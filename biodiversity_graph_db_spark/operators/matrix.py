"""Array / matrix operators (SURVEY §2.9): the DataTable2D wide matrix.

The reference stores digitised count tables as float[,] (Datasets.fs:23-28).
The scalable form is long (one row per cell); wide↔long conversion is
unpivot (stack) and pivot (conditional aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.operators._util import dsum, sql_dsum
from biodiversity_graph_db_spark.registry import query
from biodiversity_graph_db_spark.tables import table


@query(
    "M1_unpivot_wide_matrix",
    oracle=f"""
    WITH long AS (
      SELECT l_orderkey, 'quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT l_orderkey, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, 'tax', l_tax FROM lineitem
    )
    SELECT measure, COUNT(*) AS n_cells, {sql_dsum('value')} AS total
    FROM long GROUP BY measure ORDER BY measure
    """,
)
def m1_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataTable2D → long form (M1; Datasets.fs:23-28).  The wide matrix
    columns become (measure, value) rows via stack — a narrow transform,
    no shuffle until the aggregate."""
    li = table(spark, sf_dir, "lineitem")
    long = li.select(
        "l_orderkey",
        F.expr(
            "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice,"
            " 'discount', l_discount, 'tax', l_tax) AS (measure, value)"
        ),
    )
    return (
        long.groupBy("measure")
        .agg(F.count("*").alias("n_cells"), dsum("value").alias("total"))
        .orderBy("measure")
    )


_QTY_F = sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")
_QTY_O = sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")


@query(
    "M2_pivot_row_view",
    oracle=f"""
    SELECT l_returnflag,
           {_QTY_F} AS qty_F,
           {_QTY_O} AS qty_O
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def m2_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-slice view of the matrix (M2: depths → Map of morphotype→value,
    Datasets.fs:92-95) = pivot back to wide.  Conditional aggregation with
    explicit aliases (stable names; Spark's .pivot() infers them)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            dsum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))).alias(
                "qty_F"
            ),
            dsum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))).alias(
                "qty_O"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "M3_shape_check",
    oracle="""
    WITH cells AS (
      SELECT l_orderkey, COUNT(*) AS n_lines,
             COUNT(DISTINCT l_linenumber) AS n_distinct_lines
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(CASE WHEN n_lines <> n_distinct_lines THEN 1 END) AS n_ragged
    FROM cells
    """,
)
def m3_shape_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix shape validation (M3: isValid, Datasets.fs:87-90 — data dims
    must match index/morphotype lengths) as count assertions."""
    cells = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.countDistinct("l_linenumber").alias("n_distinct_lines"),
        )
    )
    return cells.agg(
        F.count("*").alias("n_rows"),
        F.count(F.when(F.col("n_lines") != F.col("n_distinct_lines"), 1)).alias(
            "n_ragged"
        ),
    )


_T_CASE = "CASE WHEN l_linestatus = '{s}' THEN l_quantity END"


@query(
    "M4_transpose",
    oracle=f"""
    WITH long AS (
      SELECT l_returnflag, 'qty_' || l_linestatus AS measure,
             {sql_dsum('l_quantity')} AS value
      FROM lineitem GROUP BY 1, 2
    )
    SELECT measure,
           MAX(CASE WHEN l_returnflag = 'A' THEN value END) AS ret_A,
           MAX(CASE WHEN l_returnflag = 'N' THEN value END) AS ret_N,
           MAX(CASE WHEN l_returnflag = 'R' THEN value END) AS ret_R
    FROM long GROUP BY measure ORDER BY measure
    """,
)
def m4_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix transpose (M4: List.flip, Types.fs:137-153): the M2 wide
    view melted to long and re-pivoted the other way — rows become
    columns.  Two conditional-agg passes; no driver-side collect."""
    li = table(spark, sf_dir, "lineitem")
    long = li.groupBy(
        "l_returnflag",
        F.concat(F.lit("qty_"), F.col("l_linestatus")).alias("measure"),
    ).agg(dsum("l_quantity").alias("value"))
    return (
        long.groupBy("measure")
        .agg(
            *[
                F.max(
                    F.when(F.col("l_returnflag") == flag, F.col("value"))
                ).alias(f"ret_{flag}")
                for flag in ("A", "N", "R")
            ]
        )
        .orderBy("measure")
    )


# --- M5: sparse matrix multiply -------------------------------------------


def spmm(a: DataFrame, b: DataFrame) -> DataFrame:
    """Sparse matrix product C = A x B in COO (long) form: ``a`` is
    (i, k, v), ``b`` is (k, j, v); returns (i, j, val) with
    ``val = sum_k a.v * b.v``.  This IS the Spark-first spelling of
    SpMM — a join on the contraction index followed by a combinable
    aggregate on the output cell — the same shape GraphX uses for its
    message rounds and IVF uses for centroid scoring.

    Scale shape: one equi-join shuffle on k (broadcast when one operand
    is a bounded dimension — AQE decides from measured sizes), then one
    map-side-combinable sum on (i, j).  No densification anywhere:
    cost is |A| + |B| + |nonzero products|, never n^2."""
    ai, ak, av = a.columns[:3]
    bk, bj, bv = b.columns[:3]
    return (
        a.select(F.col(ai).alias("i"), F.col(ak).alias("k"), F.col(av).alias("av"))
        .join(
            b.select(
                F.col(bk).alias("k"), F.col(bj).alias("j"), F.col(bv).alias("bv")
            ),
            "k",
        )
        .groupBy("i", "j")
        .agg(F.sum(F.col("av") * F.col("bv")).cast("long").alias("val"))
    )


@query(
    "M5_sparse_matmul",
    oracle="""
    WITH a AS (
      SELECT l_orderkey AS i, l_suppkey AS k,
             CAST(FLOOR(l_quantity * 10000) AS BIGINT) AS v
      FROM lineitem WHERE l_orderkey <= 600
    ),
    b AS (
      SELECT s_suppkey AS k, s_nationkey AS j, CAST(1 AS BIGINT) AS v
      FROM supplier
    )
    SELECT a.i, b.j, CAST(SUM(a.v * b.v) AS BIGINT) AS val
    FROM a JOIN b ON a.k = b.k
    GROUP BY a.i, b.j ORDER BY i, j
    """,
)
def m5_sparse_matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SpMM demo on the star schema: A = order x supplier quantity
    matrix (scaled-int values), B = supplier x nation indicator; C
    gives per-order quantity mass by nation — a one-join one-agg
    contraction, the building block the reference's DataTable2D math
    (Datasets.fs:23-28) lifts to at scale."""
    li = table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 600)
    a = li.select(
        F.col("l_orderkey").alias("i"),
        F.col("l_suppkey").alias("k"),
        F.floor(F.col("l_quantity") * 10000).cast("long").alias("v"),
    )
    b = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"),
        F.col("s_nationkey").alias("j"),
        F.lit(1).cast("long").alias("v"),
    )
    return spmm(a, b).orderBy("i", "j")
