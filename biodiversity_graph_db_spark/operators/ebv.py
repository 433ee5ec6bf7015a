"""Essential-biodiversity-variable (EBV) rollups — the end-user
analytics the reference's data model exists to serve.

The reference assembles its evidence graph precisely so researchers can
ask "how did biodiversity change through time and space?" (the coding
workflow's north star — see the extract view, Library.fs:842-902, our
J2G), but ships no rollup: every map/timeline view rescans the node
list.  This module supplies the canonical EBV cube Spark-first: taxon
richness per TIME BIN × SPATIAL CELL, composing three layers the engine
already verifies independently —

- temporal extents (timeline → earliest/latest cal-yr-BP, the
  ExtentEarliest/LatestSpecified promotion, ED1/W2),
- sampling locations (timeline → context → promoted lat/lon and the
  GEO3/GEO4 10° grid cell),
- proxy→taxon hyperedges (timeline → ProxiedTaxon star → taxon, J6).

Shape, 100 TB reading: each timeline fans out to its covered
1000-yr bins with ``sequence``+``explode`` (bounded by extent span /
bin width — task-local, no shuffle, the T14 fan-out rule); the
bin×cell×taxon rollup is ONE grouped distinct-aggregation, which Spark
executes as two-phase partial aggregation on (bin, cell, taxon) then
(bin, cell) — never an all-pairs or per-cell collect.  Group count is
bounded by |bins|·|cells|, so the result IS the heatmap the UI reads.

Correctness: the whole subgraph is minted deterministically from
TPC-H keys (timelines + extents from ``customer``, locations through
the spatial layer's shared mint, taxa through each customer's
``orders``), and the DuckDB oracle recomputes the identical rollup
from the same integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.operators.spatial import (
    CTX_ORACLE_CTE,
    GRID_DEG,
    mint_context_nodes,
    promote_context_cols,
)
from biodiversity_graph_db_spark.registry import query
from biodiversity_graph_db_spark.tables import table

#: EBV time-bin width, calendar years BP.
BIN_YEARS = 1000
#: taxa are minted onto a bounded synthetic checklist.
N_TAXA = 97


def mint_timeline_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(timeline_key, ctx_key, latest_ybp, earliest_ybp): one timeline
    per customer with a deterministic Holocene-ish extent (earliest =
    older = larger BP, as the reference's year index orders it)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    latest = (F.col("k") * 53) % 10000
    earliest = latest + 500 + (F.col("k") * 31) % 3000
    return c.select(
        F.concat(F.lit("individualtimelinenode_"), F.col("k")).alias(
            "timeline_key"
        ),
        F.concat(F.lit("contextnode_"), F.col("k")).alias("ctx_key"),
        latest.cast("long").alias("latest_ybp"),
        earliest.cast("long").alias("earliest_ybp"),
    )


def mint_timeline_taxa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(timeline_key, taxon): each customer's orders contribute the
    taxa observed on their timeline (hyperedge InferredAs spokes,
    reified onto a bounded checklist)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        F.concat(F.lit("individualtimelinenode_"), F.col("o_custkey")).alias(
            "timeline_key"
        ),
        F.concat(
            F.lit("taxonnode_"), (F.col("o_orderkey") % N_TAXA)
        ).alias("taxon"),
    ).distinct()


@query(
    "G10_ebv_richness",
    oracle=f"""
    WITH {CTX_ORACLE_CTE},
    cells AS (
      SELECT key AS ctx_key,
             CAST(FLOOR(pt_lon / {GRID_DEG}) AS BIGINT) AS cx,
             CAST(FLOOR(pt_lat / {GRID_DEG}) AS BIGINT) AS cy
      FROM ctx_promoted WHERE kind IN ('Site', 'SiteDMS')
    ),
    tl AS (
      SELECT 'individualtimelinenode_' || c_custkey AS timeline_key,
             'contextnode_' || c_custkey AS ctx_key,
             CAST((c_custkey * 53) % 10000 AS BIGINT) AS latest_ybp,
             CAST((c_custkey * 53) % 10000
                  + 500 + (c_custkey * 31) % 3000 AS BIGINT) AS earliest_ybp
      FROM customer
    ),
    bins AS (
      SELECT timeline_key, ctx_key,
             UNNEST(generate_series(latest_ybp // {BIN_YEARS},
                                    earliest_ybp // {BIN_YEARS}))
               * {BIN_YEARS} AS bin_start_ybp
      FROM tl
    ),
    taxa AS (
      SELECT DISTINCT
             'individualtimelinenode_' || o_custkey AS timeline_key,
             'taxonnode_' || (o_orderkey % {N_TAXA}) AS taxon
      FROM orders
    )
    SELECT b.bin_start_ybp, c.cx, c.cy,
           COUNT(DISTINCT b.timeline_key) AS n_timelines,
           COUNT(DISTINCT t.taxon) AS richness
    FROM bins b
    JOIN cells c ON c.ctx_key = b.ctx_key
    JOIN taxa t ON t.timeline_key = b.timeline_key
    GROUP BY b.bin_start_ybp, c.cx, c.cy
    ORDER BY b.bin_start_ybp, c.cx, c.cy
    """,
)
def g10_ebv_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taxon richness per 1000-yr bin × 10° grid cell — "how did
    biodiversity vary through the Holocene, where" as ONE cube query
    over the evidence graph's temporal, spatial and taxonomic layers."""
    cells = (
        promote_context_cols(mint_context_nodes(spark, sf_dir))
        .where(F.col("kind").isin("Site", "SiteDMS"))
        .select(
            F.col("key").alias("ctx_key"),
            F.floor(F.col("pt_lon") / GRID_DEG).cast("long").alias("cx"),
            F.floor(F.col("pt_lat") / GRID_DEG).cast("long").alias("cy"),
        )
    )
    tl = mint_timeline_extents(spark, sf_dir)
    bins = tl.select(
        "timeline_key",
        "ctx_key",
        F.explode(
            F.sequence(
                F.floor(F.col("latest_ybp") / BIN_YEARS),
                F.floor(F.col("earliest_ybp") / BIN_YEARS),
            )
        ).alias("bin_no"),
    ).select(
        "timeline_key",
        "ctx_key",
        (F.col("bin_no") * BIN_YEARS).alias("bin_start_ybp"),
    )
    taxa = mint_timeline_taxa(spark, sf_dir)
    return (
        bins.join(cells, "ctx_key")
        .join(taxa, "timeline_key")
        .groupBy("bin_start_ybp", "cx", "cy")
        .agg(
            F.count_distinct("timeline_key").alias("n_timelines"),
            F.count_distinct("taxon").alias("richness"),
        )
        .orderBy("bin_start_ybp", "cx", "cy")
    )
