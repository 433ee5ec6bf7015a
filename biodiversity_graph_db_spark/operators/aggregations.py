"""Aggregations (SURVEY §2.4) and the TPC-H-Q1-shaped pricing summary.

A1 (GenStatistics, Library.fs:328-367) is the reference's only real
aggregate: one pass over sources producing conditional counts, one of which
depends on the existence of an out-edge (a semi-join flag).  Q1 is the
bench-headline groupBy-agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.operators._util import davg, dsum, sql_davg, sql_dsum
from biodiversity_graph_db_spark.registry import query
from biodiversity_graph_db_spark.tables import table


@query(
    "A1_gen_statistics",
    oracle="""
    WITH flagged AS (
      SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal,
             EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
               AS has_orders
      FROM customer c
    )
    SELECT COUNT(*) AS total_customers,
           COUNT(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS n_building,
           COUNT(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS n_machinery,
           COUNT(CASE WHEN c_acctbal < 0 THEN 1 END) AS n_overdrawn,
           COUNT(CASE WHEN has_orders THEN 1 END) AS n_active,
           COUNT(CASE WHEN NOT has_orders THEN 1 END) AS n_inactive
    FROM flagged
    """,
)
def a1_gen_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GenStatistics (Library.fs:328-367): single-pass conditional counts;
    'active' mirrors 'primary source' = existence of a HasTemporalExtent
    out-edge, computed as a left-semi flag then aggregated.

    Scale note: the existence flag is a map-side-combinable aggregate over
    the fact side (groupBy custkey on orders), then a broadcast-friendly
    join — no row explosion."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    order_custs = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    flagged = c.join(
        order_custs.withColumn("has_orders", F.lit(True)), "c_custkey", "left"
    ).withColumn("has_orders", F.coalesce("has_orders", F.lit(False)))
    return flagged.agg(
        F.count("*").alias("total_customers"),
        F.count(F.when(F.col("c_mktsegment") == "BUILDING", 1)).alias("n_building"),
        F.count(F.when(F.col("c_mktsegment") == "MACHINERY", 1)).alias("n_machinery"),
        F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_overdrawn"),
        F.count(F.when(F.col("has_orders"), 1)).alias("n_active"),
        F.count(F.when(~F.col("has_orders"), 1)).alias("n_inactive"),
    )


@query(
    "Q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary aggregate (TPC-H Q1 shape) — the statistics-view
    pattern (A1/A7) at fact-table scale.  Partial aggregation happens
    map-side (hash aggregate), so the shuffle carries only
    |groups| x |partitions| rows; scaled-integer sums keep it
    order-independent (see _util)."""
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "A2_group_by_type",
    oracle="""
    SELECT o_orderstatus AS node_type,
           COUNT(*) AS n,
           MIN(o_orderkey) AS min_key,
           MAX(o_orderkey) AS max_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def a2_group_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nodesByType (Storage.fs:188-193): group the index by type.  The
    per-type Map becomes a grouped summary (collect_map is driver-hostile
    at scale; the grouped table IS the index)."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("node_type"))
        .agg(
            F.count("*").alias("n"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


@query(
    "A4_duplicate_guard",
    oracle="""
    SELECT l_orderkey, l_partkey, COUNT(*) AS n_dup
    FROM lineitem
    GROUP BY l_orderkey, l_partkey
    HAVING COUNT(*) > 1
    ORDER BY l_orderkey, l_partkey
    LIMIT 50
    """,
)
def a4_duplicate_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate guard (Storage.fs:425-427: distinct-length mismatch is an
    error) → groupBy-count-filter, the scalable emptiness check."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.count("*").alias("n_dup"))
        .where(F.col("n_dup") > 1)
        .orderBy("l_orderkey", "l_partkey")
        .limit(50)
    )


@query(
    "A5_array_sections_complete",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             list_sort(list_distinct(list(DISTINCT o_orderpriority))) AS seen
      FROM orders GROUP BY o_custkey
    )
    SELECT COUNT(CASE WHEN len(list_filter(
                   ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'],
                   p -> NOT list_contains(seen, p))) = 0 THEN 1 END)
             AS n_complete,
           COUNT(*) AS n_customers
    FROM per_cust
    """,
)
def a5_sections_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """allSectionsComplete (Library.fs:720-722): required-set minus
    completed-set emptiness, via array_except on a collect_set."""
    required = F.array(*[
        F.lit(p) for p in ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    ])
    per_cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.collect_set("o_orderpriority").alias("seen"))
    )
    return per_cust.agg(
        F.count(
            F.when(F.size(F.array_except(required, F.col("seen"))) == 0, 1)
        ).alias("n_complete"),
        F.count("*").alias("n_customers"),
    )


@query(
    "A6_next_id",
    oracle="SELECT MAX(o_orderkey) + 1 AS next_id FROM orders",
)
def a6_next_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-batch-row id = max key + 1 (Library.fs:608 Map.maxKeyValue)."""
    return table(spark, sf_dir, "orders").agg(
        (F.max("o_orderkey") + 1).alias("next_id")
    )


@query(
    "A3_merge_into_index",
    oracle="""
    WITH base AS (
      SELECT 'nation_' || n_nationkey AS key, 'NationNode' AS node_type,
             trim(n_name) AS pretty_name
      FROM nation
    ),
    incoming AS (
      SELECT 'nation_' || n_nationkey, 'NationNode', trim(n_name)
      FROM nation WHERE n_nationkey < 10
      UNION ALL
      SELECT 'region_' || r_regionkey, 'RegionNode', trim(r_name)
      FROM region
    )
    SELECT key, node_type, pretty_name
    FROM (SELECT * FROM base UNION SELECT * FROM incoming)
    ORDER BY node_type, key
    """,
)
def a3_merge_into_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mergeIntoIndex (A3, Storage.fs:160-168): concat + distinct + sort
    by (type, id).  Union + dropDuplicates is one shuffle; the sort rides
    the same exchange when AQE coalesces."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    base = nation.select(
        F.concat(F.lit("nation_"), F.col("n_nationkey")).alias("key"),
        F.lit("NationNode").alias("node_type"),
        F.trim(F.col("n_name")).alias("pretty_name"),
    )
    incoming = (
        base.where(F.col("key").isin(*[f"nation_{i}" for i in range(10)]))
        .unionByName(
            region.select(
                F.concat(F.lit("region_"), F.col("r_regionkey")).alias("key"),
                F.lit("RegionNode").alias("node_type"),
                F.trim(F.col("r_name")).alias("pretty_name"),
            )
        )
    )
    return (
        base.unionByName(incoming)
        .dropDuplicates()
        .orderBy("node_type", "key")
    )


@query(
    "A8_rollup_stats",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS node_type,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY node_type, priority
    """,
)
def a8_rollup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical summary via ROLLUP (status → status×priority →
    grand total) — the one-pass multi-level index summary a dashboard
    reads instead of three separate groupBys.  Spark plans ROLLUP as a
    single Expand + ONE hash aggregate (each input row fans to its
    grouping-set copies map-side), so the 100 TB cost is one shuffle on
    the compound key, not one scan per level.  Money sums ride the
    house integer-cents spelling so every engine's total is
    order-independent."""
    o = table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("total_cents"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("node_type"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n",
            "total_cents",
        )
        .orderBy("node_type", "priority")
    )


@query(
    "A9_exact_median",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
    ),
    r AS (
      SELECT l_returnflag, l_linestatus, cents,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag, l_linestatus ORDER BY cents
             ) AS rn,
             COUNT(*) OVER (
               PARTITION BY l_returnflag, l_linestatus
             ) AS n
      FROM c
    )
    SELECT l_returnflag, l_linestatus,
           CAST(MAX(n) AS BIGINT) AS n,
           AVG(cents) AS median_cents
    FROM r
    WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def a9_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group median price — the deterministic complement to
    the T24/T25 histogram-sketch quantiles (a sketch answers "roughly
    where is p50" in one pass; billing/audit paths need the exact
    order statistic).

    Scale shape — the VALUE-HISTOGRAM spelling, not a per-group sort of
    the raw rows: one map-side-combinable count by (group, cents)
    collapses the 100 TB row set to its distinct values per group
    (bounded by value cardinality), the rank window then runs over that
    collapsed table only, and the two middle positions are located by
    cumulative-count containment, not row_number over raw rows.  The
    oracle uses the plain row-window spelling — same order statistic by
    definition.  AVG over the at-most-two middle cents values is exact
    in IEEE double, so the hash matches bit-for-bit."""
    from pyspark.sql import Window

    g = ["l_returnflag", "l_linestatus"]
    c = table(spark, sf_dir, "lineitem").select(
        *g, F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents")
    )
    vh = c.groupBy(*g, "cents").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(*g).orderBy("cents")
    vh = (
        vh.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy(*g)))
        .withColumn("lo", F.col("cum") - F.col("cnt") + 1)
    )
    # middle positions (1-indexed): m1 = (n+1) div 2, m2 = (n+2) div 2
    m1 = F.floor((F.col("n") + 1) / 2)
    m2 = F.floor((F.col("n") + 2) / 2)
    hit1 = (m1 >= F.col("lo")) & (m1 <= F.col("cum"))
    hit2 = (m2 >= F.col("lo")) & (m2 <= F.col("cum"))
    picked = vh.where(hit1 | hit2).select(
        *g,
        "n",
        "cents",
        # weight the value by how many middle positions land on it so a
        # single distinct value covering both positions counts twice
        (hit1.cast("int") + hit2.cast("int")).alias("w"),
    )
    return (
        picked.groupBy(*g)
        .agg(
            F.max("n").cast("long").alias("n"),
            (
                F.sum(F.col("cents") * F.col("w"))
                / F.sum("w").cast("double")
            ).alias("median_cents"),
        )
        .orderBy(*g)
    )


@query(
    "A10_grouped_mode",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(FLOOR(l_quantity) AS BIGINT) AS qty,
             COUNT(*) AS cnt
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus, qty
    ),
    r AS (
      SELECT l_returnflag, l_linestatus, qty, cnt,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag, l_linestatus
               ORDER BY cnt DESC, qty
             ) AS rn
      FROM c
    )
    SELECT l_returnflag, l_linestatus,
           qty AS mode_qty, cnt AS mode_count
    FROM r WHERE rn = 1
    ORDER BY l_returnflag, l_linestatus
    """,
)
def a10_grouped_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group mode (most frequent quantity, smallest-value
    tiebreak) — the categorical companion to A9's exact median; the
    engine's sketch path (T22 count-min heavy hitters) answers the
    same question approximately, this is the exact spelling audits
    need.

    Scale shape: the raw rows collapse to (group, value) counts in one
    map-side-combinable aggregate FIRST; the argmax window ranks only
    the collapsed distinct-value table (bounded by value cardinality
    per group, never the row count).  The deterministic tiebreak makes
    the answer engine-independent."""
    from pyspark.sql import Window

    g = ["l_returnflag", "l_linestatus"]
    c = (
        table(spark, sf_dir, "lineitem")
        .groupBy(
            *g, F.floor(F.col("l_quantity")).cast("bigint").alias("qty")
        )
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(*g).orderBy(F.col("cnt").desc(), F.col("qty"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            *g,
            F.col("qty").alias("mode_qty"),
            F.col("cnt").alias("mode_count"),
        )
        .orderBy(*g)
    )


_SALT_BUCKETS = 16


@query(
    "A11_salted_distinct",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def a11_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) under explicit SALTING — the mitigation
    PR2's skew profile recommends, implemented: a hot group's distinct
    state is split across `_SALT_BUCKETS` reducers by salting the
    group key with a hash OF THE COUNTED VALUE, then the per-salt
    partial distincts are summed.  Correct because the same user always
    lands in the same salt bucket, so the per-salt distinct sets are
    DISJOINT and their sum is the exact distinct count — the textbook
    two-level exact-distinct that survives a group holding half the
    corpus (where the naive plan funnels that group's whole value set
    through one reducer).

    At this SF Spark's own partial aggregation handles the size; the
    operator exists because at 100 TB a skewed COUNT(DISTINCT) is the
    canonical straggler, and AQE's skew handling does not split
    aggregate groups — only explicit salting does.  The oracle is the
    plain single-level spelling (same answer by the disjointness
    argument)."""
    ev = table(spark, sf_dir, "events")
    salted = (
        ev.groupBy(
            "event_type",
            F.pmod(F.xxhash64("user_id"), F.lit(_SALT_BUCKETS)).alias(
                "_salt"
            ),
        )
        .agg(
            F.count("*").alias("pn"),
            F.countDistinct("user_id").alias("pd"),
        )
    )
    return (
        salted.groupBy("event_type")
        .agg(
            F.sum("pn").cast("long").alias("n_events"),
            F.sum("pd").cast("long").alias("n_users"),
        )
        .orderBy("event_type")
    )


@query(
    "A12_grouping_sets_distinct",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS d
      FROM events
    )
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           COALESCE(d, 'ALL') AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           COUNT(*) AS n_events
    FROM e
    GROUP BY GROUPING SETS ((event_type), (d), ())
    ORDER BY event_type, day
    """,
)
def a12_grouping_sets_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user counts along TWO independent dimensions plus
    the grand total in ONE pass — GROUPING SETS ((type), (day), ()):
    the daily-actives / per-type-actives dashboard block.  Distinct
    counts don't roll up (a user active on two days is one user), so
    the naive spelling is three separate scans; grouping sets fan each
    row to its three set copies map-side and keep ONE scan.

    Spark plans this as Expand (grouping sets) feeding the two-phase
    count-distinct (itself an Expand) — plan-tested: exactly one
    parquet scan under both Expands.  T20's KMV is the sketch answer to
    the same question; this is the exact one, and at 100 TB the
    distinct state is the cost driver (the A11 salting composes here
    when one dimension value dominates)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
    )
    gs = ev.groupingSets(
        [["event_type"], ["day"], []], "event_type", "day"
    ).agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count("*").alias("n_events"),
    )
    return gs.select(
        F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
        F.coalesce(F.col("day"), F.lit("ALL")).alias("day"),
        "n_users",
        "n_events",
    ).orderBy("event_type", "day")
