"""Oracle-checkable graph queries (SURVEY §2.3, §2.12 + S14 seed).

These run the *real* graph machinery — GraphStore, key synthesis, the
seed, traversal/closure/components — and each has a pure-SQL DuckDB
oracle: graph structure is derived from the star schema (keys are
``'{type}_{id}'`` strings the oracle can reconstruct), and seed queries
use ``range()`` series the oracle can regenerate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.graph import traversal
from biodiversity_graph_db_spark.graph.seed import seed_graph, year_nodes
from biodiversity_graph_db_spark.registry import query
from biodiversity_graph_db_spark.tables import table

_SEED_CACHE: dict[str, DataFrame] = {}


def _seed_nodes(spark: SparkSession) -> DataFrame:
    # seed is sf-independent; build once per session
    key = "nodes"
    if key not in _SEED_CACHE:
        store = seed_graph(spark)
        _SEED_CACHE["nodes"] = store.nodes.cache()
        _SEED_CACHE["edges"] = store.edges.cache()
    return _SEED_CACHE[key]


def star_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The star schema viewed as a graph: customer -FromNation-> nation
    -WithinRegion-> region; customer -HasOrder<- ... (edges point child →
    parent so the closure walks 'up' like taxonomy IsA)."""
    nation = table(spark, sf_dir, "nation")
    customer = table(spark, sf_dir, "customer")
    n_edges = nation.select(
        F.concat(F.lit("nation_"), F.col("n_nationkey")).alias("source_key"),
        F.concat(F.lit("region_"), F.col("n_regionkey")).alias("sink_key"),
        F.lit("IsA").alias("relation"),
    )
    c_edges = customer.select(
        F.concat(F.lit("customer_"), F.col("c_custkey")).alias("source_key"),
        F.concat(F.lit("nation_"), F.col("c_nationkey")).alias("sink_key"),
        F.lit("IsA").alias("relation"),
    )
    return n_edges.unionByName(c_edges)


@query(
    "G1_star_one_hop",
    oracle="""
    SELECT 'customer_419' AS source_key,
           'order_' || o_orderkey AS sink_key,
           'HasOrder' AS relation
    FROM orders WHERE o_custkey = 419
    ORDER BY sink_key
    """,
)
def g1_star_one_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 on a graph-shaped edge table built from the star schema: the
    out-edges of one customer node."""
    orders = table(spark, sf_dir, "orders")
    edges = orders.select(
        F.concat(F.lit("customer_"), F.col("o_custkey")).alias("source_key"),
        F.concat(F.lit("order_"), F.col("o_orderkey")).alias("sink_key"),
        F.lit("HasOrder").alias("relation"),
    )
    return (
        traversal.out_hop(edges)
        .where(F.col("source_key") == "customer_419")
        .withColumn("relation", F.lit("HasOrder"))
        .orderBy("sink_key")
    )


@query(
    "G2_hierarchy_closure",
    oracle="""
    WITH RECURSIVE edges(src, dst) AS (
      SELECT 'nation_' || n_nationkey, 'region_' || n_regionkey FROM nation
      UNION ALL
      SELECT 'customer_' || c_custkey, 'nation_' || c_nationkey FROM customer
    ), closure(descendant, ancestor, depth) AS (
      SELECT src, dst, 1 FROM edges
      UNION ALL
      SELECT c.descendant, e.dst, c.depth + 1
      FROM closure c JOIN edges e ON c.ancestor = e.src
    )
    SELECT descendant, ancestor, depth FROM closure
    WHERE descendant IN (
      SELECT 'customer_' || c_custkey FROM customer WHERE c_custkey <= 50
    ) OR descendant LIKE 'nation_%'
    ORDER BY descendant, ancestor, depth
    """,
)
def g2_hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taxonomy-closure machinery (§2.12: iterate-to-fixpoint, no recursive
    CTE in Spark) on the customer→nation→region hierarchy; DuckDB verifies
    with a real recursive CTE."""
    closure = traversal.transitive_closure(
        star_edges(spark, sf_dir).select("source_key", "sink_key"), max_depth=3
    )
    custs = table(spark, sf_dir, "customer").where(F.col("c_custkey") <= 50)
    keep = custs.select(
        F.concat(F.lit("customer_"), F.col("c_custkey")).alias("descendant")
    )
    return (
        closure.join(keep, "descendant", "left_semi")
        .unionByName(closure.where(F.col("descendant").like("nation_%")))
        .orderBy("descendant", "ancestor", "depth")
    )


@query(
    "G3_connected_components",
    oracle="""
    WITH comp AS (
      SELECT n_regionkey, MIN('nation_' || n_nationkey) AS component
      FROM nation GROUP BY n_regionkey
    )
    SELECT 'nation_' || n.n_nationkey AS key, c.component
    FROM nation n JOIN comp c USING (n_regionkey)
    UNION ALL
    SELECT 'region_' || r.r_regionkey AS key, c.component
    FROM comp c JOIN region r ON c.n_regionkey = r.r_regionkey
    ORDER BY key
    """,
)
def g3_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-min label propagation (the connectedComponents audit, §2.12)
    over the nation↔region graph: component id = lexicographic-min key."""
    nation = table(spark, sf_dir, "nation")
    edges = nation.select(
        F.concat(F.lit("nation_"), F.col("n_nationkey")).alias("source_key"),
        F.concat(F.lit("region_"), F.col("n_regionkey")).alias("sink_key"),
    )
    return traversal.connected_components(edges).orderBy("key")


@query(
    "S14_seed_statistics",
    oracle="""
    SELECT * FROM (VALUES
      ('BiodiversityDimensionNode', 6),
      ('CalYearNode', 14073),
      ('QualitativeLabelNode', 1),
      ('TaxonNode', 1)
    ) AS t(node_type, n)
    ORDER BY node_type
    """,
)
def s14_seed_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed golden (Seed.fs:48-98; BASELINE.md cardinalities): build the
    actual seed graph and count nodes by type."""
    return (
        _seed_nodes(spark)
        .groupBy("node_type")
        .agg(F.count("*").cast("int").alias("n"))
        .orderBy("node_type")
    )


@query(
    "W1_seed_next_chain",
    oracle="""
    WITH y AS (SELECT range AS year_value FROM range(-72, 14001))
    SELECT year_value,
           'calyearnode_' || CAST(year_value + 1 AS VARCHAR) || 'ybp'
             AS next_key
    FROM y
    WHERE year_value BETWEEN 11645 AND 11654
    ORDER BY year_value
    """,
)
def w1_seed_next_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The year Next chain (W1; Exposure.fs:123 — declared but never
    instantiated in the reference) materialized with lead() over the real
    seed year nodes."""
    from pyspark.sql import Window

    w = Window.orderBy("year_value")
    years = year_nodes(spark).select("year_value", "key")
    return (
        years.withColumn("next_key", F.lead("key").over(w))
        .where(F.col("year_value").between(11645, 11654))
        .select("year_value", "next_key")
        .orderBy("year_value")
    )


@query(
    "G4_holocene_contains",
    oracle="""
    WITH y AS (SELECT range AS yr FROM range(-72, 14001))
    SELECT COUNT(*) AS n_years,
           MIN(yr) AS earliest_contained,
           MAX(yr) AS latest_contained
    FROM y WHERE yr BETWEEN 0 AND 11650
    """,
)
def g4_holocene_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/Contains on the real seed: which year nodes fall inside the
    Holocene extent edges (EarliestTime=11650, LatestTime=0, Seed.fs:96-98)?
    Resolved as a range predicate against the time dimension — the scale
    path; the reference would materialize one edge per year."""
    _seed_nodes(spark)
    edges = _SEED_CACHE["edges"]
    nodes = _SEED_CACHE["nodes"]
    bounds = (
        edges.join(
            nodes.select("key", "year_value"),
            edges.sink_key == F.col("key"),
        )
        .agg(
            F.max(F.when(F.col("relation") == "EarliestTime", F.col("year_value"))).alias("earliest"),
            F.min(F.when(F.col("relation") == "LatestTime", F.col("year_value"))).alias("latest"),
        )
    )
    years = nodes.where(F.col("node_type") == "CalYearNode")
    return (
        years.crossJoin(F.broadcast(bounds))
        .where(F.col("year_value").between(F.col("latest"), F.col("earliest")))
        .agg(
            F.count("*").alias("n_years"),
            F.min("year_value").alias("earliest_contained"),
            F.max("year_value").alias("latest_contained"),
        )
    )


@query(
    "X5_old_date_normalization",
    oracle="""
    SELECT o_orderkey,
           CAST(1950 - year(o_orderdate) AS BIGINT) AS ad_as_bp,
           CAST(year(o_orderdate) + 1950 AS BIGINT) AS bc_as_bp,
           CAST(year(o_orderdate) AS BIGINT) AS bp_as_bp,
           1950 - year(o_orderdate) BETWEEN -72 AND 11650 AS in_scope
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
)
def x5_old_date_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """holoceneCalYear (X5, Scenarios.fs:12-19) + scope routing (F10,
    Library.fs:931-942) applied to order years under all three calendars."""
    from biodiversity_graph_db_spark.functions import dates

    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 200)
    yr = F.year("o_orderdate")
    return o.select(
        "o_orderkey",
        dates.to_cal_yr_bp(F.lit("AD"), yr).alias("ad_as_bp"),
        dates.to_cal_yr_bp(F.lit("BC"), yr).alias("bc_as_bp"),
        dates.to_cal_yr_bp(F.lit("BP"), yr).alias("bp_as_bp"),
        dates.in_holocene_scope(dates.to_cal_yr_bp(F.lit("AD"), yr)).alias(
            "in_scope"
        ),
    ).orderBy("o_orderkey")


@query(
    "F5_pretty_name_lookup",
    oracle="SELECT '9999 cal yr BP' AS pretty_name",
)
def f5_pretty_name_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """atomFriendlyNameByKey (F5, Storage.fs:227-230): key → display name
    as a point projection on the real seed nodes."""
    return (
        _seed_nodes(spark)
        .where(F.col("key") == "calyearnode_9999ybp")
        .select("pretty_name")
    )


@query(
    "F7_nodes_of_type",
    oracle="""
    SELECT * FROM (VALUES
      ('biodiversitydimensionnode_abundance', 'Abundance'),
      ('biodiversitydimensionnode_beta_diversity', 'DiversityBeta'),
      ('biodiversitydimensionnode_evenness', 'Evenness'),
      ('biodiversitydimensionnode_presence', 'PresenceOnly'),
      ('biodiversitydimensionnode_presence_absence', 'PresenceAbsence'),
      ('biodiversitydimensionnode_richness', 'Richness')
    ) AS t(key, pretty_name)
    ORDER BY key
    """,
)
def f7_nodes_of_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FileBasedGraph.Nodes<'c>() (F7, Storage.fs:50-54): all (key,
    pretty_name) of one node type — a partition-pruned projection; the
    oracle pins the outcome-key golden (Graph.fs:534-543)."""
    return (
        _seed_nodes(spark)
        .where(F.col("node_type") == "BiodiversityDimensionNode")
        .select("key", "pretty_name")
        .orderBy("key")
    )


@query(
    "F9_nearest_year_select",
    oracle="""
    SELECT o_orderkey,
           'calyearnode_' || CAST(1950 - year(o_orderdate) AS VARCHAR)
             || 'ybp' AS year_key,
           CAST(1950 - year(o_orderdate) AS BIGINT) AS year_value
    FROM orders
    WHERE o_orderkey <= 100
      AND 1950 - year(o_orderdate) BETWEEN -72 AND 14000
    ORDER BY o_orderkey
    """,
)
def f9_nearest_year_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trySelectTimeNodeByYear (F9, Scenarios.fs:24-33): date → cal-yr-BP
    → year key, existence-checked by an equi-join against the broadcast
    time dimension (14k rows — always the build side)."""
    from biodiversity_graph_db_spark.functions import dates

    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 100)
    with_bp = o.select(
        "o_orderkey",
        dates.to_cal_yr_bp(F.lit("AD"), F.year("o_orderdate")).alias("bp"),
    )
    years = F.broadcast(
        _seed_nodes(spark)
        .where(F.col("node_type") == "CalYearNode")
        .select(F.col("key").alias("year_key"), "year_value")
    )
    return (
        with_bp.join(years, with_bp.bp == years.year_value)
        .select("o_orderkey", "year_key", "year_value")
        .orderBy("o_orderkey")
    )
