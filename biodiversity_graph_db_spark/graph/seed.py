"""The fixed seed graph (S14, Seed.fs:48-98) built with spark.range.

Cardinalities (BASELINE.md): 14,073 CalYearNodes (-72..14000 cal yr BP),
6 BiodiversityDimensionNodes, the Life TaxonNode, the Holocene
QualitativeLabelNode, and 2 edges (Holocene -EarliestTime-> 11650ybp,
Holocene -LatestTime-> 0ybp).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.functions import keys as K
from biodiversity_graph_db_spark.graph.store import GraphStore

HOLOCENE_KEY = (
    "qualitativelabelnode_holocene_by_global stratotype section and point"
)
LIFE_KEY = "taxonnode_life"

OUTCOMES = (
    "Abundance",
    "DiversityBeta",
    "Evenness",
    "PresenceAbsence",
    "PresenceOnly",
    "Richness",
)


def year_nodes(spark: SparkSession):
    """One node per calendar year BP, -72..14000 (Seed.fs:55;
    year bounds Exposure.fs:66-70) — generated, never collected."""
    years = spark.range(-72, 14001).select(F.col("id").alias("year_value"))
    return years.select(
        K.year_key(F.col("year_value")).alias("key"),
        F.lit("CalYearNode").alias("node_type"),
        F.concat(F.col("year_value").cast("string"), F.lit(" cal yr BP")).alias(
            "pretty_name"
        ),
        F.to_json(F.struct(F.col("year_value").alias("Year"))).alias("payload"),
        F.col("year_value"),
    )


def seed_graph(spark: SparkSession) -> GraphStore:
    """Seed.initGraph (Seed.fs:48-98): Life + Holocene + outcomes + time
    index, then the two Holocene extent edges.

    Constructed directly (as the reference does) rather than through the
    validated mutation path: the seed is fixed and deterministic, so the
    per-batch FK/duplicate checks would only re-prove invariants the
    seed-cardinality tests and S14 oracle already pin — and each check
    is a driver-side job (8+ jobs ≈ 14 s per session before this).
    User mutations still go through ``add_nodes``/``add_relations``.
    """
    empty = GraphStore.empty(spark)
    fixed = spark.createDataFrame(
        [
            (LIFE_KEY, "TaxonNode", "Life"),
            (HOLOCENE_KEY, "QualitativeLabelNode", "Holocene"),
        ],
        "key string, node_type string, pretty_name string",
    )
    outcomes = spark.createDataFrame(
        [(m,) for m in OUTCOMES], "measure string"
    ).select(
        K.outcome_key(F.col("measure")).alias("key"),
        F.lit("BiodiversityDimensionNode").alias("node_type"),
        F.col("measure").alias("pretty_name"),
    )
    nodes = (
        empty._conform(fixed)
        .unionByName(empty._conform(outcomes))
        .unionByName(empty._conform(year_nodes(spark)))
    )
    seed_edges = spark.createDataFrame(
        [
            (HOLOCENE_KEY, "calyearnode_11650ybp", "EarliestTime",
             "QualitativeLabelNode", "CalYearNode"),
            (HOLOCENE_KEY, "calyearnode_0ybp", "LatestTime",
             "QualitativeLabelNode", "CalYearNode"),
        ],
        "source_key string, sink_key string, relation string,"
        " source_type string, sink_type string",
    ).select(
        "source_key",
        "sink_key",
        "relation",
        F.lit(1).alias("weight"),
        F.lit(None).cast("string").alias("payload"),
        "source_type",
        "sink_type",
        F.lit(None).cast("long").alias("edge_year_value"),
    )
    return GraphStore(spark, nodes, seed_edges)
