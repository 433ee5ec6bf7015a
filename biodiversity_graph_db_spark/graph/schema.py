"""Graph table design + closed node/relation vocabulary (SURVEY §1.2-1.4).

Two tables mirror the reference's atom storage (Storage.fs:76-112):

- ``nodes(key, node_type, pretty_name, payload)`` — payload is the typed
  body as canonical JSON (parity with the reference's compact-DU
  serialisation, Storage.fs:3-29); query-bearing fields are *promoted* to
  typed columns at ingest (e.g. ``year_value`` for CalYearNode).
- ``edges(source_key, sink_key, relation, weight, payload,
  source_type, sink_type)`` — payload carries per-relation data
  (OldDateSimple etc., SURVEY §1.3); the endpoint types are denormalized
  so signature validation (J5) needs no join back to nodes.

At scale both are partitioned by ``node_type`` / ``relation`` — the Spark
form of the reference's per-type consolidated files and NodesByType index
(Storage.fs:94-105, 188-193).
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

NODES_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("node_type", StringType(), False),
        StructField("pretty_name", StringType(), True),
        StructField("payload", StringType(), True),
        # promoted query-bearing columns (nullable; per-type)
        StructField("year_value", LongType(), True),
        StructField("lat", StringType(), True),
        StructField("lon", StringType(), True),
        StructField("screening_state", StringType(), True),
    ]
)

EDGES_SCHEMA = StructType(
    [
        StructField("source_key", StringType(), False),
        StructField("sink_key", StringType(), False),
        StructField("relation", StringType(), False),
        StructField("weight", IntegerType(), False),
        StructField("payload", StringType(), True),
        StructField("source_type", StringType(), True),
        StructField("sink_type", StringType(), True),
        # promoted at write time from date-valued payloads (OldDateSimple,
        # Exposure.fs:158-186) so range queries over edge dates are plain
        # columnar predicates — see graph/edge_payloads.py
        StructField("edge_year_value", LongType(), True),
    ]
)

# Node type strings exactly as Node.NodeType() renders them
# (Graph.fs:215-247).
NODE_TYPES = (
    "SourceNode",
    "BioticProxyNode",
    "BioticProxyCategoryNode",
    "TaxonNode",
    "TaxonomicNamesIndexNode",
    "InferenceMethodNode",
    "ProxiedTaxonNode",
    "ContextNode",
    "VernacularTaxonLabelNode",
    "CalYearNode",
    "QualitativeLabelNode",
    "IndividualTimelineNode",
    "IndividualDateNode",
    "QualitativeLabelOutOfScopeNode",
    "DateCalibrationInstanceNode",
    "BiodiversityDimensionNode",
    "DigitisedDatasetNode",
)

# GUID-keyed types (Graph.fs:439-440, 444, 529-532).
UUID_KEYED = (
    "ProxiedTaxonNode",
    "ContextNode",
    "IndividualTimelineNode",
    "IndividualDateNode",
    "DateCalibrationInstanceNode",
    "DigitisedDatasetNode",
)

# Relation vocabulary with (source_type, sink_type) signatures, from the
# *NodeRelation DUs: Exposure.fs:120-186, Population.fs:173-195,
# Sources.fs:204-220, Datasets.fs:168-172.  Used as a broadcast dim for
# edge-signature validation (J5; the reference's reflection-based check at
# Graph.fs:630-656 is disabled — ours is on).
RELATION_SIGNATURES: list[tuple[str, str, str]] = [
    # exposure
    ("Next", "CalYearNode", "CalYearNode"),
    ("Contains", "QualitativeLabelNode", "CalYearNode"),
    ("EarliestTime", "QualitativeLabelNode", "CalYearNode"),
    ("LatestTime", "QualitativeLabelNode", "CalYearNode"),
    ("TimeEstimate", "IndividualDateNode", "CalYearNode"),
    ("UncertaintyOldest", "IndividualDateNode", "CalYearNode"),
    ("UncertaintyYoungest", "IndividualDateNode", "CalYearNode"),
    ("OccursWithin", "IndividualDateNode", "QualitativeLabelNode"),
    ("OccursOutOfScope", "IndividualDateNode", "QualitativeLabelOutOfScopeNode"),
    ("UsedInCalibration", "IndividualDateNode", "DateCalibrationInstanceNode"),
    ("Calibrated", "DateCalibrationInstanceNode", "IndividualDateNode"),
    ("ExtentEarliest", "IndividualTimelineNode", "CalYearNode"),
    ("ExtentEarliestSpecified", "IndividualTimelineNode", "CalYearNode"),
    ("ExtentEarliestUncertainty", "IndividualTimelineNode", "CalYearNode"),
    ("ExtentEarliestOutOfScope", "IndividualTimelineNode", "QualitativeLabelOutOfScopeNode"),
    ("ExtentEarliestHarmonised", "IndividualTimelineNode", "CalYearNode"),
    ("ExtentLatest", "IndividualTimelineNode", "CalYearNode"),
    ("ExtentLatestSpecified", "IndividualTimelineNode", "CalYearNode"),
    ("ExtentLatestUncertainty", "IndividualTimelineNode", "CalYearNode"),
    ("ExtentLatestHarmonised", "IndividualTimelineNode", "CalYearNode"),
    ("IntersectsTime", "IndividualTimelineNode", "QualitativeLabelNode"),
    ("ConstructedWithDate", "IndividualTimelineNode", "IndividualDateNode"),
    ("HasProxyInfo", "IndividualTimelineNode", "ProxiedTaxonNode"),
    ("HasProxyCategory", "IndividualTimelineNode", "BioticProxyCategoryNode"),
    ("HasOrphanProxy", "IndividualTimelineNode", "BioticProxyNode"),
    ("IsLocatedAt", "IndividualTimelineNode", "ContextNode"),
    ("HasRawData", "IndividualTimelineNode", "DigitisedDatasetNode"),
    # population
    ("IsA", "TaxonNode", "TaxonNode"),
    ("IsSynonymOf", "TaxonNode", "TaxonNode"),
    ("HasIdentifier", "TaxonNode", "TaxonomicNamesIndexNode"),
    ("HasLabel", "TaxonNode", "VernacularTaxonLabelNode"),
    ("InferredFrom", "ProxiedTaxonNode", "BioticProxyNode"),
    ("InferredUsing", "ProxiedTaxonNode", "InferenceMethodNode"),
    ("InferredAs", "ProxiedTaxonNode", "TaxonNode"),
    ("MeasuredBy", "ProxiedTaxonNode", "BiodiversityDimensionNode"),
    # source
    ("HasTemporalExtent", "SourceNode", "IndividualTimelineNode"),
    ("UsesPrimarySource", "SourceNode", "SourceNode"),
    ("UsedDatabase", "SourceNode", "SourceNode"),
    ("HasDataset", "SourceNode", "DigitisedDatasetNode"),
    ("IsChapterIn", "SourceNode", "SourceNode"),
    # dataset
    ("IsProxyGroup", "DigitisedDatasetNode", "BioticProxyCategoryNode"),
]

RELATIONS = tuple(sorted({r for r, _, _ in RELATION_SIGNATURES}))


def payload_field(payload_col, field: str):
    """Parse-on-demand access to a payload JSON field (X19: the typed
    body stays canonical JSON, Storage.fs:3-29; query-bearing fields are
    promoted to real columns at ingest and this accessor covers the long
    tail)."""
    from pyspark.sql import functions as F

    col = payload_col if not isinstance(payload_col, str) else F.col(payload_col)
    return F.get_json_object(col, f"$.{field}")
