"""biodiversity_graph_db_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of AndrewIOM/biodiversity-graph-db.

The reference (see /root/reference, surveyed in SURVEY.md) is an in-memory
typed property graph of palaeo-biodiversity evidence.  This package
re-expresses its data model and every operator Spark-first:

- ``schema``     — nodes/edges table design, relation vocabulary (SURVEY §1)
- ``keys``       — deterministic key synthesis as Column exprs (Graph.fs:373-543)
- ``seed``       — the fixed seed graph (Seed.fs:48-98)
- ``graph``      — storage/mutation/traversal ops (Storage.fs, Graph.fs)
- ``operators``  — relational operator library (SURVEY §2 inventory)
- ``functions``  — scalar function library (SURVEY §2.8)
- ``sources``    — ingest connectors: BibTeX, Colandr CSV, data tables (§2.1)
- ``extensions`` — dedup / similarity / text analysis / multimodal (100 TB ops)
- ``streaming``  — Structured Streaming ingestion (§2.10)
"""

__version__ = "0.1.0"
