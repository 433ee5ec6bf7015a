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
- ``extensions`` — dedup / fuzzy match / similarity + recall / text analysis /
                   BPE tokenizer / sketches / multimodal (100 TB ops)
- ``streaming``  — Structured Streaming ingestion: windows, stateful
                   sessions, MERGE, near-dup ledger, KMV maintenance (§2.10)

Round-4 additions inside ``operators``: ``spatial`` (GEO1-6),
``snapshot`` (diff / incremental stats / time travel), ``ebv``
(richness cube), plus the AS-OF join (``joins.j9_asof_join``) and
k-core (``graph_analytics``).

Query discovery: ``registry.load_all()`` then ``registry.QUERIES`` /
``registry.ORACLE`` — every operator with its DuckDB-verifiable oracle.
"""

__version__ = "0.1.0"
