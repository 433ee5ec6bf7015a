"""Versioned graph log — time travel for the evidence graph itself.

The reference gets history for free by keeping the graph as one JSON
file per atom inside a git repository: every mutation is a copy-on-write
file replace (Storage.fs:239-275) and "read the graph as of commit X"
is a git checkout, OUTSIDE the engine.  The in-engine equivalent routes
``GraphStore`` mutations through SD3's versioned delta log
(operators/snapshot.py ``save_version`` / ``read_as_of``): each commit
appends only the CHANGED rows (upserts + tombstones) partitioned by
version, and any past state reconstructs with one latest-per-key window
under a version partition filter.

Scale shape per commit: the delta is ONE full-outer join per table on
the storage key comparing an ``xxhash64`` over the payload columns —
the exact SD1 diff plan (zero-Exchange on bucketed stores); log volume
is ∝ change volume, never corpus size, and reads prune version
partitions at the directory level.  This is the plain-parquet core of
what Delta Lake wraps in transactional metadata (see the
concurrent-writer contract, SCALE.md).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.graph.schema import (
    EDGES_SCHEMA,
    NODES_SCHEMA,
)
from biodiversity_graph_db_spark.graph.store import GraphStore
from biodiversity_graph_db_spark.operators.snapshot import (
    read_as_of,
    save_version,
)

#: edge identity — the same 4-tuple ``add_relations`` dedups on
EDGE_KEY: tuple[str, ...] = ("source_key", "sink_key", "relation", "payload")


def _log_schema(base):
    """A table's on-disk LOG schema: base columns + deleted + version —
    the single definition of the layout ``save_version`` writes and both
    ``read_version`` and ``compact_graph_log`` read."""
    from pyspark.sql.types import BooleanType, LongType, StructField

    return type(base)(
        list(base.fields)
        + [
            StructField("deleted", BooleanType(), True),
            StructField("version", LongType(), True),
        ]
    )


def table_delta(
    old: DataFrame, new: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """Full-row delta between two same-schema snapshots: the NEW side's
    rows for added/changed keys, plus tombstones (``deleted=true``, key
    cols only) for removed keys — exactly what ``save_version`` appends.
    Payload comparison is one map-side ``xxhash64`` over the non-key
    columns, so the join shuffles (key, hash), not wide payloads (the
    SD1 shape)."""
    val_cols = [c for c in old.columns if c not in key_cols]
    types = dict(old.dtypes)
    # NULL-SAFE key equality: edge identity includes the nullable
    # ``payload`` column, and a plain equi-join (NULL != NULL) would
    # tombstone AND re-add every unchanged null-payload edge — a same-
    # version tombstone/upsert tie the latest-per-key read cannot break.
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        F.xxhash64(*val_cols).alias("_oh"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *val_cols,
        F.xxhash64(*val_cols).alias("_nh"),
    )
    cond = None
    for k in key_cols:
        c = o[f"_ok_{k}"].eqNullSafe(n[f"_nk_{k}"])
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")
    # xxhash64 never returns NULL, so a NULL hash marks side absence
    upserts = (
        j.where(
            F.col("_nh").isNotNull()
            & (F.col("_oh").isNull() | (F.col("_oh") != F.col("_nh")))
        )
        .select(
            *[F.col(f"_nk_{k}").alias(k) for k in key_cols],
            *val_cols,
        )
        .withColumn("deleted", F.lit(False))
    )
    tombstones = j.where(F.col("_nh").isNull()).select(
        *[F.col(f"_ok_{k}").alias(k) for k in key_cols],
        *[F.lit(None).cast(types[c]).alias(c) for c in val_cols],
        F.lit(True).alias("deleted"),
    )
    return upserts.unionByName(tombstones)


class VersionConflictError(RuntimeError):
    """Another writer committed this version first — reload (``open_log``)
    and retry on the new head (optimistic concurrency)."""


class VersionedGraphLog:
    """The graph's delta log: ``commit`` a ``GraphStore`` to append one
    version's changes; ``read_version`` any past state back as a live
    ``GraphStore``.  Version numbers are dense from 1.

    Concurrency contract (cf. the GraphStore plain-``save`` last-write-
    wins hazard, SCALE.md): ``commit`` performs an OPTIMISTIC check —
    if the target version's partition already exists on disk, another
    writer won the race and ``VersionConflictError`` is raised BEFORE
    anything is written; the loser reopens the log and recomputes its
    delta against the new head.  This is check-then-write, not an
    atomic compare-and-swap: two writers passing the check in the same
    instant can still interleave (both append into one version — the
    same window-tie hazard as plain parquet).  A metastore/Delta layer
    upgrades exactly this check to a real transaction; the contract is
    tested (test_graph.py::TestVersionedLogConcurrency)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._head = 0  # highest committed version
        self._head_store: GraphStore | None = None  # avoids log replay

    @property
    def head(self) -> int:
        return self._head

    def _log_paths(self) -> tuple[str, str]:
        return f"{self.path}/nodes_log", f"{self.path}/edges_log"

    def head_store(self) -> GraphStore:
        """The current head state as a live GraphStore — materialized
        (localCheckpoint) and cached on first use, so repeat callers
        and ``commit``'s old side pay ONE log replay per reopen, not
        one per use.  The single owner of the fast-path policy (the
        streaming ingest and commit both resolve through here)."""
        if self._head == 0:
            return GraphStore.empty(self.spark)
        if self._head_store is None:
            store = self.read_version(self._head)
            self._head_store = GraphStore(
                self.spark,
                store.nodes.localCheckpoint(),
                store.edges.localCheckpoint(),
            )
        return self._head_store

    def commit(self, store: GraphStore) -> int:
        """Append the delta between the current head state and ``store``
        as the next version; returns the new version number.  The first
        commit writes the full table (delta vs empty)."""
        nodes_log, edges_log = self._log_paths()
        version = self._head + 1
        # optimistic concurrency: refuse to write a version another
        # writer already committed (see class docstring for the limits).
        # BOTH logs are probed — an edge-only commit writes no nodes_log
        # partition (its node delta is empty), so checking one log alone
        # would let a second writer append into its edges_log partition.
        jvm = self.spark._jvm
        conf = self.spark._jsc.hadoopConfiguration()
        for log_dir in (nodes_log, edges_log):
            vpath = jvm.org.apache.hadoop.fs.Path(
                f"{log_dir}/version={version}"
            )
            if vpath.getFileSystem(conf).exists(vpath):
                raise VersionConflictError(
                    f"version {version} already committed by another "
                    "writer; reopen the log (open_log) and retry against "
                    "the new head"
                )
        # lineage cut (the G9 iterative pattern): the committed state is
        # diffed now AND serves as the next commit's old side — without
        # this, commit k re-executes the whole k-deep mutation chain
        store = GraphStore(
            self.spark,
            store.nodes.localCheckpoint(),
            store.edges.localCheckpoint(),
        )
        # old side via head_store(): the previous commit's input when
        # cached, else ONE materialized log replay (reopened sessions)
        old = self.head_store()
        node_delta = table_delta(old.nodes, store.nodes, ["key"])
        edge_delta = table_delta(old.edges, store.edges, list(EDGE_KEY))
        save_version(node_delta, nodes_log, version, ["key"])
        save_version(edge_delta, edges_log, version, list(EDGE_KEY))
        self._head = version
        self._head_store = store
        return version

    def read_version(self, version: int) -> GraphStore:
        """Time-travel read: the graph as of ``version`` — SD3's
        latest-per-key window under a version partition filter, per
        table, re-wrapped as a queryable ``GraphStore``."""
        nodes_log, edges_log = self._log_paths()
        nodes = read_as_of(
            self.spark, nodes_log, version, ["key"], schema=_log_schema(NODES_SCHEMA)
        ).select([f.name for f in NODES_SCHEMA.fields])
        edges = read_as_of(
            self.spark,
            edges_log,
            version,
            list(EDGE_KEY),
            schema=_log_schema(EDGES_SCHEMA),
        ).select([f.name for f in EDGES_SCHEMA.fields])
        return GraphStore(self.spark, nodes, edges)


def open_log(spark: SparkSession, path: str) -> VersionedGraphLog:
    """Reopen an existing log: head = highest version partition present
    on disk (Hadoop FS listing, backend-agnostic) — how a fresh session
    (or a restarted stream's foreachBatch) resumes committing.

    Note: an all-empty delta (e.g. a replayed streaming batch) writes
    no partition directory, so empty versions are invisible here and to
    the commit conflict check — the version counter may reuse such a
    number, which is benign: every ``read_version`` answer is defined
    by the rows present, and an empty version contributes none."""
    log = VersionedGraphLog(spark, path)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    head = 0
    # max over BOTH logs: a commit whose node delta is empty (edge-only
    # mutation) creates only an edges_log partition — reading one log
    # alone would under-report the head, silently dropping the committed
    # edges from reopened reads and letting the next commit collide
    for sub in ("nodes_log", "edges_log"):
        hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/{sub}")
        fs = hpath.getFileSystem(conf)
        if fs.exists(hpath):
            for st in fs.listStatus(hpath):
                name = st.getPath().getName()
                if name.startswith("version="):
                    head = max(head, int(name.split("=", 1)[1]))
    log._head = head
    return log


def compact_graph_log(log: VersionedGraphLog, upto: int) -> None:
    """Compact both of the graph log's tables (operators/snapshot.py
    ``compact_versions``): history below ``upto`` becomes one resolved
    base; every ``read_version(v ≥ upto)`` answer is unchanged
    (tested), reads replay fewer deltas."""
    from biodiversity_graph_db_spark.operators.snapshot import (
        compact_versions,
    )

    nodes_log, edges_log = log._log_paths()
    compact_versions(
        log.spark, nodes_log, upto, ["key"], schema=_log_schema(NODES_SCHEMA)
    )
    compact_versions(
        log.spark,
        edges_log,
        upto,
        list(EDGE_KEY),
        schema=_log_schema(EDGES_SCHEMA),
    )
    log._head_store = None  # resolved layout changed; re-read on demand
