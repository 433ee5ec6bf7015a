"""Streaming ingest micro-bench (SURVEY §2.10 throughput anchor).

Streams the events table through the foreachBatch MERGE path (events →
graph node upserts, availableNow trigger) and the watermark-dedup path,
and prints rows/sec for each.  Run at sf0.1 and record in SCALE.md §10:

    python bench_streaming.py            # default /root/testdata/sf0.1
    SPARK_GRAFT_SF_DIR=... python bench_streaming.py

Not part of the driver's bench.py headline (the driver bench measures
query latency; this measures ingest throughput end-to-end including
checkpoint commits).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force_monotone_arrival(d: str) -> None:
    """Pin ascending mtimes on the part files (name order == range
    order): FileStreamSource orders micro-batches by MTIME, which a
    parallel write leaves arbitrary — without this the stateful paths'
    outputs (sessions closed, near-dup keepers) vary run to run."""
    import glob
    import time as _t

    now = _t.time()
    for i, p in enumerate(sorted(glob.glob(f"{d}/part-*.parquet"))):
        os.utime(p, (now + i, now + i))


def _state_metrics(q) -> tuple[int, float]:
    """Peak state-store footprint over a finished query's progress
    history: (max total rows, max MB) summed across state operators
    within each progress event, maxed across events — the number the
    SCALE §18 table records (state growth super-linear in window size
    is the degradation mode to catch)."""
    rows = 0
    mem = 0
    for p in q.recentProgress or []:
        ops = p.get("stateOperators") or []
        r = sum(int(so.get("numRowsTotal", 0)) for so in ops)
        m = sum(int(so.get("memoryUsedBytes", 0)) for so in ops)
        rows = max(rows, r)
        mem = max(mem, m)
    return rows, round(mem / 1e6, 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_files = int(os.environ.get("SPARK_GRAFT_STREAM_FILES", "8"))

    from pyspark.sql import functions as F

    from biodiversity_graph_db_spark.session import get_spark
    from biodiversity_graph_db_spark.streaming import ingest
    from biodiversity_graph_db_spark.tables import table

    spark = get_spark("bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    events_dir = f"{tmp}/events"
    try:
        # lay the source out as n_files time-ordered files → n_files
        # micro-batches at maxFilesPerTrigger=1 (a realistic ingest shape)
        (
            table(spark, sf_dir, "events")
            .repartitionByRange(n_files, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(events_dir)
        )
        _force_monotone_arrival(events_dir)
        n_rows = spark.read.parquet(events_dir).count()

        results: dict[str, float] = {}

        # 1) foreachBatch MERGE into graph nodes (checkpointed, idempotent)
        t0 = time.perf_counter()
        q = ingest.merge_events_into_graph(
            ingest.read_events_stream(spark, events_dir),
            f"{tmp}/nodes",
            f"{tmp}/ckpt_merge",
        ).start()
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        assert spark.read.parquet(f"{tmp}/nodes").count() == n_rows
        results["merge_rows_per_sec"] = round(n_rows / dt, 1)
        results["merge_sec"] = round(dt, 2)

        # 2) watermark dedup → parquet append (the U2-streaming path)
        t0 = time.perf_counter()
        q = (
            ingest.dedup_stream(ingest.read_events_stream(spark, events_dir))
            .writeStream.format("parquet")
            .option("path", f"{tmp}/dedup_out")
            .option("checkpointLocation", f"{tmp}/ckpt_dedup")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        results["dedup_rows_per_sec"] = round(n_rows / dt, 1)
        results["dedup_sec"] = round(dt, 2)
        results["dedup_state_rows"], results["dedup_state_mb"] = _state_metrics(q)

        # 2b) pretraining ingest with cross-batch NEAR-dup (MinHash band
        # ledger) over the documents table — the round-4 pipeline stage
        from biodiversity_graph_db_spark.streaming import pipeline

        docs_dir = f"{tmp}/docs"
        (
            table(spark, sf_dir, "documents")
            .repartitionByRange(n_files, "doc_id")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(docs_dir)
        )
        _force_monotone_arrival(docs_dir)
        n_docs = spark.read.parquet(docs_dir).count()
        t0 = time.perf_counter()
        q = pipeline.run_pretraining_ingest_neardup(
            pipeline.read_documents_stream(spark, docs_dir),
            f"{tmp}/pretrain_out",
            f"{tmp}/ckpt_neardup",
        ).start()
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        results["neardup_docs_per_sec"] = round(n_docs / dt, 1)
        results["neardup_sec"] = round(dt, 2)
        results["neardup_docs"] = n_docs
        results["neardup_kept"] = spark.read.parquet(
            f"{tmp}/pretrain_out"
        ).count()

        # 2c) timeout-based stateful sessionization (applyInPandasWithState
        # closed-session emitter — the custom-state path)
        t0 = time.perf_counter()
        q = (
            ingest.closed_sessions(
                ingest.read_events_stream(spark, events_dir)
            )
            .writeStream.format("memory")
            .queryName("bench_sessions")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        results["sessions_rows_per_sec"] = round(n_rows / dt, 1)
        results["sessions_sec"] = round(dt, 2)
        results["sessions_state_rows"], results["sessions_state_mb"] = _state_metrics(q)
        results["sessions_closed"] = spark.sql(
            "SELECT COUNT(*) c FROM bench_sessions"
        ).collect()[0].c

        # 2d) stateful as-of enrichment (clicks + latest purchase state)
        t0 = time.perf_counter()
        q = (
            ingest.asof_enrich(
                ingest.read_events_stream(spark, events_dir)
            )
            .writeStream.format("memory")
            .queryName("bench_asof")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        results["asof_rows_per_sec"] = round(n_rows / dt, 1)
        results["asof_sec"] = round(dt, 2)
        results["asof_state_rows"], results["asof_state_mb"] = _state_metrics(q)

        # 2e) versioned-graph commits: each micro-batch becomes one
        # graph version (SD4 online) — the history-producing ingest
        from biodiversity_graph_db_spark.graph.versioned import open_log

        t0 = time.perf_counter()
        q = ingest.merge_events_into_versioned_graph(
            ingest.read_events_stream(spark, events_dir),
            f"{tmp}/vlog",
            f"{tmp}/ckpt_vlog",
        ).start()
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        vlog = open_log(spark, f"{tmp}/vlog")
        assert vlog.read_version(vlog.head).nodes.count() == n_rows
        results["versioned_rows_per_sec"] = round(n_rows / dt, 1)
        results["versioned_sec"] = round(dt, 2)
        results["versioned_versions"] = vlog.head

        # 3) tumbling windowed agg → memory sink (stateful shuffle path)
        t0 = time.perf_counter()
        q = (
            ingest.tumbling_counts(
                ingest.read_events_stream(spark, events_dir)
            )
            .writeStream.format("memory")
            .queryName("bench_tumbling")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        results["tumbling_rows_per_sec"] = round(n_rows / dt, 1)
        results["tumbling_sec"] = round(dt, 2)
        results["tumbling_state_rows"], results["tumbling_state_mb"] = _state_metrics(q)

        # 4) W9 continuous-aggregate maintainer (ROLLUP cells folded
        # into the store per micro-batch; state = the on-disk cell table)
        t0 = time.perf_counter()
        q = ingest.run_multires_rollup(
            ingest.read_events_stream(spark, events_dir),
            f"{tmp}/rollup",
            f"{tmp}/ckpt_rollup",
        ).start()
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        results["w9_rollup_rows_per_sec"] = round(n_rows / dt, 1)
        results["w9_rollup_sec"] = round(dt, 2)
        results["w9_rollup_cells"] = spark.read.parquet(
            f"{tmp}/rollup"
        ).count()

        # 5) streaming IVF index maintainer: index built from half the
        # embeddings, the other half streamed in as per-batch deltas;
        # state = the delta rows awaiting compaction
        from biodiversity_graph_db_spark.extensions import (
            similarity as sim,
        )

        emb = table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding"
        )
        base = emb.where(F.col("vec_id") % 2 == 0)
        newer = emb.where(F.col("vec_id") % 2 == 1)
        n_new = newer.count()
        emb_src = f"{tmp}/emb_incoming"
        (
            newer.repartitionByRange(n_files, "vec_id")
            .write.mode("overwrite")
            .parquet(emb_src)
        )
        _force_monotone_arrival(emb_src)
        sim.write_ivf_index(base, f"{tmp}/ivf_idx")
        emb_stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(emb_src)
        )
        t0 = time.perf_counter()
        q = ingest.run_ivf_append(
            emb_stream, f"{tmp}/ivf_idx", f"{tmp}/ckpt_ivf"
        ).start()
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        results["ivf_append_rows_per_sec"] = round(n_new / dt, 1)
        results["ivf_append_sec"] = round(dt, 2)
        results["ivf_delta_rows"] = spark.read.parquet(
            f"{tmp}/ivf_idx/assigned_delta"
        ).count()
        t0 = time.perf_counter()
        sim.compact_ivf_deltas(spark, f"{tmp}/ivf_idx")
        results["ivf_compact_sec"] = round(time.perf_counter() - t0, 2)

        # 6) streaming shard export (token-budgeted JSONL shards +
        # manifests per batch) + manifest compaction
        t0 = time.perf_counter()
        q = pipeline.run_shard_export(
            pipeline.read_documents_stream(spark, docs_dir),
            f"{tmp}/shards",
            f"{tmp}/ckpt_shards",
        ).start()
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        results["shard_export_docs_per_sec"] = round(n_docs / dt, 1)
        results["shard_export_sec"] = round(dt, 2)
        results["shard_manifest_rows"] = pipeline.read_shard_manifest(
            spark, f"{tmp}/shards"
        ).count()
        t0 = time.perf_counter()
        pipeline.compact_shard_manifests(spark, f"{tmp}/shards")
        results["manifest_compact_sec"] = round(
            time.perf_counter() - t0, 2
        )

        # 7) watermarked stream-stream attribution join (inner): both
        # sides derived from ONE events stream; state = buffered rows
        # awaiting watermark expiry on both sides
        ev_s = ingest.read_events_stream(spark, events_dir)
        t0 = time.perf_counter()
        q = (
            ingest.attributed_purchases(
                ev_s.where(F.col("event_type") == "click"),
                ev_s.where(F.col("event_type") == "purchase"),
            )
            .writeStream.format("memory")
            .queryName("bench_ssjoin")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        results["ssjoin_rows_per_sec"] = round(n_rows / dt, 1)
        results["ssjoin_sec"] = round(dt, 2)
        results["ssjoin_state_rows"], results["ssjoin_state_mb"] = (
            _state_metrics(q)
        )
        results["ssjoin_matches"] = spark.sql(
            "SELECT COUNT(*) c FROM bench_ssjoin"
        ).collect()[0].c

        print(
            json.dumps(
                {
                    "metric": "streaming_ingest",
                    "rows": n_rows,
                    "micro_batches": n_files,
                    "sf_dir": sf_dir,
                    **results,
                }
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
