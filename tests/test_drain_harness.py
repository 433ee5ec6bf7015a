"""Drain-harness unit pins (r13): the single-pass feed write must
reproduce the old per-slice writer's split semantics exactly, and the
scale-adaptive partition rule must never under-partition a feed its
byte probe cannot see (VERDICT r12 item 4)."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from biodiversity_graph_db_spark.streaming.ingest import (
    _drain_shuffle_partitions,
    write_feed_batches,
)


class TestWriteFeedBatches:
    def test_split_semantics_and_file_layout(self, spark):
        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("v")
        )
        with tempfile.TemporaryDirectory() as tmp:
            src = write_feed_batches(df, "k", tmp, n_batches=3)
            files = sorted(glob.glob(f"{src}/part-*.parquet"))
            # one file per batch, mtimes strictly ascending in batch order
            assert len(files) == 3
            mtimes = [os.path.getmtime(p) for p in files]
            assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3
            # batch i holds exactly the k % 3 == i slice, original schema
            for i, p in enumerate(files):
                got = spark.read.parquet(p)
                assert got.columns == ["k", "v"]
                ks = {r.k for r in got.collect()}
                assert ks == {k for k in range(100) if k % 3 == i}

    def test_negative_and_null_keys_dropped(self, spark):
        """The old ``WHERE key % n == i`` loop silently dropped rows
        whose modulo fell outside 0..n-1 (negative keys) or was NULL;
        the partitioned writer must do the same."""
        df = spark.createDataFrame(
            [(-1, "neg"), (None, "null"), (0, "a"), (4, "b")],
            "k long, v string",
        )
        with tempfile.TemporaryDirectory() as tmp:
            src = write_feed_batches(df, "k", tmp, n_batches=3)
            rows = {r.v for r in spark.read.parquet(src).collect()}
            assert rows == {"a", "b"}

    def test_empty_slice_still_emits_a_batch_file(self, spark):
        df = spark.range(4).select(
            (F.col("id") * 3).alias("k")  # every key % 3 == 0
        )
        with tempfile.TemporaryDirectory() as tmp:
            src = write_feed_batches(df, "k", tmp, n_batches=3)
            files = sorted(glob.glob(f"{src}/part-*.parquet"))
            assert len(files) == 3
            assert spark.read.parquet(files[1]).count() == 0
            assert spark.read.parquet(files[2]).count() == 0


class TestDrainShufflePartitions:
    def test_sized_by_local_bytes(self, spark, sf_dir):
        with tempfile.TemporaryDirectory() as tmp:
            spark.range(10).write.parquet(f"{tmp}/src")
            n = _drain_shuffle_partitions(spark, f"{tmp}/src")
            assert n == 1  # a few KB of feed → one partition

    def test_nonlocal_feed_falls_back_to_ceiling(self, spark):
        """A src the local byte probe can't see (remote-style path or
        plain missing dir) must keep the session ceiling, not collapse
        the drain to one partition."""
        ceiling = int(spark.conf.get("spark.sql.shuffle.partitions"))
        for src in ("/nonexistent/drain/src", "s3a://bucket/feed"):
            assert _drain_shuffle_partitions(spark, src) == ceiling

    def test_non_numeric_session_conf(self):
        """Managed platforms can report a non-numeric value (e.g.
        'auto'); local Spark refuses to SET one, so the fallback is
        pinned through a stub session (ADVICE r12)."""

        class _Conf:
            def get(self, _k):
                return "auto"

        class _Ctx:
            defaultParallelism = 12

        class _Stub:
            conf = _Conf()
            sparkContext = _Ctx()

        assert _drain_shuffle_partitions(_Stub(), "/nonexistent/src") == 12
