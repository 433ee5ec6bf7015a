"""The spread() parallelism guards (operators/_util.py).

Guard 1 (small source): fewer partitions than cores → repartition.
Guard 2 (VERDICT r11 item 7, reader side of SCALE §40): a fat-row-group
file can present MANY byte-range splits while almost all read nothing —
a split only decodes row groups whose midpoint it contains.  spread()
must detect fewer row groups than cores via the parquet footers and
repartition, so externally-written parquet can't serialize a corpus
pass the way the §40 generator layout did.
"""

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from biodiversity_graph_db_spark.operators._util import (
    _row_group_starved,
    spread,
)


def _filler(n_rows: int) -> pa.Array:
    # distinct per-row strings defeat dictionary/RLE compression, so the
    # on-disk size stays large enough to span many byte-range splits
    return pa.array([f"{i:09d}" * 40 for i in range(n_rows)])


def _write_one_group(path: str, n_rows: int) -> None:
    """One parquet file, ONE row group, with a filler column fat enough
    to make the file span many maxPartitionBytes splits."""
    tbl = pa.table(
        {
            "id": pa.array(range(n_rows), type=pa.int64()),
            "filler": _filler(n_rows),
        }
    )
    pq.write_table(tbl, path, row_group_size=n_rows)


class TestRowGroupGuard:
    def test_fat_row_group_file_is_respread(self, spark, tmp_path):
        par = spark.sparkContext.defaultParallelism
        f = str(tmp_path / "fat.parquet")
        _write_one_group(f, 20_000)  # ~2 MB in one row group
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        try:
            # force many byte-range splits over the single row group
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
            df = spark.read.parquet(f)
            n_splits = df.rdd.getNumPartitions()
            assert n_splits >= par, "precondition: splits must look healthy"
            # the old partition-count check is blind here; the footer
            # probe must catch the 1-group layout and restore parallelism
            assert _row_group_starved(df, par)
            out = spread(df)
            assert out.rdd.getNumPartitions() == par
            # ... and the guarded frame still computes correctly
            assert out.count() == 20_000
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    def test_healthy_many_group_file_is_untouched(self, spark, tmp_path):
        """A real warehouse layout (many row groups >= cores) must NOT
        pay an Exchange: spread is a no-op."""
        par = spark.sparkContext.defaultParallelism
        f = str(tmp_path / "healthy.parquet")
        tbl = pa.table(
            {
                "id": pa.array(range(40_000), type=pa.int64()),
                "filler": _filler(40_000),
            }
        )
        # row groups sized so the file holds >= par groups
        pq.write_table(tbl, f, row_group_size=40_000 // (par + 4))
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        try:
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
            df = spark.read.parquet(f)
            assert df.rdd.getNumPartitions() >= par
            assert not _row_group_starved(df, par)
            out = spread(df)
            assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString().split("AdaptiveSparkPlan")[0] or out is df
            assert out is df
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    def test_non_file_source_skips_probe(self, spark):
        """createDataFrame sources have no input files — the probe must
        decline (False), never raise."""
        df = spark.range(10).select(F.col("id"))
        assert _row_group_starved(df, 32) is False
