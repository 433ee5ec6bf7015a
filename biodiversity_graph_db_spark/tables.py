"""Load the driver's synthetic star schema (TESTDATA.md) and register views.

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet each under the scale-factor dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any scale factor we target.
BROADCAST_DIMS = {"region", "nation"}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every table and register it as a temp view.

    Reads are plain ``spark.read.parquet`` so Catalyst keeps predicate
    pushdown / column pruning; callers should ``select`` only what they need.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(name)
    if name == "events":
        return _read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read events.parquet on ANY SparkSession, bare or configured.

    events.ts is TIMESTAMP(NANOS) in parquet — a type Spark's vectorized
    reader rejects (PARQUET_TYPE_ILLEGAL) unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is on, in which case the
    column arrives as bigint nanoseconds.  That conf is runtime-settable,
    so set it here rather than relying on session-construction configs:
    callers (the correctness harness in particular) may hand us a bare
    session.  The sub-microsecond digits are zero in the driver's data, so
    converting to a microsecond timestamp is lossless and matches DuckDB's
    view of the same file.
    """
    from pyspark.sql import functions as F

    path = f"{sf_dir}/events.parquet"
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # immutable conf on some builds; the read below still decides
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts", "")
    if ts_type == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


def fan_out(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Spread a small scan across the cluster before a compute-heavy map.

    The local test files arrive as one parquet row group → one partition,
    which serializes expensive per-row work (hashing, shingling, vector
    math).  A round-robin repartition to the default parallelism costs
    one tiny shuffle and unlocks every core.  On a real cluster reading
    100 TB the scan already has thousands of partitions and AQE coalesces
    the extra shuffle away, so this is a no-op-shaped safeguard, not a
    scale crutch.

    Repartition unconditionally: probing ``df.rdd.getNumPartitions()``
    to decide would force an RDD conversion of the logical plan (a full
    analysis pass on the driver) on every call — costlier than the tiny
    shuffle it tries to avoid.
    """
    return df.repartition(spark.sparkContext.defaultParallelism)
