"""Data profiling — the look-before-you-ingest pass: per-column row /
null / distinct counts and deterministic min/max, in ONE scan.

Every pipeline stage in this engine assumes schema discipline the
reference enforces by construction (typed DUs); profiling is how the
same discipline is checked on ARRIVING data — the S9/S13 connectors'
untyped CSV/BibTeX rows, a vendor parquet drop, a backfill.  At 100 TB
the operative constraint is one pass: the profile below compiles to a
single aggregation over the scan (Spark plans the multi-distinct as an
Expand + two-phase aggregate — still one read of the data), never one
job per column.

Determinism rules (the oracle-hash discipline): min/max render through
type-specific deterministic forms — integers/strings verbatim,
doubles through the scaled-int floor, timestamps through
``unix_timestamp`` second truncation — so DuckDB computes the
identical strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.registry import query
from biodiversity_graph_db_spark.tables import table


def _col_profile(df: DataFrame, name: str, min_s, max_s) -> DataFrame:
    c = F.col(name)
    return df.agg(
        F.lit(name).alias("column_name"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count(c)).cast("long").alias("n_nulls"),
        F.count_distinct(c).alias("n_distinct"),
        min_s.alias("min_s"),
        max_s.alias("max_s"),
    )


def profile_events(df: DataFrame) -> DataFrame:
    """One profile row per column of the events table.  Implemented as
    a union of per-column single-row aggregates over the SAME cached
    scan — Catalyst collapses the shared subtree, and each aggregate is
    map-side-combinable; a generic-schema version would instead unpivot
    to (column, value) and group once (same one-scan property, used
    when the column list is wide/unknown)."""
    s = F.col

    def istr(name: str, fn) -> F.Column:  # integer/string: verbatim
        return fn(s(name)).cast("string")

    def dstr(name: str, fn) -> F.Column:  # double: scaled-int floor
        return F.floor(fn(s(name)) * 10000).cast("long").cast("string")

    def tstr(name: str, fn) -> F.Column:  # timestamp: epoch seconds
        return fn(F.unix_timestamp(s(name))).cast("string")

    parts = [
        _col_profile(
            df, "event_id", istr("event_id", F.min), istr("event_id", F.max)
        ),
        _col_profile(
            df, "user_id", istr("user_id", F.min), istr("user_id", F.max)
        ),
        _col_profile(
            df,
            "event_type",
            istr("event_type", F.min),
            istr("event_type", F.max),
        ),
        _col_profile(df, "value", dstr("value", F.min), dstr("value", F.max)),
        _col_profile(df, "ts", tstr("ts", F.min), tstr("ts", F.max)),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("column_name")


@query(
    "PR1_profile_events",
    oracle="""
    SELECT 'event_id' AS column_name, COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT(event_id) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(MIN(event_id) AS VARCHAR) AS min_s,
           CAST(MAX(event_id) AS VARCHAR) AS max_s
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*),
           CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT),
           CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'event_type', COUNT(*),
           CAST(COUNT(*) - COUNT(event_type) AS BIGINT),
           CAST(COUNT(DISTINCT event_type) AS BIGINT),
           MIN(event_type), MAX(event_type)
    FROM events
    UNION ALL
    SELECT 'value', COUNT(*),
           CAST(COUNT(*) - COUNT(value) AS BIGINT),
           CAST(COUNT(DISTINCT value) AS BIGINT),
           CAST(CAST(FLOOR(MIN(value) * 10000) AS BIGINT) AS VARCHAR),
           CAST(CAST(FLOOR(MAX(value) * 10000) AS BIGINT) AS VARCHAR)
    FROM events
    UNION ALL
    SELECT 'ts', COUNT(*),
           CAST(COUNT(*) - COUNT(ts) AS BIGINT),
           CAST(COUNT(DISTINCT ts) AS BIGINT),
           CAST(CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS VARCHAR),
           CAST(CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS VARCHAR)
    FROM events
    ORDER BY column_name
    """,
)
def pr1_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the events table — see module docstring."""
    return profile_events(table(spark, sf_dir, "events"))
