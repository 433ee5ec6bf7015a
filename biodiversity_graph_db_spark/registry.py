"""Query/oracle registry.

Every operator from SURVEY.md §2 registers here: a named PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the equivalent
ANSI SQL the DuckDB oracle runs on the same parquet tables.  The driver's
correctness gate compares the two (row count + schema + order-insensitive
value hash), so:

- alias every computed column identically in Spark and SQL;
- emit only hash-stable types: ints, strings, and ROUNDed doubles (money
  sums go through DECIMAL so the result is order-independent);
- cast dates/timestamps to strings at the output boundary.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from biodiversity_graph_db_spark.operators import (  # noqa: F401
        aggregations,
        graph_analytics,
        graph_queries,
        joins,
        key_synthesis,
        matrix,
        relational,
        windows,
    )
    from biodiversity_graph_db_spark.extensions import (  # noqa: F401
        dedup,
        multimodal,
        similarity,
        simhash,
        textstats,
    )
