"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-hop extract query on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the 100 TB extension ops) with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _registry():
    from biodiversity_graph_db_spark import registry

    registry.load_all()
    return registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's extract view (SURVEY §3.3) on the
    real evidence graph — seed + FIXTURES subgraph built through the
    validated mutation path, then the hyperedge star join."""
    reg = _registry()
    return reg.QUERIES["J2G_evidence_extract"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_registry().QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query."""
    return dict(_registry().ORACLE)
