"""Shared helpers for oracle-checkable numeric output.

Floating-point sums are order-dependent, and double→DECIMAL casts tie-round
differently across engines (Spark HALF_UP on the exact binary expansion vs
DuckDB's float-scaled rounding) — both break the driver's value-hash.

Convention: quantize each addend deterministically (``FLOOR(x * 10^s)`` —
IEEE multiply and floor are bit-identical in any engine), sum exactly as
BIGINT (order-independent), and divide back to double.  Every step is
deterministic in both engines, so the hashes match; no ROUND, no DECIMAL.

Scale note: BIGINT holds the scaled sums comfortably at bench scale
(values ~1e5 scaled by 1e4 over 1e9 rows ≈ 1e18); a 100 TB production run
would widen the accumulator to DECIMAL(38,0) — same shape, wider type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 10_000  # 4 fractional digits


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Order-independent, engine-exact sum of a double column (4 dp)."""
    return (F.sum(F.floor(_c(col) * SCALE)) / F.lit(float(SCALE))).alias("dsum")


def davg(col: Column | str) -> Column:
    """Deterministic average: exact scaled-int sum / count / scale."""
    c = _c(col)
    return F.sum(F.floor(c * SCALE)) / F.count(c) / F.lit(float(SCALE))


def dquant(col: Column | str) -> Column:
    """Per-row deterministic 4-dp quantization (for non-aggregated output)."""
    return F.floor(_c(col) * SCALE) / F.lit(float(SCALE))


def sql_dsum(expr: str) -> str:
    return f"SUM(CAST(FLOOR(({expr}) * 10000) AS BIGINT)) / 10000.0"


def sql_davg(expr: str) -> str:
    return f"SUM(CAST(FLOOR(({expr}) * 10000) AS BIGINT)) / COUNT({expr}) / 10000.0"


def sql_dquant(expr: str) -> str:
    return f"FLOOR(({expr}) * 10000) / 10000.0"
