"""Old-date arithmetic (X5/X6, SURVEY §2.8).

``holoceneCalYear`` (Scenarios.fs:12-19): normalize AD / BC / (cal)BP
dates to calendar years BP (before 1950): AD x → 1950 - x; BC x →
x + 1950; BP/calBP x → x.  Year validity is -72..14000 (Exposure.fs:66-70).
At write time every date-valued edge payload gets this promoted to a
numeric ``cal_yr_bp`` column so range queries stay columnar (SURVEY §1.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

YEAR_MIN = -72
YEAR_MAX = 14000


def to_cal_yr_bp(kind: Column, value: Column) -> Column:
    """kind ∈ {'AD','BC','BP','calBP'} → cal yr BP (rounded to int)."""
    normalized = (
        F.when(kind == "AD", 1950 - value)
        .when(kind == "BC", value + 1950)
        .otherwise(value)
    )
    return F.round(normalized).cast("long")


def in_holocene_scope(cal_yr_bp: Column) -> Column:
    """F10 routing predicate: ≤ 11650 cal yr BP is in scope
    (Library.fs:931-942); year index bounds -72..14000."""
    return cal_yr_bp.between(YEAR_MIN, 11650)


def year_valid(cal_yr_bp: Column) -> Column:
    """X6 (Exposure.fs:66-70)."""
    return cal_yr_bp.between(YEAR_MIN, YEAR_MAX)
