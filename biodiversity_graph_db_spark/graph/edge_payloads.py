"""Typed edge payloads and their promoted columns (SURVEY §1.3).

The reference's exposure relations carry date payloads — ``TimeEstimate``,
``UncertaintyOldest/Youngest``, ``ExtentEarliest/LatestSpecified``,
``ExtentEarliest/LatestHarmonised``, ``ExtentEarliestOutOfScope`` hold an
``OldDate.OldDateSimple`` (Exposure.fs:158-186; Types.fs:653-657: BP |
CalYrBP of date * technique option | HistoryYearAD | HistoryYearBC).

We keep the payload as canonical JSON (one compact object
``{"unit": "AD|BC|BP|CalYrBP", "value": f, "technique": s?}``) and at
WRITE time promote its normalized form to a real BIGINT column
``edge_year_value`` (cal yr BP, the ``holoceneCalYear`` normalization of
Scenarios.fs:12-19 / Library.fs:931-942).  Stored edge parquet therefore
answers date-range queries with a plain columnar predicate — pushed to the
scan, no JSON parsing anywhere in the read plan.  The single
``from_json`` here runs once per edge at ingest, Arrow-free and inside
codegen, which is the right cost model at 100 TB: parse once on write,
never on read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from biodiversity_graph_db_spark.functions import dates

#: Canonical compact form of OldDateSimple (Types.fs:653-657) and
#: OldDateSimpleHarmonised (Types.fs:642-645).
OLD_DATE_SIMPLE = StructType(
    [
        StructField("unit", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("technique", StringType(), True),
    ]
)

#: ExposureRelation cases whose payload is a date (Exposure.fs:158-186).
DATE_VALUED_RELATIONS = (
    "TimeEstimate",
    "UncertaintyOldest",
    "UncertaintyYoungest",
    "ExtentEarliestSpecified",
    "ExtentLatestSpecified",
    "ExtentEarliestOutOfScope",
    "ExtentEarliestHarmonised",
    "ExtentLatestHarmonised",
)


def old_date_payload(
    unit: Column, value: Column, technique: Column | None = None
) -> Column:
    """Render an OldDateSimple as the canonical payload JSON."""
    tech = technique if technique is not None else F.lit(None).cast("string")
    return F.to_json(
        F.struct(
            unit.alias("unit"), value.alias("value"), tech.alias("technique")
        )
    )


def promote_edge_year(edges: DataFrame) -> DataFrame:
    """Add the promoted ``edge_year_value`` column (cal yr BP, BIGINT).

    NULL for relations without a date payload and for NULL payloads.
    ``CalYrBP``/``BP`` pass through; ``AD``/``BC`` normalize per
    Library.fs:934-937.  Pure column expressions — pipelines into the
    ingest scan with no shuffle.
    """
    parsed = F.from_json(F.col("payload"), OLD_DATE_SIMPLE)
    year = dates.to_cal_yr_bp(parsed["unit"], parsed["value"])
    return edges.withColumn(
        "edge_year_value",
        F.when(
            F.col("relation").isin(*DATE_VALUED_RELATIONS)
            & F.col("payload").isNotNull(),
            year,
        ).cast("long"),
    )
