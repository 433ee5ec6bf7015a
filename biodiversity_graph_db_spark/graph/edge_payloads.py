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
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

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


#: SourceRelation.UsedDatabase payload (Sources.fs:207-214):
#: ``accessDate: System.DateOnly option`` plus the DatabaseSubset DU
#: (AllRecordsInStudyScope | SpecificRecords of firstId * additionalIds |
#: ComplexSubset of methodDescription) flattened to a kind-tagged struct.
USED_DATABASE = StructType(
    [
        StructField("accessDate", StringType(), True),  # ISO yyyy-MM-dd
        StructField(
            "subset",
            StructType(
                [
                    StructField("kind", StringType(), True),
                    StructField("firstId", StringType(), True),
                    StructField("additionalIds", ArrayType(StringType()), True),
                    StructField("methodDescription", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: Harmonised.DateCalibration (Types.fs:617-633): calibration curve, input
#: date ± SD, per-sigma calibrated ranges, software, and the reanalysis
#: origin DU (FromOriginalWork | PartOfReanalysis of conductedBy * date).
DATE_CALIBRATION_HARMONISED = StructType(
    [
        StructField("CalibrationCurve", StringType(), True),
        StructField("InputDate", DoubleType(), True),
        StructField("InputStandardDeviation", DoubleType(), True),
        StructField(
            "DateRanges",
            ArrayType(
                StructType(
                    [
                        StructField("Sigma", StringType(), True),
                        StructField("Probability", DoubleType(), True),
                        StructField("EarlierBound", DoubleType(), True),
                        StructField("LaterBound", DoubleType(), True),
                    ]
                )
            ),
            True,
        ),
        StructField("SoftwareUsed", StringType(), True),
        StructField(
            "Origin",
            StructType(
                [
                    StructField("kind", StringType(), True),
                    StructField("conductedBy", StringType(), True),
                    StructField("date", StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: Relations carrying each payload family.
DATABASE_RELATIONS = ("UsedDatabase",)
CALIBRATION_RELATIONS = ("UsedInCalibration", "CalibratedAs")


def used_database_payload(
    access_date: Column, subset_kind: Column, first_id: Column | None = None
) -> Column:
    """Render a UsedDatabase edge payload as canonical JSON."""
    fid = first_id if first_id is not None else F.lit(None).cast("string")
    return F.to_json(
        F.struct(
            access_date.alias("accessDate"),
            F.struct(
                subset_kind.alias("kind"),
                fid.alias("firstId"),
                F.lit(None).cast("array<string>").alias("additionalIds"),
                F.lit(None).cast("string").alias("methodDescription"),
            ).alias("subset"),
        )
    )


def promote_source_edge_cols(edges: DataFrame) -> DataFrame:
    """Promote the queryable scalars out of source-relation payloads:

    - ``edge_access_date`` (DATE) + ``edge_subset_kind`` (STRING) from
      UsedDatabase edges (Sources.fs:207-214);
    - ``edge_curve`` + ``edge_software`` (STRING) from harmonised
      calibration edges (Types.fs:617-633).

    Same write-time discipline as ``promote_edge_year``: one from_json per
    family at ingest, pure column expressions, NULL on non-matching
    relations — stored edge parquet then answers "sources by database
    access date" / "dates by calibration curve" with pushed columnar
    predicates and zero JSON in the read plan.
    """
    udb = F.from_json(F.col("payload"), USED_DATABASE)
    cal = F.from_json(F.col("payload"), DATE_CALIBRATION_HARMONISED)
    is_udb = (
        F.col("relation").isin(*DATABASE_RELATIONS)
        & F.col("payload").isNotNull()
    )
    is_cal = (
        F.col("relation").isin(*CALIBRATION_RELATIONS)
        & F.col("payload").isNotNull()
    )
    return (
        edges.withColumn(
            "edge_access_date",
            F.when(is_udb, F.to_date(udb["accessDate"])),
        )
        .withColumn("edge_subset_kind", F.when(is_udb, udb["subset"]["kind"]))
        .withColumn("edge_curve", F.when(is_cal, cal["CalibrationCurve"]))
        .withColumn("edge_software", F.when(is_cal, cal["SoftwareUsed"]))
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
