"""Digitised data-table connector (S12, DataTable.createDataTable —
Datasets.fs:47-85): parse a tab-delimited wide matrix (first column =
depth/age index, remaining headers = morphotypes) with the reference's
shape/type validation, emitting the scalable LONG form
(index_value, index_unit, morphotype, value) — SURVEY §2.9 M1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# indexColumnType (Datasets.fs:35-44)
INDEX_UNITS = {
    "depth": "Depths",
    "year before present": "BP",
    "bp": "BP",
    "calendar year before present": "CalYrBP",
    "cal yr bp": "CalYrBP",
    "ad": "HistoryYearAD",
    "bc": "HistoryYearBC",
}


class DataTableError(ValueError):
    pass


def index_unit(header: str) -> str | None:
    return INDEX_UNITS.get(header.strip().lower())


def parse_data_table(spark: SparkSession, text: str) -> DataFrame:
    """Parse one tab-delimited table string → long-form DataFrame.

    Validation mirrors Datasets.fs:47-85: non-empty, rectangular with ≥2
    columns, a recognized index unit, numeric cells.  The wide→long
    unpivot means downstream never touches a float[,] — cells are rows,
    partitionable and aggregable at any scale.
    """
    rows = [r for r in text.split("\n") if r != ""]
    if not rows:
        raise DataTableError("The dataset was empty")
    widths = {len(r.split("\t")) for r in rows}
    if len(widths) > 1 or widths & {0, 1}:
        raise DataTableError(
            "Each row must have at least two columns, and all rows must "
            "have the same number of columns"
        )
    header = rows[0].split("\t")
    unit = index_unit(header[0])
    if unit is None:
        raise DataTableError(
            "Check first column is named 'depth' or an age unit"
        )
    morphotypes = header[1:]

    body = spark.createDataFrame([(r,) for r in rows[1:]], "line string")
    cells = body.select(F.split("line", "\t").alias("cells"))
    n = len(morphotypes)
    long = cells.select(
        F.element_at("cells", 1).try_cast("double").alias("index_value"),
        F.lit(unit).alias("index_unit"),
        F.posexplode(F.slice("cells", 2, n)).alias("pos", "raw"),
    ).select(
        "index_value",
        "index_unit",
        F.element_at(F.lit(morphotypes), F.col("pos") + 1).alias("morphotype"),
        F.col("raw").try_cast("double").alias("value"),
    )
    # numeric validation (Float.tryParse-based skips in the reference
    # collapse row lengths; here a non-numeric cell is an error)
    if long.where(F.col("value").isNull() | F.col("index_value").isNull()).limit(1).count():
        raise DataTableError("Problem with data format: non-numeric cell")
    return long


def wide_view(long: DataFrame) -> DataFrame:
    """M2 row view (Datasets.fs:92-95): pivot back to wide for display."""
    return (
        long.groupBy("index_value", "index_unit")
        .pivot("morphotype")
        .sum("value")
        .orderBy("index_value")
    )


def read_csv_quarantine(
    spark: SparkSession, path: str, schema: str
) -> tuple[DataFrame, DataFrame]:
    """S16 — CSV ingest with a malformed-row QUARANTINE: returns
    ``(good, quarantined)``.  Arriving vendor CSVs at scale always
    contain some rows that do not parse against the contract schema
    (extra delimiters, non-numeric cells, truncated lines); failing the
    whole 100 TB load for them is wrong, silently dropping them is
    worse.  PERMISSIVE mode keeps every row — a parse failure lands its
    RAW LINE in ``_corrupt_record`` with every typed column null — so
    one scan splits the input into the typed good rows and a
    quarantine table (raw line preserved for replay after the producer
    is fixed).  This is the CSV twin of the permissive JSON scan the
    graph store already uses (store.py) and the standard
    badRecords-path pattern, kept engine-portable.

    The corrupt column must be part of the declared schema per Spark's
    contract; callers pass the CONTRACT schema only and the marker is
    managed here."""
    full = f"{schema}, _corrupt_record string"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("header", True)
        .csv(path)
        # Spark's permissive CSV parser requires the corrupt column to
        # be materialized before it can be filtered on
        .cache()
    )
    good = df.where(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    quarantined = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return good, quarantined
