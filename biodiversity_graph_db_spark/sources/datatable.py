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
