"""Colandr screening-CSV connector (S9, ColandrParser.syncColandr —
Sources.fs:349-366): header CSV read, keep rows whose
citation_screening_status = 'included', map to bibliographic rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sync_colandr(spark: SparkSession, path: str) -> DataFrame:
    df = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
    return colandr_rows(df)


def colandr_rows(df: DataFrame) -> DataFrame:
    """Filter + column mapping (the reference's CsvProvider row shape)."""
    return (
        df.where(F.col("citation_screening_status") == "included")
        .select(
            F.col("citation_authors").alias("author"),
            F.col("citation_title").alias("title"),
            F.col("citation_journal_name").alias("journal"),
            F.col("citation_pub_year").try_cast("int").alias("year"),
            F.col("citation_journal_volume").try_cast("int").alias("volume"),
        )
    )
