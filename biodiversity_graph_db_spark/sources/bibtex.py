"""BibTeX ingest connector (S8, BibtexParser.parse — Sources.fs:227-247).

The reference regex-extracts article fields from one fixed @article
layout.  Here the same extraction is a DataFrame pipeline: wholetext read
→ split records → regexp_extract per group — all JVM-side, so a 100 TB
pile of .bib files ingests as an ordinary distributed scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biodiversity_graph_db_spark.functions import keys as K

# Mirrors the reference's articleRegex (Sources.fs:231) group-for-group,
# as a Java regex with (?s)-free line handling.
ARTICLE_REGEX = (
    r"@article\{(.*),\n"
    r"author = \{(.*)\},\n"
    r"title = \{(.*)\},\n"
    r"journal = \{(.*)\},\n"
    r"year = (.*),\n"
    r"volume = \{(.*)\},\n"
    r"number = \{(.*)\},\n"
    r"pages = \{(.*)--(.*)\},\n"
    r"month = \{(.*)\}\}"
)

_GROUPS = {
    "citekey": 1,
    "author": 2,
    "title": 3,
    "journal": 4,
    "year": 5,
    "volume": 6,
    "number": 7,
    "page_start": 8,
    "page_end": 9,
    "month": 10,
}


def parse_bibtex(spark: SparkSession, path: str) -> DataFrame:
    """Read .bib file(s) wholetext, split on record boundaries, extract
    the article fields.  Unparseable records are quarantined with
    ``parse_ok = false`` (the reference fails the whole file instead)."""
    raw = spark.read.option("wholetext", True).text(path)
    records = raw.select(
        F.explode(F.split(F.col("value"), r"(?=@article\{)")).alias("record")
    ).where(F.length(F.trim("record")) > 0)
    return parse_bibtex_records(records)


def parse_bibtex_records(records: DataFrame) -> DataFrame:
    """records(record: string) → typed article rows."""
    cols = [
        F.regexp_extract("record", ARTICLE_REGEX, g).alias(name)
        for name, g in _GROUPS.items()
    ]
    parsed = records.select(*cols)
    typed = parsed.select(
        "citekey",
        "author",
        "title",
        "journal",
        F.col("year").try_cast("int").alias("year"),
        F.col("volume").try_cast("int").alias("volume"),
        F.col("number").try_cast("int").alias("number"),
        F.col("page_start").try_cast("int").alias("page_start"),
        F.col("page_end").try_cast("int").alias("page_end"),
        "month",
        (F.col("citekey") != "").alias("parse_ok"),
    )
    return typed


def bibtex_to_source_nodes(articles: DataFrame) -> DataFrame:
    """S13 importSources (Seed.fs:41-45): parsed articles → Unscreened
    SourceNode rows with deterministic pub keys (Graph.fs:502-507)."""
    last_name = F.element_at(F.split(F.col("author"), ","), 1)
    return articles.where(F.col("parse_ok")).select(
        K.journal_article_key(
            F.lower(last_name), F.col("title"), F.col("year")
        ).alias("key"),
        F.lit("SourceNode").alias("node_type"),
        F.concat_ws(
            " ", F.col("author"), F.concat(F.lit("("), F.col("year"), F.lit(")")),
            F.col("title"),
        ).alias("pretty_name"),
        F.to_json(
            F.struct(
                F.lit("Unscreened").alias("screening"),
                "author", "title", "journal", "year", "volume", "number",
                "page_start", "page_end", "month",
            )
        ).alias("payload"),
        F.lit("Unscreened").alias("screening_state"),
    )
