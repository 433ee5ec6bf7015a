"""HTTP enrichment connectors (S10 CrossRef, S11 GlobalPollenProject) —
offline-stubbed.

The reference calls live HTTPS APIs (Sources.fs:255-335 CrossRef lookup
with the score-gap match heuristic; TaxonomicBackbone.fs:33-55 GPP).  The
engine shape is a ``mapInPandas`` stage at the ingest boundary: one HTTP
round-trip per row batch, never per row, executed on the workers.  The
network call itself is injected so tests (and this offline container) use
a deterministic fake.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

CROSSREF_SCHEMA = StructType(
    [
        StructField("title", StringType(), True),
        StructField("matched_doi", StringType(), True),
        StructField("matched_title", StringType(), True),
        StructField("score_best", DoubleType(), True),
        StructField("score_second", DoubleType(), True),
        StructField("match_confident", StringType(), True),
    ]
)


def _offline_lookup(titles: pd.Series) -> pd.DataFrame:
    """Deterministic fake CrossRef response (no network in container)."""
    import hashlib

    def score(t: str, salt: str) -> float:
        h = int(hashlib.md5((salt + t).encode()).hexdigest()[:8], 16)
        return 40.0 + (h % 6000) / 100.0

    best = titles.map(lambda t: score(t, "a"))
    second = titles.map(lambda t: min(score(t, "b"), score(t, "a")))
    return pd.DataFrame(
        {
            "title": titles,
            "matched_doi": titles.map(
                lambda t: "10.5555/" + hashlib.md5(t.encode()).hexdigest()[:8]
            ),
            "matched_title": titles,
            "score_best": best,
            "score_second": second,
        }
    )


def crossref_match(
    df: DataFrame,
    title_col: str = "title",
    lookup: Callable[[pd.Series], pd.DataFrame] | None = None,
) -> DataFrame:
    """S10 tryMatch: look up each title, apply the reference's score-gap
    heuristic — confident iff |best − second| > 1.0 (Sources.fs:318-325).
    """
    fn = lookup or _offline_lookup

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = fn(pdf[title_col])
            gap = (out["score_best"] - out["score_second"]).abs()
            out["match_confident"] = (gap > 1.0).map(
                lambda b: "true" if b else "false"
            )
            yield out

    return df.select(F.col(title_col).alias("title")).mapInPandas(
        run, schema=CROSSREF_SCHEMA
    )


def gpp_backbone_lookup(df: DataFrame, name_col: str = "latin_name") -> DataFrame:
    """S11 (TaxonomicBackbone.fs:33-55) — same mapInPandas shape; the live
    endpoint is unavailable offline, so this raises by default."""
    raise NotImplementedError(
        "globalpollenproject.org lookup requires network access; inject a "
        "lookup fn via crossref_match-style wiring for tests"
    )
