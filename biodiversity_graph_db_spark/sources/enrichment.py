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

def parse_crossref_payload(payload: dict) -> dict:
    """The reference's ``CrossRef.bestMatch`` (Sources.fs:264-332) as a
    pure driver-side function over a raw CrossRef work-list payload —
    the decode layer between the HTTP round-trip and ``crossref_match``.
    Replicated decision ladder, in order:

    - ``status`` ≠ "ok" → error, the reference's exact message
      (Sources.fs:329);
    - ≠ 2 items → no match (bestMatch requires rows=2, Sources.fs:267);
    - score gap ``|s0 − s1| ≤ 1.0`` → no match (Sources.fs:269);
    - item type ≠ "journal-article" → raise (the reference ``failwith``s,
      Sources.fs:324);
    - JournalArticle mapping (Sources.fs:274-320): first author = the
      ``sequence == "first"`` entry as "Family, I. N" (initial of each
      given-name word joined by ". " — no trailing dot, exactly the
      string fed to Author.create); additional authors likewise; title =
      ``title[0]`` (error when empty); journal = ``container-title[0]``
      (error when empty); (year, month) from ``published.date-parts[0]``
      which must carry ≥ 2 parts (error otherwise), month via the
      Types.fs:661 1..12 table (None outside); volume/issue =
      int-tryParse (None on non-numeric); page_range = None; doi = None
      when null/empty else verbatim.

    Returns ``{"status": "matched"|"no_match"|"error", "reason",
    "article"}`` — the Ok Some / Ok None / Error triage as data.
    Errors the reference raises from inside the mapping (missing first
    author — Seq.find throws — missing title/journal/date) come back as
    ``status="error"`` with the reference's message, matching tryMatch's
    catch-all (Sources.fs:333-338)."""
    _MONTHS = {
        1: "Jan", 2: "Feb", 3: "Mar", 4: "Apr", 5: "May", 6: "Jun",
        7: "Jul", 8: "Aug", 9: "Sep", 10: "Oct", 11: "Nov", 12: "Dec",
    }

    def initials(given: str) -> str:
        return ". ".join(w[0] for w in given.split(" ") if w)

    def author_display(a: dict) -> str:
        return a.get("family", "") + ", " + initials(a.get("given", ""))

    def err(reason: str) -> dict:
        return {"status": "error", "reason": reason, "article": None}

    if payload.get("status") != "ok":
        return err(
            "Could not successfully query CrossRef, either due to no "
            "connection or a bad request."
        )
    items = payload.get("message", {}).get("items", [])
    if len(items) != 2:
        return {"status": "no_match", "reason": "item count != 2",
                "article": None}
    if abs(items[0]["score"] - items[1]["score"]) <= 1.0:
        return {"status": "no_match", "reason": "score gap <= 1.0",
                "article": None}
    m = items[0]
    if m.get("type") != "journal-article":
        raise ValueError(m.get("type"))
    firsts = [a for a in m.get("author", []) if a.get("sequence") == "first"]
    if not firsts:
        return err("no author with sequence == 'first'")
    first_author = author_display(firsts[0])
    additional = [
        author_display(a)
        for a in m.get("author", [])
        if a.get("sequence") == "additional"
    ]
    titles = m.get("title", [])
    if not titles:
        return err("No title given by CrossRef")
    journals = m.get("container-title", [])
    if not journals:
        return err("No journal given by CrossRef")
    date_parts = m.get("published", {}).get("date-parts", [])
    if not date_parts or len(date_parts[0]) < 2:
        return err("No publication date specified")
    year, month = date_parts[0][0], _MONTHS.get(date_parts[0][1])

    def try_int(s) -> int | None:
        try:
            return int(s)
        except (TypeError, ValueError):
            return None

    doi = m.get("DOI") or None
    return {
        "status": "matched",
        "reason": None,
        "article": {
            "first_author": first_author,
            "additional_authors": additional,
            "title": titles[0],
            "journal": journals[0],
            "year": year,
            "month": month,
            "volume": try_int(m.get("volume")),
            "number": try_int(m.get("issue")),
            "page_range": None,
            "doi": doi,
        },
    }
