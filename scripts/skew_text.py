"""Zipf hot-key skew evidence for the learned-filter family (T37/T38).

Both filters reduce the token stream on the WORD key (model build) —
real corpora are Zipfian, so one stopword can be a double-digit share
of all tokens.  This harness builds two equal-token synthetic corpora —
one with a uniform 1000-word vocabulary, one where a single word is 30%
of every document — and times the full T37 fit+score and T38
weight+rank pipelines over each (written to parquet first, so the scan
shape matches production).

Why skew SHOULD be absorbed, by construction: the only corpus-sized
reduces key on (doc, word) — collapse within a document, hub share per
key bounded by one document's repetition — and on (word[, class]) for
the model, which is map-side COMBINABLE: the hot word contributes at
most one partial row per map partition to its reduce key.  Scoring
joins the model BROADCAST, so the hot key never shuffles row-wise.

Usage: python scripts/skew_text.py [runs]   (default min-of-2)
Writes one JSON line; record skewed-vs-uniform ratios in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 20_000
TOKENS_PER_DOC = 100
VOCAB = 1_000
HUB_FRAC = 0.30
LANGS = ("en", "fr", "de", "es", "zh")


def timed(fn, runs: int) -> float:
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 3)


def corpus(spark, tmp: str, skewed: bool) -> str:
    """Deterministic synthetic corpus: every doc TOKENS_PER_DOC words;
    in the skewed variant the first 30% of every doc is the single hub
    word, the rest hashes uniformly over the vocabulary."""
    from pyspark.sql import functions as F

    hub = int(TOKENS_PER_DOC * HUB_FRAC)
    words = F.transform(
        F.sequence(F.lit(0), F.lit(TOKENS_PER_DOC - 1)),
        lambda i: (
            F.when(F.lit(skewed) & (i < hub), F.lit("hubword")).otherwise(
                F.concat(
                    F.lit("w"),
                    (F.xxhash64(F.col("id") * TOKENS_PER_DOC + i) % VOCAB)
                    .cast("string"),
                )
            )
        ),
    )
    path = f"{tmp}/{'skewed' if skewed else 'uniform'}"
    (
        spark.range(N_DOCS)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
            F.element_at(
                F.array(*[F.lit(l) for l in LANGS]),
                (F.col("id") % len(LANGS) + 1).cast("int"),
            ).alias("lang"),
            F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias(
                "source"
            ),
        )
        .withColumn("n_chars", F.length("text"))
        .write.mode("overwrite")
        .parquet(f"{path}/documents.parquet")
    )
    return path


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.session import get_spark

    registry.load_all()
    spark = get_spark("skew-text")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="skew_text_")
    out: dict = {"metric": "skew_text", "runs": runs, "n_docs": N_DOCS}
    try:
        dirs = {
            "uniform": corpus(spark, tmp, skewed=False),
            "skewed": corpus(spark, tmp, skewed=True),
        }
        for qname in ("T37_nb_langid", "T38_dsir_weights"):
            q = registry.QUERIES[qname]
            for tag, d in dirs.items():
                out[f"{qname}_{tag}"] = timed(
                    lambda: q(spark, d).collect(), runs
                )
            out[f"{qname}_ratio"] = round(
                out[f"{qname}_skewed"] / out[f"{qname}_uniform"], 2
            )
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
