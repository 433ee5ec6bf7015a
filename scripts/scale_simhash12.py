"""Round-12 SimHash probe (VERDICT r11 item 6): the §39 stage-cardinality
measurement re-run with the corpus-ADAPTIVE band width — signature build
time, band-join candidate count, and full-E3 time across gen_sf1 →
gen_sf10 → gen_sf40(documents subset).  The fixed-16-bit record measured
candidates 83k → 8.28M (99.6×/decade, the inherent quadratic of a fixed
bucket domain); the adaptive ladder (2 bits per corpus doubling) should
hold the FALSE-candidate term flat, leaving the linear true-near-dup
term (the mint's ~5% planted dups) as the growth driver.

Usage: python scripts/scale_simhash12.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIRS = [
    ("sf1", "/root/repo/.scratch/gen_sf1"),
    ("sf10", "/root/repo/.scratch/gen_sf10"),
    ("sf40", "/root/repo/.scratch/gen_sf40_sub"),
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from pyspark.sql import functions as F

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.extensions import simhash
    from biodiversity_graph_db_spark.operators._util import cut
    from biodiversity_graph_db_spark.session import get_spark
    from biodiversity_graph_db_spark.tables import fan_out, table

    registry.load_all()
    spark = get_spark("scale-simhash12")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "scale_simhash12", "runs": runs}
    for tag, d in DIRS:
        if not os.path.isdir(d):
            continue
        n = table(spark, d, "documents").count()
        bb = simhash.adaptive_band_bits(n)
        docs = fan_out(table(spark, d, "documents"), spark)
        # stage 1: signature build
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            simhash.simhash_signatures(docs, band_bits=bb).count()
            ts.append(time.perf_counter() - t0)
        sig_t = round(min(ts), 3)
        # stage 2: candidate cardinality (one exact count)
        sigs = cut(simhash.simhash_signatures(docs, band_bits=bb))
        cand = simhash.simhash_candidates(sigs, broadcast=False).count()
        # stage 3: full E3
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            simhash.simhash_neardups(
                docs, broadcast=False, band_bits=bb
            ).count()
            ts.append(time.perf_counter() - t0)
        full_t = round(min(ts), 3)
        out[f"{tag}_docs"] = n
        out[f"{tag}_band_bits"] = bb
        out[f"{tag}_sig_s"] = sig_t
        out[f"{tag}_candidates"] = cand
        out[f"{tag}_full_s"] = full_t
        print(
            f"{tag}: docs={n} bb={bb} sig={sig_t}s"
            f" candidates={cand} full={full_t}s",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
