"""Round-8 wave one-order-up evidence: the nine new registry queries at
gen_sf0.1 vs gen_sf1 (the §16/§17 discipline — every wave ships with a
10x scaling ratio measured inside the generator family).

Usage: python scripts/scale_wave8.py [runs]   (default min-of-2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = "/root/repo/.scratch/gen_sf0.1"
BIG = "/root/repo/.scratch/gen_sf1"

WAVE = [
    "V11_filtered_recall",
    "O6_stratified_sample",
    "J11_band_join",
    "C5_retention_cohorts",
    "D11_prefix_dup",
    "T35_char_entropy",
    "PR5_numeric_corr",
    "ED5_interarrival_median",
    "O7_hash_sample_topk",
    "T36_pmi_collocations",
    "G21_degree_assortativity",
    "O8_weighted_sample",
    "D12_source_overlap",
    "ED6_type_transitions",
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.session import get_spark

    registry.load_all()
    spark = get_spark("scale-w8")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "scale_wave8", "runs": runs}
    for name in WAVE:
        q = registry.QUERIES[name]
        for tag, sf_dir in (("small", SMALL), ("big", BIG)):
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                q(spark, sf_dir).collect()
                ts.append(time.perf_counter() - t0)
            out[f"{name}_{tag}"] = round(min(ts), 3)
        out[f"{name}_ratio"] = round(
            out[f"{name}_big"] / out[f"{name}_small"], 2
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
