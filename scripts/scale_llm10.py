"""Round-10: the corpus-proportional LLM-pipeline ops at decade 3
(gen_sf1 -> gen_sf10, 50k -> 500k documents / 2M -> 20M embeddings) —
the dedup / contamination / quality / mix family whose work is bounded
by the CORPUS (not a replay window), i.e. the operators that actually
carry a 100 TB curation run.

Usage: python scripts/scale_llm10.py [runs]   (default min-of-2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = "/root/repo/.scratch/gen_sf1"
BIG = "/root/repo/.scratch/gen_sf10"

WAVE = [
    "T3_fingerprint_dedup",    # exact dedup, corpus-wide
    "D11_prefix_dup",          # prefix-dup, corpus-wide
    "D13_shared_spans",        # span dedup, stride-1 shingles + df cap
    "D14_span_purge",          # coverage purge over D13's matches
    "D12_source_overlap",      # cross-source overlap
    "D6_domain_cap",           # per-domain cap
    "T8_contamination_overlap",# bench-gram contamination scan
    "D5_contamination_purge",  # its enforcer
    "E3_simhash_neardup",      # simhash near-dup, corpus-wide
    "D2_semantic_dedup",       # embedding near-dup
    "T16_mix_sampling",        # mix sampling
    "T31_temperature_mix",     # temperature reweighting
    "O8_weighted_sample",      # weighted sampling
    "T45_confidence_route",    # router over the full NB fit+score
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.session import get_spark

    registry.load_all()
    spark = get_spark("scale-llm10")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "scale_llm10", "runs": runs}
    for name in WAVE:
        q = registry.QUERIES[name]
        for tag, d in (("small", SMALL), ("big", BIG)):
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                q(spark, d).collect()
                ts.append(time.perf_counter() - t0)
            out[f"{name}_{tag}"] = round(min(ts), 3)
        out[f"{name}_ratio"] = round(
            out[f"{name}_big"] / out[f"{name}_small"], 2
        )
        print(
            f"{name}: sf1={out[f'{name}_small']}s "
            f"sf10={out[f'{name}_big']}s ratio={out[f'{name}_ratio']}x",
            flush=True,
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
