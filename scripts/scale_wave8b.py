"""Round-8 wave-2 one-order-up evidence: D13 shared spans + the PQ
family (V12/V13/V14) at gen_sf0.1 vs gen_sf1 (the §16/§17 discipline).

Usage: python scripts/scale_wave8b.py [runs]   (default min-of-2)
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
    "D13_shared_spans",
    "V12_pq_adc_topk",
    "V13_pq_recall",
    "V14_pq_rerank",
    "D14_span_purge",
    "V15_ivfpq_topk",
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.session import get_spark

    registry.load_all()
    spark = get_spark("scale-w8b")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "scale_wave8b", "runs": runs}
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
