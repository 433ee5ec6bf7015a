"""Round-8 wave-3 one-order-up evidence: the learned-filter family
(T37 NB, T38 DSIR) and the k-means/purity ops (V17/V18) at gen_sf0.1
vs gen_sf1 (the §16/§17 discipline).

Usage: python scripts/scale_wave8c.py [runs]   (default min-of-2)
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
    "T37_nb_langid",
    "T38_dsir_weights",
    "V17_kmeans_refine",
    "V18_cluster_purity",
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.session import get_spark

    registry.load_all()
    spark = get_spark("scale-w8b")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "scale_wave8c", "runs": runs}
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
