"""Full TPC-H layer at decade 3 (supplement to scale_wave10): every
registered Q-query at gen_sf1 vs gen_sf10, min-of-2 — the complete
warehouse layer's three-order evidence in one table.

Usage: python scripts/scale_tpch10.py [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SMALL = "/root/repo/.scratch/gen_sf1"
BIG = "/root/repo/.scratch/gen_sf10"


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.session import get_spark

    registry.load_all()
    wave = sorted(
        n for n in registry.QUERIES
        if n.startswith("Q") and n[1].isdigit()
    )
    spark = get_spark("scale-tpch10")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "scale_tpch10", "runs": runs}
    for name in wave:
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
