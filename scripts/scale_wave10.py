"""Round-10 THREE-order scale point (VERDICT r9 item 4): the five worst
10x scalers from the r9 wave — Q21 (3.08x), Q18 (2.74x), Q12 (2.38x),
T41 and V21 — at gen_sf1 vs gen_sf10 (60M lineitem / 500k docs), the
third decade of the §23/§30 curve.  A quadratic term that hides behind
a benign 10x ratio at decade 2 shows up as a >>10x decade-3 ratio.

Also runs the new partsupp wave (Q2/Q9/Q11/Q16/Q20) at both decades —
their first above-driver-SF evidence.

Usage: python scripts/scale_wave10.py [runs]   (default min-of-2)
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
    "Q21_sole_blame_supplier",
    "Q18_large_volume_customer",
    "Q12_priority_line_counts",
    "T41_nb_model_store",
    "V21_pq_trained_recall",
    "Q2_min_cost_supplier",
    "Q9_product_profit",
    "Q11_important_stock",
    "Q16_supplier_relationship",
    "Q20_excess_stock",
    "T45_confidence_route",
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.session import get_spark

    registry.load_all()
    spark = get_spark("scale-w10")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "scale_wave10", "runs": runs}
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
