"""Round-9 wave one-order-up evidence: the TPC-H completion queries,
the NB-maintainer driver form and the trained-PQ A/B at gen_sf0.1 vs
gen_sf1 (the §16/§17 discipline — ratios within the generator family).

Usage: python scripts/scale_wave9.py [runs]   (default min-of-2)
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
    "Q6_forecast_revenue",
    "Q7_volume_shipping",
    "Q8_market_share",
    "Q10_returned_items",
    "Q12_priority_line_counts",
    "Q13_customer_order_distribution",
    "Q14_promo_revenue",
    "Q15_top_supplier",
    "Q18_large_volume_customer",
    "Q19_discounted_revenue",
    "Q21_sole_blame_supplier",
    "Q22_dormant_balance",
    "T41_nb_model_store",
    "V21_pq_trained_recall",
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.session import get_spark

    registry.load_all()
    spark = get_spark("scale-w9")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "scale_wave9", "runs": runs}
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
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
