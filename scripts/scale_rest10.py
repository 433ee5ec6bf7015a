"""Round-10: decade-3 coverage for the remaining families — graph
kernels, spatial, temporal/event, versioned-log, export, matrix,
profiling — at gen_sf1 vs gen_sf10 (6M orders -> 60M lineitem rows,
10M events, 500k docs).

Usage: python scripts/scale_rest10.py [runs]
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
    "G3_connected_components",
    "G5_triangle_count",
    "G11_kcore",
    "G13_weighted_sssp",
    # GEO3 deliberately absent: the minted context model grows BOTH
    # sides linearly (points and fixed-20x10-degree areas from
    # customer keys), so the bbox-contained PAIR set is quadratic by
    # construction - measured 19.8M pairs at gen_sf1, ~2.0B at
    # gen_sf10. The per-area counts are output-inherent work, not a
    # join-shape defect (the join is the cell-bucketed equi-join);
    # SCALE section 36 records the arithmetic and the production
    # posture (areas are a bounded dimension in a real deployment;
    # density-adaptive gridding + covered-cell pre-aggregation is the
    # published upgrade when both sides truly grow).
    "GEO5_density_grid",
    "W9_multires_rollup",
    "C3_rate_changepoint",
    "J8_interval_containment",
    "SD1_snapshot_diff",
    "EX2_shard_manifest",
    "M5_sparse_matmul",
    "PR1_profile_events",
    "T28_lm_perplexity",
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.session import get_spark

    registry.load_all()
    spark = get_spark("scale-rest10")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "scale_rest10", "runs": runs}
    for name in WAVE:
        import gc

        q = registry.QUERIES[name]
        for tag, d in (("small", SMALL), ("big", BIG)):
            ts = []
            for _ in range(runs):
                t0 = time.perf_counter()
                q(spark, d).collect()
                ts.append(time.perf_counter() - t0)
                gc.collect()
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
