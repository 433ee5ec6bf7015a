"""Round-12 GEO scale curve (VERDICT r11 item 3): GEO7/GEO7b/GEO8 across
FOUR orders — gen_sf0.1 → gen_sf1 → gen_sf10 → gen_sf40(customer subset).
GEO7/GEO8 were the repo's steepest r11 scalers (6.18×/7.74× at decade 3);
this measures the multi-resolution GEO8 rewrite and adds the decade-4
point the r11 verdict asked for.  GEO7b (fractional corners) additionally
exercises the boundary filter-refine branch at every decade.

Usage: python scripts/scale_geo12.py [runs]   (default min-of-2)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIRS = [
    ("sf0.1", "/root/repo/.scratch/gen_sf0.1"),
    ("sf1", "/root/repo/.scratch/gen_sf1"),
    ("sf10", "/root/repo/.scratch/gen_sf10"),
    ("sf40", "/root/repo/.scratch/gen_sf40_sub"),
]

WAVE = [
    "GEO7_area_point_count",
    "GEO7b_area_point_count_frac",
    "GEO8_nearest_topk",
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.session import get_spark

    registry.load_all()
    spark = get_spark("scale-geo12")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "scale_geo12", "runs": runs}
    for name in WAVE:
        q = registry.QUERIES[name]
        prev = None
        for tag, d in DIRS:
            if not os.path.isdir(d):
                continue
            ts, rows = [], 0
            for _ in range(runs):
                t0 = time.perf_counter()
                rows = len(q(spark, d).collect())
                ts.append(time.perf_counter() - t0)
            out[f"{name}_{tag}"] = round(min(ts), 3)
            out[f"{name}_{tag}_rows"] = rows
            msg = f"{name} {tag}: {out[f'{name}_{tag}']}s rows={rows}"
            if prev:
                r = round(out[f"{name}_{tag}"] / prev, 2)
                out[f"{name}_{tag}_ratio"] = r
                msg += f" ratio={r}x"
            prev = out[f"{name}_{tag}"]
            print(msg, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
