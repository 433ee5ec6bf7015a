"""Hub-skew evidence for the iterative graph kernels (VERDICT r7 item 8).

G20's degree profile measures the power law; this harness measures what
a hub actually COSTS: two synthetic graphs at equal |E| and |V| — one
uniform, one with a single hub vertex holding ~30% of all edge endpoints
(half as src, half as dst) — drive G6 pagerank, G9 label propagation and
G19 personalized PageRank, min-of-N wall time each.

What skew can and cannot hit in these kernels, by construction:

- the per-round contribution aggregate (groupBy dst / groupBy (dst,
  label)) is map-side COMBINABLE — the hub's reduce key receives at most
  one partial row per map partition, so a 30% hub does NOT concentrate
  30% of rows on one reducer;
- the per-round rank⊳edge join keys the EDGE side on src; the hub's
  partition is ~30% of the shuffle when partitions ≈ few, and AQE's
  skew-split can rebalance it (the rank side is one row per key);
- LPA's argmax window partitions by dst: the hub's vote group is
  |distinct neighbor labels| rows — the one structure that genuinely
  grows with hub degree in round 1.

Usage: python scripts/skew_run.py [runs]   (default min-of-2)
Writes one JSON line; record skewed-vs-uniform ratios in SCALE.md §18.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EDGES = 500_000
N_VERTICES = 50_000
HUB_FRAC = 0.30


def timed(fn, runs: int) -> float:
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(min(ts), 3)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    from pyspark.sql import functions as F

    from biodiversity_graph_db_spark.graph.algorithms import (
        label_propagation,
        pagerank,
        personalized_pagerank,
    )
    from biodiversity_graph_db_spark.session import get_spark

    spark = get_spark("skew")
    spark.sparkContext.setLogLevel("ERROR")

    def gen_edges(hub_frac: float):
        """Deterministic synthetic edge list: uniform endpoints from a
        hash of the edge id; with hub_frac, that share of edges gets one
        endpoint pinned to vertex 0 (alternating src/dst so both the
        join-key and the aggregate-key side see the hub)."""
        base = spark.range(N_EDGES).select(
            "id",
            F.pmod(F.hash((F.col("id") * 7 + 1).cast("string")), F.lit(N_VERTICES)).alias("s"),
            F.pmod(F.hash((F.col("id") * 13 + 5).cast("string")), F.lit(N_VERTICES)).alias("d"),
        )
        if hub_frac:
            is_hub = (F.col("id") % 100) < int(hub_frac * 100)
            base = base.select(
                "id",
                F.when(is_hub & (F.col("id") % 2 == 0), F.lit(0)).otherwise(F.col("s")).alias("s"),
                F.when(is_hub & (F.col("id") % 2 == 1), F.lit(0)).otherwise(F.col("d")).alias("d"),
            )
        return (
            base.where(F.col("s") != F.col("d"))
            .select(
                F.concat(F.lit("v"), F.col("s")).alias("src"),
                F.concat(F.lit("v"), F.col("d")).alias("dst"),
            )
            .localCheckpoint()
        )

    out: dict = {
        "metric": "graph_skew",
        "n_edges": N_EDGES,
        "n_vertices": N_VERTICES,
        "hub_frac": HUB_FRAC,
        "runs": runs,
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    for name, frac in (("uniform", 0.0), ("skewed", HUB_FRAC)):
        edges = gen_edges(frac)
        out[f"{name}_edges"] = edges.count()
        out[f"{name}_g6_pagerank_sec"] = timed(
            lambda: pagerank(edges, iterations=5).count(), runs
        )
        out[f"{name}_g9_lpa_sec"] = timed(
            lambda: label_propagation(edges, max_iter=5).count(), runs
        )
        out[f"{name}_g19_ppr_sec"] = timed(
            lambda: personalized_pagerank(
                edges, sources=["v1", "v2", "v3"], iterations=5
            ).count(),
            runs,
        )
        edges.unpersist()
    for k in ("g6_pagerank", "g9_lpa", "g19_ppr"):
        out[f"{k}_skew_ratio"] = round(
            out[f"skewed_{k}_sec"] / out[f"uniform_{k}_sec"], 2
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
