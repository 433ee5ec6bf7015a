"""Optimization-round profiler (guide §1): time registered queries with
the noop sink (computation only, no sink/driver-collect cost) AND with the
bench's .collect() methodology, and dump .explain("formatted") to
plans/<tag>/<query>.txt so plan claims are checkable artifacts.

Usage:
  python scripts/opt_profile.py Q1_pricing_summary GEO8_nearest_topk
  SPARK_GRAFT_PLAN_TAG=r12/before python scripts/opt_profile.py --all-headline
  python scripts/opt_profile.py --plans-only GEO7b_area_point_count_frac

Output: one JSON line per query {name, noop_s, collect_s, exchanges,
aqe, python_nodes} plus the plan file.  Timings are min-of-N
(SPARK_GRAFT_BENCH_RUNS, default 3) after a warm-up of the parquet
footers, mirroring bench.py so numbers are comparable.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "r12/probe")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    plans_only = "--plans-only" in flags

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.session import get_spark

    registry.load_all()
    if "--all-headline" in flags:
        import bench

        names = [n for n in bench.HEADLINE if n in registry.QUERIES]
    else:
        names = [n for n in args if n in registry.QUERIES]
        missing = [n for n in args if n not in registry.QUERIES]
        if missing:
            print(f"unknown queries: {missing}", file=sys.stderr)

    spark = get_spark("opt_profile")
    spark.sparkContext.setLogLevel("ERROR")

    from biodiversity_graph_db_spark.tables import TABLES, table

    for t in TABLES:
        table(spark, sf_dir, t).count()

    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(plan_dir, exist_ok=True)

    out = []
    for name in names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"opt_profile: {name}")
        # Plan first (cheap, no execution for pure-DF queries; queries
        # with internal actions will run them once here).
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(plan_dir, f"{name}.txt"), "w") as f:
            f.write(plan)
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        n_python = len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|FlatMapGroupsInPandas|MapInPandas", plan)
        )
        rec = {
            "name": name,
            "exchanges": n_exchange,
            "python_nodes": n_python,
        }
        if not plans_only:
            noop_ts, coll_ts = [], []
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                noop_ts.append(time.perf_counter() - t0)
            for _ in range(runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                coll_ts.append(time.perf_counter() - t0)
            rec["noop_s"] = round(min(noop_ts), 3)
            rec["collect_s"] = round(min(coll_ts), 3)
        out.append(rec)
        print(json.dumps(rec), flush=True)
        spark.sparkContext.setJobDescription(None)
        import gc

        gc.collect()

    print(json.dumps({"profile": out, "sf_dir": sf_dir, "runs": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
