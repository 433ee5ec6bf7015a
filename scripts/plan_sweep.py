"""Registry-wide physical-plan sweep: scan + Generate counts per query.

The per-query plan tests assert shapes someone thought to pin; this
sweep catches what nobody thought to pin — the round-8 run found five
multi-consumer subtrees silently re-running their corpus pass (T27 4x
tokenize, PR3/C5/D12 4x scans, G21 18x) that every individual test had
passed over.  Run it each round after new queries land; investigate any
query whose scan count exceeds its table count or whose Generate count
exceeds its explode count.

Usage: python scripts/plan_sweep.py [sf_dir]   (default sf0.001)

Caveat: building a plan EXECUTES localCheckpoint cuts, so the sweep
takes a few minutes and the counts are the post-cut residuals — a
query whose corpus pass is materialized once shows 0 parquet scans
(read its checkpoint subtree separately if the pre-cut shape matters).
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from biodiversity_graph_db_spark import registry
    from biodiversity_graph_db_spark.session import get_spark

    registry.load_all()
    spark = get_spark("plan-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    rows = []
    for name, q in registry.QUERIES.items():
        try:
            plan = q(spark, sf)._jdf.queryExecution().explainString(mode)
            scans = re.findall(r"^\(\d+\) Scan parquet (\S*)", plan, re.M)
            gens = len(re.findall(r"^\(\d+\) Generate", plan, re.M))
            per_table = Counter(s.rsplit(".", 1)[-1] for s in scans)
            worst = max(per_table.values(), default=0)
            rows.append((worst, len(scans), gens, name))
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            rows.append((-1, -1, -1, f"{name} ERR {str(ex)[:80]}"))

    rows.sort(reverse=True)
    print(f"{'max/table':>9} {'scans':>5} {'gens':>4}  query")
    for worst, n, g, name in rows:
        flag = "  <-- investigate" if worst >= 3 or g >= 3 else ""
        print(f"{worst:>9} {n:>5} {g:>4}  {name}{flag}")
    spark.stop()


if __name__ == "__main__":
    main()
