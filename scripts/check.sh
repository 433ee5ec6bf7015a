#!/usr/bin/env bash
# The round gate: a commit that closes out a work session must pass this.
# (Round 2 shipped with a red parity suite — never again: run this before
# the final commit of any session.)
#
#   scripts/check.sh          # gate at sf0.001 (fast) + plans + contract
#   SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 scripts/check.sh   # driver SF
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== oracle parity + plan regressions =="
python -m pytest tests/test_oracle_parity.py tests/test_plans.py -q

echo "== driver contract =="
python - <<'PY'
import __spark_entry__ as e
from biodiversity_graph_db_spark.session import get_spark
spark = get_spark("check"); spark.sparkContext.setLogLevel("ERROR")
n = len(e.entry(spark).collect())
q, o = len(e.queries()), len(e.oracle_sql())
assert n >= 0 and q == o, (n, q, o)
print(f"entry rows={n} queries={q} oracles={o}")
spark.stop()
PY

echo "== bench smoke (one query) =="
SPARK_GRAFT_BENCH_QUERIES=Q1_pricing_summary python bench.py
echo "ALL GREEN"
