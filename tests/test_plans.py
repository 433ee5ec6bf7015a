"""Physical-plan regression tests: the properties that make these queries
scale (pushdown, pruning, broadcast, partial aggregation) must stay in
the plan — a correctness-preserving change that loses them is a perf bug.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biodiversity_graph_db_spark import registry

registry.load_all()


def _plan(spark, sf_dir, name: str) -> str:
    df = registry.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


class TestPlans:
    def test_q1_filter_pushdown_and_pruning(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "Q1_pricing_summary")
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
        # column pruning: the scan must not read join keys it doesn't need
        assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]
        # two-phase aggregation (map-side partial)
        assert plan.count("HashAggregate") >= 2

    def test_j2_broadcasts_dimensions(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "J2_multihop_extract")
        assert plan.count("BroadcastHashJoin") >= 2
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_f1_point_lookup_pushdown(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "F1_point_lookup")
        assert "PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,419)]" in plan

    def test_j8_range_join_is_not_nested_loop(self, spark, sf_dir):
        # the bucketized range join must stay an equi-join
        plan = _plan(spark, sf_dir, "J8_interval_containment")
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan

    def test_o1_sort_is_topk(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "O1_index_sort")
        assert "TakeOrderedAndProject" in plan

    def test_j3_semi_join(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "J3_reverse_membership")
        assert "LeftSemi" in plan

    def test_e2_no_cartesian(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "E2_minhash_lsh_neardup")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_g2_forest_closure_is_one_lazy_plan(self, spark, sf_dir):
        # the assume_forest unrolled closure must stay a single lazy plan:
        # no localCheckpoint barrier (surfaces as a Scan ExistingRDD) and
        # no per-round materialization — just unioned broadcast joins
        plan = _plan(spark, sf_dir, "G2_hierarchy_closure")
        assert "ExistingRDD" not in plan
        assert "Union" in plan
        assert "CartesianProduct" not in plan

    def test_v1_query_side_broadcast(self, spark, sf_dir):
        plan = _plan(spark, sf_dir, "V1_cosine_topk")
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        # candidate side streams once; per-query top-k via window
        assert "RunningWindowFunction" in plan or "Window" in plan


class TestLayout:
    def test_bucketed_join_has_no_shuffle(self, spark, sf_dir, tmp_path):
        from biodiversity_graph_db_spark.plans import layout
        from biodiversity_graph_db_spark.tables import table

        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        ).withColumnRenamed("l_orderkey", "o_orderkey")
        thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # force the shuffle-join path: bucketing's win is eliding the
            # Exchange of a sort-merge join (broadcast would hide it)
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            layout.write_bucketed(orders, "b_orders", "o_orderkey", 8)
            layout.write_bucketed(li, "b_lineitem", "o_orderkey", 8)
            joined = layout.bucketed_join(
                spark, "b_orders", "b_lineitem", "o_orderkey"
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan
            # sanity: same result as the plain join
            want = orders.join(li, "o_orderkey").count()
            assert joined.count() == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lineitem")

    def test_salted_join_matches_plain_join(self, spark, sf_dir):
        from biodiversity_graph_db_spark.plans import layout
        from biodiversity_graph_db_spark.tables import table

        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey", "l_quantity"
        )
        part = table(spark, sf_dir, "part").select(
            F.col("p_partkey").alias("l_partkey"), "p_name"
        )
        got = layout.salted_join(li, part, "l_partkey", n_salt=8)
        want = li.join(part, "l_partkey")
        assert got.count() == want.count()
        assert got.exceptAll(want).isEmpty()
