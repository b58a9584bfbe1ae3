"""Physical-plan regression guards: the optimizations that make these
queries survive 100× scale must stay visible in the plan — filter
pushdown to the scan, column-pruned ReadSchema, broadcast dimensions,
map-side partial aggregation, TakeOrdered top-k. A refactor that
silently loses one of these still passes value checks; these tests
fail it."""

import contextlib
import io

from harness_aws_etl_pipeline_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].builder(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestPlanHealth:
    def test_g2_pushdown_and_broadcast(self, spark):
        plan = _plan(spark, "g2_revenue_rollup")
        # join keys pushed as IsNotNull at minimum; dims broadcast
        assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan.split(
            "PushedFilters: ["
        )[0]
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan  # dims must not shuffle at this size

    def test_g1_partial_aggregation(self, spark):
        plan = _plan(spark, "g1_pricing_summary")
        # two HashAggregates (partial + final) around ONE exchange
        assert plan.count("HashAggregate") >= 2
        assert "partial_" in plan  # map-side combine present

    def test_g1_column_pruning(self, spark):
        plan = _plan(spark, "g1_pricing_summary")
        # lineitem has 16 columns; the scan must read only the few used
        read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert read_schema, "no ReadSchema in plan"
        assert all(ln.count(",") <= 6 for ln in read_schema)

    def test_orderby_limit_is_takeordered(self, spark):
        plan = _plan(spark, "orderby_limit")
        assert "TakeOrderedAndProject" in plan
        assert "\n   Sort " not in plan  # no global sort for a top-k

    def test_q5_all_dims_broadcast(self, spark):
        plan = _plan(spark, "q5_region_revenue")
        assert plan.count("BroadcastHashJoin") >= 4
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_window_topk_two_shuffles_max(self, spark):
        import re

        plan = _plan(spark, "window_topk")
        # rank-per-group = ONE hash exchange for the window, plus the
        # final output sort's range exchange — nothing else
        nodes = re.findall(r"^\(\d+\) Exchange", plan, flags=re.M)
        assert len(nodes) <= 2, plan[:500]

    def test_scan_count_filter_pushdown(self, spark):
        plan = _plan(spark, "scan_count")
        assert "ReadSchema" in plan

    def test_no_bnl_anywhere_in_core_joins(self, spark):
        # relalg_counts intentionally carries BNLJ since r7: its bloom
        # legs crossJoin 1-row aggregate arms (the safe known-stats
        # pattern) — what stays forbidden everywhere is the partition-
        # multiplying CartesianProduct
        for name in ("g4_kpis", "q3_shipping_priority"):
            plan = _plan(spark, name)
            assert "BroadcastNestedLoopJoin" not in plan, name
            assert "CartesianProduct" not in plan, name
        assert "CartesianProduct" not in _plan(spark, "relalg_counts")
