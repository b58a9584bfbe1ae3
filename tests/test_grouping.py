"""Grouping lattices (operators/grouping.py): rollup/cube/grouping-sets
semantics, packed grouping bits, and the cube-subsumption identity the
catalog panel's docstring claims (rollup and per-key sets are gid
projections of the cube for the same key set)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.grouping import (
    cube_agg,
    grouping_sets_agg,
    rollup_agg,
)


@pytest.fixture()
def facts(spark):
    rows = [
        ("a", "x", 1),
        ("a", "y", 2),
        ("b", "x", 3),
        ("b", "x", 4),
        (None, "y", 5),  # genuine NULL key — must not be confused
    ]
    return spark.createDataFrame(rows, "g string, h string, v long")


def _rows(df):
    return {
        (r["g"], r["h"], r["_gid"], r["cnt"], r["sv"])
        for r in df.collect()
    }


_AGGS = (
    lambda: F.count(F.lit(1)).alias("cnt"),
    lambda: F.sum("v").cast("long").alias("sv"),
)


class TestLattices:
    def test_rollup_levels_and_gid(self, facts):
        got = _rows(rollup_agg(facts, ["g", "h"], *[a() for a in _AGGS]))
        # detail rows gid 0; the genuine NULL g stays gid 0
        assert ("a", "x", 0, 1, 1) in got
        assert (None, "y", 0, 1, 5) in got
        # g-level subtotals gid 1 (h rolled up)
        assert ("b", None, 1, 2, 7) in got
        # grand total gid 3
        assert (None, None, 3, 5, 15) in got
        # rollup never emits gid 2 (g rolled up, h kept)
        assert not any(r[2] == 2 for r in got)

    def test_cube_subsumes_rollup_and_sets(self, facts):
        aggs = lambda: [a() for a in _AGGS]
        cube = _rows(cube_agg(facts, ["g", "h"], *aggs()))
        rollup = _rows(rollup_agg(facts, ["g", "h"], *aggs()))
        sets = _rows(
            grouping_sets_agg(facts, [["g"], ["h"]], *aggs())
        )
        assert rollup == {r for r in cube if r[2] in (0, 1, 3)}
        assert sets == {r for r in cube if r[2] in (1, 2)}

    def test_grouping_sets_exact_levels(self, facts):
        got = _rows(
            grouping_sets_agg(facts, [["g"], ["h"]], *[a() for a in _AGGS])
        )
        # only the two requested levels, nothing else
        assert {r[2] for r in got} == {1, 2}
        assert (None, "x", 2, 3, 8) in got

    def test_single_pass_plan(self, facts):
        """The lattice is ONE Expand + one aggregate, not one job per
        level — the reason to use rollup over p separate groupBys."""
        plan = (
            rollup_agg(facts, ["g", "h"], F.count(F.lit(1)).alias("cnt"),
                       F.sum("v").cast("long").alias("sv"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Expand") >= 1
        assert "Exchange" in plan

    def test_empty_keys_raise(self, facts):
        with pytest.raises(ValueError):
            rollup_agg(facts, [])
        with pytest.raises(ValueError):
            cube_agg(facts, [])
        with pytest.raises(ValueError):
            grouping_sets_agg(facts, [])
