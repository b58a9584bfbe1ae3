"""Date-spine gap filling (operators/timeseries.py): dense axis per
group, zero/NULL fill policy, pass-through of existing rows, empty
input, and the downstream claim — a moving average over the filled
axis differs from the sparse one exactly where holes existed."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.timeseries import (
    date_spine,
    fill_date_gaps,
)


def _d(s):
    return datetime.date.fromisoformat(s)


@pytest.fixture()
def sparse(spark):
    rows = [
        ("a", _d("2024-01-01"), 10),
        ("a", _d("2024-01-04"), 40),  # 2nd/3rd missing
        ("b", _d("2024-01-02"), 5),   # b missing the 1st/3rd/4th
    ]
    return spark.createDataFrame(rows, "g string, d date, cnt long")


class TestSpine:
    def test_dense_per_group_global_bounds(self, spark, sparse):
        got = date_spine(sparse, "d", ["g"]).collect()
        days = {(r["g"], r["d"]) for r in got}
        assert len(days) == 2 * 4  # both groups share the global axis
        assert ("b", _d("2024-01-01")) in days

    def test_no_groups(self, spark, sparse):
        got = sorted(r["d"] for r in date_spine(sparse, "d").collect())
        assert got == [_d(f"2024-01-0{i}") for i in range(1, 5)]


class TestFill:
    def test_holes_filled_existing_untouched(self, spark, sparse):
        got = {
            (r["g"], r["d"]): r["cnt"]
            for r in fill_date_gaps(sparse, "d", ["g"]).collect()
        }
        assert len(got) == 8
        assert got[("a", _d("2024-01-01"))] == 10  # untouched
        assert got[("a", _d("2024-01-02"))] == 0   # filled
        assert got[("b", _d("2024-01-04"))] == 0
        assert got[("b", _d("2024-01-02"))] == 5

    def test_null_fill_policy(self, spark, sparse):
        got = {
            (r["g"], r["d"]): r["cnt"]
            for r in fill_date_gaps(
                sparse, "d", ["g"], fill={"cnt": None}
            ).collect()
        }
        assert got[("a", _d("2024-01-02"))] is None
        assert got[("a", _d("2024-01-01"))] == 10

    def test_empty_input(self, spark):
        df = spark.createDataFrame([], "g string, d date, cnt long")
        assert fill_date_gaps(df, "d", ["g"]).count() == 0

    def test_moving_average_needs_the_dense_axis(self, spark, sparse):
        from pyspark.sql import Window

        w = (
            Window.partitionBy("g")
            .orderBy("d")
            .rowsBetween(-2, 0)
        )
        dense = fill_date_gaps(sparse, "d", ["g"])
        ma = {
            (r["g"], r["d"]): r["ma"]
            for r in dense.withColumn("ma", F.avg("cnt").over(w)).collect()
        }
        # with the holes filled, the 3-row window over a's Jan-4 spans
        # Jan 2-4 = (0 + 0 + 40)/3; the sparse frame would have
        # averaged Jan 1 and Jan 4 together
        assert ma[("a", _d("2024-01-04"))] == pytest.approx(40 / 3)
