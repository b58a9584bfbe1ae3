"""Date-spine gap filling (operators/timeseries.py): dense axis per
group, zero/NULL fill policy, pass-through of existing rows, empty
input, and the downstream claim — a moving average over the filled
axis differs from the sparse one exactly where holes existed."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.timeseries import (
    bfill,
    date_spine,
    ffill,
    fill_date_gaps,
    interpolate_linear,
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


@pytest.fixture()
def holey(spark):
    # per-group series with leading, interior, and trailing holes
    rows = [
        ("a", _d("2024-01-01"), None),
        ("a", _d("2024-01-02"), 10.0),
        ("a", _d("2024-01-03"), None),
        ("a", _d("2024-01-04"), None),
        ("a", _d("2024-01-05"), 40.0),
        ("a", _d("2024-01-06"), None),
        ("b", _d("2024-01-01"), 7.0),
        ("b", _d("2024-01-02"), None),
    ]
    return spark.createDataFrame(rows, "g string, d date, v double")


def _vals(df):
    return {
        (r["g"], r["d"]): r["v"]
        for r in df.orderBy("g", "d").collect()
    }


class TestHoleFilling:
    def test_ffill(self, spark, holey):
        got = _vals(ffill(holey, "d", ["v"], ["g"]))
        assert got[("a", _d("2024-01-01"))] is None  # leading stays
        assert got[("a", _d("2024-01-03"))] == 10.0
        assert got[("a", _d("2024-01-04"))] == 10.0
        assert got[("a", _d("2024-01-06"))] == 40.0
        assert got[("b", _d("2024-01-02"))] == 7.0

    def test_bfill(self, spark, holey):
        got = _vals(bfill(holey, "d", ["v"], ["g"]))
        assert got[("a", _d("2024-01-01"))] == 10.0
        assert got[("a", _d("2024-01-04"))] == 40.0
        assert got[("a", _d("2024-01-06"))] is None  # trailing stays
        assert got[("b", _d("2024-01-02"))] is None

    def test_linear_interior_weights_by_axis_distance(self, spark, holey):
        got = _vals(interpolate_linear(holey, "d", ["v"], ["g"]))
        # Jan 3/4 sit 1/3 and 2/3 of the way from 10 → 40
        assert got[("a", _d("2024-01-03"))] == pytest.approx(20.0)
        assert got[("a", _d("2024-01-04"))] == pytest.approx(30.0)
        assert got[("a", _d("2024-01-02"))] == 10.0  # untouched
        assert got[("a", _d("2024-01-01"))] is None  # edge default
        assert got[("a", _d("2024-01-06"))] is None
        assert got[("b", _d("2024-01-02"))] is None

    def test_linear_uneven_spacing(self, spark):
        # hole 1 day from the left neighbor, 9 from the right: the
        # value must land 1/10 of the way, NOT at the midpoint
        rows = [
            ("a", _d("2024-01-01"), 0.0),
            ("a", _d("2024-01-02"), None),
            ("a", _d("2024-01-11"), 100.0),
        ]
        df = spark.createDataFrame(rows, "g string, d date, v double")
        got = _vals(interpolate_linear(df, "d", ["v"], ["g"]))
        assert got[("a", _d("2024-01-02"))] == pytest.approx(10.0)

    def test_linear_nearest_extrapolation(self, spark, holey):
        got = _vals(
            interpolate_linear(
                holey, "d", ["v"], ["g"], extrapolate="nearest"
            )
        )
        assert got[("a", _d("2024-01-01"))] == 10.0
        assert got[("a", _d("2024-01-06"))] == 40.0
        assert got[("b", _d("2024-01-02"))] == 7.0

    def test_linear_numeric_axis_and_all_null_group(self, spark):
        rows = [
            ("a", 0, 0.0),
            ("a", 4, None),
            ("a", 10, 5.0),
            ("c", 1, None),
            ("c", 2, None),
        ]
        df = spark.createDataFrame(rows, "g string, x long, v double")
        got = {
            (r["g"], r["x"]): r["v"]
            for r in interpolate_linear(df, "x", ["v"], ["g"]).collect()
        }
        assert got[("a", 4)] == pytest.approx(2.0)
        assert got[("c", 1)] is None and got[("c", 2)] is None

    def test_spine_then_interpolate_composes(self, spark, sparse):
        dense = fill_date_gaps(sparse, "d", ["g"], fill={"cnt": None})
        got = {
            (r["g"], r["d"]): r["cnt"]
            for r in interpolate_linear(
                dense, "d", ["cnt"], ["g"]
            ).collect()
        }
        assert got[("a", _d("2024-01-02"))] == pytest.approx(20.0)
        assert got[("a", _d("2024-01-03"))] == pytest.approx(30.0)

    def test_single_exchange_for_all_windows(self, spark, holey):
        plan = (
            interpolate_linear(holey, "d", ["v"], ["g"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") <= 1


class TestExponentialSmoothing:
    """ewma / holt_linear: exact IEEE-fold equality against a Python
    reference fold (the operators' determinism contract), init
    conventions, grouping, and the no-extra-shuffle plan shape."""

    VALS = [10.0, 20.0, 15.0, 7.5, 33.25, 33.25, 0.0]

    @pytest.fixture()
    def series(self, spark):
        from harness_aws_etl_pipeline_spark.operators.timeseries import (
            ewma,
            holt_linear,
        )

        rows = [("a", i, v) for i, v in enumerate(self.VALS)]
        rows += [("b", i, float(i)) for i in range(3)]
        df = spark.createDataFrame(rows, "g string, o int, v double")
        return df, ewma, holt_linear

    def test_ewma_matches_reference_fold_exactly(self, series):
        df, ewma, _ = series
        got = {
            (r["g"], r["o"]): r["ewma"]
            for r in ewma(df, "o", "v", ["g"], alpha=0.3).collect()
        }
        s = self.VALS[0]
        exp = [s]
        for x in self.VALS[1:]:
            s = 0.3 * x + 0.7 * s
            exp.append(s)
        assert [got[("a", i)] for i in range(len(self.VALS))] == exp
        # independent group folds from its own first value
        assert got[("b", 0)] == 0.0
        assert got[("b", 1)] == 0.3 * 1.0 + 0.7 * 0.0

    def test_holt_matches_reference_fold_exactly(self, series):
        df, _, holt_linear = series
        got = {
            (r["g"], r["o"]): (r["level"], r["trend"])
            for r in holt_linear(
                df, "o", "v", ["g"], alpha=0.3, beta=0.2
            ).collect()
        }
        lvl, tr = self.VALS[0], 0.0
        exp = [(lvl, tr)]
        for x in self.VALS[1:]:
            nl = 0.3 * x + 0.7 * (lvl + tr)
            tr = 0.2 * (nl - lvl) + 0.8 * tr
            lvl = nl
            exp.append((lvl, tr))
        assert [got[("a", i)] for i in range(len(self.VALS))] == exp
        assert got[("b", 0)] == (0.0, 0.0)

    def test_alpha_bounds_and_ungrouped(self, series):
        df, ewma, holt_linear = series
        with pytest.raises(ValueError):
            ewma(df, "o", "v", ["g"], alpha=0.0)
        with pytest.raises(ValueError):
            holt_linear(df, "o", "v", ["g"], beta=1.5)
        one = df.filter(F.col("g") == "a")
        flat = ewma(one.select("o", "v"), "o", "v", alpha=1.0).collect()
        # alpha=1 tracks the input exactly
        assert all(r["ewma"] == r["v"] for r in flat)

    def test_single_exchange(self, series):
        df, ewma, _ = series
        plan = (
            ewma(df, "o", "v", ["g"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") <= 1


class TestSeasonalDecompose:
    def test_odd_period_matches_numpy(self, spark):
        import numpy as np

        from harness_aws_etl_pipeline_spark.operators.timeseries import (
            seasonal_decompose,
        )

        n, p = 35, 7
        seas = [3, -1, 0, 2, -2, -1, -1]
        rows = [(i, 10 + 0.5 * i + seas[i % p]) for i in range(n)]
        out = (
            seasonal_decompose(
                spark.createDataFrame(rows, "t long, v double"),
                "t", "v", p,
            )
            .orderBy("t")
            .collect()
        )
        v = np.array([r[1] for r in rows])
        trend = np.full(n, np.nan)
        for i in range(3, n - 3):
            trend[i] = v[i - 3 : i + 4].mean()
        detr = v - trend
        sm = np.array([np.nanmean(detr[k::p]) for k in range(p)])
        sm -= sm.mean()
        for i, r in enumerate(out):
            if np.isnan(trend[i]):
                assert r["trend"] is None and r["resid"] is None
            else:
                assert abs(r["trend"] - trend[i]) < 1e-9
                assert abs(r["resid"]) < 1e-9  # pure signal, no noise
            assert abs(r["seasonal"] - sm[i % p]) < 1e-9
            assert r["pos"] == i % p

    def test_even_period_two_sided_ma(self, spark):
        """Even period uses the textbook 2xMA: (period+1)-point window
        with half weights at the ends — on a pure linear series the
        trend must equal the series exactly wherever defined."""
        from harness_aws_etl_pipeline_spark.operators.timeseries import (
            seasonal_decompose,
        )

        rows = [(i, 2.0 * i + 5) for i in range(16)]
        out = (
            seasonal_decompose(
                spark.createDataFrame(rows, "t long, v double"),
                "t", "v", 4,
            )
            .orderBy("t")
            .collect()
        )
        defined = [r for r in out if r["trend"] is not None]
        # window is 5 rows -> rows 2..13 defined
        assert len(defined) == 12
        for r in defined:
            assert abs(r["trend"] - (2.0 * r["t"] + 5)) < 1e-9
            assert abs(r["resid"]) < 1e-9

    def test_grouped_and_guard(self, spark):
        import pytest as _pytest

        from harness_aws_etl_pipeline_spark.operators.timeseries import (
            seasonal_decompose,
        )

        rows = [("a", i, float(i % 3)) for i in range(9)] + [
            ("b", i, 5.0) for i in range(9)
        ]
        df = spark.createDataFrame(rows, "g string, t long, v double")
        out = seasonal_decompose(df, "t", "v", 3, ["g"]).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r["g"], []).append(r)
        assert len(by_g["a"]) == len(by_g["b"]) == 9
        # constant series: zero seasonal everywhere, resid 0 interior
        for r in by_g["b"]:
            assert abs(r["seasonal"]) < 1e-9
            if r["trend"] is not None:
                assert abs(r["resid"]) < 1e-9
        with _pytest.raises(ValueError, match="period"):
            seasonal_decompose(df, "t", "v", 1, ["g"])
