"""Robust outliers (operators/outliers.py): the exact-integer flags
must equal their float definitions on planted data, edges (constant
groups, short windows, even counts) behave, and the rolling variant
keeps a single group-key exchange."""

from __future__ import annotations

import statistics

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.outliers import (
    iqr_outliers,
    mad_outliers,
    rolling_zscore,
)


class TestRollingZ:
    def test_flags_match_float_definition(self, spark):
        vals = [10.0, 11.0, 9.0, 10.5, 10.0, 50.0, 10.0, 9.5, 11.0, 10.2]
        rows = [("a", i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "g string, t int, v double")
        got = {
            r["t"]: (r["is_outlier"], r["zscore"])
            for r in rolling_zscore(
                df, "t", "v", ["g"], window=5, k=2, min_periods=3
            ).collect()
        }
        for i, v in enumerate(vals):
            lo = max(0, i - 4)
            win = vals[lo : i + 1]
            if len(win) < 3:
                assert got[i][0] is False and got[i][1] is None
                continue
            mean = sum(win) / len(win)
            var = sum((x - mean) ** 2 for x in win) / len(win)
            expect = var > 0 and abs(v - mean) > 2 * var**0.5
            assert got[i][0] == expect, f"t={i}"
            if var > 0:
                assert got[i][1] == pytest.approx(
                    (v - mean) / var**0.5, rel=1e-9
                )

    def test_constant_window_no_flag_null_z(self, spark):
        df = spark.createDataFrame(
            [("a", i, 5.0) for i in range(6)], "g string, t int, v double"
        )
        out = rolling_zscore(df, "t", "v", ["g"], window=4).collect()
        assert all(not r["is_outlier"] and r["zscore"] is None for r in out)

    def test_single_exchange(self, spark):
        df = spark.createDataFrame(
            [("a", i, float(i)) for i in range(8)],
            "g string, t int, v double",
        )
        plan = (
            rolling_zscore(df, "t", "v", ["g"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") <= 1


class TestMad:
    def test_flags_match_float_definition(self, spark):
        data = {
            "a": [1.0, 2.0, 2.5, 3.0, 2.2, 100.0, 2.8],
            "b": [5.0, 5.0, 5.0, 5.0],          # constant: MAD 0
            "c": [1.0, 2.0, 3.0, 4.0],          # even count
        }
        rows = [(g, v) for g, vs in data.items() for v in vs]
        df = spark.createDataFrame(rows, "g string, v double")
        got = [
            ((r["g"], r["v"]), r["is_outlier"])
            for r in mad_outliers(df, "v", ["g"], k=3).collect()
        ]
        for (g, v), flag in got:
            med = statistics.median(data[g])
            mad = statistics.median([abs(x - med) for x in data[g]])
            assert flag == (abs(v - med) > 3 * mad), (g, v)

    def test_ungrouped(self, spark):
        df = spark.createDataFrame(
            [(v,) for v in [1.0, 1.1, 0.9, 1.0, 40.0]], "v double"
        )
        got = {r["v"]: r["is_outlier"] for r in mad_outliers(df, "v").collect()}
        assert got[40.0] is True and got[1.0] is False

    def test_original_columns_survive(self, spark):
        df = spark.createDataFrame([("a", 1, 2.0)], "g string, id int, v double")
        out = mad_outliers(df, "v", ["g"])
        assert set(out.columns) == {"g", "id", "v", "is_outlier"}


class TestIqr:
    def test_flags_match_float_definition(self, spark):
        import numpy as np

        data = {
            "a": [1.0, 2.0, 2.5, 3.0, 2.2, 100.0, 2.8, -50.0],
            "c": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
        rows = [(g, v) for g, vs in data.items() for v in vs]
        df = spark.createDataFrame(rows, "g string, v double")
        got = [
            ((r["g"], r["v"]), r["is_outlier"])
            for r in iqr_outliers(df, "v", ["g"]).collect()
        ]
        for (g, v), flag in got:
            q1, q3 = np.percentile(data[g], [25, 75])  # linear interp
            iqr = q3 - q1
            expect = v < q1 - 1.5 * iqr or v > q3 + 1.5 * iqr
            assert flag == expect, (g, v)

    def test_wider_fence_flags_less(self, spark):
        vals = [1.0, 2.0, 2.5, 3.0, 2.2, 9.0, 2.8]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        strict = sum(
            r["is_outlier"] for r in iqr_outliers(df, "v", k_halves=1).collect()
        )
        loose = sum(
            r["is_outlier"] for r in iqr_outliers(df, "v", k_halves=6).collect()
        )
        assert strict >= loose
