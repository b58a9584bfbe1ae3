"""Histogram + exact correlation (operators/histogram.py): bin
placement edges, empty-bin emission, clamping, NULLs, constant
columns, numpy parity for corr, and partitioning invariance of the
exact moment sums."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.histogram import corr_exact, histogram


class TestHistogram:
    def test_counts_and_edges(self, spark):
        df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
        rows = histogram(df, "v", bins=10).collect()
        assert [r["bin"] for r in rows] == list(range(10))
        assert all(r["cnt"] == 10 for r in rows)
        # max value lands in the LAST bin, not a phantom 11th
        assert rows[-1]["cnt"] == 10 and rows[-1]["hi"] == 99.0

    def test_empty_bins_emitted(self, spark):
        df = spark.createDataFrame([(0.0,), (9.99,)], "v double")
        rows = histogram(df, "v", bins=5).collect()
        assert len(rows) == 5
        assert [r["cnt"] for r in rows] == [1, 0, 0, 0, 1]

    def test_explicit_range_clamps(self, spark):
        df = spark.createDataFrame([(-5.0,), (2.0,), (99.0,)], "v double")
        rows = histogram(df, "v", bins=4, lo=0.0, hi=8.0).collect()
        assert rows[0]["cnt"] == 1  # -5 clamps into bin 0
        assert rows[1]["cnt"] == 1  # 2.0 -> [2, 4)
        assert rows[-1]["cnt"] == 1  # 99 clamps into the top bin

    def test_nulls_and_constant(self, spark):
        df = spark.createDataFrame([(None,), (3.0,), (3.0,)], "v double")
        rows = histogram(df, "v", bins=3).collect()
        assert sum(r["cnt"] for r in rows) == 2
        assert rows[0]["cnt"] == 2  # constant column -> all in bin 0

    def test_guard(self, spark):
        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError, match="bins"):
            histogram(df, "v", bins=0)


class TestCorr:
    def test_numpy_parity(self, spark):
        rng = np.random.default_rng(7)
        xv = rng.normal(50, 10, 500).round(4)
        yv = (0.7 * xv + rng.normal(0, 5, 500)).round(4)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(xv, yv)], "x double, y double"
        )
        got = corr_exact(df, "x", "y").first()
        assert got["n"] == 500
        assert got["corr"] == pytest.approx(np.corrcoef(xv, yv)[0, 1], abs=1e-6)

    def test_partitioning_invariance_bit_exact(self, spark):
        rng = np.random.default_rng(11)
        rows = [
            (float(a), float(b))
            for a, b in zip(
                rng.normal(0, 3, 400).round(4), rng.normal(0, 3, 400).round(4)
            )
        ]
        df = spark.createDataFrame(rows, "x double, y double")
        a = corr_exact(df.repartition(1), "x", "y").first()["corr"]
        b = corr_exact(df.repartition(13, "x"), "x", "y").first()["corr"]
        assert a == b  # EXACT equality: integer moments, one float expr

    def test_constant_and_null_pairs(self, spark):
        df = spark.createDataFrame(
            [(1.0, 5.0), (1.0, 7.0), (None, 9.0), (2.0, None)],
            "x double, y double",
        )
        r = corr_exact(df, "x", "y").first()
        assert r["n"] == 2 and r["corr"] is None  # x constant on the pairs

    def test_perfect_correlation(self, spark):
        df = spark.createDataFrame(
            [(float(i), float(2 * i + 3)) for i in range(50)], "x double, y double"
        )
        assert corr_exact(df, "x", "y").first()["corr"] == pytest.approx(1.0)


class TestProfileCli:
    def test_profile_with_corr(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main

        src = str(tmp_path / "prof")
        spark.range(0, 200).selectExpr(
            "CAST(id AS DOUBLE) AS x", "CAST(id * 3 AS DOUBLE) AS y"
        ).write.parquet(src)
        rc = main(["profile", "--input", src, "--col", "x",
                   "--bins", "4", "--corr-with", "y"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["n"] == 200 and res["min"] == 0.0 and res["max"] == 199.0
        assert [b["cnt"] for b in res["histogram"]] == [50, 50, 50, 50]
        assert res["corr"]["r"] == pytest.approx(1.0)


class TestCorrMatrix:
    def test_matches_corr_exact_per_pair(self, spark):
        from harness_aws_etl_pipeline_spark.operators.histogram import (
            corr_exact,
            corr_matrix,
        )

        rows = [
            (1.0, 2.0, -1.0),
            (2.0, 4.1, -2.0),
            (3.0, 5.9, -3.5),
            (4.0, 8.2, None),
            (None, 1.0, 5.0),
        ]
        df = spark.createDataFrame(rows, "a double, b double, c double")
        got = {
            (r["x"], r["y"]): (r["n"], r["corr"])
            for r in corr_matrix(df, ["a", "b", "c"]).collect()
        }
        assert len(got) == 6  # 3 diag + 3 upper
        for x, y in (("a", "b"), ("a", "c"), ("b", "c")):
            ref = corr_exact(df, x, y).first()
            assert got[(x, y)] == (ref["n"], ref["corr"]), (x, y)
        # diagonal: perfectly self-correlated (same fixed chain)
        assert got[("a", "a")][1] == pytest.approx(1.0)
        # pairwise-complete counts differ per pair
        assert got[("a", "b")][0] == 4 and got[("a", "c")][0] == 3

    def test_single_aggregate_pass(self, spark):
        from harness_aws_etl_pipeline_spark.operators.histogram import (
            corr_matrix,
        )

        df = spark.createDataFrame(
            [(float(i), float(i * i)) for i in range(10)],
            "a double, b double",
        )
        out = corr_matrix(df, ["a", "b"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        # one global aggregate: a single pair of HashAggregates
        assert plan.count("HashAggregate") <= 2
        constant = corr_matrix(
            df.withColumn("k", F.lit(1.0)), ["a", "k"]
        ).collect()
        flat = {(r["x"], r["y"]): r["corr"] for r in constant}
        assert flat[("a", "k")] is None and flat[("k", "k")] is None

    def test_empty_cols_guard(self, spark):
        from harness_aws_etl_pipeline_spark.operators.histogram import (
            corr_matrix,
        )

        df = spark.createDataFrame([(1.0,)], "a double")
        with pytest.raises(ValueError):
            corr_matrix(df, [])


class TestCorrMoments:
    def test_include_moments_exact(self, spark):
        df = spark.createDataFrame(
            [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0)], "x double, y double"
        )
        r = corr_exact(df, "x", "y", include_moments=True).first()
        s = 10_000
        xs = [1 * s, 2 * s, 3 * s]
        ys = [2 * s, 4 * s, 6 * s]
        assert int(r["sx"]) == sum(xs)
        assert int(r["sy"]) == sum(ys)
        assert int(r["sxx"]) == sum(v * v for v in xs)
        assert int(r["syy"]) == sum(v * v for v in ys)
        assert int(r["sxy"]) == sum(a * b for a, b in zip(xs, ys))
        assert abs(r["corr"] - 1.0) < 1e-12

    def test_matrix_duplicate_cols_do_not_collide(self, spark):
        from harness_aws_etl_pipeline_spark.operators.histogram import (
            corr_matrix,
        )

        df = spark.createDataFrame(
            [(1.0, 9.0), (2.0, 7.0), (3.0, 5.0)], "a double, b double"
        )
        out = corr_matrix(df, ["a", "b", "a"]).collect()
        # 3 cols -> 6 unordered pairs; (a,a) appears as (0,0), (0,2)
        # and (2,2) — once all three collided into one broken tag
        assert len(out) == 6
        diag = [r for r in out if r["x"] == "a" and r["y"] == "a"]
        assert len(diag) == 3
        assert all(abs(r["corr"] - 1.0) < 1e-12 for r in diag)

    def test_matrix_moments_match_corr_exact(self, spark):
        from harness_aws_etl_pipeline_spark.operators.histogram import (
            corr_matrix,
        )

        df = spark.createDataFrame(
            [(1.0, 9.0), (2.0, 7.0), (3.0, 6.0)], "a double, b double"
        )
        cell = {
            (r["x"], r["y"]): r
            for r in corr_matrix(
                df, ["a", "b"], include_moments=True
            ).collect()
        }[("a", "b")]
        ref = corr_exact(df, "a", "b", include_moments=True).first()
        for k in ("n", "sx", "sy", "sxx", "syy", "sxy"):
            assert cell[k] == ref[k]
        assert cell["corr"] == ref["corr"]
