"""Exact distributed quantiles (operators/quantiles.py): rank
selection matches a driver-side sort, partitioning independence,
NULL handling, duplicate-heavy ties, endpoints, approx cross-check."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.quantiles import (
    exact_quantiles,
    quantile_check,
)


def _truth(vals, qs):
    sv = sorted(vals)
    n = len(sv)
    return {q: (int(q * (n - 1)), sv[int(q * (n - 1))]) for q in qs}


class TestExact:
    def test_matches_sorted_truth(self, spark):
        rng = random.Random(11)
        vals = [rng.uniform(-500, 500) for _ in range(4001)]
        df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(16)
        qs = [0.0, 0.1, 0.5, 0.9, 0.999, 1.0]
        truth = _truth(vals, qs)
        for r in exact_quantiles(df, "v", qs).collect():
            k, want = truth[r["q"]]
            assert r["rank"] == k
            assert r["value"] == want

    def test_partitioning_independent(self, spark):
        vals = [float(i % 97) for i in range(3000)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        a = exact_quantiles(df.repartition(32), "v", [0.25, 0.75]).collect()
        b = exact_quantiles(
            df.orderBy(F.desc("v")).coalesce(1), "v", [0.25, 0.75]
        ).collect()
        assert [(r["q"], r["rank"], r["value"]) for r in a] == [
            (r["q"], r["rank"], r["value"]) for r in b
        ]

    def test_ties_and_nulls(self, spark):
        # heavy duplication: the value at any rank is well-defined
        # regardless of tie placement across range partitions
        vals = [1.0] * 500 + [2.0] * 10 + [3.0] * 490
        rows = [(v,) for v in vals] + [(None,)] * 25
        df = spark.createDataFrame(rows, "v double").repartition(8)
        got = {r["q"]: r["value"] for r in
               exact_quantiles(df, "v", [0.0, 0.4, 0.5, 0.52, 1.0]).collect()}
        truth = _truth(vals, [0.0, 0.4, 0.5, 0.52, 1.0])
        assert got == {q: v for q, (_, v) in truth.items()}

    def test_integer_column_type_preserved(self, spark):
        df = spark.createDataFrame([(i,) for i in range(100)], "v long")
        row = exact_quantiles(df, "v", [0.5]).first()
        assert row["value"] == 49 and isinstance(row["value"], int)

    def test_guards(self, spark):
        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError, match="non-empty"):
            exact_quantiles(df, "v", [])
        with pytest.raises(ValueError, match="outside"):
            exact_quantiles(df, "v", [1.5])
        allnull = spark.createDataFrame([(None,)], "v double")
        with pytest.raises(ValueError, match="no non-NULL"):
            exact_quantiles(allnull, "v", [0.5])


class TestApproxCheck:
    def test_band_holds(self, spark):
        vals = [float(i) for i in range(20_000)]
        df = spark.createDataFrame([(v,) for v in vals], "v double").repartition(8)
        row = quantile_check(df, "v", [0.5, 0.9, 0.99], rel_err=1e-3).first()
        assert row["quantiles_checked"] == 3
        assert row["approx_within_band"] is True


class TestQuantileBucket:
    def test_quartile_assignment_and_ties(self, spark):
        from harness_aws_etl_pipeline_spark.operators.quantiles import (
            quantile_bucket,
        )

        # 0..7: cuts at ranks floor(.25*7)=1, floor(.5*7)=3, floor(.75*7)=5
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(8)], "id long, v double"
        )
        got = {
            r["id"]: r["v_qb"] for r in quantile_bucket(df, "v", 4).collect()
        }
        # cuts = 1.0, 3.0, 5.0 ; ties land LOW (x > cut strictly)
        assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 3}

    def test_nulls_and_guard(self, spark):
        from harness_aws_etl_pipeline_spark.operators.quantiles import (
            quantile_bucket,
        )

        df = spark.createDataFrame(
            [(1, 1.0), (2, None), (3, 9.0)], "id long, v double"
        )
        got = {
            r["id"]: r["v_qb"] for r in quantile_bucket(df, "v", 2).collect()
        }
        assert got[2] is None
        assert got[1] == 0 and got[3] == 1
        import pytest as _p

        with _p.raises(ValueError):
            quantile_bucket(df, "v", 1)

    def test_heavy_ties_stay_deterministic(self, spark):
        from harness_aws_etl_pipeline_spark.operators.quantiles import (
            quantile_bucket,
        )

        rows = [(i, 5.0) for i in range(20)] + [(100, 9.0)]
        df = spark.createDataFrame(rows, "id long, v double")
        got = {r["id"]: r["v_qb"] for r in quantile_bucket(df, "v", 4).collect()}
        # all cuts equal 5.0 → every tied row is bucket 0, outlier top
        assert all(v == 0 for k, v in got.items() if k != 100)
        assert got[100] == 3
