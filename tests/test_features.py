"""Feature prep (operators/features.py) and weighted sampling
(operators/sampling.py:sample_weighted_n): encoding correctness,
determinism, schema stability, cardinality guards, and the A-Res
membership/weighting properties."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.features import (
    feature_slot,
    hash_features,
    one_hot,
)
from harness_aws_etl_pipeline_spark.operators.sampling import (
    sample_weighted_n,
)


@pytest.fixture()
def cats(spark):
    rows = [
        (1, "en", "web"),
        (2, "fr", "web"),
        (3, "en", None),
        (4, None, "book"),
    ]
    return spark.createDataFrame(rows, "id long, lang string, src string")


class TestOneHot:
    def test_indicators_and_sorted_schema(self, cats):
        out = one_hot(cats, "lang")
        assert [c for c in out.columns if c.startswith("lang__")] == [
            "lang__en",
            "lang__fr",
        ]
        got = {r["id"]: (r["lang__en"], r["lang__fr"]) for r in out.collect()}
        assert got[1] == (1, 0)
        assert got[2] == (0, 1)
        assert got[4] == (0, 0)  # NULL → all zeros

    def test_explicit_values_pin_schema(self, cats):
        out = one_hot(cats, "lang", values=["en", "de"])
        assert [c for c in out.columns if c.startswith("lang__")] == [
            "lang__de",
            "lang__en",
        ]
        got = {r["id"]: r["lang__de"] for r in out.collect()}
        assert all(v == 0 for v in got.values())

    def test_cardinality_guard(self, spark):
        df = spark.range(50).withColumn("v", F.col("id").cast("string"))
        with pytest.raises(ValueError, match="distinct"):
            one_hot(df, "v", max_values=10)

    def test_no_shuffle_with_pinned_values(self, cats):
        plan = (
            one_hot(cats, "lang", values=["en", "fr"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestHashFeatures:
    def test_slot_matches_hashlib(self, spark):
        df = spark.createDataFrame([("en",)], "lang string")
        slot = df.select(
            feature_slot(F.concat(F.lit("lang="), F.col("lang")), 256).alias("s")
        ).first()["s"]
        exp = int(hashlib.md5(b"lang=en").hexdigest()[:8], 16) % 256
        assert slot == exp

    def test_array_sorted_distinct_null_safe(self, cats):
        out = {
            r["id"]: r["features"]
            for r in hash_features(cats, ["lang", "src"], dims=64).collect()
        }

        def slot(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 64

        assert out[1] == sorted({slot("lang=en"), slot("src=web")})
        assert out[3] == [slot("lang=en")]  # NULL src contributes nothing
        assert out[4] == [slot("src=book")]

    def test_dims_guard(self, cats):
        with pytest.raises(ValueError):
            hash_features(cats, ["lang"], dims=0)


class TestWeightedSample:
    @pytest.fixture()
    def weighted(self, spark):
        rows = [(i, float(1 + (i % 7)), "g%d" % (i % 2)) for i in range(200)]
        return spark.createDataFrame(rows, "id long, w double, g string")

    @staticmethod
    def _exp_jump(key, salt, w):
        u_int = int(
            hashlib.md5(f"{key}|{salt}".encode()).hexdigest()[:8], 16
        )
        return -math.log((u_int + 1) / 4294967296.0) / w

    def test_matches_reference_ares(self, weighted):
        got = sorted(
            r["id"] for r in sample_weighted_n(weighted, 20, "w", "id").collect()
        )
        rows = weighted.collect()
        exp = sorted(
            i
            for i, _ in sorted(
                ((r["id"], self._exp_jump(r["id"], 0, r["w"])) for r in rows),
                key=lambda t: (t[1], t[0]),
            )[:20]
        )
        assert got == exp

    def test_weight_bias(self, spark):
        # two-point corpus: weight-9 rows should dominate weight-1 rows
        rows = [(i, 9.0 if i % 2 == 0 else 1.0) for i in range(2000)]
        df = spark.createDataFrame(rows, "id long, w double")
        heavy = sum(
            1
            for r in sample_weighted_n(df, 400, "w", "id", salt=3).collect()
            if r["id"] % 2 == 0
        )
        # E[heavy] ≈ 360 of 400; binomial-ish tail makes < 300 absurd
        assert heavy > 300

    def test_grouped_and_nonpositive_weights(self, weighted):
        df = weighted.withColumn(
            "w", F.when(F.col("id") < 10, F.lit(-1.0)).otherwise(F.col("w"))
        )
        out = sample_weighted_n(df, 5, "w", "id", group_cols=["g"])
        rows = out.collect()
        assert len(rows) == 10  # 5 per group
        assert all(r["id"] >= 10 for r in rows)  # w<=0 excluded
        per_g = {g: 0 for g in ("g0", "g1")}
        for r in rows:
            per_g[r["g"]] += 1
        assert per_g == {"g0": 5, "g1": 5}

    def test_take_ordered_plan(self, weighted):
        plan = (
            sample_weighted_n(weighted, 5, "w", "id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan


class TestScaling:
    @pytest.fixture()
    def nums(self, spark):
        rows = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 5.0),
                ("a", None)]
        return spark.createDataFrame(rows, "g string, v double")

    def test_standard_scale_exact(self, spark, nums):
        from harness_aws_etl_pipeline_spark.operators.features import (
            standard_scale,
        )

        got = standard_scale(nums, ["v"], ["g"]).collect()
        by = {}
        for r in got:
            by.setdefault(r["g"], []).append((r["v"], r["v_z"]))
        # group a: mean 2, pop std sqrt(2/3) on the scaled axis
        n, s1, s2 = 3.0, 60000.0, 1400000000.0
        z = lambda x: (round(x * 10000) - s1 / n) / (
            ((n * s2 - s1 * s1) ** 0.5) / n
        )
        for v, vz in by["a"]:
            if v is None:
                assert vz is None
            else:
                assert vz == z(v)
        # constant group b → NULL
        assert all(vz is None for _, vz in by["b"])

    def test_minmax_scale(self, spark, nums):
        from harness_aws_etl_pipeline_spark.operators.features import (
            minmax_scale,
        )

        got = {
            (r["g"], r["v"]): r["v_mm"]
            for r in minmax_scale(nums, ["v"], ["g"]).collect()
        }
        assert got[("a", 1.0)] == 0.0
        assert got[("a", 2.0)] == 0.5
        assert got[("a", 3.0)] == 1.0
        assert got[("b", 5.0)] is None  # constant group
        assert got[("a", None)] is None

    def test_global_scaling_broadcasts(self, spark, nums):
        from harness_aws_etl_pipeline_spark.operators.features import (
            minmax_scale,
            standard_scale,
        )

        out = standard_scale(nums.select("v"), ["v"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan
        got = sorted(
            r["v_mm"]
            for r in minmax_scale(nums.select("v"), ["v"]).collect()
            if r["v_mm"] is not None
        )
        assert got[0] == 0.0 and got[-1] == 1.0


class TestRobustScale:
    def test_exact_median_iqr_chain(self, spark):
        from harness_aws_etl_pipeline_spark.operators.features import (
            robust_scale,
        )

        # 0..8: q1 = rank floor(.25*8)=2 → 2.0, med = 4.0, q3 = 6.0
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(9)] + [(99, None)],
            "id long, v double",
        )
        got = {r["id"]: r["v_rs"] for r in robust_scale(df, ["v"]).collect()}
        for i in range(9):
            assert got[i] == (float(i) - 4.0) / (6.0 - 2.0)
        assert got[99] is None

    def test_zero_iqr_scales_null(self, spark):
        from harness_aws_etl_pipeline_spark.operators.features import (
            robust_scale,
        )

        df = spark.createDataFrame(
            [(i, 5.0) for i in range(10)], "id long, v double"
        )
        got = [r["v_rs"] for r in robust_scale(df, ["v"]).collect()]
        assert all(v is None for v in got)


class TestOneHotGuards:
    def test_sanitized_collision_raises(self, spark):
        df = spark.createDataFrame([("a.b",), ("a_b",)], "v string")
        with pytest.raises(ValueError, match="sanitize to column"):
            one_hot(df, "v")

    def test_null_does_not_occupy_guard_slot(self, spark):
        # 3 non-null values + NULL with max_values=3 must encode all
        # three (NULL once rode the limit and evicted one value)
        df = spark.createDataFrame(
            [("x",), ("y",), ("z",), (None,)], "v string"
        )
        out = one_hot(df, "v", max_values=3)
        assert [c for c in out.columns if c.startswith("v__")] == [
            "v__x", "v__y", "v__z",
        ]

    def test_guard_still_fires_past_max(self, spark):
        df = spark.createDataFrame(
            [("a",), ("b",), ("c",), ("d",), (None,)], "v string"
        )
        with pytest.raises(ValueError, match="distinct values"):
            one_hot(df, "v", max_values=3)


class TestScaleOutlierCounts:
    def test_matches_float_scalers(self, spark):
        """The exact decimal inequalities must agree with the float
        z/mm columns wherever the float value is not borderline —
        on this fixture nothing is within 1e-9 of a boundary, so the
        counts must match the scalers' outputs exactly."""
        from harness_aws_etl_pipeline_spark.operators.features import (
            minmax_scale,
            scale_outlier_counts,
            standard_scale,
        )

        rows = [
            ("a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 100]
        ] + [("b", 5.0), ("b", 5.0), ("a", None), (None, 3.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        got = scale_outlier_counts(df, "v", ["g"]).first()
        z = standard_scale(df, ["v"], ["g"]).collect()
        mm = minmax_scale(df, ["v"], ["g"]).collect()
        z_vals = [r["v_z"] for r in z if r["v_z"] is not None]
        mm_vals = [r["v_mm"] for r in mm if r["v_mm"] is not None]
        assert got["z_rows"] == len(z_vals)
        assert got["z_hi_cnt"] == sum(1 for x in z_vals if x > 1)
        assert got["z_lo_cnt"] == sum(1 for x in z_vals if x < -1)
        assert got["mm_rows"] == len(mm_vals)
        assert got["mm_hi_cnt"] == sum(1 for x in mm_vals if x > 0.5)

    def test_global_no_groups(self, spark):
        from harness_aws_etl_pipeline_spark.operators.features import (
            scale_outlier_counts,
        )

        df = spark.createDataFrame(
            [(float(v),) for v in [0, 0, 0, 10]], "v double"
        )
        got = scale_outlier_counts(df, "v").first()
        # mean 2.5, std sqrt(18.75): only 10 has z>1; mm: only 10 > .5
        assert (
            got["z_rows"], got["z_hi_cnt"], got["z_lo_cnt"],
            got["mm_rows"], got["mm_hi_cnt"],
        ) == (4, 1, 0, 4, 1)
