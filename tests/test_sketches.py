"""Space-saving heavy hitters (operators/sketches.py): exactness in
the no-eviction regime, bound soundness + certain-detection under
adversarial arrival order and tiny capacity, weighted equivalence,
guards, cache hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.sketches import heavy_hitters


def _exact(df, col):
    return {
        r["k"]: r["c"]
        for r in df.groupBy(F.col(col).cast("string").alias("k"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
        if r["k"] is not None
    }


class TestExactRegime:
    def test_matches_groupby_when_capacity_covers(self, spark):
        rows = [(f"k{i % 7}",) for i in range(200)] + [(None,)] * 5
        df = spark.createDataFrame(rows, "v string").repartition(8)
        got = heavy_hitters(df, "v", k=4, capacity=64).collect()
        exact = sorted(_exact(df, "v").items(), key=lambda kv: (-kv[1], kv[0]))
        assert [(r["rank"], r["key"]) for r in got] == [
            (i + 1, k) for i, (k, _) in enumerate(exact[:4])
        ]
        for r in got:
            # no eviction anywhere -> bounds collapse to the exact count
            assert r["count_min"] == r["count_max"] == dict(exact)[r["key"]]

    def test_guaranteed_flags_in_exact_regime(self, spark):
        # counts 30/20/10: with k=2 both survivors' lower bounds beat
        # the 3rd candidate's upper bound -> guaranteed
        rows = [("a",)] * 30 + [("b",)] * 20 + [("c",)] * 10
        df = spark.createDataFrame(rows, "v string").repartition(4)
        got = {r["key"]: r["guaranteed"]
               for r in heavy_hitters(df, "v", k=2, capacity=16).collect()}
        assert got == {"a": True, "b": True}
        # tie at the boundary: b and c both 20 -> b cannot be certain
        rows = [("a",)] * 30 + [("b",)] * 20 + [("c",)] * 20
        df = spark.createDataFrame(rows, "v string").repartition(4)
        got = {r["key"]: r["guaranteed"]
               for r in heavy_hitters(df, "v", k=2, capacity=16).collect()}
        assert got == {"a": True, "b": False}

    def test_deterministic_across_partitionings_when_exact(self, spark):
        rows = [(f"k{i % 11}",) for i in range(330)]
        df = spark.createDataFrame(rows, "v string")
        a = [tuple(r) for r in heavy_hitters(df.repartition(16), "v", k=5).collect()]
        b = [tuple(r) for r in heavy_hitters(df.coalesce(1), "v", k=5).collect()]
        assert a == b


class TestSketchRegime:
    def test_bounds_sound_and_heavy_keys_certain(self, spark):
        # 3 planted heavy keys among 2000 singletons, capacity far
        # below the distinct count, heavy rows arriving LAST in a
        # single partition (worst case for space-saving)
        rows = [(f"noise{i}",) for i in range(2000)]
        rows += [("hot_a",)] * 500 + [("hot_b",)] * 400 + [("hot_c",)] * 300
        df = spark.createDataFrame(rows, "v string").coalesce(1)
        exact = _exact(df, "v")
        got = heavy_hitters(df, "v", k=3, capacity=64).collect()
        by_key = {r["key"]: r for r in got}
        assert set(by_key) == {"hot_a", "hot_b", "hot_c"}
        for key, r in by_key.items():
            assert r["count_min"] <= exact[key] <= r["count_max"]
            assert r["guaranteed"]

    def test_bounds_sound_across_partitions(self, spark):
        # heavy key spread over many partitions + per-partition noise;
        # merged bounds must still bracket the exact counts
        rows = [("hot", i) for i in range(3000)]
        rows += [(f"noise{i}", i) for i in range(5000)]
        df = spark.createDataFrame(rows, "v string, i int").repartition(8, "i")
        exact = _exact(df, "v")
        got = heavy_hitters(df, "v", k=1, capacity=32).collect()
        assert len(got) == 1 and got[0]["key"] == "hot"
        assert got[0]["count_min"] <= exact["hot"] <= got[0]["count_max"]
        assert got[0]["guaranteed"]

    def test_weighted_equals_expansion_in_exact_regime(self, spark):
        w = spark.createDataFrame(
            [("a", 5), ("b", 3), ("a", 2), ("c", 1)], "v string, w int"
        )
        flat = spark.createDataFrame(
            [("a",)] * 7 + [("b",)] * 3 + [("c",)], "v string"
        )
        got_w = [tuple(r) for r in heavy_hitters(w, "v", k=3, weight="w").collect()]
        got_f = [tuple(r) for r in heavy_hitters(flat, "v", k=3).collect()]
        assert got_w == got_f
        # weights < 1 dropped
        neg = spark.createDataFrame([("a", 2), ("b", 0), ("c", -4)],
                                    "v string, w int")
        assert [r["key"] for r in heavy_hitters(neg, "v", k=5, weight="w").collect()] \
            == ["a"]


class TestEdges:
    def test_empty_and_all_null(self, spark):
        empty = spark.createDataFrame([], "v string")
        out = heavy_hitters(empty, "v", k=3)
        assert out.columns == ["rank", "key", "count_min", "count_max", "guaranteed"]
        assert out.count() == 0
        nulls = spark.createDataFrame([(None,), (None,)], "v string")
        assert heavy_hitters(nulls, "v", k=3).count() == 0

    def test_fewer_candidates_than_k(self, spark):
        df = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
        got = heavy_hitters(df, "v", k=10).collect()
        assert [(r["key"], r["count_min"]) for r in got] == [("a", 2), ("b", 1)]
        assert all(r["guaranteed"] for r in got)

    def test_guards(self, spark):
        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError, match="k must be"):
            heavy_hitters(df, "v", k=0)
        with pytest.raises(ValueError, match="capacity"):
            heavy_hitters(df, "v", k=10, capacity=5)

    def test_cache_hygiene(self, spark):
        from harness_aws_etl_pipeline_spark.operators.memo import clear_all_memos

        clear_all_memos()
        df = spark.createDataFrame([(f"k{i % 3}",) for i in range(30)], "v string")
        heavy_hitters(df, "v", k=2).collect()
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


class TestTopkCli:
    def test_topk_command(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main

        src = str(tmp_path / "keys")
        spark.createDataFrame(
            [("a",)] * 30 + [("b",)] * 20 + [("c",)] * 10, "v string"
        ).write.parquet(src)
        rc = main(["topk", "--input", src, "--col", "v", "--k", "2"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["status"] == "success"
        assert [(t["key"], t["count_min"], t["guaranteed"]) for t in res["top"]] \
            == [("a", 30, True), ("b", 20, True)]


class TestGroupedHeavyHitters:
    def test_exact_regime_matches_windowed_groupby(self, spark):
        from harness_aws_etl_pipeline_spark.operators.sketches import (
            heavy_hitters_by,
        )

        # strictly-decreasing per-key counts per group (ties with the
        # 3rd candidate would legitimately clear `guaranteed`)
        rows = [
            (g, f"k{j}")
            for g_i, g in enumerate(("en", "de", "fr"))
            for j in range(3 + g_i)
            for _ in range(50 - 10 * j + g_i)
        ]
        df = spark.createDataFrame(rows, "lang string, tok string").repartition(7)
        got = heavy_hitters_by(df, "lang", "tok", k=2).collect()
        from pyspark.sql import Window

        exact = (
            df.groupBy("lang", "tok")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tok"))
                ),
            )
            .filter(F.col("rank") <= 2)
            .collect()
        )
        exp = {(r["lang"], r["rank"]): (r["tok"], r["c"]) for r in exact}
        assert len(got) == len(exp) == 6
        for r in got:
            tok, c = exp[(r["grp"], r["rank"])]
            assert r["key"] == tok
            assert r["count_min"] == r["count_max"] == c  # exact regime
            assert r["guaranteed"]

    def test_groups_never_mix_and_bounds_sound(self, spark):
        from harness_aws_etl_pipeline_spark.operators.sketches import (
            heavy_hitters_by,
        )

        # group A: one hot key among many; group B: uniform junk that
        # would evict A's state if the groups shared a summary
        rows = [("A", "hot")] * 300 + [("A", f"a{i}") for i in range(40)]
        rows += [("B", f"b{i % 50}") for i in range(500)]
        df = spark.createDataFrame(rows, "g string, k string").repartition(5)
        got = heavy_hitters_by(df, "g", "k", k=1, capacity=8)
        byg = {r["grp"]: r for r in got.collect()}
        assert byg["A"]["key"] == "hot"
        assert byg["A"]["count_min"] <= 300 <= byg["A"]["count_max"]
        # B's uniform keys: top-1 exists with sound bounds
        assert byg["B"]["count_min"] <= 10 <= byg["B"]["count_max"]

    def test_weighted_and_null_groups_dropped(self, spark):
        from harness_aws_etl_pipeline_spark.operators.sketches import (
            heavy_hitters_by,
        )

        df = spark.createDataFrame(
            [("g", "x", 5), ("g", "y", 2), (None, "z", 9), ("g", None, 9)],
            "g string, k string, w int",
        )
        got = heavy_hitters_by(df, "g", "k", k=2, weight="w").collect()
        assert [(r["grp"], r["key"], r["count_max"]) for r in got] == [
            ("g", "x", 5),
            ("g", "y", 2),
        ]

    def test_guards(self, spark):
        from harness_aws_etl_pipeline_spark.operators.sketches import (
            heavy_hitters_by,
        )

        df = spark.createDataFrame([("g", "k")], "g string, k string")
        with pytest.raises(ValueError, match="k must be"):
            heavy_hitters_by(df, "g", "k", k=0)
        with pytest.raises(ValueError, match="capacity"):
            heavy_hitters_by(df, "g", "k", k=9, capacity=3)
