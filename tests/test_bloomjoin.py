"""Bloom join pruning (operators/bloomjoin.py): result equality with
the plain join (the no-false-negatives guarantee), actual pruning
power on a selective build side, NULL/string keys, empty build side,
cross-partitioning determinism, and the no-shuffle probe plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.bloomjoin import (
    bloom_build,
    bloom_join,
    bloom_prune,
)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestEquality:
    def test_inner_equals_plain_join(self, spark):
        big = spark.range(0, 5000).select(
            (F.col("id") % 700).alias("k"), F.col("id").alias("v")
        )
        small = spark.range(0, 50).select(
            (F.col("id") * 13).alias("k"), (F.col("id") + 100).alias("w")
        )
        got = bloom_join(big, small, "k")
        exp = big.join(small, "k")
        assert _sorted_rows(got) == _sorted_rows(exp)

    def test_left_semi_equals_plain(self, spark):
        big = spark.range(0, 3000).select((F.col("id") % 400).alias("k"))
        small = spark.range(0, 20).select((F.col("id") * 7).alias("k"))
        got = bloom_join(big, small, "k", how="left_semi")
        exp = big.join(small, "k", "left_semi")
        assert _sorted_rows(got) == _sorted_rows(exp)

    def test_differing_key_names(self, spark):
        big = spark.range(0, 1000).select((F.col("id") % 100).alias("bk"))
        small = spark.range(0, 10).select((F.col("id") * 11).alias("sk"))
        got = bloom_join(big, small, ("bk", "sk"))
        exp = big.join(small, big["bk"] == small["sk"])
        assert _sorted_rows(got) == _sorted_rows(exp)

    def test_string_keys(self, spark):
        big = spark.createDataFrame(
            [(f"host{i % 37}.com",) for i in range(500)], "k string"
        )
        small = spark.createDataFrame(
            [("host3.com",), ("host11.com",), ("absent.com",)], "k string"
        )
        got = bloom_join(big, small, "k")
        exp = big.join(small, "k")
        assert _sorted_rows(got) == _sorted_rows(exp)

    def test_null_keys_never_match(self, spark):
        big = spark.createDataFrame(
            [(None, 1), (2, 2), (3, 3)], "k int, v int"
        )
        small = spark.createDataFrame([(None,), (2,)], "k int")
        got = bloom_join(big, small, "k")
        exp = big.join(small, "k")
        assert _sorted_rows(got) == _sorted_rows(exp) == [(2, 2)]

    def test_outer_rejected(self, spark):
        df = spark.range(1).select(F.col("id").alias("k"))
        with pytest.raises(ValueError, match="unmatched big-side"):
            bloom_join(df, df, "k", how="left")


class TestPruning:
    def test_prunes_most_nonmatching_rows(self, spark):
        # 10k fact rows over 1000 distinct keys, build side covers 10
        # keys -> ~99% of rows should be gone after the prune (Bloom
        # fp ~1% at m=10n) even BEFORE the join runs
        big = spark.range(0, 10_000).select((F.col("id") % 1000).alias("k"))
        small = spark.range(0, 10).select((F.col("id") * 97).alias("k"))
        bloom = bloom_build(small, "k")
        kept = bloom_prune(big, "k", bloom)
        matching = big.join(small, "k", "left_semi").count()
        assert matching <= kept.count() <= matching + 0.05 * big.count()

    def test_empty_build_side_prunes_everything(self, spark):
        big = spark.range(0, 100).select(F.col("id").alias("k"))
        small = spark.range(0).select(F.col("id").alias("k"))
        assert bloom_join(big, small, "k").count() == 0
        assert bloom_prune(big, "k", bloom_build(small, "k")).count() == 0

    def test_duplicate_build_keys_harmless(self, spark):
        small = spark.createDataFrame([(5,)] * 50 + [(9,)], "k int")
        big = spark.range(0, 20).select(F.col("id").alias("k"))
        bloom = bloom_build(small, "k")
        kept = {r["k"] for r in bloom_prune(big, "k", bloom).collect()}
        assert {5, 9} <= kept


class TestDeterminismAndPlan:
    def test_partitioning_invariance(self, spark):
        big = spark.range(0, 2000).select((F.col("id") % 300).alias("k"))
        small = spark.range(0, 15).select((F.col("id") * 19).alias("k"))
        bloom = bloom_build(small, "k")
        a = _sorted_rows(bloom_prune(big.repartition(1), "k", bloom))
        b = _sorted_rows(bloom_prune(big.repartition(17, "k"), "k", bloom))
        assert a == b

    def test_probe_side_has_no_exchange(self, spark):
        big = spark.range(0, 100).select(F.col("id").alias("k"))
        small = spark.range(0, 5).select(F.col("id").alias("k"))
        plan = bloom_prune(
            big, "k", bloom_build(small, "k")
        )._jdf.queryExecution().executedPlan().toString()
        # the probe side is broadcast + filter only: every hash
        # exchange in the plan belongs to the BUILD side's bitmap
        # groupBy (keyed _w) — the big side's key is never shuffled
        import re

        keys = re.findall(r"Exchange (?:hash|range)partitioning\((\w+)", plan)
        assert keys and all(k.startswith("_w") for k in keys), plan

    def test_explicit_sizing_validated(self, spark):
        df = spark.range(1).select(F.col("id").alias("k"))
        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_build(df, "k", num_bits=100)
        with pytest.raises(ValueError, match="num_hashes"):
            bloom_build(df, "k", num_hashes=0)


class TestAntiJoin:
    def test_anti_equals_plain(self, spark):
        from harness_aws_etl_pipeline_spark.operators.bloomjoin import (
            bloom_anti_join,
        )

        big = spark.range(0, 4000).select(
            (F.col("id") % 500).alias("k"), F.col("id").alias("v")
        )
        small = spark.range(0, 30).select((F.col("id") * 17).alias("k"))
        got = bloom_anti_join(big, small, "k")
        exp = big.join(small, "k", "left_anti")
        assert _sorted_rows(got) == _sorted_rows(exp)

    def test_null_keys_kept(self, spark):
        from harness_aws_etl_pipeline_spark.operators.bloomjoin import (
            bloom_anti_join,
        )

        big = spark.createDataFrame(
            [(None, 1), (2, 2), (3, 3)], "k int, v int"
        )
        small = spark.createDataFrame([(2,)], "k int")
        key = lambda t: tuple((x is None, x) for x in t)  # None-safe sort
        got = sorted((tuple(r) for r in bloom_anti_join(big, small, "k").collect()), key=key)
        exp = sorted((tuple(r) for r in big.join(small, "k", "left_anti").collect()), key=key)
        assert got == exp
        assert (None, 1) in got  # NULL never matches -> survives anti

    def test_empty_blocklist_keeps_everything(self, spark):
        from harness_aws_etl_pipeline_spark.operators.bloomjoin import (
            bloom_anti_join,
        )

        big = spark.range(0, 50).select(F.col("id").alias("k"))
        small = spark.range(0).select(F.col("id").alias("k"))
        assert bloom_anti_join(big, small, "k").count() == 50

    def test_differing_key_names(self, spark):
        from harness_aws_etl_pipeline_spark.operators.bloomjoin import (
            bloom_anti_join,
        )

        big = spark.range(0, 300).select((F.col("id") % 40).alias("bk"))
        small = spark.range(0, 5).select((F.col("id") * 7).alias("sk"))
        got = bloom_anti_join(big, small, ("bk", "sk"))
        exp = big.join(small, big["bk"] == small["sk"], "left_anti")
        assert _sorted_rows(got) == _sorted_rows(exp)


class TestTypeGuard:
    def test_mismatched_key_families_raise(self, spark):
        from decimal import Decimal

        from harness_aws_etl_pipeline_spark.operators.bloomjoin import (
            bloom_anti_join,
        )

        big = spark.range(0, 100).select(F.col("id").alias("k"))
        small = spark.createDataFrame(
            [(Decimal(5),), (Decimal(9),)], "k decimal(10,0)"
        )
        bloom = bloom_build(small, "k")
        with pytest.raises(ValueError, match="canonical type"):
            bloom_prune(big, "k", bloom)
        with pytest.raises(ValueError, match="canonical type"):
            bloom_anti_join(big, small, "k")
        with pytest.raises(ValueError, match="canonical type"):
            bloom_join(big, small, "k")

    def test_int_widths_and_float_double_reconcile(self, spark):
        big = spark.range(0, 50).select(F.col("id").cast("int").alias("k"))
        small = spark.range(0, 10).select(
            (F.col("id") * 5).cast("bigint").alias("k")
        )
        got = _sorted_rows(bloom_join(big, small, "k"))
        exp = _sorted_rows(big.join(small, "k"))
        assert got == exp and len(got) == 10

    def test_anti_join_persist_path_equal(self, spark):
        from harness_aws_etl_pipeline_spark.operators.bloomjoin import (
            bloom_anti_join,
        )

        big = spark.range(0, 500).select((F.col("id") % 80).alias("k"))
        small = spark.range(0, 9).select((F.col("id") * 7).alias("k"))
        got = _sorted_rows(bloom_anti_join(big, small, "k", persist=True))
        exp = _sorted_rows(big.join(small, "k", "left_anti"))
        assert got == exp
