"""Blocked fuzzy string join (operators/fuzzyjoin.py): equality with
the naive cross-join filter (length banding is lossless), single
emission per pair, prefix-mode subsetting, exact-match degenerate,
NULLs, and column-collision suffixing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.fuzzyjoin import fuzzy_string_join

LEFT = ["anna", "johnny", "catherine", "bob", "xy", "zebra"]
RIGHT = ["ana", "jonny", "katherine", "rob", "x", "zebras", "completely-else"]


def _frames(spark):
    l = spark.createDataFrame([(i, w) for i, w in enumerate(LEFT)], "lid int, name string")
    r = spark.createDataFrame([(i, w) for i, w in enumerate(RIGHT)], "rid int, word string")
    return l, r


class TestEquality:
    @pytest.mark.parametrize("k", [0, 1, 2])
    def test_equals_naive_filter(self, spark, k):
        l, r = _frames(spark)
        got = {
            (x["lid"], x["rid"], x["edit_dist"])
            for x in fuzzy_string_join(l, r, "name", "word", max_dist=k).collect()
        }
        exp = {
            (x["lid"], x["rid"], x["d"])
            for x in l.crossJoin(r)
            .withColumn("d", F.levenshtein("name", "word"))
            .filter(F.col("d") <= k)
            .collect()
        }
        assert got == exp

    def test_single_emission_per_pair(self, spark):
        l, r = _frames(spark)
        out = fuzzy_string_join(l, r, "name", "word", max_dist=2)
        assert out.count() == out.select("lid", "rid").distinct().count()

    def test_prefix_mode_is_subset(self, spark):
        l, r = _frames(spark)
        full = {
            (x["lid"], x["rid"])
            for x in fuzzy_string_join(l, r, "name", "word", max_dist=2).collect()
        }
        pre = {
            (x["lid"], x["rid"])
            for x in fuzzy_string_join(
                l, r, "name", "word", max_dist=2, prefix_len=1
            ).collect()
        }
        assert pre <= full
        # 'catherine'/'katherine' differ in the first char: dropped
        assert (2, 2) in full and (2, 2) not in pre

    def test_nulls_and_collisions(self, spark):
        l = spark.createDataFrame([(1, None), (2, "abc")], "id int, s string")
        r = spark.createDataFrame([(9, "abd"), (8, None)], "id int, s string")
        rows = fuzzy_string_join(l, r, "s", "s", max_dist=1).collect()
        assert len(rows) == 1
        assert rows[0]["id"] == 2 and rows[0]["id_r"] == 9
        assert rows[0]["s"] == "abc" and rows[0]["s_r"] == "abd"

    def test_guard(self, spark):
        l, r = _frames(spark)
        with pytest.raises(ValueError, match="max_dist"):
            fuzzy_string_join(l, r, "name", "word", max_dist=-1)
