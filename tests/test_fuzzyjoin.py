"""Blocked fuzzy string join (operators/fuzzyjoin.py): equality with
the naive cross-join filter (length banding is lossless), single
emission per pair, prefix-mode subsetting, exact-match degenerate,
NULLs, and column-collision suffixing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.fuzzyjoin import (
    fuzzy_join_candidates,
    fuzzy_string_join,
)

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


def _narrow_words(n: int, salt: str) -> list[str]:
    """Deterministic pseudo-random words, ALL length 9-12 — the
    narrow natural-length distribution where length-band blocking
    degenerates toward the cross product."""
    import hashlib

    out = []
    for i in range(n):
        h = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
        out.append(h[: 9 + (i % 4)])
    return out


class TestSegmentBlocking:
    @pytest.mark.parametrize("k", [0, 1, 2])
    def test_length_mode_equals_naive(self, spark, k):
        l, r = _frames(spark)
        got = {
            (x["lid"], x["rid"], x["edit_dist"])
            for x in fuzzy_string_join(
                l, r, "name", "word", max_dist=k, blocking="length"
            ).collect()
        }
        exp = {
            (x["lid"], x["rid"], x["d"])
            for x in l.crossJoin(r)
            .withColumn("d", F.levenshtein("name", "word"))
            .filter(F.col("d") <= k)
            .collect()
        }
        assert got == exp

    def test_segment_equals_naive_on_planted_typos(self, spark):
        # near-misses whose edits hit first/middle/last segments, plus
        # short strings (< k+1 chars → empty-segment floor) and dups
        L = ["mississippi", "abcdefghij", "xy", "a", "", "dup", "dup"]
        R = ["missisippi", "Xbcdefghij", "abcdefghiX", "abcdeXghij",
             "yx", "ab", "", "dup", "other-thing"]
        l = spark.createDataFrame(
            [(i, w) for i, w in enumerate(L)], "lid int, s string"
        )
        r = spark.createDataFrame(
            [(i, w) for i, w in enumerate(R)], "rid int, t string"
        )
        for k in (1, 2):
            got = sorted(
                (x["lid"], x["rid"], x["edit_dist"])
                for x in fuzzy_string_join(l, r, "s", "t", max_dist=k).collect()
            )
            exp = sorted(
                (x["lid"], x["rid"], x["d"])
                for x in l.crossJoin(r)
                .withColumn("d", F.levenshtein("s", "t"))
                .filter(F.col("d") <= k)
                .collect()
            )
            assert got == exp, f"k={k}"

    def test_narrow_length_candidates_far_below_cross_product(self, spark):
        # 300×300 distinct hex words, every length in [9, 12]: the
        # length bands hold ~everything, the segment keys almost
        # nothing — the r7 VERDICT's scale criterion (<5% of |L|·|R|)
        n = 300
        l = spark.createDataFrame(
            [(w,) for w in _narrow_words(n, "L")], "a string"
        )
        r = spark.createDataFrame(
            [(w,) for w in _narrow_words(n, "R")], "b string"
        )
        seg = fuzzy_join_candidates(l, r, "a", "b", max_dist=2).count()
        assert seg < 0.05 * n * n, f"segment blocking compared {seg} pairs"
        band = fuzzy_join_candidates(
            l, r, "a", "b", max_dist=2, blocking="length"
        ).count()
        assert band > 10 * max(seg, 1)  # the regime the fix targets

    def test_helper_and_suffix_collisions_raise(self, spark):
        l = spark.createDataFrame([(1, "abc")], "id int, s string")
        r_helper = spark.createDataFrame([("abd", 1)], "s string, _lid int")
        with pytest.raises(ValueError, match="_lid"):
            fuzzy_string_join(l, r_helper, "s", "s", max_dist=1)
        l2 = spark.createDataFrame([("abc", "x")], "s string, s_r string")
        r2 = spark.createDataFrame([("abd",)], "s string")
        with pytest.raises(ValueError, match="s_r"):
            fuzzy_string_join(l2, r2, "s", "s", max_dist=1)
        l3 = spark.createDataFrame([("abc", 0)], "s string, edit_dist int")
        with pytest.raises(ValueError, match="edit_dist"):
            fuzzy_string_join(l3, r2, "s", "s", max_dist=1)
        with pytest.raises(ValueError, match="blocking"):
            fuzzy_string_join(l, r2, "s", "s", blocking="nope")

    def test_duplicate_rows_preserve_multiplicity(self, spark):
        l = spark.createDataFrame([("abc",), ("abc",)], "s string")
        r = spark.createDataFrame([("abd",)], "t string")
        assert fuzzy_string_join(l, r, "s", "t", max_dist=1).count() == 2
