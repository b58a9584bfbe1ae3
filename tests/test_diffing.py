"""Keyed table diff (operators/diffing.py): status partitioning,
per-column change attribution, NULL-safe compares, float tolerance,
duplicate-key surfacing, composite keys, and the identical gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.diffing import (
    diff_summary,
    table_diff,
)


@pytest.fixture()
def pair(spark):
    a = spark.createDataFrame(
        [
            (1, "x", 10.0),
            (2, "y", 20.0),     # v changes in b
            (3, None, 30.0),    # NULL name unchanged
            (4, "gone", 40.0),  # removed in b
        ],
        "id int, name string, v double",
    )
    b = spark.createDataFrame(
        [
            (1, "x", 10.0),
            (2, "y", 21.0),
            (3, None, 30.0),
            (5, "new", 50.0),   # added
        ],
        "id int, name string, v double",
    )
    return a, b


class TestDiff:
    def test_statuses_and_attribution(self, spark, pair):
        a, b = pair
        d = {r["id"]: r for r in table_diff(a, b, "id").collect()}
        assert d[1]["_diff_status"] == "unchanged"
        assert d[2]["_diff_status"] == "changed"
        assert d[2]["v_changed"] is True and d[2]["name_changed"] is False
        assert d[3]["_diff_status"] == "unchanged"  # NULL <=> NULL
        assert d[4]["_diff_status"] == "removed"
        assert d[5]["_diff_status"] == "added"
        assert d[5]["v_changed"] is None  # nothing to compare against

    def test_summary_counts_and_gate(self, spark, pair):
        a, b = pair
        s = diff_summary(a, b, "id").first()
        assert (s["rows_a"], s["rows_b"]) == (4, 4)
        assert (s["added"], s["removed"], s["changed"], s["unchanged"]) == (
            1, 1, 1, 2,
        )
        assert s["changed_v"] == 1 and s["changed_name"] == 0
        assert s["identical"] is False
        same = diff_summary(a, a, "id").first()
        assert same["identical"] is True and same["unchanged"] == 4

    def test_float_tolerance(self, spark):
        a = spark.createDataFrame([(1, 1.0)], "id int, v double")
        b = spark.createDataFrame([(1, 1.0 + 1e-12)], "id int, v double")
        strict = diff_summary(a, b, "id").first()
        assert strict["changed"] == 1
        loose = diff_summary(a, b, "id", float_tolerance=1e-9).first()
        assert loose["changed"] == 0 and loose["identical"] is True

    def test_duplicate_keys_surfaced(self, spark):
        a = spark.createDataFrame([(1, "x"), (1, "y")], "id int, s string")
        b = spark.createDataFrame([(1, "x")], "id int, s string")
        s = diff_summary(a, b, "id").first()
        assert s["dup_key_a"] == 1 and s["dup_key_b"] == 0
        assert s["identical"] is False  # ambiguity blocks the gate

    def test_composite_key_and_compare_subset(self, spark):
        a = spark.createDataFrame(
            [(1, "p", 5, "meta1")], "k1 int, k2 string, v int, note string"
        )
        b = spark.createDataFrame(
            [(1, "p", 5, "meta2")], "k1 int, k2 string, v int, note string"
        )
        full = diff_summary(a, b, ["k1", "k2"]).first()
        assert full["changed"] == 1 and full["changed_note"] == 1
        only_v = diff_summary(a, b, ["k1", "k2"], compare_cols=["v"]).first()
        assert only_v["changed"] == 0 and only_v["identical"] is True

    def test_guards(self, spark, pair):
        a, b = pair
        with pytest.raises(ValueError, match="key column"):
            table_diff(a, b, "nope")
        with pytest.raises(ValueError, match="compare_cols"):
            table_diff(a, b, "id", compare_cols=["missing"])


class TestCli:
    def test_diff_cli_summary_and_rows(self, spark, tmp_path, capsys, pair):
        import json

        from harness_aws_etl_pipeline_spark.cli import main

        a, b = pair
        ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
        a.write.parquet(ra)
        b.write.parquet(rb)
        out = str(tmp_path / "rows")
        rc = main(["diff", "--reference", ra, "--current", rb,
                   "--keys", "id", "--output", out])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["added"] == 1 and res["removed"] == 1
        assert res["changed"] == 1 and res["identical"] is False
        back = spark.read.parquet(out)
        assert back.count() == 5 and "_diff_status" in back.columns
