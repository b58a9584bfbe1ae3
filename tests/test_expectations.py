"""Data-quality expectations: single-pass checks, gate, quarantine."""

import pytest

from harness_aws_etl_pipeline_spark.meta.expectations import (
    check,
    enforce,
    expect_between,
    expect_in,
    expect_not_null,
    expect_unique,
    quarantine,
)


@pytest.fixture
def dirty(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, None, 5.0),      # null name
            (3, "c", 999.0),     # out of range
            (3, "d", 20.0),      # duplicate id
        ],
        "id long, name string, amount double",
    )


# Column expressions need a live session — built per-test
def _expectations():
    return [
        expect_not_null("name"),
        expect_between("amount", 0.0, 100.0),
        expect_in("name", ["a", "b", "c", "d"]),
        expect_unique("id"),
    ]


class TestExpectations:
    def test_check_counts_all_rules_one_pass(self, dirty):
        report = check(dirty, _expectations())
        assert report["rows"] == 4 and not report["passed"]
        assert report["violations"] == {
            "name_not_null": 1,
            "amount_between": 1,
            "name_in_set": 0,
            "id_unique": 1,
        }

    def test_enforce_raises_with_names(self, dirty):
        with pytest.raises(ValueError, match="name_not_null"):
            enforce(dirty, _expectations())

    def test_enforce_passes_clean(self, spark):
        clean = spark.createDataFrame([(1, "a", 10.0)], "id long, name string, amount double")
        assert enforce(clean, _expectations())["passed"]

    def test_quarantine_split(self, dirty):
        good, bad = quarantine(dirty, _expectations())
        assert {r["id"] for r in good.collect()} == {1, 3}  # row-level rules only
        assert bad.count() == 2

    def test_quarantine_null_predicate_lands_in_bad(self, spark):
        # a CUSTOM predicate evaluating to SQL NULL (`amount > 5` on a
        # null cell — no null-guard like the built-in helpers) must
        # quarantine the row, not drop it from BOTH splits
        from pyspark.sql import functions as F

        from harness_aws_etl_pipeline_spark.meta.expectations import Expectation

        df = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", None)], "id long, name string, amount double"
        )
        good, bad = quarantine(df, [Expectation("amount_gt5", F.col("amount") > 5)])
        assert {r["id"] for r in good.collect()} == {1}
        assert {r["id"] for r in bad.collect()} == {2}
        assert good.count() + bad.count() == df.count()  # nothing vanishes


class TestStratifiedSample:
    def test_per_stratum_fractions(self, spark):
        from harness_aws_etl_pipeline_spark.operators.sampling import stratified_sample

        df = spark.createDataFrame(
            [(i, "minority" if i % 10 == 0 else "majority") for i in range(5000)],
            "id long, label string",
        )
        mix = stratified_sample(df, "id", "label", {"minority": 1.0, "majority": 0.1})
        counts = {
            r["label"]: r["count"]
            for r in mix.groupBy("label").count().collect()
        }
        assert counts["minority"] == 500  # keep all
        assert 300 < counts["majority"] < 600  # ~10% of 4500

    def test_unlisted_strata_dropped(self, spark):
        from harness_aws_etl_pipeline_spark.operators.sampling import stratified_sample

        df = spark.createDataFrame(
            [(1, "keep"), (2, "drop")], "id long, label string"
        )
        out = stratified_sample(df, "id", "label", {"keep": 1.0})
        assert [r["label"] for r in out.collect()] == ["keep"]
