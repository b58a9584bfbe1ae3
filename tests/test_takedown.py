"""Takedown governance pass: rule predicates, audit counts, bulk-id
anti-join path."""

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.takedown import (
    TakedownRules,
    apply_takedown,
    apply_takedown_ids,
    takedown_report,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "https://keep.com/a", "alpha text"),
        (2, "https://bad.com/x?utm_source=tw", "beta text"),
        (3, "http://plain.com/y", "gamma text"),
        (4, None, "delta text"),  # null url must never match a pattern
        (5, "https://keep.com/b", "erase me exactly"),
        (6, "https://keep.com/c", "zeta text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def _md5(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


class TestRules:
    def test_empty_rules_rejected(self):
        with pytest.raises(ValueError):
            TakedownRules()

    def test_url_rule_without_url_col_rejected(self, corpus):
        with pytest.raises(ValueError):
            apply_takedown(corpus, TakedownRules(url_patterns=("x",)))


class TestApply:
    def test_each_rule_kind_and_overlap(self, corpus):
        rules = TakedownRules(
            ids=(6,),
            url_patterns=(r"utm_source", r"^http://"),
            content_hashes=(_md5("erase me exactly"),),
        )
        kept = apply_takedown(corpus, rules, url_col="url")
        assert sorted(r["doc_id"] for r in kept.collect()) == [1, 4]

        rep = takedown_report(corpus, rules, url_col="url").collect()[0]
        assert rep["total"] == 6
        assert rep["removed"] == 4 and rep["kept"] == 2
        assert rep["matched_ids"] == 1
        assert rep["matched_url_pattern_0"] == 1  # utm_source
        assert rep["matched_url_pattern_1"] == 1  # http://
        assert rep["matched_content_hashes"] == 1

    def test_multi_rule_row_counted_once_in_removed(self, corpus):
        # doc 2 matches both its id rule and the utm pattern
        rules = TakedownRules(ids=(2,), url_patterns=(r"utm_source",))
        rep = takedown_report(corpus, rules, url_col="url").collect()[0]
        assert rep["removed"] == 1
        assert rep["matched_ids"] == 1 and rep["matched_url_pattern_0"] == 1

    def test_null_url_and_text_never_match(self, spark):
        df = spark.createDataFrame(
            [(1, None, None), (2, "http://x.com/a", "t")],
            "doc_id long, url string, text string",
        )
        rules = TakedownRules(
            url_patterns=(r"^http://",), content_hashes=(_md5("t"),)
        )
        kept = apply_takedown(df, rules, url_col="url")
        assert [r["doc_id"] for r in kept.collect()] == [1]


class TestBulkIds:
    def test_anti_join_both_modes(self, corpus, spark):
        blocked = spark.createDataFrame([(2,), (5,), (99,)], "doc_id long")
        for broadcast in (True, False):
            kept = apply_takedown_ids(corpus, blocked, broadcast=broadcast)
            assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4, 6]

    def test_broadcast_plan_is_broadcast(self, corpus, spark):
        blocked = spark.createDataFrame([(2,)], "doc_id long")
        plan = (
            apply_takedown_ids(corpus, blocked)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


class TestSnapTableTakedown:
    def test_erasure_commit_and_time_travel_audit(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.takedown import (
            takedown_from_table,
        )
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        t = SnapTable(spark, str(tmp_path / "corpus_table"))
        t.write(
            spark.createDataFrame(
                [
                    (1, "https://keep.com/a", "alpha"),
                    (2, "http://bad.com/x", "beta"),
                    (3, "https://keep.com/b", "gamma"),
                ],
                "doc_id long, url string, text string",
            )
        )
        v0 = t.current_version()
        res = takedown_from_table(
            t, TakedownRules(ids=(3,), url_patterns=(r"^http://",)),
            url_col="url",
        )
        assert res["removed"] == 2 and res["kept"] == 1
        assert res["matched_ids"] == 1 and res["matched_url_pattern_0"] == 1
        assert res["files_rewritten"] >= 1
        assert [r["doc_id"] for r in t.read().collect()] == [1]
        # the pre-delete snapshot stays reviewable via time travel
        assert t.read(version=v0).count() == 3


class TestBloomBulkPath:
    def test_bloom_anti_mode_identical(self, spark):
        from harness_aws_etl_pipeline_spark.operators.takedown import (
            apply_takedown_ids,
        )

        docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        blocked = spark.range(0, 40).selectExpr("id * 31 as doc_id")
        plain = apply_takedown_ids(docs, blocked, bloom=False)
        bloomed = apply_takedown_ids(docs, blocked, bloom=True)
        assert sorted(r["doc_id"] for r in bloomed.collect()) == sorted(
            r["doc_id"] for r in plain.collect()
        )
