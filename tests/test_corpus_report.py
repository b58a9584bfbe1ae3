"""Corpus diagnostics (operators/corpus_report.py)."""

from __future__ import annotations

import pytest

from harness_aws_etl_pipeline_spark.operators.corpus_report import (
    compare_corpus_reports,
    corpus_report,
)

GOOD = (
    "the quick brown fox jumps over that lazy dog and keeps running with "
    "steady pace across the field of green grass to reach home before dark "
    "while birds have sung overhead and the evening light settles on the "
    "hills in amber bands that stretch far to the west of the long valley"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "web", GOOD),
        (2, "web", GOOD + " extra tail"),
        (3, "books", "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestReport:
    def test_summary_numbers(self, corpus):
        rep = corpus_report(corpus)
        assert rep["docs"] == 3
        assert rep["tokens"] == 52 + 54 + 2
        assert rep["chars"] == sum(len(t) for t in
                                   [GOOD, GOOD + " extra tail", "short doc"])
        assert rep["gate_pass"] == 2  # the two GOOD docs
        assert rep["token_p50"] == 52
        doms = rep["domains"]
        assert doms["web"]["docs"] == 2 and doms["books"]["docs"] == 1
        assert abs(doms["web"]["share"] + doms["books"]["share"] - 1.0) < 0.01

    def test_sections_optional(self, corpus):
        rep = corpus_report(corpus, domain_col=None, filter_preset=None)
        assert "domains" not in rep and "gate_pass" not in rep


class TestCompare:
    def test_no_drift_no_flags(self, corpus):
        rep = corpus_report(corpus)
        diff = compare_corpus_reports(rep, rep)
        assert diff["flags"] == []
        assert diff["metrics"]["docs"]["rel_change"] == 0.0

    def test_drift_flags(self, corpus, spark):
        rep = corpus_report(corpus)
        # new version: books domain gone, web only, docs halved
        v2 = corpus_report(
            spark.createDataFrame([(1, "web", GOOD)],
                                  "doc_id long, source string, text string")
        )
        diff = compare_corpus_reports(rep, v2)
        assert any("vanished: books" in f for f in diff["flags"])
        assert any(f.startswith("docs:") for f in diff["flags"])
        assert diff["domains"]["books"]["new_share"] == 0.0

    def test_appeared_domain_flagged(self, corpus, spark):
        rep = corpus_report(corpus)
        v2 = corpus_report(
            corpus.unionByName(
                spark.createDataFrame(
                    [(9, "code", GOOD)], "doc_id long, source string, text string"
                )
            )
        )
        diff = compare_corpus_reports(rep, v2)
        assert any("appeared: code" in f for f in diff["flags"])
