"""Quality-filter presets (operators/filters.py): each rule exercised
by a doc built to fail exactly that rule; flag/filter modes; report."""

from __future__ import annotations

import pytest

from harness_aws_etl_pipeline_spark.operators.filters import (
    apply_quality_filters,
    quality_filter_report,
)

GOOD = (
    "the quick brown fox jumps over that lazy dog and keeps running with "
    "steady pace across the field of green grass to reach home before dark "
    "while birds have sung overhead and the evening light settles on the "
    "hills in amber bands that stretch far to the west of the long valley"
)  # 58 words, mean len ~4, has the/that/and/have/with/to/of


@pytest.fixture(scope="module")
def gopher_docs(spark):
    rows = [
        (1, GOOD),
        (2, "too short"),                              # word_count
        (3, " ".join(["a"] * 60)),                     # mean_word_len < 3 (also stopwords/dup)
        (4, GOOD + " " + " ".join(["###"] * 10)),      # symbol_ratio
        (5, " ".join(["12345"] * 30) + " " + GOOD),    # alpha_ratio < 0.8
        (6, " ".join([f"w{i}xyz" for i in range(60)])),  # stopwords = 0
        (7, "\n".join([GOOD] + ["same line"] * 5)),    # dup_lines
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestGopher:
    def test_good_doc_passes_all(self, gopher_docs):
        out = apply_quality_filters(gopher_docs, "gopher")
        got = {r.doc_id: (r._qf_pass, list(r._qf_failed)) for r in out.collect()}
        assert got[1] == (True, [])

    def test_each_planted_failure_names_its_rule(self, gopher_docs):
        out = apply_quality_filters(gopher_docs, "gopher")
        got = {r.doc_id: set(r._qf_failed) for r in out.collect()}
        assert "word_count" in got[2]
        assert "mean_word_len" in got[3]
        assert "symbol_ratio" in got[4]
        assert "alpha_ratio" in got[5]
        assert "stopwords" in got[6]
        assert "dup_lines" in got[7]

    def test_filter_mode_keeps_schema(self, gopher_docs):
        out = apply_quality_filters(gopher_docs, "gopher", mode="filter")
        assert out.columns == gopher_docs.columns
        assert {r.doc_id for r in out.collect()} == {1}

    def test_threshold_override(self, gopher_docs):
        # relax the word floor: the 2-word doc fails only word_count,
        # so min_words=2 lets it through that rule
        out = apply_quality_filters(gopher_docs, "gopher", min_words=2)
        got = {r.doc_id: set(r._qf_failed) for r in out.collect()}
        assert "word_count" not in got[2]

    def test_report_counts(self, gopher_docs):
        row = quality_filter_report(gopher_docs, "gopher").collect()[0]
        assert row.qf_pass_cnt == 1
        assert row.qf_word_count_fail >= 1
        assert row.qf_stopwords_fail >= 2  # docs 3 and 6 at least

    def test_top_ngram_repetition_rules(self, spark):
        # template spam: one 2-gram ("buy now") covers most of the doc.
        # Pad with distinct filler so only the repetition rules fail.
        filler = " ".join(
            f"word{i} of the sentence and that with have to be" for i in range(6)
        )
        spam = ("buy now " * 20) + filler
        df = spark.createDataFrame(
            [(1, GOOD), (2, spam)], "doc_id long, text string"
        )
        got = {
            r.doc_id: set(r._qf_failed)
            for r in apply_quality_filters(df, "gopher").collect()
        }
        assert got[1] == set()
        assert {"top2gram", "top3gram", "top4gram"} & got[2]
        # relaxing the caps clears those rules
        relaxed = apply_quality_filters(
            df, "gopher", max_top2gram_fraction=1.0,
            max_top3gram_fraction=1.0, max_top4gram_fraction=1.0,
        )
        got2 = {r.doc_id: set(r._qf_failed) for r in relaxed.collect()}
        assert not {"top2gram", "top3gram", "top4gram"} & got2[2]

    def test_empty_text_fails_not_crashes(self, spark):
        df = spark.createDataFrame([(1, ""), (2, None)], "doc_id long, text string")
        out = apply_quality_filters(df.fillna({"text": ""}), "gopher")
        assert all(not r._qf_pass for r in out.collect())


class TestC4:
    def test_rules(self, spark):
        rows = [
            (1, "First sentence here. Second one follows! Third ends now?"),
            (2, "No terminal punctuation at all just words"),       # min_sentences
            (3, "Code block ahead { return 0; }. Two. Three. Four."),  # curly
            (4, "Lorem Ipsum dolor sit amet. Two more. And three."),   # lorem
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = apply_quality_filters(df, "c4")
        got = {r.doc_id: (r._qf_pass, set(r._qf_failed)) for r in out.collect()}
        assert got[1] == (True, set())
        assert "min_sentences" in got[2][1]
        assert "no_curly_brace" in got[3][1]
        assert "no_lorem_ipsum" in got[4][1]

    def test_unknown_preset_rejected(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="preset"):
            apply_quality_filters(df, "refinedweb")
        with pytest.raises(ValueError, match="mode"):
            apply_quality_filters(df, "c4", mode="yeet")
