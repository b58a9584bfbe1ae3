"""Duplicated-span removal (operators/spandedup.py): planted shared
passages, first-occurrence survival, span merging, rebuild integrity,
short-doc and idempotence edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.spandedup import (
    duplicated_spans,
    position_grams,
    remove_duplicated_spans,
    span_dedup_stats,
)


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


BOILER = _words("boiler", 12)  # the shared 12-token passage


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # doc 1: unique head + BOILER + unique tail (first occurrence)
        (1, _words("alpha", 6) + " " + BOILER + " " + _words("omega", 6)),
        # doc 2: different unique text, same BOILER embedded
        (2, _words("beta", 8) + " " + BOILER + " " + _words("gamma", 4)),
        # doc 3: fully unique
        (3, _words("delta", 25)),
        # doc 4: too short to form a single 8-gram
        (4, _words("eps", 5)),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestPositionGrams:
    def test_counts_and_short_doc(self, corpus):
        pg = position_grams(corpus, k=8)
        cnt = {
            r.doc_id: r.n
            for r in pg.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
        }
        # doc 1: 24 tokens -> 17 windows; doc 3: 25 -> 18; doc 4: none
        assert cnt[1] == 17 and cnt[3] == 18
        assert 4 not in cnt

    def test_equal_windows_share_gram(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
        )
        grams = position_grams(df, k=4).select("gram").distinct().count()
        assert grams == 1


class TestDuplicatedSpans:
    def test_second_occurrence_marked_first_kept(self, corpus):
        spans = duplicated_spans(corpus, k=8).collect()
        # only doc 2's copy of BOILER is removable; doc 1 is canonical
        assert {r.doc_id for r in spans} == {2}
        (s,) = spans
        # BOILER occupies tokens [8, 20) in doc 2; every 8-gram fully
        # inside it is duplicated -> windows 8..12, merged span [8, 20)
        assert (s.span_start, s.span_end) == (8, 20)

    def test_within_doc_repetition_merges(self, spark):
        # one doc repeating the same 8 tokens 3x (24 tokens): every
        # window at pos p >= 8 equals the canonical window at p-8, so
        # marked positions are 8..16, merging to the single span
        # [8, 24) — the first period survives
        text = " ".join([_words("rep", 8)] * 3)
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        spans = duplicated_spans(df, k=8).collect()
        assert len(spans) == 1
        (s,) = spans
        assert s.span_start == 8 and s.span_end == 24

    def test_no_false_positives(self, corpus):
        spans = duplicated_spans(
            corpus.filter(F.col("doc_id").isin(3, 4)), k=8
        ).count()
        assert spans == 0


class TestRemove:
    def test_rebuild_cuts_only_the_copy(self, corpus):
        out = {
            r.doc_id: r.text
            for r in remove_duplicated_spans(corpus, k=8).collect()
        }
        assert out[1] == _words("alpha", 6) + " " + BOILER + " " + _words("omega", 6)
        assert out[2] == _words("beta", 8) + " " + _words("gamma", 4)
        assert out[3] == _words("delta", 25)
        assert out[4] == _words("eps", 5)

    def test_idempotent(self, corpus):
        once = remove_duplicated_spans(corpus, k=8)
        twice = remove_duplicated_spans(once, k=8)
        assert sorted(map(tuple, once.collect())) == sorted(
            map(tuple, twice.collect())
        )

    def test_explicit_spans_long_typed(self, spark):
        """remove_spans accepts long-typed explicit spans — the
        empty-spans fallback must not fail analysis on the type
        mismatch (the int cast happens in the per-doc aggregation)."""
        from harness_aws_etl_pipeline_spark.operators.spandedup import (
            remove_spans,
        )

        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, "f g h")], "doc_id long, text string"
        )
        spans = spark.createDataFrame(
            [(1, 1, 3)], "doc_id long, span_start long, span_end long"
        )
        got = {r.doc_id: r.text for r in remove_spans(docs, spans).collect()}
        assert got == {1: "a d e", 2: "f g h"}

    def test_other_columns_untouched(self, spark):
        df = spark.createDataFrame(
            [(1, "x " + BOILER, "s0"), (2, "y " + BOILER, "s1")],
            "doc_id long, text string, source string",
        )
        out = remove_duplicated_spans(df, k=8)
        assert set(out.columns) == {"doc_id", "text", "source"}
        got = {r.doc_id: (r.text, r.source) for r in out.collect()}
        assert got[1] == ("x " + BOILER, "s0")
        assert got[2][1] == "s1" and BOILER not in got[2][0]


class TestStats:
    def test_panel_numbers(self, corpus):
        row = span_dedup_stats(corpus, k=8).collect()[0]
        assert row.span_tokens_total == 24 + 24 + 25 + 5
        assert row.spans_removed == 1
        assert row.span_docs_affected == 1
        assert row.span_tokens_removed == 12

    def test_empty_corpus(self, spark):
        empty = spark.createDataFrame([], "doc_id long, text string")
        row = span_dedup_stats(empty, k=8).collect()[0]
        assert row.span_tokens_total == 0 and row.spans_removed == 0
        assert row.span_docs_affected == 0 and row.span_tokens_removed == 0


class TestStringIds:
    def test_string_id_corpus(self, spark):
        df = spark.createDataFrame(
            [("a", "h " + BOILER), ("b", "t " + BOILER)],
            "doc_id string, text string",
        )
        spans = duplicated_spans(df, k=8).collect()
        assert {r.doc_id for r in spans} == {"b"}  # min (doc_id, pos) = 'a'
