"""Benchmark decontamination (operators/decontam.py).

Planted-overlap corpus: doc 1 embeds a verbatim benchmark 5-gram mid-
sentence, doc 2 repeats one inside itself, doc 3 shares only a 4-gram
(below n), doc 4 is clean prose.  Every assertion is hand-computable.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.decontam import (
    benchmark_ngrams,
    contamination_hits,
    contamination_stats,
    decontaminate,
    flag_contaminated,
)

BENCH_SENT = "the quick brown fox jumps"  # the planted 5-gram


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, f"intro words {BENCH_SENT} trailing words here"),
            (2, f"{BENCH_SENT} again {BENCH_SENT} twice"),
            (3, "the quick brown fox sleeps all day long"),  # only a 4-gram
            (4, "completely unrelated clean training text sample"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(100, f"{BENCH_SENT} over the lazy dog")],
        "qid long, text string",
    )


class TestDecontaminate:
    def test_blocklist_is_distinct_lowercased(self, bench):
        grams = benchmark_ngrams(bench, n=5, use_hash=False)
        vals = {r.ngram for r in grams.collect()}
        # 9 tokens -> 5 five-grams, all distinct
        assert len(vals) == 5
        assert BENCH_SENT in vals

    def test_hits_count_distinct_ngrams_per_doc(self, corpus, bench):
        hits = contamination_hits(corpus, bench, n=5, use_hash=False)
        got = {r.doc_id: r.hit_ngrams for r in hits.collect()}
        # doc 1 contains exactly the planted 5-gram; doc 2's repeat is
        # array_distinct-ed per doc -> still 1; docs 3/4 absent
        assert got == {1: 1, 2: 1}

    def test_case_insensitive_match(self, spark, bench):
        shouting = spark.createDataFrame(
            [(9, BENCH_SENT.upper() + " extra")], "doc_id long, text string"
        )
        assert contamination_hits(shouting, bench, n=5, use_hash=False).count() == 1

    def test_below_n_overlap_does_not_flag(self, corpus, bench):
        clean = decontaminate(corpus, bench, n=5, use_hash=False)
        assert sorted(r.doc_id for r in clean.collect()) == [3, 4]
        # schema unchanged by the anti-join
        assert clean.columns == corpus.columns

    def test_flag_is_nondestructive(self, corpus, bench):
        flagged = flag_contaminated(corpus, bench, n=5, use_hash=False)
        assert flagged.count() == corpus.count()
        by_id = {r.doc_id: (r._contaminated, r._hit_ngrams) for r in flagged.collect()}
        assert by_id[1] == (True, 1)
        assert by_id[3] == (False, 0)
        assert by_id[4] == (False, 0)

    def test_hash_and_string_paths_agree(self, corpus, bench):
        for fn in (contamination_hits, decontaminate):
            a = fn(corpus, bench, n=5, use_hash=True)
            b = fn(corpus, bench, n=5, use_hash=False)
            assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_shuffle_join_path_agrees_with_broadcast(self, corpus, bench):
        a = contamination_hits(corpus, bench, n=5, broadcast=False)
        b = contamination_hits(corpus, bench, n=5, broadcast=True)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_stats_panel_shape_and_values(self, corpus, bench):
        row = contamination_stats(corpus, bench, n=5, use_hash=False).collect()[0]
        assert row.bench_ngrams == 5
        assert row.contaminated_docs == 2
        assert row.hits_total == 2
        assert row.clean_docs == 2
        expected_chars = sum(
            len(t)
            for i, t in [
                (3, "the quick brown fox sleeps all day long"),
                (4, "completely unrelated clean training text sample"),
            ]
        )
        assert row.clean_chars == expected_chars

    def test_empty_benchmark_flags_nothing(self, spark, corpus):
        empty = spark.createDataFrame([], "qid long, text string")
        assert decontaminate(corpus, empty, n=5).count() == corpus.count()
        row = contamination_stats(corpus, empty, n=5).collect()[0]
        assert (row.bench_ngrams, row.contaminated_docs, row.hits_total) == (0, 0, 0)

    def test_short_docs_yield_no_ngrams(self, spark, bench):
        shorty = spark.createDataFrame(
            [(1, "quick brown fox")], "doc_id long, text string"
        )
        assert decontaminate(shorty, bench, n=5).count() == 1

    def test_by_benchmark_leak_report(self, spark, corpus):
        from harness_aws_etl_pipeline_spark.operators.decontam import (
            contamination_by_benchmark,
        )

        two_bench = spark.createDataFrame(
            [
                (100, f"{BENCH_SENT} over the lazy dog"),  # hits docs 1, 2
                (200, "nothing from this one appears anywhere at all"),
            ],
            "qid long, text string",
        )
        rows = {
            r.qid: (r.leaked_ngrams, r.corpus_docs)
            for r in contamination_by_benchmark(
                corpus, two_bench, n=5, use_hash=False
            ).collect()
        }
        # only item 100 leaks: 1 distinct 5-gram, found in 2 corpus docs
        assert rows == {100: (1, 2)}

    def test_by_benchmark_rejects_id_collision(self, corpus, bench):
        from harness_aws_etl_pipeline_spark.operators.decontam import (
            contamination_by_benchmark,
        )

        with pytest.raises(ValueError, match="bench_id_col"):
            contamination_by_benchmark(corpus, bench, bench_id_col="doc_id")

    def test_blocklist_broadcast_in_plan(self, corpus, bench):
        plan = contamination_hits(
            corpus, bench, n=5, broadcast=True
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
