"""BM25 retrieval: hand-computed scores, ranking semantics,
determinism, and pruning behavior (operators/retrieval.py)."""

from __future__ import annotations

import math

import pytest

from harness_aws_etl_pipeline_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
)

K1, B = 1.2, 0.75


def _bm25_ref(corpus: dict[int, str], query: str, k1=K1, b=B) -> dict[int, float]:
    """Plain-python BM25 with the operator's exact arithmetic (scaled-
    long per-term contributions)."""
    toks = {d: t.lower().split() for d, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / float(n)
    df: dict[str, int] = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    out: dict[int, float] = {}
    qterms: dict[str, int] = {}
    for term in query.lower().split():
        qterms[term] = qterms.get(term, 0) + 1
    for d, t in toks.items():
        scaled = 0
        for term, qtf in qterms.items():
            tf = t.count(term)
            if tf == 0 or term not in df:
                continue
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            tfn = (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * len(t) / avgdl)
            )
            scaled += int(round(qtf * idf * tfn * 1_000_000))
        if scaled:
            out[d] = scaled / 1_000_000
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    rows = {
        1: "spark shuffle join spark spark",
        2: "window scan merge window",
        3: "the quick brown fox",
        4: "spark window",
        5: "merge merge merge merge merge merge merge merge",
    }
    return rows, spark.createDataFrame(
        list(rows.items()), "doc_id long, text string"
    )


def _queries(spark, *qs):
    return spark.createDataFrame(
        [(f"q{i}", q) for i, q in enumerate(qs)], "query_id string, query string"
    )


class TestScores:
    def test_matches_python_reference(self, spark, corpus):
        rows, docs = corpus
        got = {
            r["doc_id"]: r["score"]
            for r in bm25_scores(docs, _queries(spark, "spark merge")).collect()
        }
        assert got == _bm25_ref(rows, "spark merge")

    def test_no_shared_term_no_row(self, spark, corpus):
        _, docs = corpus
        assert bm25_scores(docs, _queries(spark, "zebra")).count() == 0

    def test_repeated_query_term_scales_qtf(self, spark, corpus):
        rows, docs = corpus
        got = {
            r["doc_id"]: r["score"]
            for r in bm25_scores(docs, _queries(spark, "spark spark")).collect()
        }
        ref = _bm25_ref(rows, "spark spark")
        assert got == ref
        # and a doubled term genuinely outweighs the single-term query
        single = _bm25_ref(rows, "spark")
        assert all(got[d] > single[d] for d in single)

    def test_empty_corpus(self, spark):
        empty = spark.createDataFrame([], "doc_id long, text string")
        assert bm25_scores(empty, _queries(spark, "x")).count() == 0


class TestTopK:
    def test_rank_order_and_k(self, spark, corpus):
        rows, docs = corpus
        top = bm25_topk(docs, _queries(spark, "spark window"), k=2).collect()
        ref = _bm25_ref(rows, "spark window")
        want = sorted(ref, key=lambda d: (-ref[d], d))[:2]
        got = [r["doc_id"] for r in sorted(top, key=lambda r: r["rk"])]
        assert got == want

    def test_tf_saturation(self, spark, corpus):
        """Eight 'merge's beat four 'window's less than 2x — BM25's
        saturating tf, the property distinguishing it from raw tf."""
        rows, docs = corpus
        ref = _bm25_ref(rows, "merge")
        # doc 5 has 8x the tf of doc 2's 'window' but idf/dl-normalized
        # score stays bounded by (k1+1)/1 saturation
        one_tf = _bm25_ref({**rows, 5: "merge"}, "merge")
        assert ref[5] < 2 * one_tf[5]

    def test_deterministic_across_partitionings(self, spark, corpus):
        _, docs = corpus
        q = _queries(spark, "spark merge window scan")
        a = bm25_topk(docs.repartition(1), q, k=5).collect()
        b = bm25_topk(docs.repartition(7), q, k=5).collect()
        key = lambda r: (r["query_id"], r["rk"])  # noqa: E731
        assert sorted(a, key=key) == sorted(b, key=key)

    def test_multi_query_isolated(self, spark, corpus):
        rows, docs = corpus
        top = bm25_topk(
            docs, _queries(spark, "spark", "merge"), k=3
        ).collect()
        by_q = {}
        for r in top:
            by_q.setdefault(r["query_id"], []).append(r)
        want0 = _bm25_ref(rows, "spark")
        want1 = _bm25_ref(rows, "merge")
        assert {r["doc_id"] for r in by_q["q0"]} == set(
            sorted(want0, key=lambda d: (-want0[d], d))[:3]
        )
        assert {r["doc_id"] for r in by_q["q1"]} == set(
            sorted(want1, key=lambda d: (-want1[d], d))[:3]
        )
