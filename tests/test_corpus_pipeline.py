"""End-to-end corpus preparation (operators/corpus_pipeline.py):
planted artifacts for every stage, report bookkeeping, lazy mode."""

from __future__ import annotations

import pytest

from harness_aws_etl_pipeline_spark.operators.corpus_pipeline import prepare_corpus

BODY = (
    "the quick brown fox jumps over that lazy dog and keeps running with "
    "steady pace across the field of green grass to reach home before dark "
    "while birds have sung overhead and the evening light settles on the "
    "hills in amber bands that stretch far to the west of the long valley"
)
BENCH_GRAM = "zeta functions over finite prime fields"  # absent from BODY


@pytest.fixture(scope="module")
def corpus(spark):
    """Docs engineered to trip exactly one stage each:
    1-2: survivors; 3: exact dup of 1 (dedup); 4: too short (filter);
    5: contains the benchmark text verbatim later (decontam, but long
    enough to pass the filter).  Every doc carries a shared boilerplate
    line (line_dedup must strip it from survivors)."""
    decon = BODY + " " + BENCH_GRAM
    rows = [
        (1, "src0", "shared boilerplate footer\n" + BODY),
        (2, "src0", "shared boilerplate footer\n" + BODY + " extra tail words"),
        (3, "src1", "shared boilerplate footer\n" + BODY),  # dup of 1
        (4, "src1", "shared boilerplate footer\ntoo short"),
        (5, "src0", "shared boilerplate footer\n" + decon),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(1, f"benchmark question: {BENCH_GRAM} answer")],
        "qid long, text string",
    )


class TestPrepareCorpus:
    def test_full_pipeline_stages_and_survivors(self, corpus, bench):
        out, report = prepare_corpus(
            corpus,
            filter_preset="gopher",
            line_dedup_min_count=3,
            benchmark=bench,
            decontam_n=5,
            dedup_method="hash",
            pack_capacity=32,
        )
        stages = [r["stage"] for r in report]
        assert stages == [
            "filter[gopher]", "line_dedup", "decontam", "dedup[hash]", "pack"
        ]
        by = {r["stage"]: r for r in report}
        assert by["filter[gopher]"]["removed"] == 1          # doc 4
        assert by["line_dedup"]["removed"] == 0              # rewrites, not drops
        assert by["decontam"]["removed"] == 1                # doc 5
        assert by["dedup[hash]"]["removed"] == 1             # doc 3 (or 1)
        assert by["pack"]["removed"] == 0
        rows = out.collect()
        ids = {r.doc_id for r in rows}
        assert len(ids & {1, 3}) == 1 and 2 in ids and len(ids) == 2
        # boilerplate stripped; packing columns appended
        assert all("shared boilerplate footer" not in r.text for r in rows)
        assert {"n_tokens", "bin_id", "_truncated"} <= set(out.columns)

    def test_line_dedup_must_run_before_hash_dedup(self, corpus):
        # docs 1 and 3 differ ONLY after boilerplate stripping ... they
        # are exact dups either way; but stripping makes 1 and 2 share
        # MORE content — assert the stage composes without reordering
        out, report = prepare_corpus(
            corpus, line_dedup_min_count=3, dedup_method="hash"
        )
        assert [r["stage"] for r in report] == ["line_dedup", "dedup[hash]"]
        assert out.count() == 4  # one of the exact-dup pair removed

    def test_span_dedup_stage(self, spark):
        """span_dedup cuts a duplicated passage out of the later doc
        while keeping the first occurrence and all unique text."""
        shared = " ".join(f"boil{i}" for i in range(10))
        df = spark.createDataFrame(
            [
                (1, "src0", " ".join(f"head{i}" for i in range(6)) + " " + shared),
                (2, "src0", " ".join(f"tail{i}" for i in range(6)) + " " + shared),
            ],
            "doc_id long, source string, text string",
        )
        out, report = prepare_corpus(df, span_dedup_k=8)
        texts = {r.doc_id: r.text for r in out.collect()}
        assert shared in texts[1]
        assert shared not in texts[2]
        assert texts[2].startswith("tail0")
        assert [r["stage"] for r in report] == ["span_dedup[k=8]"]
        assert report[0]["rows_out"] == 2  # edits text, drops no rows

    def test_url_stages_run_first(self, spark):
        """url_dedup + host cap lead the chain (key thinning before
        text gates); url_columns materializes PSL eTLD+1 for
        domain-weighted mixing."""
        from harness_aws_etl_pipeline_spark.operators.urlops import (
            parse_suffix_list,
        )

        rows = [
            (1, "https://a.github.io/x", "t1 " * 10),
            (2, "HTTPS://a.github.io/x#frag", "t2 " * 10),  # canonical dup of 1
            (3, "https://b.github.io/y", "t3 " * 10),
            (4, "https://b.github.io/z", "t4 " * 10),
            (5, "https://b.github.io/w", "t5 " * 10),
            (6, None, "t6 " * 10),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string, text string")
        rules = parse_suffix_list("github.io\ncom\n")
        out, report = prepare_corpus(
            df,
            url_col="url",
            max_docs_per_host=2,
            url_columns=True,
            suffix_rules=rules,
        )
        assert [r["stage"] for r in report] == [
            "url_dedup", "host_cap[2]", "url_columns",
        ]
        got = {r.doc_id: r for r in out.collect()}
        assert 2 not in got          # canonical dup dropped (min id 1 wins)
        assert 6 in got              # NULL url untouched
        b_docs = [d for d in got if got[d].url_host == "b.github.io"]
        assert len(b_docs) == 2      # host capped
        assert got[1].url_domain == "a.github.io"  # PSL private suffix

    def test_mix_stage(self, corpus):
        out, report = prepare_corpus(
            corpus, mix_weights={"src0": 1, "src1": 1}
        )
        assert report[0]["stage"] == "mix"
        assert 0 < out.count() <= 5

    def test_lazy_mode_no_report(self, corpus, bench):
        out, report = prepare_corpus(
            corpus,
            filter_preset="gopher",
            benchmark=bench,
            decontam_n=5,
            report=False,
        )
        assert report == []
        assert out.count() == 3  # same survivors, one fused plan

    def test_no_stages_is_identity(self, corpus):
        out, report = prepare_corpus(corpus)
        assert report == []
        assert out is corpus

    def test_normalize_stage_first(self, spark):
        # composed vs decomposed twins: normalization makes them exact
        # dups, so hash dedup collapses them — the stage-order reason
        df = spark.createDataFrame(
            [(1, "caf\xe9 latte"), (2, "café latte")],
            "doc_id long, text string",
        )
        out, report = prepare_corpus(df, normalize="NFKC", dedup_method="hash")
        assert [r["stage"] for r in report] == ["normalize[NFKC]", "dedup[hash]"]
        assert report[0]["removed"] == 0  # rewrite, not a drop
        assert out.count() == 1


class TestHtmlStage:
    def test_html_extract_runs_first_and_feeds_gates(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.corpus_pipeline import (
            prepare_corpus,
        )

        df = spark.createDataFrame(
            [
                (1, "<html><body><p>the quick brown fox jumps over the "
                    "lazy dog again and again</p></body></html>"),
                (2, "<p>dup</p><p>dup</p>"),
            ],
            "doc_id long, html string",
        )
        out, report = prepare_corpus(df, html_col="html")
        stages = [r["stage"] for r in report]
        assert stages[0] == "html_extract"
        rows = {r["doc_id"]: r["text"] for r in out.collect()}
        assert rows[1].startswith("the quick brown fox")
        assert "<p>" not in rows[1] and "<p>" not in rows[2]

    def test_robots_stage(self, spark):
        from harness_aws_etl_pipeline_spark.operators.corpus_pipeline import (
            prepare_corpus,
        )

        df = spark.createDataFrame(
            [
                (1, "https://a.com/ok", "fine words here today"),
                (2, "https://a.com/private/x", "secret words here today"),
            ],
            "doc_id long, url string, text string",
        )
        rules = spark.createDataFrame(
            [("a.com", "disallow", "/private/", 9)],
            "host string, rule string, prefix string, prefix_len int",
        )
        out, report = prepare_corpus(df, url_col="url", robots_rules=rules)
        assert report[0]["stage"] == "robots_filter"
        assert report[0]["removed"] == 1
        assert [r["doc_id"] for r in out.collect()] == [1]
