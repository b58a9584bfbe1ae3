"""Streaming corpus prep (streaming/corpus.py): real readStream
micro-batches through filter → decontam → incremental dedup gate →
keyed upsert, plus the fresh-checkpoint replay (exactly-once) case."""

from __future__ import annotations

import pytest

LOREM = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(30))
OTHER = " ".join(f"delta{i} epsilon{i} zeta{i}" for i in range(30))
SHORTY = "tiny"
BENCH_GRAM = "quantized holographic flux capacitor calibration routine"


@pytest.fixture()
def src(spark, tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    rows = [
        (1, LOREM),
        (2, OTHER),
        (3, LOREM + " tail"),            # near-dup of 1 at threshold .5
        (4, SHORTY),                     # unsigned: too short to shingle
        (5, OTHER.replace("delta1 ", f"{BENCH_GRAM} ")),  # contaminated
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(d / "b0"))
    return d


@pytest.fixture()
def bench(spark):
    return spark.createDataFrame(
        [(1, f"eval question about the {BENCH_GRAM} please")],
        "qid long, text string",
    )


def _run(spark, src, tmp_path, bench, ckpt):
    from harness_aws_etl_pipeline_spark.streaming.corpus import (
        run_streaming_corpus_prep,
    )

    batches = {}
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "b0")
    )
    run_streaming_corpus_prep(
        stream,
        str(tmp_path / "out"),
        str(tmp_path / ckpt),
        str(tmp_path / "state"),
        benchmark=bench,
        decontam_n=5,
        dedup_threshold=0.5,
        on_batch=lambda bid, info: batches.update({bid: info}),
    )
    return batches


class TestStreamingCorpusPrep:
    def test_gates_compose_end_to_end(self, spark, src, tmp_path, bench):
        batches = _run(spark, src, tmp_path, bench, "ckpt1")
        info = batches[0]
        assert info["rows_in"] == 5
        assert info["after_decontam"] == 4          # doc 5 dropped
        assert info["accepted"] == 3                # 3 loses to 1; 4 unsigned passes
        out = spark.read.parquet(str(tmp_path / "out"))
        ids = {r.doc_id for r in out.collect()}
        assert ids == {1, 2, 4}
        assert "_part" in out.columns               # synthetic partition key

    def test_fresh_checkpoint_replay_is_exactly_once(
        self, spark, src, tmp_path, bench
    ):
        _run(spark, src, tmp_path, bench, "ckpt1")
        out1 = sorted(
            map(tuple, spark.read.parquet(str(tmp_path / "out")).collect())
        )
        # same data, FRESH checkpoint → same batch id → ledger skip;
        # output unchanged, state version unchanged
        batches = _run(spark, src, tmp_path, bench, "ckpt2")
        assert batches[0]["skipped_replay"] is True
        assert batches[0]["accepted"] == 0          # hook never ran
        out2 = sorted(
            map(tuple, spark.read.parquet(str(tmp_path / "out")).collect())
        )
        assert out1 == out2

    def test_custom_id_col(self, spark, tmp_path, bench):
        """Non-default id_col: process_batch normalizes ids to an
        internal doc_id; the output hook must rename back before the
        semi-join (regression: AnalysisException for any id_col other
        than 'doc_id')."""
        from harness_aws_etl_pipeline_spark.streaming.corpus import (
            run_streaming_corpus_prep,
        )

        d = tmp_path / "src2"
        d.mkdir()
        spark.createDataFrame(
            [("a", LOREM), ("b", OTHER), ("c", LOREM + " tail")],
            "item_key string, body string",
        ).coalesce(1).write.parquet(str(d / "b0"))
        batches = {}
        stream = spark.readStream.schema("item_key string, body string").parquet(
            str(d / "b0")
        )
        run_streaming_corpus_prep(
            stream,
            str(tmp_path / "out2"),
            str(tmp_path / "ckpt_id"),
            str(tmp_path / "state2"),
            id_col="item_key",
            text_col="body",
            dedup_threshold=0.5,
            on_batch=lambda bid, info: batches.update({bid: info}),
        )
        assert batches[0]["accepted"] == 2          # c loses to a
        out = spark.read.parquet(str(tmp_path / "out2"))
        assert {r.item_key for r in out.collect()} == {"a", "b"}

    def test_second_batch_dedups_against_state(self, spark, src, tmp_path, bench):
        _run(spark, src, tmp_path, bench, "ckpt1")
        # a second drop of files: one state-dup, one genuinely new.
        # Written to a staging dir and the part-file copied INTO b0 —
        # the file source lists b0 flat (no recursive lookup)
        import shutil

        staging = tmp_path / "staging"
        spark.createDataFrame(
            [(10, LOREM + " more"), (11, "brand new content " * 20)],
            "doc_id long, text string",
        ).coalesce(1).write.parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.copy(part, src / "b0" / "later-drop.parquet")
        batches = _run(spark, src, tmp_path, bench, "ckpt1")
        # the new batch (id 1) accepts only the genuinely-new doc
        assert batches[1]["accepted"] == 1
        ids = {
            r.doc_id
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        }
        assert ids == {1, 2, 4, 11}


class TestStreamingSpanGate:
    def test_cross_batch_span_cut_and_replay(self, spark, tmp_path):
        """span_state_path enables the substring gate: batch 2's doc
        shares a 12-token passage with batch 1 — the passage is cut
        BEFORE the doc-level gate (so the otherwise-distinct doc is
        accepted without it), and a fresh-checkpoint replay converges
        with the span commit skipped."""
        import shutil

        from harness_aws_etl_pipeline_spark.streaming.corpus import (
            run_streaming_corpus_prep,
        )

        boiler = " ".join(f"flux{i}" for i in range(12))
        d = tmp_path / "src_span"
        d.mkdir()
        spark.createDataFrame(
            [(1, " ".join(f"aa{i}" for i in range(30)) + " " + boiler)],
            "doc_id long, text string",
        ).coalesce(1).write.parquet(str(d / "b0"))

        def run(ck):
            batches = {}
            stream = spark.readStream.schema("doc_id long, text string").parquet(
                str(d / "b0")
            )
            run_streaming_corpus_prep(
                stream,
                str(tmp_path / "out_span"),
                str(tmp_path / ck),
                str(tmp_path / "state_span_doc"),
                span_state_path=str(tmp_path / "state_span_gram"),
                span_k=8,
                dedup_threshold=0.5,
                on_batch=lambda bid, info: batches.update({bid: info}),
            )
            return batches

        b = run("ck_span1")
        assert b[0]["accepted"] == 1 and b[0]["span_new_grams"] > 0

        # second drop: distinct text + the SAME passage
        staging = tmp_path / "staging_span"
        spark.createDataFrame(
            [(2, " ".join(f"bb{i}" for i in range(30)) + " " + boiler)],
            "doc_id long, text string",
        ).coalesce(1).write.parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.copy(part, d / "b0" / "later-span.parquet")
        b = run("ck_span1")
        assert b[1]["accepted"] == 1                  # distinct doc accepted
        out = spark.read.parquet(str(tmp_path / "out_span"))
        texts = {r.doc_id: r.text for r in out.collect()}
        assert boiler in texts[1]                     # first occurrence kept
        assert boiler not in texts[2]                 # cross-batch span cut
        assert texts[2].startswith("bb0")

        # fresh checkpoint, same data: both ledgers short-circuit
        b = run("ck_span2")
        assert b[0]["skipped_replay"] is True
        assert b[0]["span_commit_skipped"] is True
        out2 = {r.doc_id: r.text for r in spark.read.parquet(
            str(tmp_path / "out_span")).collect()}
        assert out2 == texts


class TestStreamingTakedown:
    def test_rules_enforced_per_batch_before_gates(self, spark, tmp_path, src, bench):
        from harness_aws_etl_pipeline_spark.operators.takedown import (
            TakedownRules,
        )
        from harness_aws_etl_pipeline_spark.streaming.corpus import (
            run_streaming_corpus_prep,
        )

        batches = {}
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(src / "b0")
        )
        ok = run_streaming_corpus_prep(
            stream,
            str(tmp_path / "out_td"),
            str(tmp_path / "ckpt_td"),
            str(tmp_path / "state_td"),
            takedown_rules=TakedownRules(ids=(2,)),
            benchmark=bench,
            decontam_n=5,
            dedup_threshold=0.5,
            on_batch=lambda bid, info: batches.update({bid: info}),
        )
        assert ok
        info = batches[0]
        assert info["after_takedown"] == info["rows_in"] - 1
        out_ids = {
            r["doc_id"]
            for r in spark.read.parquet(str(tmp_path / "out_td")).collect()
        }
        assert 2 not in out_ids and 1 in out_ids
