"""[EXT] Streaming corpus preparation — the continuous-ingest twin of
``operators.corpus_pipeline.prepare_corpus``.

Each micro-batch runs the stateless gates (quality-filter preset,
benchmark decontamination against a STATIC benchmark frame), the
optional stateful SUBSTRING gate (``span_state_path`` —
:class:`operators.incremental.IncrementalSpanDeduper`: duplicated
k-token spans vs every gram ever seen are cut from the batch text),
and then the stateful cross-batch near-dup gate
(:class:`operators.incremental.IncrementalDeduper` — batch vs
everything ever accepted), with the surviving documents upserted into
a partition-keyed output table.

Span-gate ordering (the part that makes it exactly-once): the clean
pass is PURE against the pre-batch gram state; the gram commit runs
LAST, after the doc-gate commit, under its own txn ledger.  Crash
before the doc commit → full deterministic recompute; crash between
the two commits → doc-gate skip + gram commit alone (the cleaned
output was already written through pre_commit); replay after both →
both ledgers skip.

Exactly-once, spelled out (the part streaming corpus pipelines
usually get wrong):

- The deduper's snapshot-table txn ledger short-circuits REPLAYED
  batches (fresh checkpoint, same data ⇒ same batch id ⇒ skip).
- The output write happens in ``process_batch``'s ``pre_commit`` hook
  — BEFORE the state commit — through the keyed, replay-idempotent
  ``upsert_partitioned``.  Every crash ordering converges:
  crash before the output write → nothing committed, the replayed
  batch recomputes the identical accepted set (acceptance is a
  deterministic function of batch + state, and the state is
  unchanged); crash between output write and state commit → the
  recompute upserts the SAME rows over themselves and then commits;
  replay after the commit → the ledger skips both.
- Stateless gates are deterministic functions of the batch, so they
  need no state of their own.

Scale: the stateless gates are pure column work on the micro-batch;
the dedup gate's cost is bounded by batch × matching-state buckets
(see ``operators/incremental.py``); the output upsert rewrites only
the partitions the batch touches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

__all__ = ["run_streaming_corpus_prep"]


def run_streaming_corpus_prep(
    stream_df: DataFrame,
    output_path: str,
    checkpoint_dir: str,
    state_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_by: list[str] | None = None,
    filter_preset: str | None = None,
    takedown_rules=None,
    url_col: str | None = None,
    benchmark: DataFrame | None = None,
    decontam_n: int = 13,
    dedup_threshold: float = 0.5,
    span_state_path: str | None = None,
    span_k: int = 50,
    span_track_hits: bool = False,
    app_id: str = "stream_corpus",
    timeout_sec: int = 300,
    on_batch: Callable[[int, dict], None] | None = None,
) -> bool:
    """Drain ``stream_df`` (Trigger.AvailableNow) through the corpus
    gates into a keyed parquet table at ``output_path``.

    Returns the query's termination status.  ``on_batch(batch_id,
    info)`` receives per-batch counts (rows_in / after each gate /
    accepted) for monitoring.

    ``takedown_rules`` (a :class:`~..operators.takedown.TakedownRules`)
    enforces erasure rules on EVERY batch before the quality gates —
    the continuous-enforcement half of the governance story (the
    retroactive half is ``takedown_from_table`` on the output table).
    """
    from harness_aws_etl_pipeline_spark.operators.incremental import (
        IncrementalDeduper,
        IncrementalSpanDeduper,
    )
    from harness_aws_etl_pipeline_spark.sinks.upsert import upsert_partitioned

    from pyspark.sql import functions as F

    spark = stream_df.sparkSession
    dd = IncrementalDeduper(spark, state_path, threshold=dedup_threshold)
    span_dd = (
        IncrementalSpanDeduper(
            spark, span_state_path, k=span_k, track_hits=span_track_hits
        )
        if span_state_path is not None
        else None
    )
    # the keyed upsert needs partition columns to prune its rewrites;
    # without a natural one, a 16-way id-hash partition bounds every
    # batch's rewrite to the partitions it touches
    parts = partition_by or ["_part"]
    synthetic = partition_by is None

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        info: dict = {"rows_in": batch_df.count()}
        df = batch_df
        if takedown_rules is not None:
            from harness_aws_etl_pipeline_spark.operators.takedown import (
                apply_takedown,
            )

            df = apply_takedown(
                df, takedown_rules, id_col=id_col, url_col=url_col,
                text_col=text_col,
            )
            info["after_takedown"] = df.count()
        if filter_preset is not None:
            from harness_aws_etl_pipeline_spark.operators.filters import (
                apply_quality_filters,
            )

            df = apply_quality_filters(
                df, filter_preset, text_col=text_col, mode="filter"
            )
            info["after_filter"] = df.count()
        if benchmark is not None:
            from harness_aws_etl_pipeline_spark.operators.decontam import (
                decontaminate,
            )

            df = decontaminate(
                df, benchmark, n=decontam_n, id_col=id_col, text_col=text_col
            )
            info["after_decontam"] = df.count()
        if span_dd is not None:
            # PURE clean against the pre-batch span state; the gram
            # commit happens LAST (after the doc-gate commit) so a
            # replay in any crash window recomputes the identical
            # cleaned text — see IncrementalSpanDeduper's streaming
            # caveat.  pre_span is cached: the clean pass walks it and
            # the gram commit recounts it.
            pre_span = df.persist()
            df = span_dd.clean_batch(
                pre_span, id_col=id_col, text_col=text_col
            )["cleaned"]
            info["span_docs"] = pre_span.count()
        else:
            pre_span = None
        # cache: the dedup gate walks the batch several times (sigs,
        # internal pairs, state join) and the pre_commit semi-join
        # reads it again
        df = df.persist()
        try:
            accepted_box: dict = {}

            def _write_out(accepted_ids: DataFrame) -> None:
                # process_batch normalizes ids to an internal "doc_id"
                # column; rename back so the semi-join works for any
                # caller-supplied id_col
                ids = accepted_ids
                if id_col != "doc_id":
                    ids = ids.withColumnRenamed("doc_id", id_col)
                accepted = df.join(ids, id_col, "left_semi")
                if synthetic:
                    accepted = accepted.withColumn(
                        "_part", F.pmod(F.xxhash64(F.col(id_col)), F.lit(16))
                    )
                accepted_box["n"] = accepted.count()
                if accepted_box["n"]:
                    upsert_partitioned(
                        accepted, output_path, [id_col], parts
                    )

            out = dd.process_batch(
                df,
                id_col=id_col,
                text_col=text_col,
                txn=(app_id, batch_id),
                pre_commit=_write_out,
            )
            info["skipped_replay"] = out["skipped"]
            info["accepted"] = accepted_box.get("n", 0)
            if span_dd is not None:
                # gram commit LAST, and attempted even when the doc
                # gate skipped: a crash between the two commits
                # replays into doc-skip + THIS commit alone (the
                # cleaned text was already written through
                # pre_commit); the span ledger dedups its own replays
                sp = span_dd.commit_grams(
                    pre_span, id_col=id_col, text_col=text_col,
                    txn=(f"{app_id}-span", batch_id),
                )
                info["span_new_grams"] = sp["new_grams"]
                info["span_commit_skipped"] = sp["skipped"]
        finally:
            df.unpersist()
            if pre_span is not None:
                pre_span.unpersist()
        if on_batch is not None:
            on_batch(batch_id, info)

    query = (
        stream_df.writeStream.foreachBatch(_gate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query.awaitTermination(timeout_sec)
