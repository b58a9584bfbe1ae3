"""S7 'scheduled' mode as Structured Streaming — the Spark-native
replacement for the reference's event-driven micro-batching.

Reference behavior: an S3 ObjectCreated event or an EventBridge
schedule triggers one Lambda batch over new files
(lambda_handler.py:165-182; extractor.py:64-67), and processed inputs
are copied to ``archive/`` then deleted (L7, loader.py:162-204).

Spark-first equivalent: the file source with ``Trigger.AvailableNow``
— the source log tracks which files were already processed (replacing
the ``pending/`` sweep), ``cleanSource=archive`` + ``sourceArchiveDir``
replace the copy+delete, and checkpointing makes the whole thing
exactly-once. One ``run_available_now`` call == one reference
"scheduled sweep", but incremental and restart-safe.

The transform applied per micro-batch is the same T1→T8 pipeline used
in batch mode — transforms are plan fragments, so batch/streaming
share them unchanged (the reason there is no separate streaming
operator implementation).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def stream_ingest(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    fmt: str = "csv",
    archive_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming file source over a landing directory.

    ``schema`` is mandatory — streaming sources cannot infer (and at
    the 100 TB design point batch sources shouldn't either).
    ``archive_dir`` enables native source archival (L7). Note Spark
    archives lazily — a processed file moves when a *later* micro-batch
    runs maintenance, so a one-shot AvailableNow sweep leaves the last
    batch's inputs in place until the next sweep; for synchronous
    archive-after-job semantics use sinks.archive_source.
    ``max_files_per_trigger`` bounds micro-batch size (the scalable
    version of the reference's BATCH_SIZE hint, config.yaml:49).
    """
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    if archive_dir is not None:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.format(fmt).load(source_dir)


def run_available_now(
    stream_df: DataFrame,
    output_path: str,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    timeout_sec: int = 300,
    on_batch: Callable[[int, dict], None] | None = None,
) -> bool:
    """Process everything currently available, then stop (the
    reference's scheduled sweep, exactly-once).

    ``on_batch(batch_id, info)`` is the streaming analogue of the
    batch job's L8/L9 hooks: called after each micro-batch commits
    with ``{"rows": n}`` — wire it to JobRuns/notifications for
    per-batch lineage. When set, the sink runs through foreachBatch
    (same write, plus the callback); otherwise the native file sink.

    Returns True if the query terminated within the timeout.
    """
    df = transform(stream_df) if transform is not None else stream_df

    if on_batch is not None:

        def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
            w = batch_df.write.mode("append")
            if partition_by:
                present = [c for c in partition_by if c in batch_df.columns]
                if present:
                    w = w.partitionBy(*present)
            getattr(w, "parquet" if fmt == "parquet" else fmt)(output_path)
            on_batch(batch_id, {"rows": batch_df.count()})

        writer = (
            df.writeStream.foreachBatch(_write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
        )
    else:
        writer = (
            df.writeStream.format(fmt)
            .option("path", output_path)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .outputMode("append")
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
    query = writer.start()
    return query.awaitTermination(timeout_sec)


def run_available_now_upsert(
    stream_df: DataFrame,
    output_path: str,
    checkpoint_dir: str,
    key_cols: list[str],
    partition_by: list[str],
    transform: Callable[[DataFrame], DataFrame] | None = None,
    moved_keys: str = "scan",
    timeout_sec: int = 300,
    on_batch: Callable[[int, dict], None] | None = None,
) -> bool:
    """Streaming MERGE: each micro-batch upserts into the partitioned
    table by key instead of appending — the standard CDC/incremental-
    load sink shape (``writeStream.foreachBatch(merge)``), built on
    :func:`sinks.upsert.upsert_partitioned` so it inherits partition
    pruning, moved-key stale cleanup, NULL-partition safety, and the
    Hadoop-FS path handling.

    Exactly-once composition: the file-source checkpoint makes batch
    REPLAY possible, not duplication — and upsert-by-key is idempotent
    under replay (the same rows replace themselves), so a crash
    between write and checkpoint commit converges to the same table.
    That is precisely why the append sink (:func:`run_available_now`)
    is NOT replay-idempotent and a keyed table should use this one.
    """
    from harness_aws_etl_pipeline_spark.sinks.upsert import upsert_partitioned

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        df = transform(batch_df) if transform is not None else batch_df
        if df.isEmpty():
            return
        stats = upsert_partitioned(
            df, output_path, key_cols, partition_by, moved_keys=moved_keys
        )
        if on_batch is not None:
            on_batch(batch_id, stats)

    query = (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query.awaitTermination(timeout_sec)
