"""Small-file compaction for partitioned parquet tables.

The reference writes one file per job (loader.py:94); thousands of
jobs → the classic small-file problem (every downstream scan pays a
task + open per file). This utility rewrites a table with bounded file
counts, preserving the hive partition layout.

Strategy: read → repartition on the partition columns (so each output
partition directory is written by as few tasks as hold its data) →
write with ``maxRecordsPerFile`` as the upper bound. For very skewed
partition sizes, pass ``files_per_partition > 1`` to spread a hot
partition over several files (repartition by partition cols + a
bounded random split key).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def compact_table(
    spark: SparkSession,
    path: str,
    partition_cols: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
    files_per_partition: int = 1,
    target_path: str | None = None,
) -> dict:
    """Rewrite ``path`` with compacted files; in-place when
    ``target_path`` is None (write to temp sibling, then swap).

    All path operations go through the Hadoop FileSystem adapter
    (sinks/fs.py) so the swap works on any scheme the cluster has a
    connector for, not just the local filesystem. Single-writer
    operation: the staging dir name is deterministic (so a crashed
    run's leftovers are found and cleaned), which also means two
    concurrent compactions of the same table would clobber each other
    — serialize them like any other table rewrite.
    """
    from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

    fs = get_fs(path, spark)
    df = spark.read.parquet(path)
    in_place = target_path is None
    # deterministic temp sibling (same parent → same filesystem, so
    # the final rename is a metadata move, never a copy)
    dest = target_path or path.rstrip("/") + ".__compacting__"
    if in_place and fs.exists(dest):
        fs.delete(dest, recursive=True)  # stale leftover from a crash

    if partition_cols:
        if files_per_partition > 1:
            split = (F.rand(7) * files_per_partition).cast("int")
            df = df.repartition(*[F.col(c) for c in partition_cols], split)
        else:
            df = df.repartition(*[F.col(c) for c in partition_cols])
        writer = df.write.mode("overwrite").partitionBy(*partition_cols)
    else:
        df = df.coalesce(max(files_per_partition, 1))
        writer = df.write.mode("overwrite")
    writer.option("maxRecordsPerFile", max_records_per_file).parquet(dest)

    if in_place:
        # rename-aside swap: a crash at any point leaves either the
        # old table or both copies on disk, never neither
        aside = path.rstrip("/") + ".__old__"
        if fs.exists(aside):
            fs.delete(aside, recursive=True)
        if not fs.rename(path, aside):
            raise IOError(f"compact: could not move table aside to {aside!r}")
        if not fs.rename(dest, path):
            fs.rename(aside, path)  # roll back
            raise IOError("compact: swap rename failed; table restored")
        fs.delete(aside, recursive=True)
        dest = path

    return {"path": dest, "parquet_files": fs.file_count(dest, ".parquet")}
