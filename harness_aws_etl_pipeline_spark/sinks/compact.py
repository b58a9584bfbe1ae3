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
    ``target_path`` is None (write to temp sibling, then swap)."""
    import os
    import shutil
    import tempfile

    df = spark.read.parquet(path)
    in_place = target_path is None
    dest = target_path or tempfile.mkdtemp(
        prefix=".compact_", dir=os.path.dirname(path.rstrip("/")) or "."
    )

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
        local_src = path.removeprefix("file:")
        shutil.rmtree(local_src)
        shutil.move(dest, local_src)
        dest = path

    def _count_files(p: str) -> int:
        n = 0
        for _root, _dirs, files in os.walk(p.removeprefix("file:")):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    return {"path": dest, "parquet_files": _count_files(dest)}
