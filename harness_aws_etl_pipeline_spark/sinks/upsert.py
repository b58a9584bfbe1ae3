"""Keyed upsert (merge) into a hive-partitioned table — the
incremental-load primitive the append/overwrite sinks can't express:
rows in the incoming batch REPLACE existing rows with the same key;
everything else is preserved.

Spark-first mechanics, no table format required:

1. The incoming batch's partition values are collected (a model-sized
   list — partitions, not rows) and turned into an explicit partition
   filter, so the existing-data scan reads ONLY the touched partitions
   (partition pruning, visible as PartitionFilters in the scan).
2. Survivors = touched-partition rows whose key is NOT in the batch
   (left_anti against the batch's distinct keys — broadcast when
   small).
3. Survivors ∪ batch is written with
   ``spark.sql.sources.partitionOverwriteMode=dynamic`` so ONLY the
   touched partitions are rewritten; untouched partitions are never
   read or written. At 100 TB the cost is proportional to the touched
   partitions, not the table.

The merged plan is localCheckpoint'ed before the overwrite because
Spark cannot overwrite a path it is still lazily reading from. A
production deployment at petabyte scale would stage-and-swap or use a
transactional table format; the checkpoint keeps the same semantics
single-job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_partitioned(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    partition_by: list[str],
    fmt: str = "parquet",
) -> dict:
    """Merge ``df`` into the partitioned table at ``path`` by key.

    Returns ``{"partitions_touched": n, "rows_upserted": n}``. First
    write (no existing table) degrades to a plain partitioned write.
    """
    if not key_cols or not partition_by:
        raise ValueError("upsert_partitioned needs key_cols and partition_by")
    spark: SparkSession = df.sparkSession
    local = path.removeprefix("file:")

    batch_parts = [
        tuple(r) for r in df.select(*partition_by).distinct().collect()
    ]
    if not os.path.exists(local):
        df.write.mode("overwrite").partitionBy(*partition_by).format(fmt).save(path)
        return {
            "partitions_touched": len(batch_parts),
            "rows_upserted": df.count(),
            "created": True,
        }

    # explicit partition filter → the scan prunes to touched partitions
    part_filter = F.struct(*[F.col(c) for c in partition_by]).isin(
        [F.struct(*[F.lit(v) for v in p]) for p in batch_parts]
    )
    existing = spark.read.format(fmt).load(path).filter(part_filter)
    survivors = existing.join(
        F.broadcast(df.select(*key_cols).distinct()), key_cols, "left_anti"
    )
    merged = survivors.unionByName(df.select(*survivors.columns)).localCheckpoint(
        eager=True
    )

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(*partition_by).format(fmt).save(
            path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {
        "partitions_touched": len(batch_parts),
        "rows_upserted": df.count(),
        "created": False,
    }
