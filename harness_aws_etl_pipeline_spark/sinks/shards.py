"""[EXT] Token-bounded training-shard layout.

Trainers consume a corpus as a sequence of shards with a predictable
token budget each (data-loader memory, checkpoint-resume granularity,
shuffle-buffer sizing).  This module assigns packed bins (or any
token-counted rows) to consecutive shards of ``tokens_per_shard``
tokens and writes one directory per shard.

The assignment needs a GLOBAL running token total in ``order_col``
order — the naive formulation is a single-partition window (one task
scans the world).  :func:`assign_shards` uses the scalable two-level
prefix sum instead:

1. ``repartitionByRange(order_col)`` — ordered, parallel partitions.
2. per-partition token sums — one tiny aggregate (#partitions rows).
3. driver-side prefix offsets over those sums (model-sized).
4. within-partition cumulative sums — a window PARTITIONED BY the
   range-partition id, so every partition computes its prefix in
   parallel; global running total = driver offset + local cumsum.

Shard id = ``(running_total - row_tokens) // tokens_per_shard`` (the
shard the row STARTS in), so every shard holds ≤ tokens_per_shard
tokens plus at most one boundary row's overflow — the exact semantics
of sequential shard filling, computed with no global bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assign_shards", "write_training_shards"]


def assign_shards(
    df: DataFrame,
    tokens_per_shard: int,
    token_col: str = "total_tokens",
    order_col: str = "bin_id",
    shard_col: str = "shard_id",
    num_range_parts: int | None = None,
) -> DataFrame:
    """Add ``shard_col`` — the 0-based token-bounded shard index in
    ``order_col`` order (see module doc for the two-level prefix sum).
    Deterministic: a pure function of (order_col, token_col) values,
    independent of the input partitioning.

    The ranged frame is evaluated by TWO jobs (the per-partition sums,
    then the within-partition window), so it is pinned with an eager
    ``localCheckpoint`` across them — otherwise a nondeterministic
    input (sample/limit/nondeterministic UDF upstream) could recompute
    differently in job 2 and silently disagree with the driver
    offsets.  localCheckpoint (not persist) keeps the engine's
    cache-hygiene contract — no CacheManager entry to leak; the
    blocks are released when the frame is garbage-collected."""
    if tokens_per_shard < 1:
        raise ValueError("tokens_per_shard must be >= 1")
    nparts = num_range_parts or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    ranged = (
        df.repartitionByRange(int(nparts), F.col(order_col))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # per-range-partition sums: tiny (one row per partition), and the
    # partition -> key-range mapping is monotone by construction
    psums = (
        ranged.groupBy("__pid")
        .agg(
            F.sum(token_col).alias("__ptok"),
            F.min(order_col).alias("__pmin"),
        )
        .collect()
    )
    offsets: dict[int, int] = {}
    run = 0
    for r in sorted(psums, key=lambda r: (r["__pmin"] is None, r["__pmin"])):
        offsets[r["__pid"]] = run
        run += int(r["__ptok"] or 0)

    off_map = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.withColumn("__cum", F.sum(token_col).over(w))
        .withColumn(
            shard_col,
            (
                (off_map[F.col("__pid")] + F.col("__cum") - F.col(token_col))
                / F.lit(tokens_per_shard)
            ).cast("long"),
        )
        .drop("__pid", "__cum")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    tokens_per_shard: int,
    token_col: str = "total_tokens",
    order_col: str = "bin_id",
    fmt: str = "parquet",
) -> dict:
    """Assign shards and write ``path/shard_id=N/`` directories (one
    coalesced file per shard — a shard is bounded by construction, so
    the single writer task per shard is the point, not a bottleneck).
    Returns ``{"shards", "rows", "tokens"}``."""
    assigned = assign_shards(df, tokens_per_shard, token_col, order_col)
    # one file per shard: repartition on the shard key, then hive-
    # partition by it (each task writes only its own shard dirs)
    (
        assigned.repartition(F.col("shard_id"))
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .format(fmt)
        .save(path)
    )
    row = assigned.agg(
        F.countDistinct("shard_id").alias("s"),
        F.count(F.lit(1)).alias("r"),
        F.sum(token_col).alias("t"),
    ).collect()[0]
    return {"shards": int(row["s"]), "rows": int(row["r"]), "tokens": int(row["t"])}
