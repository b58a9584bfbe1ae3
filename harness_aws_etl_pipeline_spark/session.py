"""SparkSession factory with scale-minded defaults.

The reference engine runs in a single 256 MB Lambda process
(reference: infrastructure/terraform/main.tf:317) — its only knobs are
file-size caps. Here the session is configured for Spark's distributed
execution model instead: AQE for runtime re-planning (skew joins,
partition coalescing), snappy parquet, UTC session time, Arrow for any
pandas interchange.

Local test/bench runs use ``local[N]``; on a real cluster the same
builder config applies unchanged (master comes from spark-submit).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "harness-aws-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults are chosen for the 100 TB design point but scale down to
    local mode:

    - AQE on: runtime shuffle-partition coalescing, skew-join splitting,
      and dynamic join-strategy switching — the engine never
      hand-schedules what the optimizer re-plans better with runtime
      stats.
    - ``spark.sql.shuffle.partitions`` defaults to the local core count
      (not Spark's legacy 200); on a cluster AQE coalesces upward from
      a high initial value, so set it to ~2-3× total cores there.
    - Arrow enabled: every pandas_udf / mapInPandas crossing is
      columnar-batched, never row-at-a-time pickling.
    - UTC session timezone: timestamp semantics independent of host tz.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    # Scan-split sizing (guide §6): Spark charges every file
    # ``openCostInBytes`` (default 4 MB) when packing splits, which
    # floors the split size at 4 MB — on small inputs that caps scan
    # parallelism at totalBytes/4MB tasks no matter how many cores are
    # idle (an 11 MB table scans with 3 tasks on 32 cores). 128 KB
    # models a local-SSD/parquet open cost honestly and lets the split
    # size follow bytes-per-core (totalBytes / defaultParallelism), so
    # the setting adapts to SPARK_GRAFT_CPUS instead of hard-coding a
    # parallelism. At production scale files are >= maxPartitionBytes
    # and the open-cost term never binds — the knob is inert there.
    open_cost = int(os.environ.get("SPARK_GRAFT_OPEN_COST", 128 * 1024))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.openCostInBytes", str(open_cost))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
