"""Bucketed tables: co-located, shuffle-free joins and aggregations.

At 100 TB the dominant cost of a fact⋈fact join is the shuffle of both
sides. Writing frequently-joined tables bucketed on the join key
(``bucketBy(n, key)`` + ``sortBy``) pins co-partitioning into the
storage layout: Spark then plans a sort-merge join with **no Exchange
on either side** (verified in tests by asserting the executed plan has
no shuffle), and aggregations on the bucket key skip their exchange
too. Pick bucket counts so (table size / buckets) fits an executor's
task comfortably — a power of two eases future resharding; both sides
must share the bucket count (or be integer multiples, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).

This is the engine's answer to "pre-partition the data for the join
you run every day" — the reference's hive-style date layout (L4) is
the pruning half; bucketing is the co-location half.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+sorted) managed table."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    w = w.sortBy(*(sort_cols or [bucket_col]))
    w.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — planned without exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


@contextmanager
def bucketed_g2_demo(
    spark: SparkSession, sf_dir: str, prefix: str, num_buckets: int = 8
):
    """The g2 fact⋈fact demonstration harness shared by bench.py and
    tools/explain_audit.py (one definition — the measured layout and
    the documented plan can't drift apart): writes lineitem/orders
    bucketed+sorted on the join key as ``{prefix}_lineitem`` /
    ``{prefix}_orders``, disables broadcast (so the comparison is
    shuffle-join vs bucket-join — at 100 TB neither fact side
    broadcasts), and yields ``(joined_bucketed, joined_plain)``.
    Restores the conf and drops the tables on exit."""
    from pyspark.sql import functions as F

    from harness_aws_etl_pipeline_spark.plans.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed(
            li, f"{prefix}_lineitem", "l_orderkey", num_buckets,
            sort_cols=["l_orderkey"],
        )
        write_bucketed(
            od, f"{prefix}_orders", "o_orderkey", num_buckets,
            sort_cols=["o_orderkey"],
        )
        joined_b = spark.table(f"{prefix}_lineitem").join(
            spark.table(f"{prefix}_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        joined_p = li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        yield joined_b, joined_p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_lineitem")
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_orders")


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (test and
    tuning helper — 'did bucketing actually remove the shuffle?').
    BroadcastExchange doesn't count: it ships one small side to every
    executor; the cost bucketing eliminates is hash-repartitioning."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        "Exchange" in line and "BroadcastExchange" not in line
        for line in plan.splitlines()
    )
