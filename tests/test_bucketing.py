"""Bucketed co-located joins: the shuffle must disappear."""

from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.plans.bucketing import (
    bucketed_join,
    plan_has_shuffle,
    write_bucketed,
)


import pytest


@pytest.fixture
def no_broadcast(spark):
    """Force sort-merge joins so the test exercises the shuffle path
    bucketing is meant to eliminate (tiny test tables would otherwise
    broadcast and hide it)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


class TestBucketing:
    def test_bucketed_join_has_no_shuffle(self, spark, no_broadcast):
        orders = spark.createDataFrame(
            [(i, i % 50, float(i)) for i in range(1000)],
            "o_orderkey long, o_custkey long, total double",
        )
        lines = spark.createDataFrame(
            [(i % 1000, j, float(j)) for i in range(2000) for j in (1, 2)],
            "l_orderkey long, l_linenumber int, qty double",
        )
        try:
            write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=4)
            write_bucketed(
                lines.withColumnRenamed("l_orderkey", "o_orderkey"),
                "b_lines",
                "o_orderkey",
                num_buckets=4,
            )
            joined = bucketed_join(spark, "b_orders", "b_lines", "o_orderkey")
            # correctness: same result as the plain join
            plain = orders.join(
                lines, orders.o_orderkey == lines.l_orderkey
            ).count()
            assert joined.count() == plain == 4000
            # the point: no shuffle on either side
            assert not plan_has_shuffle(joined)
            # and the unbucketed twin DOES shuffle
            assert plan_has_shuffle(
                orders.join(lines, orders.o_orderkey == lines.l_orderkey)
            )
        finally:
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_lines")

    def test_aggregation_on_bucket_key_no_shuffle(self, spark):
        df = spark.createDataFrame(
            [(i % 10, float(i)) for i in range(100)], "k long, v double"
        )
        try:
            write_bucketed(df, "b_agg", "k", num_buckets=4)
            agg = spark.table("b_agg").groupBy("k").agg(F.sum("v"))
            assert agg.count() == 10
            assert not plan_has_shuffle(agg)
        finally:
            spark.sql("DROP TABLE IF EXISTS b_agg")
