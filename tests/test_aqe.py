"""AQE behaviors the 100 TB design leans on, proven at test scale."""

from pyspark.sql import functions as F


class TestAdaptiveExecution:
    def test_aqe_enabled_and_coalesces_shuffle(self, spark):
        assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
        assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
        # tiny aggregate over a 4-slot session: AQE should coalesce the
        # shuffle down from the configured partition count
        df = (
            spark.range(1000)
            .withColumn("k", F.col("id") % 5)
            .groupBy("k")
            .count()
        )
        df.collect()  # materialize so AQE finalizes the plan
        n_parts = df.rdd.getNumPartitions()
        configured = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert n_parts <= configured
        assert n_parts <= 2  # 5 tiny groups collapse to 1-2 partitions

    def test_broadcast_picked_for_small_side(self, spark):
        big = spark.range(10000).withColumn("k", F.col("id") % 100)
        small = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("v"))
        joined = big.join(small, "k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
