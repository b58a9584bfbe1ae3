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

    def test_skew_join_split_fires(self, spark):
        """AQE skew-join splitting, observed at test scale by lowering
        the skew thresholds: a hot key concentrated in one partition
        gets split across tasks (plan marks the join isSkew=true)."""
        confs = {
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        }
        saved = {k: spark.conf.get(k) for k in confs}
        try:
            for k, v in confs.items():
                spark.conf.set(k, v)
            import pyspark.sql.functions as F2

            # 98% of fact rows share one key; payload pads bytes
            fact = spark.range(200000).select(
                F2.when(F2.col("id") % 50 != 0, 7).otherwise(F2.col("id")).alias("k"),
                F2.concat(F2.lit("x" * 128), F2.col("id").cast("string")).alias("pad"),
            )
            dim = spark.range(200000).select(
                F2.col("id").alias("k"), F2.lit("d").alias("attr")
            )
            joined = fact.join(dim, "k")
            # collect() executes THIS DataFrame's QueryExecution — a
            # count() would build a separate one and the inspected
            # adaptive plan would never reach isFinalPlan=true
            assert len(joined.collect()) == 200000
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan
            assert "skew=true" in plan
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)

    def test_broadcast_picked_for_small_side(self, spark):
        big = spark.range(10000).withColumn("k", F.col("id") % 100)
        small = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("v"))
        joined = big.join(small, "k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
