"""G3 — SQL entry point: views, partitioned external table, MSCK."""

from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.plans.sqlapi import (
    create_partitioned_table,
    repair_table,
    register_views,
)


class TestSqlApi:
    def test_views_and_adhoc_sql(self, spark):
        register_views(spark, "/root/testdata/sf0.001", names=("nation", "region"))
        got = spark.sql(
            "SELECT r_name, COUNT(*) AS n FROM nation "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        )
        assert got.count() == 5
        assert got.agg(F.sum("n")).first()[0] == 25

    def test_partitioned_table_msck(self, spark, tmp_path):
        # write hive-layout data OUTSIDE the catalog, then discover it
        df = spark.createDataFrame(
            [(1, 10.0, 2024, 1), (2, 20.0, 2024, 2), (3, 30.0, 2025, 1)],
            "id long, amount double, _year int, _month int",
        )
        loc = str(tmp_path / "silver")
        df.write.partitionBy("_year", "_month").parquet(loc)

        create_partitioned_table(
            spark,
            "silver_sales_test",
            loc,
            "id BIGINT, amount DOUBLE",
            ["_year INT", "_month INT"],
        )
        try:
            # catalog knows no partitions yet
            assert spark.sql("SELECT * FROM silver_sales_test").count() == 0
            repair_table(spark, "silver_sales_test")
            assert spark.sql("SELECT * FROM silver_sales_test").count() == 3
            # partition pruning: only one directory scanned
            pruned = spark.sql(
                "SELECT * FROM silver_sales_test WHERE _year = 2025"
            )
            assert pruned.count() == 1
            plan = pruned._jdf.queryExecution().executedPlan().toString()
            assert "PartitionFilters" in plan
        finally:
            spark.sql("DROP TABLE IF EXISTS silver_sales_test")
