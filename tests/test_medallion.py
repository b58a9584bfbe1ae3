"""Capstone integration: the reference's full medallion story on this
engine — bronze file arrivals → (streaming) ingest + T1-T8 transform →
partitioned silver parquet → gold SQL rollup → job lineage — in one
flow (reference: README.md:5-26 architecture; etl/README.md:58-145)."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from harness_aws_etl_pipeline_spark.meta import JobRuns
from harness_aws_etl_pipeline_spark.pipeline import run_job, transform
from harness_aws_etl_pipeline_spark.streaming import run_available_now, stream_ingest

BRONZE_SCHEMA = StructType(
    [
        StructField("order_id", LongType()),
        StructField("product", StringType()),
        StructField("quantity", LongType()),
        StructField("unit_price", DoubleType()),
        StructField("order_date", StringType()),
    ]
)


def _bronze(land, n_files=3):
    rows_per = 4
    for f in range(n_files):
        lines = ["order_id,product,quantity,unit_price,order_date"]
        for i in range(rows_per):
            oid = f * rows_per + i
            lines.append(
                f"{oid},widget{oid % 3},{1 + oid % 5},{9.99 + oid},2024-0{1 + f}-1{i}"
            )
        (land / f"sales_{f}.csv").write_text("\n".join(lines) + "\n")


class TestMedallionFlow:
    def test_streaming_bronze_to_silver_to_gold(self, spark, tmp_path):
        land = tmp_path / "bronze"
        land.mkdir()
        _bronze(land)

        # bronze → silver: streaming sweep with the SAME T1-T8 batch
        # transform applied per micro-batch, partitioned output
        silver = str(tmp_path / "silver")
        src = stream_ingest(spark, str(land), BRONZE_SCHEMA, fmt="csv")
        assert run_available_now(
            src,
            silver,
            str(tmp_path / "ckpt"),
            transform=lambda df: transform(df, collect_stats=False)[0],
            partition_by=["_year", "_month", "_day"],
            timeout_sec=180,
        )

        silver_df = spark.read.parquet(silver)
        assert silver_df.count() == 12
        assert {"_year", "_month", "_day", "_row_hash"} <= set(silver_df.columns)
        # heuristic date cast happened: order_date is a timestamp now
        assert dict(silver_df.dtypes)["order_date"].startswith("timestamp")

        # gold: SQL rollup over the silver table with partition pruning
        silver_df.createOrReplaceTempView("silver_sales")
        gold = spark.sql(
            """
            SELECT _year, _month, COUNT(*) AS orders,
                   ROUND(SUM(quantity * unit_price), 2) AS revenue
            FROM silver_sales WHERE _month = 2
            GROUP BY _year, _month ORDER BY _year, _month
            """
        )
        rows = gold.collect()
        assert len(rows) == 1 and rows[0]["orders"] == 4
        assert rows[0]["revenue"] > 0

    def test_batch_jobs_with_lineage(self, spark, tmp_path):
        land = tmp_path / "bronze2"
        land.mkdir()
        _bronze(land, n_files=2)
        runs = JobRuns(spark, str(tmp_path / "job_runs"))
        out = str(tmp_path / "silver2")

        r1 = run_job(
            spark, {"type": "batch", "prefix": str(land)}, out, job_runs=runs,
            job_id="sweep-1",
        )
        assert r1["status"] == "success" and r1["transform"]["rows_out"] == 8

        # second sweep of the same prefix appends (batch mode has no
        # source log — that's what the streaming variant adds)
        r2 = run_job(
            spark, {"type": "batch", "prefix": str(land)}, out, job_runs=runs,
            job_id="sweep-2",
        )
        assert r2["status"] == "success"
        assert spark.read.parquet(out).count() == 16

        lineage = {r["job_id"]: r["status"] for r in runs.latest().collect()}
        assert lineage == {"sweep-1": "SUCCESS", "sweep-2": "SUCCESS"}
