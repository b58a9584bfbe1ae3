from harness_aws_etl_pipeline_spark.meta.jobruns import JobRuns

__all__ = ["JobRuns"]
