from harness_aws_etl_pipeline_spark.meta import alerts
from harness_aws_etl_pipeline_spark.meta.jobruns import JobRuns

__all__ = ["JobRuns", "alerts"]
