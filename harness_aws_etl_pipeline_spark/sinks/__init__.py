from harness_aws_etl_pipeline_spark.sinks.retention import sweep_expired, sweep_lifecycle
from harness_aws_etl_pipeline_spark.sinks.upsert import upsert_partitioned
from harness_aws_etl_pipeline_spark.sinks.writers import load, write_table, archive_source

__all__ = [
    "load",
    "write_table",
    "archive_source",
    "upsert_partitioned",
    "sweep_expired",
    "sweep_lifecycle",
]
