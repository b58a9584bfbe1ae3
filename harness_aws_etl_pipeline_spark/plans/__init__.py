from harness_aws_etl_pipeline_spark.plans.catalog import CATALOG, QuerySpec, tables

__all__ = ["CATALOG", "QuerySpec", "tables"]
