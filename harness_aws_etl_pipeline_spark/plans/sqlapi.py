"""G3 — SQL entry point: table registration, partitioned external
tables, partition discovery.

Reference capability (etl/README.md:656-676): an Athena
``CREATE EXTERNAL TABLE ... PARTITIONED BY ... STORED AS PARQUET`` over
the Silver layer plus ``MSCK REPAIR TABLE`` for partition discovery,
then ad-hoc SQL (etl/README.md:679-685). Spark SQL supports the same
DDL natively; this module provides the engine-side wrappers:

- ``register_views``: session-scoped temp views over the test tables
  (the zero-DDL path for ad-hoc SQL, ``spark.sql(...)``).
- ``create_partitioned_table`` + ``repair_table``: a real external
  parquet table with hive partition layout and MSCK discovery — the
  persistent-catalog path. Partition pruning then shows up in plans as
  ``PartitionFilters`` (scan skips non-matching directories entirely —
  at 100 TB this is the difference between scanning a day and scanning
  a decade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from harness_aws_etl_pipeline_spark.plans.catalog import TABLE_NAMES, load_table


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register the test tables as temp views for ``spark.sql``."""
    for t in names:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Ad-hoc SQL over the registered tables (registers on demand)."""
    register_views(spark, sf_dir)
    return spark.sql(query)


def create_partitioned_table(
    spark: SparkSession,
    table_name: str,
    location: str,
    schema_ddl: str,
    partition_cols: list[str],
) -> None:
    """``CREATE TABLE ... USING PARQUET PARTITIONED BY ... LOCATION``
    — the Spark-native form of the reference's Athena DDL."""
    cols = ", ".join(partition_cols)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table_name} ({schema_ddl}) "
        f"USING PARQUET PARTITIONED BY ({cols}) LOCATION '{location}'"
    )


def repair_table(spark: SparkSession, table_name: str) -> None:
    """``MSCK REPAIR TABLE`` — discover hive-layout partitions added
    outside the catalog (the reference's post-write step,
    etl/README.md:676)."""
    spark.sql(f"MSCK REPAIR TABLE {table_name}")
