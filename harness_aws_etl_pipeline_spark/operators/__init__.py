"""Composable DataFrame operators.

Each operator is a pure ``DataFrame -> DataFrame`` (or
``DataFrame -> (DataFrame, stats)``) function, individually testable,
mirroring the reference transform pipeline's steps (reference:
etl/src/transform/transformer.py:39-93) plus the large-scale
training-data extensions (dedup_fuzzy, textops, similarity, multimodal).
"""

from harness_aws_etl_pipeline_spark.operators.normalize import normalize_column_names, normalize_name
from harness_aws_etl_pipeline_spark.operators.nulls import (
    drop_null_rows,
    fill_nulls,
    flag_nulls,
    handle_nulls,
    null_counts,
)
from harness_aws_etl_pipeline_spark.operators.dedup import deduplicate_exact
from harness_aws_etl_pipeline_spark.operators.casts import (
    cast_date_like_columns,
    infer_numeric_columns,
    numeric_parse_ratios,
)
from harness_aws_etl_pipeline_spark.operators.derive import (
    add_processing_timestamp,
    add_row_hash,
    add_date_partitions,
)
from harness_aws_etl_pipeline_spark.operators.profile import profile, validate

__all__ = [
    "normalize_column_names",
    "normalize_name",
    "drop_null_rows",
    "fill_nulls",
    "flag_nulls",
    "handle_nulls",
    "null_counts",
    "deduplicate_exact",
    "cast_date_like_columns",
    "infer_numeric_columns",
    "numeric_parse_ratios",
    "add_processing_timestamp",
    "add_row_hash",
    "add_date_partitions",
    "profile",
    "validate",
]
