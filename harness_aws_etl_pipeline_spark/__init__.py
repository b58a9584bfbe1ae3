"""harness_aws_etl_pipeline_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference
serverless medallion ETL pipeline (tmmsunny012/harness-aws-etl-pipeline:
S3 → Lambda/pandas → partitioned Parquet, with job metadata + Gold-layer
analytics) as an idiomatic Apache Spark engine:

- extract  → ``spark.read`` multi-format sources with per-file error
  isolation and trigger routing (sources/)
- transform → composable DataFrame operators: column normalization,
  null handling, dedup, heuristic casts, derived fields, profiling
  (operators/)
- load     → partitioned Parquet/CSV/JSON sinks with empty-skip and
  archival semantics (sinks/)
- gold     → aggregation/join/window query tier (plans/)
- streaming → file-arrival micro-batching as Structured Streaming with
  Trigger.AvailableNow (streaming/)
- meta     → job_runs lifecycle table replacing DynamoDB metadata (meta/)

Plus large-scale training-data-pipeline extensions: exact & fuzzy
deduplication (MinHash-LSH, SimHash, n-gram Jaccard), similarity search
over embedding columns, text analysis, and multimodal binary-column
plumbing (operators/dedup_fuzzy.py, operators/similarity.py,
operators/textops.py, operators/multimodal.py).

Everything is built on the public PySpark DataFrame/SQL API; plans are
declared logically and optimized by Catalyst. No RDD-level code.
"""

from harness_aws_etl_pipeline_spark.session import get_spark
from harness_aws_etl_pipeline_spark.config import EngineConfig

__version__ = "0.1.0"

__all__ = ["get_spark", "EngineConfig", "__version__"]
