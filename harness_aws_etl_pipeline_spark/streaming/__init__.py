from harness_aws_etl_pipeline_spark.streaming.ingest import stream_ingest, run_available_now
from harness_aws_etl_pipeline_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    session_counts,
)

__all__ = [
    "stream_ingest",
    "run_available_now",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
]
