from harness_aws_etl_pipeline_spark.streaming.ingest import stream_ingest, run_available_now
from harness_aws_etl_pipeline_spark.streaming.stateful import (
    streaming_dedup,
    streaming_dedup_within_watermark,
    streaming_running_counts,
)
from harness_aws_etl_pipeline_spark.streaming.windows import (
    tumbling_counts,
    sliding_counts,
    session_counts,
)

__all__ = [
    "stream_ingest",
    "run_available_now",
    "streaming_dedup",
    "streaming_dedup_within_watermark",
    "streaming_running_counts",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
]
