from harness_aws_etl_pipeline_spark.streaming.ingest import (
    run_available_now,
    run_available_now_upsert,
    stream_ingest,
)
from harness_aws_etl_pipeline_spark.streaming.joins import (
    enrich_stream,
    interval_join,
)
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
    "run_available_now_upsert",
    "streaming_dedup",
    "streaming_dedup_within_watermark",
    "streaming_running_counts",
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "interval_join",
    "enrich_stream",
]
