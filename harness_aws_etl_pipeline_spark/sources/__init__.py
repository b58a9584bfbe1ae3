from harness_aws_etl_pipeline_spark.sources.readers import (
    detect_format,
    read_file,
    read_batch,
    read_paths,
    list_supported_files,
    extract,
    parse_event,
    SUPPORTED_FORMATS,
)

__all__ = [
    "detect_format",
    "read_file",
    "read_batch",
    "read_paths",
    "list_supported_files",
    "extract",
    "parse_event",
    "SUPPORTED_FORMATS",
]
