from harness_aws_etl_pipeline_spark.functions.text import (
    tokens,
    word_count,
    token_count_regex,
    shingles,
    punct_ratio,
    stopword_ratio,
)
from harness_aws_etl_pipeline_spark.functions.vectors import (
    dot,
    l2_norm,
    cosine_similarity,
)

__all__ = [
    "tokens",
    "word_count",
    "token_count_regex",
    "shingles",
    "punct_ratio",
    "stopword_ratio",
    "dot",
    "l2_norm",
    "cosine_similarity",
]
