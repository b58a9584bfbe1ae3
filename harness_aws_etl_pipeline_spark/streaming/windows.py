"""[EXT] Streaming windowed aggregations with watermark-based late-data
handling.

The reference has no streaming state at all (§2.11 — each event is an
isolated batch); these are the engine's extension surface for the
``events`` stream shape: tumbling / sliding / session windows, each a
watermarked stateful aggregation that Structured Streaming maintains
incrementally.

The same builders run in batch mode (a batch DataFrame through
``tumbling_counts`` gives the identical deterministic answer — that is
how the DuckDB oracle checks them; see plans/catalog.py
events_tumbling). Watermarks only matter on an unbounded stream: state
for windows older than (max event time − delay) is dropped, bounding
memory at any input rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """Non-overlapping fixed windows: count + value sum per window."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return src.groupBy(F.window(ts_col, width), *group_cols).agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.sum("value").alias("value_sum"),
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows (each event lands in width/slide windows)."""
    src = df.withWatermark(ts_col, watermark) if watermark else df
    return src.groupBy(F.window(ts_col, width, slide)).agg(
        F.count(F.lit(1)).alias("event_cnt")
    )


def session_counts(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key_cols: tuple[str, ...] = ("user_id",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Dynamic-gap session windows per key (``session_window`` —
    watermark is mandatory for streaming session state)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *key_cols)
        .agg(F.count(F.lit(1)).alias("event_cnt"))
    )
