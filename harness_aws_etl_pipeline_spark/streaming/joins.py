"""[EXT] Stream-stream interval joins and stream-static enrichment.

The reference joins nothing across events (each trigger processes one
batch in isolation); these complete the engine's §2.11 streaming
surface with the two join shapes Structured Streaming supports:

- :func:`interval_join` — stream⋈stream on equality keys plus a time
  interval (``right.ts ∈ [left.ts + lower, left.ts + upper]``). With
  watermarks on BOTH sides Spark bounds the join state: a buffered row
  is dropped once the other side's watermark passes the interval's
  reach, so state size is rate × window, independent of stream age.
  Without watermarks the state grows forever — the builder therefore
  REQUIRES them when either input is streaming. Outer variants emit
  the unmatched row only when the watermark proves no match can still
  arrive (i.e. in a LATER micro-batch — not "immediately", which is
  the part every first-time user trips over).
- :func:`enrich_stream` — stream⋈static dimension lookup. The static
  side is broadcast per micro-batch, so a dimension refresh (re-read
  of the path) is picked up on the next trigger; no state is kept.

Both run identically on batch DataFrames (watermarks are no-ops
there) — that is how the tests pin the join semantics exactly, the
same batch-twin strategy the windowed aggregations use.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join", "enrich_stream"]

_SUFFIX = "_r"


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: "str | list[str]",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    left_watermark: str | None = None,
    right_watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose keys match and whose right-side timestamp falls
    inside ``[left_ts + lower, left_ts + upper]``.

    ``lower``/``upper`` are signed interval strings (``"-5 minutes"``,
    ``"0 seconds"``, ``"10 minutes"``). Right-side columns come back
    suffixed ``_r``, except the key columns, which collapse to ONE
    output column per key via ``coalesce(left, right)`` — so a
    rightOuter/fullOuter unmatched right row still carries its key
    instead of a NULL next to a dropped column. ``how`` ∈ inner /
    leftOuter / rightOuter / fullOuter, Spark's supported
    stream-stream set.

    When either side is a streaming DataFrame both watermarks are
    required — they are what lets Spark discard buffered state.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if not keys:
        raise ValueError("interval_join needs at least one equality key")
    streaming = left.isStreaming or right.isStreaming
    if streaming and (left_watermark is None or right_watermark is None):
        raise ValueError(
            "stream-stream interval_join requires watermarks on BOTH "
            "sides (unbounded join state otherwise)"
        )
    l_side = (
        left.withWatermark(left_ts, left_watermark) if left_watermark else left
    )
    r_side = (
        right.withWatermark(right_ts, right_watermark)
        if right_watermark
        else right
    )
    for c in right.columns:
        r_side = r_side.withColumnRenamed(c, c + _SUFFIX)
    rts = right_ts + _SUFFIX

    cond = reduce(
        lambda a, b: a & b,
        [F.col(k) == F.col(k + _SUFFIX) for k in keys],
    )
    cond = (
        cond
        & (F.col(rts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    joined = l_side.join(r_side, cond, how)
    # one key column per key: equal on matches, the surviving side's
    # on outer-unmatched rows
    for k in keys:
        joined = joined.withColumn(
            k, F.coalesce(F.col(k), F.col(k + _SUFFIX))
        )
    return joined.drop(*[k + _SUFFIX for k in keys])


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: "str | list[str]",
    how: str = "left",
) -> DataFrame:
    """Stream⋈static dimension enrichment — the streaming face of the
    G4 broadcast-dimension pattern. The dimension is broadcast to the
    executors each micro-batch (it must be the small side); stateless,
    so any ``how`` Spark allows for stream-static joins works."""
    return stream.join(F.broadcast(dim), on, how)
