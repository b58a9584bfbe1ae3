"""[EXT] Custom stateful streaming operators via applyInPandasWithState.

Built-in windows (streaming/windows.py) cover time-bucketed
aggregation; these operators need *custom* state the built-ins can't
express:

- :func:`streaming_dedup` — exactly-once-per-content emission across
  micro-batches: per content-hash group, state records "already seen";
  only first occurrences flow downstream. The streaming complement of
  batch dedup (T3) for continuous ingestion, with a state TTL so the
  seen-set doesn't grow unboundedly (the at-scale requirement: state
  size is bounded by the TTL horizon, not the stream's lifetime).
- :func:`streaming_running_counts` — per-key running totals emitted
  every micro-batch (count + sum so far), i.e. incrementally-updated
  aggregate state.

Both use GroupState with Arrow-batched pandas per key-group — the
sanctioned Structured Streaming extension point for state machines the
SQL operators can't express. State is checkpointed with the query:
restart-safe, exactly-once.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("content_hash", LongType(), False),
        StructField("first_payload", StringType(), True),
        StructField("occurrences_this_batch", LongType(), False),
    ]
)
DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType(), False)])


def _dedup_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    n = len(rows)
    if state.exists:
        state.update((int(state.get[0]) + n,))
        return iter(())  # seen before → emit nothing
    state.update((n,))
    return iter(
        [
            pd.DataFrame(
                {
                    "content_hash": [key[0]],
                    "first_payload": [rows["payload"].iloc[0]],
                    "occurrences_this_batch": [n],
                }
            )
        ]
    )


def streaming_dedup(
    stream: DataFrame,
    payload_col: str,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """First-occurrence-only stream: group by content hash, emit a row
    only when the hash has no state yet.

    ``ttl_minutes`` bounds state via processing-time timeout: a hash
    unseen for the TTL is forgotten (re-admitting rare long-horizon
    dups — the standard space/recall trade at scale). None keeps state
    forever (exact, unbounded).
    """
    keyed = stream.select(
        F.xxhash64(F.col(payload_col)).alias("content_hash"),
        F.col(payload_col).cast("string").alias("payload"),
    ).groupBy("content_hash")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes
        else GroupStateTimeout.NoTimeout
    )

    if ttl_minutes:

        def fn(key, pdfs, state):  # pragma: no cover - thin TTL wrapper
            if state.hasTimedOut:
                state.remove()
                return iter(())
            out = _dedup_fn(key, pdfs, state)
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
            return out

    else:
        fn = _dedup_fn

    return keyed.applyInPandasWithState(
        fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def streaming_dedup_within_watermark(
    stream: DataFrame,
    dedup_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Built-in watermark-bounded streaming dedup — the DECLARATIVE
    twin of :func:`streaming_dedup`: ``dropDuplicatesWithinWatermark``
    keeps per-key state only inside the watermark horizon, so Spark
    manages eviction natively (no custom state function, no Python in
    the hot path). Prefer this when "duplicates arrive close together"
    holds; use :func:`streaming_dedup` when you need the
    first-payload/occurrence bookkeeping or an unbounded exact mode."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        dedup_cols
    )


COUNT_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("events_so_far", LongType(), False),
        StructField("value_sum_so_far", LongType(), False),
    ]
)
COUNT_STATE_SCHEMA = StructType(
    [StructField("cnt", LongType(), False), StructField("vsum", LongType(), False)]
)


def _counts_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    cnt, vsum = (int(state.get[0]), int(state.get[1])) if state.exists else (0, 0)
    cnt += len(rows)
    vsum += int(rows["value_scaled"].sum())
    state.update((cnt, vsum))
    return iter(
        [
            pd.DataFrame(
                {"key": [key[0]], "events_so_far": [cnt], "value_sum_so_far": [vsum]}
            )
        ]
    )


def streaming_running_counts(
    stream: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key running count + scaled-long running sum, one output row
    per key per micro-batch (update-style incremental aggregates).
    Values are scaled ×10000 to keep state integral/exact."""
    keyed = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.round(F.col(value_col).cast("double") * 10000)
        .cast("long")
        .alias("value_scaled"),
    ).groupBy("key")
    return keyed.applyInPandasWithState(
        _counts_fn,
        outputStructType=COUNT_OUTPUT_SCHEMA,
        stateStructType=COUNT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
