"""Event-sequence analytics: transition matrices and path n-grams.

Product/behavioral analytics over an event stream ask "what happens
AFTER x?" — the first-order answer is the Markov transition matrix
(counts and row-conditional probabilities of state→state steps per
actor), and the order-n answer is path n-grams (the most common
length-n event chains). The reference's dashboard tier stops at
funnels and daily trends (etl/README.md:692); these are the two
standard next steps a warehouse team builds on the same event table.

Spark-first shape: one ``lag`` window per step (a single Exchange on
the actor key — the same partitioning every per-actor operator in
this repo uses), then a grouped count. The transition matrix itself
is |states|² rows and the n-gram table |states|ⁿ — tiny next to the
facts — so the row-conditional normalization is a window over the
AGGREGATE, never the raw events. No UDFs, no collect; the only
full-data shuffles are the actor-key Exchange (reused by every lag
via one window spec) and the final small groupBy.

Determinism: counts are exact longs; each probability is one IEEE
division of two exact longs — safe to value-oracle cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["transition_counts", "event_ngrams", "funnel_steps", "sessionize"]


def transition_counts(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """First-order Markov transitions per actor: one row per observed
    (prev_state, state) pair with its count and the row-conditional
    probability ``p = cnt / Σ cnt over prev_state``.

    ``tie_cols`` breaks ``order_col`` ties deterministically (pass the
    event id); without it, tied rows order arbitrarily and the matrix
    is nondeterministic on real data.
    """
    ties = [F.col(c) for c in (tie_cols or [])]
    w = Window.partitionBy(key_col).orderBy(F.col(order_col), *ties)
    pairs = (
        df.select(key_col, order_col, state_col, *(tie_cols or []))
        .withColumn("prev_state", F.lag(state_col).over(w))
        .filter(F.col("prev_state").isNotNull())
    )
    counts = pairs.groupBy(
        "prev_state", F.col(state_col).alias("state")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    row_total = Window.partitionBy("prev_state")
    return counts.withColumn(
        "p",
        F.col("cnt").cast("double")
        / F.sum("cnt").over(row_total).cast("double"),
    )


def event_ngrams(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    n: int = 3,
    sep: str = ">",
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Length-``n`` event chains per actor (sliding, overlapping),
    counted corpus-wide: one row per distinct chain with its count.
    The chain renders as ``a>b>c`` in ``gram``; chains that would
    cross actors never form (lag partitions by the actor key).

    ``n`` is a plan-size dial, not a data dial — each extra step is
    one more lag over the SAME window spec (no extra shuffle).
    """
    if n < 2:
        raise ValueError(f"n must be >= 2: {n}")
    ties = [F.col(c) for c in (tie_cols or [])]
    w = Window.partitionBy(key_col).orderBy(F.col(order_col), *ties)
    steps = [F.lag(state_col, n - 1 - i).over(w) for i in range(n - 1)]
    steps.append(F.col(state_col))
    out = df.select(key_col, order_col, state_col, *(tie_cols or []))
    materialized = out.select(
        F.concat_ws(sep, *steps).alias("gram"),
        steps[0].alias("_first"),
    )
    return (
        materialized.filter(F.col("_first").isNotNull())
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def funnel_steps(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered conversion funnel over arbitrary step lists: an actor
    reaches step i when their first ``steps[i]`` event AT OR AFTER
    their step-(i−1) time exists. Returns one row per step:
    ``(step int, name string, actors long)`` — actors monotonically
    non-increasing down the funnel by construction.

    Staged conditional mins: each stage is one filtered grouped
    aggregate plus one equi-join back on the actor key — the stage
    frames shrink monotonically, so every join after the first is on
    an already-reduced key set (broadcastable when the funnel
    narrows; Catalyst/AQE decides). No windows over the raw events,
    no collect."""
    if not steps:
        raise ValueError("steps must be non-empty")
    stages = []
    prev = None
    for i, name in enumerate(steps):
        filt = df.filter(F.col(state_col) == name).select(
            key_col, order_col
        )
        if prev is None:
            cur = filt.groupBy(key_col).agg(F.min(order_col).alias("_t"))
        else:
            cur = (
                filt.join(prev, key_col)
                .filter(F.col(order_col) >= F.col("_t"))
                .groupBy(key_col)
                .agg(F.min(order_col).alias("_t"))
            )
        prev = cur
        stages.append(
            cur.agg(F.count(F.lit(1)).alias("actors")).select(
                F.lit(i + 1).alias("step"),
                F.lit(name).alias("name"),
                F.col("actors").cast("long").alias("actors"),
            )
        )
    out = stages[0]
    for s in stages[1:]:
        out = out.unionByName(s)
    return out


def sessionize(
    df: DataFrame,
    key_col: str,
    order_col: str,
    gap_seconds: int = 1800,
    tie_cols: list[str] | None = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: append ``out_col`` (1-based long per
    actor) — a new session starts at an actor's first event and
    whenever the gap from the previous event exceeds ``gap_seconds``.
    The deterministic batch twin of ``streaming/windows.py``'s
    ``session_window`` path: lag + cumulative sum over ONE actor-key
    Exchange, no UDFs.

    ``order_col`` must be a timestamp (gaps measure in seconds);
    ``tie_cols`` breaks equal timestamps deterministically."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive: {gap_seconds}")
    ties = [F.col(c) for c in (tie_cols or [])]
    w = Window.partitionBy(key_col).orderBy(F.col(order_col), *ties)
    prev = F.lag(order_col).over(w)
    new_session = (
        prev.isNull()
        | (
            F.unix_timestamp(F.col(order_col)) - F.unix_timestamp(prev)
            > gap_seconds
        )
    ).cast("long")
    return df.withColumn(
        out_col,
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
