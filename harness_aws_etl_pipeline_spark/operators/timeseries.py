"""Time-series gap filling: the date spine.

Trend dashboards and window analytics assume a DENSE time axis — a
day with no orders must appear as 0, not vanish (a 7-day moving
average over a sparse axis silently averages the wrong days; lag/lead
step over holes). The warehouse fix is the date-spine pattern:
generate the full calendar between the data's bounds, cross it with
the group domain, left-join the actuals, fill the holes.

Spark-first shape: the spine is ``sequence(min_d, max_d, interval)``
exploded — one 1-row aggregate for the bounds, one broadcast of the
(tiny) spine × groups frame builder side, and a left join keyed on
(group, date). No UDFs; the spine never exceeds
``days × |groups|`` rows, and the join shuffles only the aggregated
actuals (already one row per group-day), never the raw facts.

Reference scope note: the reference's dashboard spec calls for daily
trends (etl/README.md:692) over job-date-partitioned output — this
supplies the dense-axis guarantee those trends assume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "date_spine",
    "fill_date_gaps",
    "ffill",
    "bfill",
    "interpolate_linear",
    "ewma",
    "holt_linear",
    "seasonal_decompose",
]


def date_spine(
    df: DataFrame,
    date_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Every (group, date) combination between the GLOBAL min/max of
    ``date_col`` — one row per group per calendar day, whether or not
    the group has data that day. Groups are the distinct values
    observed in ``df``; the date bounds are global so every group
    shares one axis (what a multi-series chart needs)."""
    groups = group_cols or []
    bounds = df.agg(
        F.min(F.col(date_col).cast("date")).alias("_mn"),
        F.max(F.col(date_col).cast("date")).alias("_mx"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("_mn", "_mx", F.expr("interval 1 day"))
        ).alias(date_col)
    )
    if not groups:
        return spine
    dom = df.select(*groups).distinct()
    return dom.crossJoin(F.broadcast(spine))


def fill_date_gaps(
    df: DataFrame,
    date_col: str,
    group_cols: list[str] | None = None,
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """``df`` (one row per (group, date) — aggregate first) re-laid on
    the dense spine: missing (group, day) combinations appear with
    the ``fill`` value per column (default 0 — pass ``{col: None}``
    to keep NULL). Existing rows pass through unchanged.

    An empty ``df`` returns empty (no bounds → no spine)."""
    groups = group_cols or []
    value_cols = [
        c for c in df.columns if c != date_col and c not in groups
    ]
    spine = date_spine(df, date_col, groups)
    keyed = df.withColumn(date_col, F.col(date_col).cast("date"))
    out = spine.join(keyed, on=[*groups, date_col], how="left")
    fills = fill or {}
    for c in value_cols:
        v = fills.get(c, 0)
        if v is not None:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out


# ------------------------------------------------------ hole filling
#
# The three standard repairs for a series with NULL holes (sensor
# dropouts, spine-induced gaps from ``fill_date_gaps(fill={c: None})``):
# carry the last observation forward, carry the next one back, or
# connect the neighbors linearly. All three are running-frame window
# functions — one Exchange on the group key shared by every output
# column, O(rows) per partition, no UDFs, no collect.
#
# Scale note: with ``group_cols`` the windows partition by key and
# parallelize per series; WITHOUT groups the window is a single
# global frame — one task holds the whole series, which is fine for
# a per-key series already reduced to thousands of points and wrong
# for a raw 100 TB fact table (aggregate or group first).


def _ordered(
    group_cols: list[str] | None, order_col: str
):
    groups = group_cols or []
    if groups:
        return Window.partitionBy(*groups).orderBy(order_col)
    return Window.partitionBy().orderBy(order_col)


def ffill(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Forward fill: each NULL takes the most recent non-NULL value
    at or before it in ``order_col`` order (per group). Leading NULLs
    stay NULL."""
    w = _ordered(group_cols, order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    for c in value_cols:
        df = df.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return df


def bfill(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Backward fill: each NULL takes the next non-NULL value at or
    after it. Trailing NULLs stay NULL."""
    w = _ordered(group_cols, order_col).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    for c in value_cols:
        df = df.withColumn(c, F.first(F.col(c), ignorenulls=True).over(w))
    return df


def _axis(df: DataFrame, order_col: str) -> Column:
    """The interpolation x-axis as a double: days since epoch for
    dates, seconds for timestamps, the value itself for numerics."""
    t = dict(df.dtypes)[order_col]
    c = F.col(order_col)
    if t == "date":
        return F.datediff(c, F.lit("1970-01-01").cast("date")).cast("double")
    if t.startswith("timestamp"):
        return c.cast("double")
    return c.cast("double")


def interpolate_linear(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    group_cols: list[str] | None = None,
    extrapolate: str = "none",
) -> DataFrame:
    """Linear interpolation: each NULL becomes the straight line
    between its nearest non-NULL neighbors, evaluated at its own
    ``order_col`` position (dates interpolate on the day axis, so
    unevenly spaced gaps weight correctly — a hole 1 day from the
    left neighbor and 9 from the right lands near the left value).

    Edge policy: interior holes always fill; leading/trailing holes
    (only one neighbor exists) stay NULL under ``extrapolate="none"``
    (the default) or copy the nearest neighbor under
    ``extrapolate="nearest"``. Output columns are double.

    The fill expression is the single IEEE chain
    ``y0 + (y1 - y0) * ((x - x0) / (x1 - x0))`` — engines that
    evaluate it in this exact order (DuckDB, numpy) reproduce it
    bit-for-bit, which is what lets the catalog value-oracle this
    operator.
    """
    if extrapolate not in ("none", "nearest"):
        raise ValueError(f"extrapolate must be none|nearest: {extrapolate}")
    base = _ordered(group_cols, order_col)
    back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    x = _axis(df, order_col)
    for c in value_cols:
        y = F.col(c).cast("double")
        known_x = F.when(y.isNotNull(), x)
        y0 = F.last(y, ignorenulls=True).over(back)
        x0 = F.last(known_x, ignorenulls=True).over(back)
        y1 = F.first(y, ignorenulls=True).over(fwd)
        x1 = F.first(known_x, ignorenulls=True).over(fwd)
        edge = (
            F.coalesce(y0, y1)
            if extrapolate == "nearest"
            else F.lit(None).cast("double")
        )
        df = df.withColumn(
            c,
            F.when(y.isNotNull(), y)
            .when(y0.isNull() | y1.isNull(), edge)
            .otherwise(y0 + (y1 - y0) * ((x - x0) / (x1 - x0))),
        )
    return df


# ------------------------------------------- exponential smoothing
#
# EWMA and Holt's linear method are RECURRENCES (each output depends
# on the previous one), which no window frame expresses. The Spark
# shape is a per-group sequential fold: collect the (order, value)
# series into a sorted array (one shuffle on the group key), run
# ``F.aggregate`` over it JVM-side (no Python), and explode back to
# rows. Scale envelope: one group's series must fit in one task —
# aggregate to a coarser grain first (daily/hourly roll-up), exactly
# like the window-based repairs above; the fold itself is O(n) state
# with an O(n²)-copy output array, fine for the
# thousands-of-points-per-series this is for and wrong for raw facts.
#
# Determinism contract: the fold is a fixed IEEE chain
# (``α·x + (1-α)·s`` in that order), so any engine that folds the
# same sorted series with the same expression reproduces it
# bit-for-bit — DuckDB's ``list_reduce`` (EWMA) and a recursive CTE
# (Holt) do, which is what lets the catalog value-oracle both.


def _series(
    df: DataFrame,
    order_col: str,
    value_col: str,
    group_cols: list[str] | None,
) -> DataFrame:
    """One row per group holding the sorted (o, v) series. Contract:
    one row per (group, order) — aggregate duplicates first (ties
    would sort deterministically by value but smooth a meaningless
    interleaving)."""
    groups = group_cols or []
    return df.groupBy(*groups).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("o"),
                    F.col(value_col).cast("double").alias("v"),
                )
            )
        ).alias("_series")
    )


def ewma(
    df: DataFrame,
    order_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    alpha: float = 0.3,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially weighted moving average per group:
    ``s₁ = x₁; sₜ = α·xₜ + (1-α)·sₜ₋₁`` — the standard smoother for
    noisy operational series (init = first observation, the
    ``adjust=False`` convention). Returns one row per input point:
    (groups, order_col, value_col, out_col)."""
    a = float(alpha)
    if not 0.0 < a <= 1.0:
        raise ValueError(f"alpha must be in (0, 1]: {alpha}")
    oma = 1.0 - a
    groups = list(group_cols or [])
    assembled = _series(df, order_col, value_col, groups)

    def step(acc, x):
        s = F.when(acc["s"].isNull(), x["v"]).otherwise(
            F.lit(a) * x["v"] + F.lit(oma) * acc["s"]
        )
        return F.struct(
            s.alias("s"), F.concat(acc["out"], F.array(s)).alias("out")
        )

    init = F.struct(
        F.lit(None).cast("double").alias("s"),
        F.array().cast("array<double>").alias("out"),
    )
    return (
        assembled.withColumn(
            "_ew", F.aggregate("_series", init, step)["out"]
        )
        .select(*groups, F.explode(F.arrays_zip("_series", "_ew")).alias("_z"))
        .select(
            *groups,
            F.col("_z._series.o").alias(order_col),
            F.col("_z._series.v").alias(value_col),
            F.col("_z._ew").alias(out_col),
        )
    )


def holt_linear(
    df: DataFrame,
    order_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    alpha: float = 0.3,
    beta: float = 0.2,
    level_col: str = "level",
    trend_col: str = "trend",
) -> DataFrame:
    """Holt's linear (double-exponential) smoothing per group:
    ``ℓ₁ = x₁, b₁ = 0;  ℓₜ = α·xₜ + (1-α)·(ℓₜ₋₁ + bₜ₋₁);
    bₜ = β·(ℓₜ - ℓₜ₋₁) + (1-β)·bₜ₋₁`` — level + trend state, the
    one-step forecast being ``level + trend``. Same shape and scale
    envelope as :func:`ewma`."""
    a, b = float(alpha), float(beta)
    for name, v in (("alpha", a), ("beta", b)):
        if not 0.0 < v <= 1.0:
            raise ValueError(f"{name} must be in (0, 1]: {v}")
    oma, omb = 1.0 - a, 1.0 - b
    groups = list(group_cols or [])
    assembled = _series(df, order_col, value_col, groups)

    def step(acc, x):
        nl = F.when(acc["l"].isNull(), x["v"]).otherwise(
            F.lit(a) * x["v"] + F.lit(oma) * (acc["l"] + acc["b"])
        )
        nb = F.when(acc["l"].isNull(), F.lit(0.0)).otherwise(
            F.lit(b) * (nl - acc["l"]) + F.lit(omb) * acc["b"]
        )
        pair = F.struct(nl.alias("l"), nb.alias("b"))
        return F.struct(
            nl.alias("l"),
            nb.alias("b"),
            F.concat(acc["out"], F.array(pair)).alias("out"),
        )

    init = F.struct(
        F.lit(None).cast("double").alias("l"),
        F.lit(None).cast("double").alias("b"),
        F.array().cast("array<struct<l:double,b:double>>").alias("out"),
    )
    return (
        assembled.withColumn(
            "_hl", F.aggregate("_series", init, step)["out"]
        )
        .select(*groups, F.explode(F.arrays_zip("_series", "_hl")).alias("_z"))
        .select(
            *groups,
            F.col("_z._series.o").alias(order_col),
            F.col("_z._series.v").alias(value_col),
            F.col("_z._hl.l").alias(level_col),
            F.col("_z._hl.b").alias(trend_col),
        )
    )


def seasonal_decompose(
    df: DataFrame,
    order_col: str,
    value_col: str,
    period: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Classical additive decomposition: ``value = trend + seasonal +
    resid`` (per group), the standard pre-model sanity split for
    regular time series (weekly retail cycles, hourly load).

    - **trend**: centered moving average — a ``period``-point simple
      MA for odd periods; the textbook 2×MA for even ones (a
      ``period+1``-point window with half weights at both ends, so the
      window stays symmetric). Edge rows whose window is incomplete
      get a NULL trend (no padded/decaying estimates — at 100 TB a
      silently-degraded edge estimate poisons downstream anomaly
      thresholds).
    - **seasonal**: per seasonal position (``row_number − 1 mod
      period`` within the group), the mean of the INTERIOR detrended
      values, centered so the seasonal components sum to ~0 over one
      period.
    - **resid**: ``value − trend − seasonal`` (NULL on edge rows).

    Contract: REGULAR sampling, one row per (group, order) — run
    ``date_spine`` + ``fill_date_gaps``/``interpolate_linear`` first
    if the series has holes; position-based seasonality is meaningless
    across gaps.

    Shape: one rows-frame window pass over each group (sum + count +
    first/last in ONE frame — a single group-key Exchange), one
    ``period``-row seasonal aggregate broadcast back. The trend
    numerator is an exact integer on the 10⁴-scaled axis (integer
    window weights: 2·S − first − last for even periods), which is
    what the catalog leg value-oracles cross-engine."""
    if period < 2:
        raise ValueError(f"period must be >= 2: {period}")
    groups = list(group_cols or [])
    half = period // 2
    even = period % 2 == 0
    denom = float(2 * period if even else period)

    vs = F.round(F.col(value_col).cast("double") * 10_000).cast(
        "decimal(38,0)"
    )
    w = (
        Window.partitionBy(*groups) if groups else Window.partitionBy()
    ).orderBy(order_col)
    frame = w.rowsBetween(-half, half)
    full = period + 1 if even else period
    src = df.withColumn("_vs", vs).withColumn(
        "_pos", ((F.row_number().over(w) - 1) % period).cast("int")
    )
    s = F.sum("_vs").over(frame)
    cnt = F.count("_vs").over(frame)
    if even:
        trend_num = (
            s * 2 - F.first("_vs").over(frame) - F.last("_vs").over(frame)
        )
    else:
        trend_num = s
    t = src.withColumn(
        "_tnum", F.when(cnt == full, trend_num)
    ).withColumn(
        "trend",
        (F.col("_tnum").cast("double") / F.lit(denom)) / 10_000.0,
    )
    # interior detrended values, exact numerator on the scaled axis:
    # detr·denom = vs·denom − tnum
    detr_num = F.col("_vs") * F.lit(int(denom)) - F.col("_tnum")
    smean = (
        t.where(F.col("_tnum").isNotNull())
        .groupBy(*groups, "_pos")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(detr_num).alias("_dsum"),
        )
        .withColumn(
            "_smean",
            F.col("_dsum").cast("double")
            / (F.col("_n") * F.lit(denom) * 10_000.0),
        )
    )
    center = smean.groupBy(*groups).agg(
        F.avg("_smean").alias("_scenter")
    )
    out = (
        t.join(smean.select(*groups, "_pos", "_smean"), [*groups, "_pos"], "left")
        .join(F.broadcast(center), groups, "left")
        if groups
        else t.join(
            F.broadcast(smean.select("_pos", "_smean")), ["_pos"], "left"
        ).crossJoin(F.broadcast(center))
    )
    return (
        out.withColumn(
            "seasonal", F.col("_smean") - F.col("_scenter")
        )
        .withColumn(
            "resid",
            F.col(value_col).cast("double")
            - F.col("trend")
            - F.col("seasonal"),
        )
        .select(
            *groups,
            F.col(order_col),
            F.col(value_col),
            F.col("_pos").alias("pos"),
            "trend",
            "seasonal",
            "resid",
        )
    )
