"""Robust outlier detection: rolling z-score, groupwise MAD, Tukey
IQR fences.

The data-quality use case (reference scope: the pipeline's audit
tier — etl/README.md's quality metrics — stops at null/duplicate
counts; this extends the audit to VALUE-level anomalies): flag
points that sit implausibly far from their local or group context
before they poison downstream aggregates or training corpora.

Determinism contract (what lets the catalog value-oracle these):
every *flag* is an EXACT INTEGER inequality over scaled-long values
and decimal(38,0) moment sums — never a float comparison — so the
flagged row set is bit-identical across engines:

- rolling z:  ``(x·n − s)² > k²·(n·q − s²)``  (s=Σx, q=Σx² over the
  trailing window, all in scaled decimal units);
- MAD:        ``2·|2x − med2| > k·mad4``      (med2 = 2·median,
  mad4 = 2·median(|2x − med2|) — doubling clears the half-step the
  even-count median interpolates);
- IQR fences: ``8x < 2·q1₄ − kh·(q3₄ − q1₄)`` (q₄ = 4·quantile —
  linear interpolation at p ∈ {¼, ¾} lands on exact quarters — and
  ``kh`` counts half-IQRs: kh=3 is Tukey's 1.5).

Scale shapes: the rolling variant is one window Exchange on the
group key; the group variants are a percentile aggregate (exact,
JVM-side) shuffled once on the group key and joined back — the
per-group stats frame has one row per group. For groups with
billions of DISTINCT values the percentile buffer grows; route
those through operators/quantiles.py's two-level rank selection
and feed the medians in via ``precomputed``-style joins instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rolling_zscore", "mad_outliers", "iqr_outliers"]

_S = 10_000


def _xs(value_col: str, scale: int) -> Column:
    return (
        F.round(F.col(value_col).cast("double") * scale)
        .cast("decimal(38,0)")
    )


def rolling_zscore(
    df: DataFrame,
    order_col: str,
    value_col: str,
    group_cols: list[str] | None = None,
    window: int = 7,
    k: int = 3,
    min_periods: int = 3,
    scale: int = _S,
) -> DataFrame:
    """Adds ``zscore`` (double; NULL below ``min_periods`` rows or at
    zero variance) and ``is_outlier`` (boolean; the exact integer
    form of ``|x − mean| > k·σ_pop``) over the trailing ``window``
    rows per group, current row included.

    One shuffle on the group key; both moment sums ride the same
    window frame. Ungrouped input collapses to a single task —
    aggregate or group first at scale (module docstring).
    """
    groups = group_cols or []
    base = (
        Window.partitionBy(*groups) if groups else Window.partitionBy()
    ).orderBy(order_col)
    w = base.rowsBetween(-(window - 1), Window.currentRow)
    xs = _xs(value_col, scale)
    n = F.count(F.lit(1)).over(w).cast("decimal(38,0)")
    s = F.sum(xs).over(w)
    q = F.sum(xs * xs).over(w)
    # var_pop·n² = n·q − s²  (≥ 0; 0 ⟺ the window is constant)
    varn2 = (n * q - s * s).cast("decimal(38,0)")
    dev = (xs * n - s).cast("decimal(38,0)")
    z = F.when(
        (n >= F.lit(min_periods).cast("decimal(38,0)"))
        & (varn2 > 0),
        dev.cast("double") / F.sqrt(varn2.cast("double")),
    )
    flag = (
        (n >= F.lit(min_periods).cast("decimal(38,0)"))
        & (dev * dev > F.lit(k * k).cast("decimal(38,0)") * varn2)
    )
    return df.withColumn("zscore", z).withColumn("is_outlier", flag)


def _median2(xs: Column) -> Column:
    """2× the exact interpolated median of scaled longs — an exact
    long (the even-count midpoint is a half-step; doubling clears
    it; sums stay < 2⁵² so the double round-trip is lossless)."""
    return F.round(F.percentile(xs, F.lit(0.5)) * 2).cast("long")


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 3,
    scale: int = _S,
) -> DataFrame:
    """Adds ``is_outlier``: ``|x − median| > k·MAD`` per group, as
    the exact integer inequality ``2·|2x − med2| > k·mad4``.
    Constant groups (MAD = 0) flag every non-median point under the
    strict ``>`` only when it deviates at all — i.e. any x ≠ median.

    Two percentile aggregates (values, then absolute deviations)
    and two joins back on the group key; the stats frames are one
    row per group.
    """
    groups = group_cols or []
    xs2 = (_xs(value_col, scale) * 2).cast("long")
    tagged = df.withColumn("_x2", xs2)
    gb = tagged.groupBy(*groups) if groups else tagged.groupBy()
    med = gb.agg(_median2(F.col("_x2") / 2).alias("_med2"))
    joined = (
        tagged.join(med, on=groups) if groups else tagged.crossJoin(
            F.broadcast(med)
        )
    )
    dev = F.abs(F.col("_x2") - F.col("_med2"))
    devd = joined.withColumn("_dev", dev)
    gb2 = devd.groupBy(*groups) if groups else devd.groupBy()
    mad = gb2.agg(_median2(F.col("_dev")).alias("_mad4"))
    out = (
        devd.join(mad, on=groups) if groups else devd.crossJoin(
            F.broadcast(mad)
        )
    )
    return out.withColumn(
        "is_outlier", F.col("_dev") * 2 > F.lit(k) * F.col("_mad4")
    ).drop("_x2", "_med2", "_dev", "_mad4")


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k_halves: int = 3,
    scale: int = _S,
) -> DataFrame:
    """Adds ``is_outlier``: outside Tukey's fences
    ``[q1 − k·IQR, q3 + k·IQR]`` per group with ``k = k_halves/2``
    (the default 3 is the standard 1.5), as exact integer
    inequalities on 4×-quantile longs.

    One percentile aggregate + one join back on the group key.
    """
    groups = group_cols or []
    xs = _xs(value_col, scale).cast("long")
    tagged = df.withColumn("_xq", xs)
    gb = tagged.groupBy(*groups) if groups else tagged.groupBy()
    quart = gb.agg(
        F.round(F.percentile(F.col("_xq"), F.lit(0.25)) * 4)
        .cast("long")
        .alias("_q1_4"),
        F.round(F.percentile(F.col("_xq"), F.lit(0.75)) * 4)
        .cast("long")
        .alias("_q3_4"),
    )
    out = (
        tagged.join(quart, on=groups) if groups else tagged.crossJoin(
            F.broadcast(quart)
        )
    )
    iqr4 = F.col("_q3_4") - F.col("_q1_4")
    lo = F.col("_xq") * 8 < F.col("_q1_4") * 2 - F.lit(k_halves) * iqr4
    hi = F.col("_xq") * 8 > F.col("_q3_4") * 2 + F.lit(k_halves) * iqr4
    return out.withColumn("is_outlier", lo | hi).drop(
        "_xq", "_q1_4", "_q3_4"
    )
