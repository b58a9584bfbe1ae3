"""Equi-width histograms and exact correlation — the remaining
profiling-tier statistics.

Histogram: the distribution summary every data-quality dashboard and
optimizer-statistics layer wants. One aggregate for the bounds, one
``groupBy(bin)`` whose shuffle is at most ``bins`` rows per map
partition (map-side combinable) — never a sort, never a collect of
values. Binning reuses the engine's deterministic cell arithmetic
(operators/zorder.py:_cell's fixed IEEE order: cast double →
subtract → multiply → divide → floor), so both engines place every
value in the same bin and the whole histogram is value-oracled.

Correlation: Pearson r assembled from EXACT integer moment sums —
per row, values scale to longs (``round(x·10⁴)``) and the five
moments (Σx, Σy, Σx², Σy², Σxy) accumulate as ``decimal(38,0)``
(integer addition: exact + associative, so partition order cannot
perturb them; products of two 10⁴-scaled values need more than 63
bits at fact-table row counts, hence decimal instead of long). The
single float expression at the end evaluates the textbook formula in
one fixed order — bit-identical across engines, unlike the built-in
``corr`` whose running-sum implementation is accumulation-order-
dependent in the last bits.

Reference scope note: the reference profiles null counts and distinct
ratios only (etl/src/transform/transformer.py:238-246); this
completes the profiling family (distinct ratios, percentiles,
sketches) with distribution shape and association strength.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["histogram", "corr_exact", "corr_matrix"]

_S = 10_000


def histogram(
    df: DataFrame,
    col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """``(bin INT, lo DOUBLE, hi DOUBLE, cnt BIGINT)`` — equi-width
    counts of ``df[col]`` over ``[lo, hi]`` (data min/max when not
    given; values outside an explicit range clamp into the edge bins,
    the SQL ``width_bucket`` convention without its overflow rows).
    NULLs are excluded. Empty bins ARE emitted (cnt 0) so the result
    always has exactly ``bins`` rows — chart- and diff-friendly."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    v = F.col(col).cast("double")
    if lo is None or hi is None:
        b = df.agg(
            F.min(v).alias("_lo"), F.max(v).alias("_hi")
        )
    else:
        b = df.sparkSession.range(1).select(
            F.lit(float(lo)).alias("_lo"), F.lit(float(hi)).alias("_hi")
        )
    # the zorder cell arithmetic: fixed IEEE order, constant range -> 0
    cell = F.floor(
        ((v - F.col("_lo")) * F.lit(float(bins)))
        / F.nullif((F.col("_hi") - F.col("_lo")), F.lit(0.0))
    )
    binned = (
        df.crossJoin(F.broadcast(b))
        .where(v.isNotNull())
        .select(
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
            .otherwise(
                F.greatest(
                    F.least(cell, F.lit(bins - 1)), F.lit(0)
                )
            )
            .cast("int")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spine = b.select(
        F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("bin"),
        "_lo",
        "_hi",
    )
    return (
        spine.join(binned, "bin", "left")
        .select(
            "bin",
            (
                F.col("_lo")
                + (F.col("_hi") - F.col("_lo")) * F.col("bin") / F.lit(float(bins))
            ).alias("lo"),
            (
                F.col("_lo")
                + (F.col("_hi") - F.col("_lo"))
                * (F.col("bin") + 1)
                / F.lit(float(bins))
            ).alias("hi"),
            F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
        )
        .orderBy("bin")
    )


def corr_exact(
    df: DataFrame, x: str, y: str, include_moments: bool = False
) -> DataFrame:
    """1 row: ``(n BIGINT, corr DOUBLE)`` — Pearson correlation of the
    rows where BOTH columns are non-NULL, from exact decimal moment
    sums (one pass, map-side combinable). ``corr`` is NULL when either
    column is constant (zero variance) or fewer than 2 rows qualify.
    Values are scaled to 4 decimal places before summing — inputs
    needing more precision should pre-scale.

    ``include_moments=True`` appends the raw decimal(38,0) sums
    ``(sx, sy, sxx, syy, sxy)`` — the exact, order-independent
    sufficient statistic. Hash THOSE cross-engine (any engine with
    128-bit integers re-derives them bit-for-bit); the float ``corr``
    is a chained sqrt/divide and belongs to the in-repo numpy tests,
    not a byte-level oracle."""
    xs = F.round(F.col(x).cast("double") * _S).cast("decimal(38,0)")
    ys = F.round(F.col(y).cast("double") * _S).cast("decimal(38,0)")
    src = df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
    m = src.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xs).alias("sx"),
        F.sum(ys).alias("sy"),
        F.sum(xs * xs).alias("sxx"),
        F.sum(ys * ys).alias("syy"),
        F.sum(xs * ys).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    num = n * F.col("sxy").cast("double") - sx * sy
    vx = n * F.col("sxx").cast("double") - sx * sx
    vy = n * F.col("syy").cast("double") - sy * sy
    out = [
        F.col("n").cast("long").alias("n"),
        F.when(
            (F.col("n") >= 2) & (vx > 0) & (vy > 0),
            num / F.sqrt(vx) / F.sqrt(vy),
        ).alias("corr"),
    ]
    if include_moments:
        out += [F.col(c) for c in ("sx", "sy", "sxx", "syy", "sxy")]
    return m.select(*out)


def corr_matrix(
    df: DataFrame, cols: list[str], include_moments: bool = False
) -> DataFrame:
    """Pairwise Pearson correlations of ``cols`` in ONE aggregate
    pass: ``(x string, y string, n bigint, corr double)``, one row per
    unordered pair (x ≤ y in list order, diagonal included). Each
    pair is PAIRWISE-COMPLETE (rows where both are non-NULL) with its
    own exact decimal moment sums — the same partition-order-proof
    arithmetic and single fixed float expression as
    :func:`corr_exact`. ``include_moments=True`` appends the raw
    decimal(38,0) sums ``(sx, sy, sxx, syy, sxy)`` per pair — the
    exact sufficient statistic, the thing to hash cross-engine
    (see :func:`corr_exact`).

    Cost: one map-side-combinable aggregate carrying
    ``6·p·(p+1)/2`` columns — right for profiling panels of up to a
    few dozen numeric columns; at hundreds of columns move to a
    melt + self-join shape instead (p² shuffle rows, not p² aggregate
    expressions in one stage)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = []
    pairs = []
    for i, a in enumerate(cols):
        # positional tags: a repeated column name must not collide
        # (cols=['a','b','a'] once aliased the diagonal and the (a,a)
        # pair both as 0_0 and broke the aggregate)
        for j, b in enumerate(cols[i:], start=i):
            tag = f"{i}_{j}"
            pairs.append((a, b, tag))
            xa = F.round(F.col(a).cast("double") * _S).cast("decimal(38,0)")
            xb = F.round(F.col(b).cast("double") * _S).cast("decimal(38,0)")
            both = F.col(a).isNotNull() & F.col(b).isNotNull()
            aggs += [
                F.sum(both.cast("long")).alias(f"n_{tag}"),
                F.sum(F.when(both, xa)).alias(f"sx_{tag}"),
                F.sum(F.when(both, xb)).alias(f"sy_{tag}"),
                F.sum(F.when(both, xa * xa)).alias(f"sxx_{tag}"),
                F.sum(F.when(both, xb * xb)).alias(f"syy_{tag}"),
                F.sum(F.when(both, xa * xb)).alias(f"sxy_{tag}"),
            ]
    m = df.agg(*aggs)
    rows = []
    for a, b, tag in pairs:
        n = F.col(f"n_{tag}").cast("double")
        sx = F.col(f"sx_{tag}").cast("double")
        sy = F.col(f"sy_{tag}").cast("double")
        num = n * F.col(f"sxy_{tag}").cast("double") - sx * sy
        vx = n * F.col(f"sxx_{tag}").cast("double") - sx * sx
        vy = n * F.col(f"syy_{tag}").cast("double") - sy * sy
        fields = [
            F.lit(a).alias("x"),
            F.lit(b).alias("y"),
            F.col(f"n_{tag}").cast("long").alias("n"),
            F.when(
                (F.col(f"n_{tag}") >= 2) & (vx > 0) & (vy > 0),
                num / F.sqrt(vx) / F.sqrt(vy),
            ).alias("corr"),
        ]
        if include_moments:
            fields += [
                F.coalesce(
                    F.col(f"{mom}_{tag}"), F.lit(0).cast("decimal(38,0)")
                ).alias(mom)
                for mom in ("sx", "sy", "sxx", "syy", "sxy")
            ]
        rows.append(F.struct(*fields))
    out_cols = ["_r.x", "_r.y", "_r.n", "_r.corr"]
    if include_moments:
        out_cols += [f"_r.{mom}" for mom in ("sx", "sy", "sxx", "syy", "sxy")]
    return m.select(F.explode(F.array(*rows)).alias("_r")).select(*out_cols)
