"""ML feature preparation: one-hot encoding and the hashing trick.

The last mile of a training-data pipeline turns categorical columns
into model inputs. Two standard encodings:

- **one-hot** for LOW-cardinality columns: one 0/1 indicator per
  observed value, with a fixed, sorted column order so downstream
  schemas are stable across reruns and shards.
- **feature hashing** for UNBOUNDED-cardinality columns (hosts,
  tokens, ids): each ``col=value`` string hashes to one of ``dims``
  slots; collisions are the accepted trade for a fixed-width vector
  with zero vocabulary state (Weinberger et al., ICML 2009 — the
  "hashing trick").

Spark-first shape: one-hot is a pure projection (codegen'd CASE
columns — never a pivot, which would shuffle); hashing is a
projection into an array column. The ONLY collect is one bounded
distinct() when one-hot values aren't supplied, and it raises above
``max_values`` rather than silently building a 10⁶-column schema.

Determinism: slots derive from md5 (engine-agnostic, like the
sampling/mixing machinery) — any engine with md5 + hex→int
reproduces the exact slot assignment, which is what lets the catalog
value-oracle the encoding cross-engine.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "one_hot",
    "hash_features",
    "feature_slot",
    "standard_scale",
    "minmax_scale",
    "robust_scale",
    "scale_outlier_counts",
]

_SAFE = re.compile(r"[^0-9a-zA-Z_]")


def one_hot(
    df: DataFrame,
    col: str,
    values: list[str] | None = None,
    max_values: int = 256,
) -> DataFrame:
    """Append one ``{col}__{value}`` 0/1 int column per value, in
    sorted value order. NULLs (and values outside ``values``) encode
    as all-zeros. Pass ``values`` explicitly in production (schema
    pinned by config, no job-time scan); omitting it runs one bounded
    ``distinct()`` and raises above ``max_values`` — one-hot beyond a
    few hundred columns is the wrong encoding (use
    :func:`hash_features`).

    Distinct values whose SANITIZED names collide (``a.b`` vs ``a_b``
    both map to ``a_b``) raise rather than silently overwriting an
    indicator — a lost value would desync any downstream schema."""
    if values is None:
        observed = [
            r[0]
            for r in df.select(col)
            .where(F.col(col).isNotNull())
            .distinct()
            .limit(max_values + 1)
            .collect()
        ]
        if len(observed) > max_values:
            raise ValueError(
                f"one_hot({col!r}): > {max_values} distinct values — "
                "pass values= or switch to hash_features"
            )
        values = observed
    names: dict[str, str] = {}
    for v in sorted(values):
        name = f"{col}__{_SAFE.sub('_', str(v))}"
        if name in names:
            raise ValueError(
                f"one_hot({col!r}): values {names[name]!r} and {v!r} "
                f"both sanitize to column {name!r} — rename the values "
                "or pass disambiguated values="
            )
        names[name] = str(v)
    out = df
    for v in sorted(values):
        name = f"{col}__{_SAFE.sub('_', str(v))}"
        out = out.withColumn(
            name, (F.col(col) == F.lit(v)).cast("int")
        )
        out = out.withColumn(name, F.coalesce(F.col(name), F.lit(0)))
    return out


def feature_slot(feature: Column, dims: int) -> Column:
    """Slot in [0, dims) for a feature string: the first 8 hex chars
    of its md5 as an integer, mod ``dims`` — exact integer arithmetic,
    reproducible by any md5-capable engine."""
    h = F.substring(F.md5(feature), 1, 8)
    return F.pmod(F.conv(h, 16, 10).cast("long"), F.lit(dims)).cast("int")


def hash_features(
    df: DataFrame,
    cols: list[str],
    dims: int = 1024,
    out_col: str = "features",
) -> DataFrame:
    """Hash each ``col=value`` pair of the given categorical columns
    into a ``dims``-slot space and append ``out_col`` as a sorted
    array of distinct slots (NULL values contribute nothing). The
    vector width is fixed by ``dims`` — no vocabulary, no fit step,
    append-safe at any cardinality."""
    if dims <= 0:
        raise ValueError(f"dims must be positive: {dims}")
    slots = [
        F.when(
            F.col(c).isNotNull(),
            feature_slot(F.concat(F.lit(f"{c}="), F.col(c).cast("string")), dims),
        )
        for c in cols
    ]
    arr = F.array_sort(
        F.array_distinct(
            F.filter(F.array(*slots), lambda s: s.isNotNull())
        )
    )
    return df.withColumn(out_col, arr)


# ----------------------------------------------------- numeric scaling
#
# Distributed standardization has the same reproducibility trap as
# every float aggregate: SUM(double) depends on partition merge order,
# so two runs can z-score borderline rows differently. The fix is the
# repo's exact-moment pattern (operators/histogram.py:corr_exact):
# scale values to longs, accumulate Σx and Σx² as decimal(38,0)
# (exact + associative), then evaluate ONE fixed IEEE chain at the
# end — byte-stable across runs, partitionings, and engines.

_S = 10_000


def standard_scale(
    df: DataFrame,
    cols: list[str],
    group_cols: list[str] | None = None,
    suffix: str = "_z",
) -> DataFrame:
    """Append ``{col}{suffix}`` = ``(x − mean) / std`` per column
    (population std, per group if ``group_cols``), from exact decimal
    moment sums evaluated in one fixed IEEE chain:
    ``(xₛ − s1/n) / (sqrt(n·s2 − s1²)/n)`` on the 10⁴-scaled axis
    (the z-score is scale-invariant, so no rescaling is needed).
    NULL inputs stay NULL; a constant (or single-row) group scores
    NULL. One grouped aggregate over ≤ |groups| rows + one join —
    map-side combinable, no windows over the facts."""
    groups = list(group_cols or [])
    aggs = []
    for c in cols:
        xs = F.round(F.col(c).cast("double") * _S).cast("decimal(38,0)")
        aggs += [
            F.count(F.col(c)).alias(f"_n_{c}"),
            F.sum(xs).alias(f"_s1_{c}"),
            F.sum(xs * xs).alias(f"_s2_{c}"),
        ]
    stats = df.groupBy(*groups).agg(*aggs)
    out = (
        df.join(stats, on=groups, how="left")
        if groups
        else df.crossJoin(F.broadcast(stats))
    )
    for c in cols:
        xs = F.round(F.col(c).cast("double") * _S)
        n = F.col(f"_n_{c}").cast("double")
        s1 = F.col(f"_s1_{c}").cast("double")
        s2 = F.col(f"_s2_{c}").cast("double")
        spread = n * s2 - s1 * s1
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(
                (F.col(f"_n_{c}") >= 2) & (spread > 0),
                (xs - s1 / n) / (F.sqrt(spread) / n),
            ),
        )
    return out.drop(
        *[f"_{m}_{c}" for c in cols for m in ("n", "s1", "s2")]
    )


def minmax_scale(
    df: DataFrame,
    cols: list[str],
    group_cols: list[str] | None = None,
    suffix: str = "_mm",
) -> DataFrame:
    """Append ``{col}{suffix}`` = ``(x − min) / (max − min)`` per
    column (per group if ``group_cols``) — min/max are exact under any
    aggregation order, and the rescale is one fixed IEEE chain, so the
    output is byte-stable cross-engine. Constant groups score NULL."""
    groups = list(group_cols or [])
    aggs = []
    for c in cols:
        v = F.col(c).cast("double")
        aggs += [F.min(v).alias(f"_mn_{c}"), F.max(v).alias(f"_mx_{c}")]
    stats = df.groupBy(*groups).agg(*aggs)
    out = (
        df.join(stats, on=groups, how="left")
        if groups
        else df.crossJoin(F.broadcast(stats))
    )
    for c in cols:
        mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(
                mx > mn, (F.col(c).cast("double") - mn) / (mx - mn)
            ),
        )
    return out.drop(*[f"_{m}_{c}" for c in cols for m in ("mn", "mx")])


def robust_scale(
    df: DataFrame,
    cols: list[str],
    suffix: str = "_rs",
) -> DataFrame:
    """Outlier-resistant scaling: ``(x − median) / IQR`` per column —
    the third scaler (standard/min-max/robust), the one to reach for
    when the column has heavy tails that would crush a z-score's
    variance. Center and spread are EXACT order statistics
    (operators/quantiles.py:exact_quantiles — rank = floor(q·(n−1)),
    a pure function of the value multiset, collected as 3 rows of
    bounded metadata per column), and the rescale is one fixed IEEE
    chain — byte-stable cross-engine like its siblings. Zero-IQR
    (>50% tied) columns scale NULL; NULLs pass through."""
    from harness_aws_etl_pipeline_spark.operators.quantiles import (
        exact_quantiles,
    )

    out = df
    for c in cols:
        cuts = {
            r["q"]: float(r["value"])
            for r in exact_quantiles(df, c, [0.25, 0.5, 0.75]).collect()
        }
        q1, med, q3 = cuts[0.25], cuts[0.5], cuts[0.75]
        x = F.col(c).cast("double")
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(
                F.lit(q3 > q1) & x.isNotNull(),
                (x - F.lit(med)) / (F.lit(q3) - F.lit(q1)),
            ),
        )
    return out


def scale_outlier_counts(
    df: DataFrame,
    col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """1 row of EXACT-INTEGER facts about the two scalers' output —
    the cross-engine value oracle for :func:`standard_scale` and
    :func:`minmax_scale` without hashing any chained float:

    ``(z_rows, z_hi_cnt, z_lo_cnt, mm_rows, mm_hi_cnt)`` all BIGINT —
    rows that would z-score non-NULL, rows with z > 1 / z < −1, rows
    that would min-max-scale non-NULL, and rows with mm > ½.

    The boundary tests are the scalers' defining inequalities pushed
    back to exact decimal arithmetic on the 10⁴-scaled axis:

    - ``z > 1  ⟺  d > 0 ∧ d² > spread`` with ``d = n·xₛ − s1`` and
      ``spread = n·s2 − s1²`` (d, spread exact decimal(38,0));
    - ``z < −1 ⟺  d < 0 ∧ d² > spread``;
    - ``mm > ½ ⟺  2·xₛ > mnₛ + mxₛ`` on the scaled-long axis.

    No sqrt, no division — every comparison is a decimal integer
    inequality, so ANY engine reproduces the counts bit-for-bit (this
    is what the driver's `numeric_inference` oracle re-derives in
    DuckDB with HUGEINTs). The float z/mm columns the scalers emit
    stay pinned by the pytest numpy oracles. Decimal(38,0) holds up to
    ~10³⁸: with xₛ ≤ 10⁹ that is ~10¹⁴ rows per group before d²
    overflows — beyond 100 TB-scale group sizes.

    One grouped aggregate (map-side combinable) + one broadcast join —
    the same physical shape as the scalers themselves."""
    groups = list(group_cols or [])
    _dec = "decimal(38,0)"
    xs = F.round(F.col(col).cast("double") * _S).cast(_dec)
    stats = df.groupBy(*groups).agg(
        F.count(F.col(col)).cast(_dec).alias("_n"),
        F.sum(xs).alias("_s1"),
        F.sum(xs * xs).alias("_s2"),
        F.min(xs).alias("_mn"),
        F.max(xs).alias("_mx"),
    )
    j = (
        df.join(stats, on=groups, how="left")
        if groups
        else df.crossJoin(F.broadcast(stats))
    )
    d = F.col("_n") * xs - F.col("_s1")
    spread = F.col("_n") * F.col("_s2") - F.col("_s1") * F.col("_s1")
    z_ok = F.col(col).isNotNull() & (F.col("_n") >= 2) & (spread > 0)
    mm_ok = F.col(col).isNotNull() & (F.col("_mx") > F.col("_mn"))
    return j.agg(
        F.sum(z_ok.cast("long")).cast("long").alias("z_rows"),
        F.sum((z_ok & (d > 0) & (d * d > spread)).cast("long"))
        .cast("long")
        .alias("z_hi_cnt"),
        F.sum((z_ok & (d < 0) & (d * d > spread)).cast("long"))
        .cast("long")
        .alias("z_lo_cnt"),
        F.sum(mm_ok.cast("long")).cast("long").alias("mm_rows"),
        F.sum(
            (mm_ok & (xs * 2 > F.col("_mn") + F.col("_mx"))).cast("long")
        )
        .cast("long")
        .alias("mm_hi_cnt"),
    )
