"""Distribution-drift monitoring between two dataset snapshots.

A 100 TB training-data pipeline re-ingests sources continuously; the
question "did this month's crawl/feature/table move away from the
reference distribution?" is the health check that gates retrains and
catches upstream breakage. This module compares a REFERENCE snapshot
against a CURRENT snapshot of one column with the standard monitoring
statistics, each in a shuffle-shape that survives scale:

- :func:`ks_statistic` — exact two-sample Kolmogorov–Smirnov distance
  ``sup_x |F_ref(x) − F_cur(x)|`` for numeric columns. The CDFs only
  change at observed values, so the statistic is a max over the
  distinct-value table: one ``groupBy(value)`` (map-side combinable),
  then the engine's TWO-LEVEL PREFIX SUM (``repartitionByRange`` →
  per-partition window + driver offsets over one row per partition —
  the ``sinks/shards.py`` pattern) for the cumulative counts. No
  global single-task window, no value collect. The sufficient
  statistic ``max |cum_ref·n_cur − cum_cur·n_ref|`` is an exact
  integer (``decimal(38,0)`` — the cross products overflow longs at
  fact-table counts), so it is value-oracle-able bit-for-bit; the
  float KS is derived from it in one division.
- :func:`tvd_drift` — exact total-variation distance
  ``½ Σ_v |p_ref(v) − p_cur(v)|`` for categorical columns, same
  exact-integer numerator trick, one groupBy.
- :func:`psi_report` / :func:`psi` — population stability index over
  shared equi-width bins (the credit-scoring/ML-monitoring standard),
  reusing :func:`histogram <harness_aws_etl_pipeline_spark.operators.
  histogram.histogram>`'s deterministic bin arithmetic with the
  REFERENCE side's bounds (the monitoring convention: the reference
  frame defines the grid). PSI's ``ln`` makes it float-library-
  sensitive, so it is NOT value-oracled — the oracled surface is the
  per-bin counts and the integer KS/TVD statistics; PSI itself is
  pinned by tests on hand-computable fixtures.
- :func:`chi2_drift` — the categorical χ² homogeneity statistic with
  degrees of freedom, for significance-style reporting (float;
  tests-only, same reason as PSI).

Reference scope note: the reference has no drift monitoring at all —
its closest notion is the per-run row-count metric
(etl/src/utils/metrics.py); this extends the engine's profiling tier
(distinct ratios, percentiles, sketches, histogram/correlation) from
"describe one snapshot" to "compare two snapshots", the operation a
monitoring DAG actually schedules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "ks_statistic",
    "tvd_drift",
    "psi_report",
    "psi",
    "chi2_drift",
    "drift_cells",
    "grid_bin",
]

_DEC = "decimal(38,0)"


def _side_counts(ref: DataFrame, cur: DataFrame, col, cast: str | None):
    """Per-distinct-value (c_ref, c_cur) counts — one union + one
    map-side-combinable groupBy; NULLs excluded on both sides (a NULL
    has no place on a CDF and no category identity)."""
    v = F.col(col)
    if cast:
        v = v.cast(cast)
    u = (
        ref.where(v.isNotNull()).select(v.alias("v"), F.lit(1).alias("_s"))
        .unionByName(
            cur.where(v.isNotNull()).select(v.alias("v"), F.lit(2).alias("_s"))
        )
    )
    return u.groupBy("v").agg(
        F.sum(F.when(F.col("_s") == 1, 1).otherwise(0)).cast("long").alias("c1"),
        F.sum(F.when(F.col("_s") == 2, 1).otherwise(0)).cast("long").alias("c2"),
    )


def ks_statistic(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    num_range_parts: int | None = None,
) -> DataFrame:
    """1 row: ``(n_ref, n_cur, ks_num decimal(38,0), ks double)`` —
    the exact two-sample KS distance, ``ks = ks_num / (n_ref·n_cur)``.
    ``ks`` is NULL when either side has no non-NULL values.

    Plan shape: groupBy(value) → repartitionByRange → per-partition
    cumulative window + driver prefix offsets (one collected row per
    range partition) → one max. Deterministic: a pure function of the
    two value multisets."""
    d = _side_counts(ref, cur, col, "double")
    nparts = num_range_parts or int(
        ref.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    # pinned across the two jobs that read it (per-partition sums,
    # then the window) — the shards.py two-level-prefix contract
    ranged = (
        d.repartitionByRange(nparts, F.col("v"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    psums = (
        ranged.groupBy("_pid")
        .agg(
            F.sum("c1").alias("p1"),
            F.sum("c2").alias("p2"),
            F.min("v").alias("pmin"),
        )
        .collect()
    )
    off1: dict[int, int] = {}
    off2: dict[int, int] = {}
    run1 = run2 = 0
    for r in sorted(psums, key=lambda r: (r["pmin"] is None, r["pmin"])):
        off1[r["_pid"]] = run1
        off2[r["_pid"]] = run2
        run1 += int(r["p1"] or 0)
        run2 += int(r["p2"] or 0)
    n1, n2 = run1, run2
    if not psums:
        empty = ref.sparkSession.range(1)
        return empty.select(
            F.lit(0).cast("long").alias("n_ref"),
            F.lit(0).cast("long").alias("n_cur"),
            F.lit(0).cast(_DEC).alias("ks_num"),
            F.lit(None).cast("double").alias("ks"),
        )
    map1 = F.create_map(
        *[x for pid, off in off1.items() for x in (F.lit(pid), F.lit(off))]
    )
    map2 = F.create_map(
        *[x for pid, off in off2.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum1 = (map1[F.col("_pid")] + F.sum("c1").over(w)).cast(_DEC)
    cum2 = (map2[F.col("_pid")] + F.sum("c2").over(w)).cast(_DEC)
    diff = F.abs(cum1 * F.lit(n2).cast(_DEC) - cum2 * F.lit(n1).cast(_DEC))
    out = ranged.select(diff.alias("_d")).agg(
        F.coalesce(F.max("_d"), F.lit(0).cast(_DEC)).alias("ks_num")
    )
    return out.select(
        F.lit(n1).cast("long").alias("n_ref"),
        F.lit(n2).cast("long").alias("n_cur"),
        F.col("ks_num").cast(_DEC).alias("ks_num"),
        F.when(
            F.lit(n1 > 0 and n2 > 0),
            F.col("ks_num").cast("double") / F.lit(float(n1) * float(n2)),
        ).alias("ks"),
    )


def tvd_drift(ref: DataFrame, cur: DataFrame, col: str) -> DataFrame:
    """1 row: ``(n_ref, n_cur, tvd_num decimal(38,0), tvd double)`` —
    exact total-variation distance between the two categorical
    distributions: ``tvd = tvd_num / (2·n_ref·n_cur)`` with
    ``tvd_num = Σ_v |c_ref(v)·n_cur − c_cur(v)·n_ref|``. TVD is the
    largest probability mass any event set can disagree by — 0 for
    identical distributions, 1 for disjoint supports. ``tvd`` is NULL
    when either side is empty. One groupBy + one broadcast of the
    1-row totals; no sort, no window."""
    d = _side_counts(ref, cur, col, None)
    totals = d.agg(
        F.sum("c1").cast("long").alias("n_ref"),
        F.sum("c2").cast("long").alias("n_cur"),
    )
    num = F.abs(
        F.col("c1").cast(_DEC) * F.col("n_cur").cast(_DEC)
        - F.col("c2").cast(_DEC) * F.col("n_ref").cast(_DEC)
    )
    return (
        d.crossJoin(F.broadcast(totals))
        .agg(
            F.coalesce(F.max("n_ref"), F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce(F.max("n_cur"), F.lit(0)).cast("long").alias("n_cur"),
            F.coalesce(F.sum(num), F.lit(0).cast(_DEC)).alias("tvd_num"),
        )
        .select(
            "n_ref",
            "n_cur",
            F.col("tvd_num").cast(_DEC).alias("tvd_num"),
            F.when(
                (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
                F.col("tvd_num").cast("double")
                / (2.0 * F.col("n_ref").cast("double") * F.col("n_cur").cast("double")),
            ).alias("tvd"),
        )
    )


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Per-bin comparison table ``(bin, lo, hi, ref_cnt, cur_cnt)``
    over a SHARED equi-width grid — bounds from the REFERENCE side
    when not given (the monitoring convention: the reference defines
    the grid; current values outside it clamp into the edge bins, so
    out-of-range drift is visible as edge-bin mass). The bin counts
    are exact integers (value-oracle-able); derive the PSI score from
    them with :func:`psi`."""
    from harness_aws_etl_pipeline_spark.operators.histogram import histogram

    if lo is None or hi is None:
        b = ref.agg(
            F.min(F.col(col).cast("double")).alias("lo"),
            F.max(F.col(col).cast("double")).alias("hi"),
        ).first()
        lo = b["lo"] if lo is None else lo
        hi = b["hi"] if hi is None else hi
        if lo is None or hi is None:
            raise ValueError(f"reference side has no non-NULL {col!r} values")
    r = histogram(ref, col, bins=bins, lo=lo, hi=hi).select(
        "bin", "lo", "hi", F.col("cnt").alias("ref_cnt")
    )
    c = histogram(cur, col, bins=bins, lo=lo, hi=hi).select(
        "bin", F.col("cnt").alias("cur_cnt")
    )
    return r.join(c, "bin").orderBy("bin")


def psi(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
    epsilon: float = 1e-6,
) -> DataFrame:
    """1 row: ``(n_ref, n_cur, psi double)`` — population stability
    index ``Σ (p_cur − p_ref)·ln(p_cur/p_ref)`` over the shared grid,
    with ``epsilon`` floor-smoothing so empty bins contribute finite
    terms. Rule-of-thumb bands: <0.1 stable, 0.1–0.25 moderate, >0.25
    major shift. Float (``ln``) — pinned by tests, not the SQL oracle;
    oracle the :func:`psi_report` counts instead."""
    rep = psi_report(ref, cur, col, bins=bins, lo=lo, hi=hi)
    tot = rep.agg(
        F.sum("ref_cnt").alias("nr"), F.sum("cur_cnt").alias("nc")
    )
    p_r = F.greatest(
        F.col("ref_cnt").cast("double") / F.col("nr"), F.lit(epsilon)
    )
    p_c = F.greatest(
        F.col("cur_cnt").cast("double") / F.col("nc"), F.lit(epsilon)
    )
    return (
        rep.crossJoin(F.broadcast(tot))
        .select(
            F.col("nr").alias("n_ref"),
            F.col("nc").alias("n_cur"),
            ((p_c - p_r) * F.log(p_c / p_r)).alias("_term"),
        )
        .groupBy("n_ref", "n_cur")
        .agg(F.sum("_term").alias("psi"))
        .select(
            F.col("n_ref").cast("long").alias("n_ref"),
            F.col("n_cur").cast("long").alias("n_cur"),
            "psi",
        )
    )


def drift_cells(ref: DataFrame, cur: DataFrame, col: str) -> DataFrame:
    """``(value STRING, ref_cnt BIGINT, cur_cnt BIGINT)`` — the exact
    per-category contingency table BOTH :func:`tvd_drift` and
    :func:`chi2_drift` reduce (NULLs excluded, categories from either
    side). This is the χ² family's sufficient statistic and the thing
    to value-oracle cross-engine: the counts are exact integers under
    any partitioning, while the χ² score itself is a chained float.
    One union + one map-side-combinable groupBy — |categories| rows."""
    d = _side_counts(ref, cur, col, None)
    return d.select(
        F.col("v").cast("string").alias("value"),
        F.col("c1").alias("ref_cnt"),
        F.col("c2").alias("cur_cnt"),
    )


def chi2_drift(ref: DataFrame, cur: DataFrame, col: str) -> DataFrame:
    """1 row: ``(n_ref, n_cur, categories bigint, dof bigint, chi2
    double)`` — the χ² homogeneity statistic over the two categorical
    samples (expected counts from the pooled distribution). Float by
    nature; significance thresholds are the reader's lookup. ``chi2``
    is NULL when either side is empty or only one category exists."""
    d = _side_counts(ref, cur, col, None)
    totals = d.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c2").cast("double").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    j = d.crossJoin(F.broadcast(totals))
    row_tot = F.col("c1") + F.col("c2")
    n = F.col("n1") + F.col("n2")
    e1 = row_tot * F.col("n1") / n
    e2 = row_tot * F.col("n2") / n
    term = (F.col("c1") - e1) ** 2 / e1 + (F.col("c2") - e2) ** 2 / e2
    return j.groupBy("n1", "n2", "k").agg(F.sum(term).alias("_chi2")).select(
        F.col("n1").cast("long").alias("n_ref"),
        F.col("n2").cast("long").alias("n_cur"),
        F.col("k").alias("categories"),
        F.greatest(F.col("k") - 1, F.lit(0)).cast("long").alias("dof"),
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0) & (F.col("k") > 1),
            F.col("_chi2"),
        ).alias("chi2"),
    )


def grid_bin(col, lo: float, hi: float, bins: int = 10):
    """Pinned-grid bin label (INT in [0, bins), NULL for NULL input)
    for NUMERIC drift monitoring: the same deterministic cell chain
    as :func:`histogram <harness_aws_etl_pipeline_spark.operators.
    histogram.histogram>` with EXPLICIT bounds — out-of-range values
    clamp into the edge bins, so range drift is visible as edge mass.

    This is the bridge from numeric columns to the categorical
    :class:`~harness_aws_etl_pipeline_spark.operators.incremental.
    IncrementalDrift` monitor: pin (lo, hi, bins) from the REFERENCE
    snapshot once, then feed ``grid_bin(value, lo, hi)`` as the
    monitored category — the grid must not drift with the stream,
    which is exactly why it is a pure function of pinned literals."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if not hi > lo:
        raise ValueError(f"need hi > lo: ({lo}, {hi})")
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    cell = F.floor(((c - F.lit(float(lo))) * F.lit(float(bins)))
                   / F.lit(float(hi) - float(lo)))
    return (
        F.when(
            c.isNotNull(),
            F.greatest(F.least(cell, F.lit(bins - 1)), F.lit(0)),
        )
        .cast("int")
    )
