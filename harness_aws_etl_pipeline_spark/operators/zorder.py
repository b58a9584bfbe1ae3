"""Z-order (Morton) clustering for multi-dimensional data skipping.

A 100-TB table is pruned by file/row-group min-max statistics, and
statistics only prune what the LAYOUT clusters: sorting by one column
gives perfect skipping on that column and none on any other. The
Morton curve interleaves the bits of several columns so that rows
close in EVERY dimension land close in the one-dimensional file
order — each output file then covers a small bounding box in all
clustered dimensions at once, and a predicate on ANY subset of them
skips most files (the technique behind lakehouse `OPTIMIZE ZORDER
BY`: Delta/Iceberg/Hudi; Morton 1966).

Pipeline: per-column min/max (one aggregate job) → linear scaling to
a ``bits``-wide integer cell grid → bit interleave (dimension 0 at
the least-significant position) → ``repartitionByRange`` + in-
partition sort on the code. Everything is JVM-side column arithmetic
inside whole-stage codegen — no UDFs — and the only jobs are the
stats aggregate and the range shuffle the re-layout IS.

Determinism: the cell is ``floor((v - min) * (2^bits - 1) / range)``
evaluated in IEEE double — bit-identical across engines for inputs
below 2^53 (the catalog oracle re-derives codes for a full table in
DuckDB); the interleave is pure integer shifts/ors. NULLs take cell 0
(sort first) by convention, constant columns (range 0) contribute
cell 0 — both documented below.

Reference scope note: the reference pipeline's sink writes
hive-partitioned parquet only (etl/src/load/loader.py) — this extends
the engine's layout family (hive partitioning, bucketing, token-bound
shards) with multi-dimensional clustering.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["layout_stats", "morton_interleave", "morton_code", "zorder_by"]

_MAX_CODE_BITS = 62  # stay clear of the long sign bit


def morton_interleave(cells: Sequence[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of pre-scaled integer
    ``cells`` into one Morton code: bit ``b`` of dimension ``d``
    lands at position ``b * ndim + d`` (dimension 0 least
    significant). Inputs must already sit in ``[0, 2^bits)``."""
    ndim = len(cells)
    if ndim < 1:
        raise ValueError("need at least one cell column")
    if bits < 1 or bits * ndim > _MAX_CODE_BITS:
        raise ValueError(
            f"bits={bits} x {ndim} dims exceeds {_MAX_CODE_BITS} code bits"
        )
    code = F.lit(0).cast("long")
    for d, c in enumerate(cells):
        c = c.cast("long")
        for b in range(bits):
            code = code.bitwiseOR(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * ndim + d)
            )
    return code


def _cell(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Scale ``col`` into ``[0, 2^bits)`` against data min/max. The
    arithmetic order (cast double → subtract → multiply → divide →
    floor) is fixed: both engines evaluate it IEEE-identically for
    integer inputs under 2^53 (where double subtraction of exactly-
    representable values is exact, so this matches the former
    subtract-in-long form bit-for-bit) — and fractional columns
    (doubles in [0,1), sub-second timestamps) scale on their REAL
    values instead of silently collapsing to one long-truncated cell
    and losing that dimension's clustering entirely."""
    m = (1 << bits) - 1
    # NULLIF keeps the constant-column branch from materializing an
    # Inf/NaN floor under ANSI mode — the WHEN below never reads it
    scaled = F.floor(
        ((col.cast("double") - mn) * F.lit(float(m)))
        / F.nullif((mx - mn).cast("double"), F.lit(0.0))
    )
    return (
        F.when(col.isNull() | (mx == mn), F.lit(0))
        .otherwise(F.least(scaled, F.lit(m)))
        .cast("long")
    )


def morton_code(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 10,
    out_col: str = "_morton",
) -> DataFrame:
    """``df`` plus the Morton code of ``cols`` as ``out_col``.

    Per-column min/max come from one aggregate over the data
    (broadcast back as a 1-row crossJoin — no driver round trip in
    the plan), so the code depends only on the data, not on session
    state — which is what lets the DuckDB oracle recompute it."""
    if not cols:
        raise ValueError("cols must be non-empty")
    stats = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_mx_{c}"),
            )
        ]
    )
    cells = [
        _cell(F.col(c), F.col(f"_mn_{c}"), F.col(f"_mx_{c}"), bits) for c in cols
    ]
    code = morton_interleave(cells, bits)  # validates bits x ndim early
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col, code)
        .drop(*[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols])
    )


def zorder_by(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """Re-lay ``df`` out along the Morton curve of ``cols``: range-
    partition on the code (contiguous curve segments per output
    partition → tight per-file bounding boxes in every clustered
    dimension) and sort within partitions so row-group statistics
    prune too. Rows are unchanged; write the result with any sink.

    ``partitions`` sizes the output file count (default: session
    shuffle parallelism). Range boundaries come from Spark's
    reservoir sampling of the code — layout-level, not value-level,
    nondeterminism."""
    coded = morton_code(df, cols, bits=bits, out_col="_zorder_code")
    parted = (
        coded.repartitionByRange(partitions, "_zorder_code")
        if partitions
        else coded.repartitionByRange("_zorder_code")
    )
    return parted.sortWithinPartitions("_zorder_code").drop("_zorder_code")


def layout_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Clustering-quality report: one row per physical partition with
    row count and per-column min/max — the bounding box a file
    written from that partition would advertise to min-max pruning.
    Diagnostic for "did the z-order tighten the boxes" (the test
    suite asserts it beats a single-column sort on the neglected
    dimension)."""
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(*aggs)
        .orderBy("_pid")
    )
