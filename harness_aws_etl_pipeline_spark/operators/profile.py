"""A1/A4/A5 — table profiling + validation report.

Reference semantics (etl/src/transform/transformer.py:230-255): after
transforming, emit a validation dict with row/column counts, columns
that still contain nulls, a ``{col: dtype}`` schema map, and a
likely-identifier warning for string columns whose distinct ratio
exceeds 0.9 on >100 rows (A4, transformer.py:243-246).

Scale notes: everything is computed in at most two aggregate passes —
one for null counts + row count (shared single ``agg``), one for
distinct ratios (``approx_count_distinct``; HLL sketch, no shuffle of
raw values). The reference's per-column ``nunique()`` would be a full
shuffle per column at scale.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_ratios(df: DataFrame, columns: list[str] | None = None, exact: bool = False) -> dict[str, float]:
    """A4 — distinct/total ratio per (string) column, one aggregate pass.

    ``exact=True`` uses ``countDistinct`` (needed for oracle-checked
    results); default is ``approx_count_distinct`` (HLL) which is the
    100 TB-sane choice for profiling.
    """
    cands = columns if columns is not None else [c for c, t in df.dtypes if t == "string"]
    if not cands:
        return {}
    cd = F.countDistinct if exact else F.approx_count_distinct
    row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[cd(F.col(c)).alias(c) for c in cands],
    ).first()
    n = row["__n"] or 0
    return {c: (float(row[c]) / n if n else 0.0) for c in cands}


def profile(df: DataFrame) -> dict[str, Any]:
    """A1+A2+A5 in one pass: row count, per-column null counts, schema."""
    cols = df.columns
    row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols],
    ).first()
    nulls = {c: int(row[c] or 0) for c in cols}
    return {
        "row_count": int(row["__n"]),
        "column_count": len(cols),
        "null_counts": nulls,
        "total_nulls": sum(nulls.values()),
        "columns_with_nulls": [c for c in cols if nulls[c] > 0],
        "schema": dict(df.dtypes),
    }


def validate(df: DataFrame, id_ratio_threshold: float = 0.9, min_rows: int = 100) -> dict[str, Any]:
    """Full validation report (profile + likely-ID warnings)."""
    report = profile(df)
    warnings: list[str] = []
    if report["row_count"] > min_rows:
        for c, r in distinct_ratios(df).items():
            if r > id_ratio_threshold:
                warnings.append(
                    f"column {c!r} has distinct ratio {r:.3f} — likely an identifier"
                )
    report["warnings"] = warnings
    report["valid"] = True
    return report
