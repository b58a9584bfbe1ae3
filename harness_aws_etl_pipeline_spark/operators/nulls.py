"""T2 — null-handling strategies + A2 null profiling.

Reference semantics (etl/src/transform/transformer.py:124-147):

- ``drop``: remove rows containing any null (T2a, transformer.py:127-129)
- ``fill``: numeric nulls → 0, everything else → "" (T2b, :130-136)
- ``flag``: add boolean ``<col>_is_null`` per column that has nulls
  (T2c, :137-141)
- null counts per column + grand total (A2, :124-125,143-147)

Scale notes: ``drop``/``fill`` are narrow row-level transforms — they
fuse into the scan stage under whole-stage codegen, no shuffle. ``flag``
and the per-column counts need to know *which* columns contain nulls;
that is one single-pass aggregate over all columns (not one pass per
column), then a narrow projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC_PREFIXES = ("int", "bigint", "smallint", "tinyint", "float", "double", "decimal", "long", "short", "byte")


def _numeric_columns(df: DataFrame) -> list[str]:
    return [c for c, t in df.dtypes if t.startswith(_NUMERIC_PREFIXES)]


def null_counts(df: DataFrame) -> dict[str, int]:
    """A2 — per-column null counts in ONE aggregate pass.

    Equivalent of ``df.isnull().sum()`` (reference transformer.py:124)
    but distributed: a single ``agg`` with one conditional-sum per
    column, map-side combined, so cost is one scan regardless of width.
    """
    if not df.columns:
        return {}
    row = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in df.columns]
    ).first()
    return {c: int(row[c] or 0) for c in df.columns}


def drop_null_rows(df: DataFrame) -> DataFrame:
    """T2a — drop rows with a null in any column (``na.drop("any")``)."""
    return df.na.drop("any")


def fill_nulls(df: DataFrame) -> DataFrame:
    """T2b — fill numeric nulls with 0, string nulls with ''.

    Non-numeric non-string columns (timestamps, arrays, …) are left
    as-is, matching the reference's object-dtype branch which only
    touches numeric and object columns (transformer.py:130-136).
    """
    numeric = _numeric_columns(df)
    strings = [c for c, t in df.dtypes if t == "string"]
    out = df
    if numeric:
        out = out.na.fill(0, subset=numeric)
    if strings:
        out = out.na.fill("", subset=strings)
    return out


def flag_nulls(df: DataFrame, columns_with_nulls: list[str] | None = None) -> DataFrame:
    """T2c — add ``<col>_is_null`` boolean for each column that has nulls.

    If ``columns_with_nulls`` is None it is computed with
    :func:`null_counts` (one extra aggregate pass — pass the list in
    when you already profiled).
    """
    if columns_with_nulls is None:
        counts = null_counts(df)
        columns_with_nulls = [c for c, n in counts.items() if n > 0]
    return df.select(
        "*", *[F.col(c).isNull().alias(f"{c}_is_null") for c in columns_with_nulls]
    )


def handle_nulls(df: DataFrame, strategy: str = "drop") -> DataFrame:
    """Dispatch on the configured strategy (reference config.yaml:83)."""
    if strategy == "drop":
        return drop_null_rows(df)
    if strategy == "fill":
        return fill_nulls(df)
    if strategy == "flag":
        return flag_nulls(df)
    raise ValueError(f"unknown null_handling strategy: {strategy!r}")
