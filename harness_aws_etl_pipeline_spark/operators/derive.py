"""T6/T7/T8 — derived metadata fields.

Reference semantics (etl/src/transform/transformer.py:211-222):

- T6: ``_processed_at`` = wall-clock processing timestamp (:211)
- T7: ``_row_hash`` = stable per-row content hash (:214). The pandas
  ``hash_pandas_object`` values are engine-specific by design; the
  engine preserves the *semantics* (deterministic content hash over all
  columns) using ``xxhash64`` — values intentionally differ from the
  reference and are excluded from value-checked oracle queries.
- T8: ``_year``/``_month``/``_day`` partition keys from the first
  timestamp column (:217-222).

The reference computes the hash *after* adding ``_processed_at``
(transformer.py:211-214), so its row hash depends on wall-clock time;
:func:`add_processing_metadata` preserves that ordering but hashes only
the data columns by default (deterministic), with
``include_processed_at=True`` to reproduce the reference's
nondeterministic behavior.

All three are narrow projections — they fuse into whatever stage reads
the rows; no shuffle, no extra pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_processing_timestamp(df: DataFrame, column: str = "_processed_at") -> DataFrame:
    """T6 — constant processing timestamp (nondeterministic)."""
    return df.withColumn(column, F.current_timestamp())


def add_row_hash(
    df: DataFrame, column: str = "_row_hash", subset: list[str] | None = None
) -> DataFrame:
    """T7 — 64-bit content hash over ``subset`` (default: all columns)."""
    cols = subset or df.columns
    return df.withColumn(column, F.xxhash64(*[F.col(c) for c in cols]))


def first_timestamp_column(df: DataFrame) -> str | None:
    for c, t in df.dtypes:
        if t.startswith("timestamp") or t == "date":
            return c
    return None


def add_date_partitions(df: DataFrame, source_column: str | None = None) -> DataFrame:
    """T8 — ``_year``/``_month``/``_day`` from the first (or given)
    timestamp column. No-op when no timestamp column exists, matching
    the reference's guard (transformer.py:217-218)."""
    col = source_column or first_timestamp_column(df)
    if col is None:
        return df
    return (
        df.withColumn("_year", F.year(F.col(col)))
        .withColumn("_month", F.month(F.col(col)))
        .withColumn("_day", F.dayofmonth(F.col(col)))
    )


def add_processing_metadata(
    df: DataFrame, include_processed_at: bool = True, hash_include_processed_at: bool = False
) -> DataFrame:
    """T6+T7+T8 in reference order (transformer.py:211-222)."""
    out = df
    data_cols = list(df.columns)
    if include_processed_at:
        out = add_processing_timestamp(out)
    hash_cols = out.columns if hash_include_processed_at else data_cols
    out = add_row_hash(out, subset=hash_cols)
    return add_date_partitions(out)
