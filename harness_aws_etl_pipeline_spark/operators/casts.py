"""T4/T5/A6 — heuristic schema mutation (date + numeric inference).

Reference semantics:

- T4 (etl/src/transform/transformer.py:182-188): columns whose name
  contains one of ``date/time/created/updated`` are parsed to
  timestamps; unparseable values become null (pandas
  ``to_datetime(errors="coerce")`` ≙ Spark's cast-to-null semantics).
- T5/A6 (transformer.py:190-197): string columns are cast to numeric
  when >80% of their non-null values parse as numbers
  (``to_numeric(errors="coerce")``). This is data-dependent schema
  mutation — the engine does it as a deliberate two-phase plan:

  1. ONE aggregate pass computing the parse ratio of every candidate
     column simultaneously (not a pass per column — at 100 TB an extra
     scan per column is the difference between one job and fifty).
  2. A narrow projection casting the columns that passed the
     threshold.

  The profile pass is also where the 100 TB design point bites
  hardest: on known-schema data, skip it entirely (the engine's
  explicit-schema path) — inference is for schemaless bronze input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DATE_NAME_MARKERS = ("date", "time", "created", "updated")


def date_like_columns(df: DataFrame) -> list[str]:
    """String columns whose name suggests a date (T4 name heuristic)."""
    return [
        c
        for c, t in df.dtypes
        if t == "string" and any(m in c.lower() for m in DATE_NAME_MARKERS)
    ]


def cast_date_like_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """T4 — cast name-matched string columns to timestamp (invalid→null)."""
    targets = set(columns if columns is not None else date_like_columns(df))
    if not targets:
        return df
    # try_to_timestamp: malformed → null (pandas errors="coerce"
    # semantics) even under ANSI mode
    return df.select(
        *[
            F.try_to_timestamp(F.col(c)).alias(c) if c in targets else F.col(c)
            for c in df.columns
        ]
    )


def numeric_parse_ratios(df: DataFrame, columns: list[str] | None = None) -> dict[str, float]:
    """A6 — fraction of non-null values castable to double, per string
    column, in ONE aggregate pass over all candidates.

    ``avg(cast(c as double) is not null)`` over non-null values — the
    distributed equivalent of the reference's
    ``to_numeric(errors='coerce').notna().mean()`` (transformer.py:193).
    Columns that are entirely null report ratio 0.0.
    """
    cands = columns if columns is not None else [c for c, t in df.dtypes if t == "string"]
    if not cands:
        return {}
    # try_cast: malformed → null instead of an ANSI runtime error
    row = df.agg(
        *[
            F.coalesce(
                F.avg(
                    F.when(
                        F.col(c).isNotNull(),
                        F.col(c).try_cast("double").isNotNull().cast("double"),
                    )
                ),
                F.lit(0.0),
            ).alias(c)
            for c in cands
        ]
    ).first()
    return {c: float(row[c]) for c in cands}


def numeric_parse_counts(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """A6 (exact integer form) — per string column, ``(parsed_cnt,
    nonnull_cnt)`` in ONE aggregate pass, plus the T5 >80% inference
    decision expressed as exact integer arithmetic
    (``5*parsed_cnt > 4*nonnull_cnt`` ≡ parsed/nonnull > 0.8).

    The integer sufficient statistics of :func:`numeric_parse_ratios`
    (transformer.py:190-197): same single scan, but the output carries
    no derived float, so it is hash-stable across engines regardless
    of division/rounding behavior. One row per candidate column.
    """
    cands = columns if columns is not None else [c for c, t in df.dtypes if t == "string"]
    if not cands:
        raise ValueError("numeric_parse_counts: no string candidate columns")
    agg = df.agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(c).isNotNull()
                        & F.col(c).try_cast("double").isNotNull(),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"p_{i}")
            for i, c in enumerate(cands)
        ],
        *[
            F.coalesce(F.sum(F.col(c).isNotNull().cast("int")), F.lit(0))
            .cast("long")
            .alias(f"n_{i}")
            for i, c in enumerate(cands)
        ],
    )
    stack_args = ", ".join(f"'{c}', p_{i}, n_{i}" for i, c in enumerate(cands))
    return agg.select(
        F.expr(
            f"stack({len(cands)}, {stack_args}) AS (col_name, parsed_cnt, nonnull_cnt)"
        )
    ).withColumn("inferred", F.col("parsed_cnt") * 5 > F.col("nonnull_cnt") * 4)


def infer_numeric_columns(
    df: DataFrame,
    threshold: float = 0.8,
    columns: list[str] | None = None,
    ratios: dict[str, float] | None = None,
) -> DataFrame:
    """T5 — cast string columns to double where parse ratio > threshold.

    Pass precomputed ``ratios`` (from :func:`numeric_parse_ratios`) to
    avoid the profile pass when profiling already ran.
    """
    if ratios is None:
        ratios = numeric_parse_ratios(df, columns)
    targets = {c for c, r in ratios.items() if r > threshold}
    if not targets:
        return df
    return df.select(
        *[
            F.col(c).try_cast("double").alias(c) if c in targets else F.col(c)
            for c in df.columns
        ]
    )
