"""T3/A3 — exact deduplication.

Reference semantics (etl/src/transform/transformer.py:151-171): drop
exact duplicate rows across all columns and report how many were
removed.

Scale notes: ``dropDuplicates()`` is a hash aggregate on all columns —
one shuffle keyed on the full row. At 100 TB prefer
:func:`deduplicate_by_hash`, which shuffles on a single 64-bit content
hash instead of the full row payload (map-side partial aggregation
dedupes within partitions first, so the shuffle only carries one row
per distinct hash per input partition). Fuzzy/near-dup strategies live
in ``operators/dedup_fuzzy.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deduplicate_exact(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Drop exact duplicate rows (optionally on a column subset)."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def deduplicate_by_hash(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact dedup keyed on a 64-bit xxhash of the row content.

    Keeps an arbitrary representative per hash (first within each
    group), like ``dropDuplicates``. The shuffle key is 8 bytes instead
    of the whole row, which matters when rows are wide (documents with
    large text payloads). Collision probability at 2^64 is negligible
    for dedup purposes; use :func:`deduplicate_exact` when bit-exact
    guarantees are required.
    """
    cols = subset or df.columns
    hashed = df.withColumn("__content_hash", F.xxhash64(*[F.col(c) for c in cols]))
    return hashed.dropDuplicates(["__content_hash"]).drop("__content_hash")


def duplicate_count(df: DataFrame) -> int:
    """A3 — number of rows that exact-dedup would remove.

    Single aggregation: ``count(*) - count(distinct all columns)``
    computed via a groupBy on all columns (one shuffle), instead of the
    reference's two full ``len(df)`` passes around ``drop_duplicates``
    (transformer.py:161-169).
    """
    agg = (
        df.groupBy(*df.columns)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(
            F.sum(F.col("__n") - F.lit(1)).alias("dups"),
        )
        .first()
    )
    return int(agg["dups"] or 0)
