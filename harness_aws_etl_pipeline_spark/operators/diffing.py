"""Keyed table diff — reconcile two snapshots of the same table.

The migration/replication question: "is table B the same data as
table A, and if not, WHICH rows and WHICH columns moved?" — asked
after every backfill, engine migration, CDC resync, or vendor switch
(this repo's own verify harness is the query-level version; this is
the row-level one). At 100 TB the only viable shape is one key-keyed
full-outer join with column-pruned comparisons — never a collect,
never a row-by-row driver loop.

Semantics:

- rows are matched on ``key_cols`` (a candidate key — duplicate keys
  on either side are REPORTED, not guessed around: reconciliation on
  a non-key is meaningless, but the operator still diffs pairable
  rows and counts the ambiguity);
- every non-key column is compared NULL-safely (``<=>``): added /
  removed / changed / unchanged per row, and per-column change
  counts for changed rows — the "what moved" attribution that turns
  a red diff into a bug report;
- floats compare exactly by default; pass ``float_tolerance`` to
  compare ``abs(a−b) <= tol`` instead (migrations across engines
  legitimately perturb last bits).

Plan shape: ONE full-outer sort-merge/shuffled-hash join on the key
(both sides column-pruned to key + compared columns), all comparisons
as codegen boolean expressions, one aggregate for the summary. The
per-row frame is returned lazily — write it, sample it, or aggregate
it; the summary runs without materializing it.

Reference scope note: the reference validates loads by row count only
(etl/src/load/loader.py:186-195); this is the full reconciliation
primitive its migration runbook would need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_diff", "diff_summary"]

_STATUS = "_diff_status"


def _compared_cols(
    a: DataFrame, b: DataFrame, key_cols: list[str], compare_cols
) -> list[str]:
    shared = [c for c in a.columns if c in set(b.columns) and c not in key_cols]
    if compare_cols is not None:
        missing = [c for c in compare_cols if c not in shared]
        if missing:
            raise ValueError(
                f"compare_cols {missing} not present (non-key) on both sides"
            )
        return list(compare_cols)
    return shared


def table_diff(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str] | str,
    compare_cols: list[str] | None = None,
    float_tolerance: float | None = None,
) -> DataFrame:
    """Per-row diff of ``b`` (current) against ``a`` (reference).

    Returns one row per key present on either side: the key columns,
    ``_diff_status`` ∈ {added, removed, changed, unchanged}, and for
    every compared column ``<col>_changed BOOLEAN`` (NULL for
    added/removed rows — there is nothing to compare against).
    Duplicate keys pair positionally-arbitrarily through the join and
    are surfaced by :func:`diff_summary`'s ``dup_key`` counters."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    for side, df in (("a", a), ("b", b)):
        miss = [k for k in keys if k not in df.columns]
        if miss:
            raise ValueError(f"key column(s) {miss} missing from side {side!r}")
    cols = _compared_cols(a, b, keys, compare_cols)
    la = a.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("_in_a"),
        *[F.col(c).alias(f"_a_{c}") for c in cols],
    )
    lb = b.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("_in_b"),
        *[F.col(c).alias(f"_b_{c}") for c in cols],
    )
    j = la.join(lb, on=keys, how="full")

    def _same(c: str) -> F.Column:
        x, y = F.col(f"_a_{c}"), F.col(f"_b_{c}")
        t = dict(a.dtypes)[c]
        if float_tolerance is not None and t in ("float", "double"):
            return (x.isNull() & y.isNull()) | (
                x.isNotNull()
                & y.isNotNull()
                & (
                    F.abs(x.cast("double") - y.cast("double"))
                    <= F.lit(float(float_tolerance))
                )
            )
        return x.eqNullSafe(y)

    changed_flags = [(~_same(c)).alias(f"{c}_changed") for c in cols]
    any_change = F.lit(False)
    for c in cols:
        any_change = any_change | ~_same(c)
    status = (
        F.when(F.col("_in_a").isNull(), F.lit("added"))
        .when(F.col("_in_b").isNull(), F.lit("removed"))
        .when(any_change, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    both = F.col("_in_a").isNotNull() & F.col("_in_b").isNotNull()
    return j.select(
        *keys,
        status.alias(_STATUS),
        *[
            F.when(both, flag).alias(name)
            for flag, name in zip(
                changed_flags, [f"{c}_changed" for c in cols]
            )
        ],
    )


def diff_summary(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str] | str,
    compare_cols: list[str] | None = None,
    float_tolerance: float | None = None,
) -> DataFrame:
    """1 row: ``rows_a, rows_b, added, removed, changed, unchanged,
    dup_key_a, dup_key_b`` plus ``changed_<col> BIGINT`` per compared
    column (how many changed rows moved THAT column). ``identical``
    is the gate a migration runbook asserts: no adds, no removes, no
    changes, no duplicate-key ambiguity on either side."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cols = _compared_cols(a, b, keys, compare_cols)
    d = table_diff(
        a, b, keys, compare_cols=cols, float_tolerance=float_tolerance
    )
    dups_a = (
        a.groupBy(*keys)
        .count()
        .where(F.col("count") > 1)
        .agg(F.count(F.lit(1)).alias("dup_key_a"))
    )
    dups_b = (
        b.groupBy(*keys)
        .count()
        .where(F.col("count") > 1)
        .agg(F.count(F.lit(1)).alias("dup_key_b"))
    )
    counts = d.agg(
        F.sum(F.when(F.col(_STATUS) == "added", 1).otherwise(0))
        .cast("long")
        .alias("added"),
        F.sum(F.when(F.col(_STATUS) == "removed", 1).otherwise(0))
        .cast("long")
        .alias("removed"),
        F.sum(F.when(F.col(_STATUS) == "changed", 1).otherwise(0))
        .cast("long")
        .alias("changed"),
        F.sum(F.when(F.col(_STATUS) == "unchanged", 1).otherwise(0))
        .cast("long")
        .alias("unchanged"),
        *[
            F.sum(F.when(F.col(f"{c}_changed"), 1).otherwise(0))
            .cast("long")
            .alias(f"changed_{c}")
            for c in cols
        ],
    )
    na = a.agg(F.count(F.lit(1)).cast("long").alias("rows_a"))
    nb = b.agg(F.count(F.lit(1)).cast("long").alias("rows_b"))
    out = (
        counts.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(dups_a))
        .crossJoin(F.broadcast(dups_b))
    )
    identical = (
        (F.col("added") == 0)
        & (F.col("removed") == 0)
        & (F.col("changed") == 0)
        & (F.col("dup_key_a") == 0)
        & (F.col("dup_key_b") == 0)
    )
    return out.select(
        "rows_a",
        "rows_b",
        "added",
        "removed",
        "changed",
        "unchanged",
        "dup_key_a",
        "dup_key_b",
        identical.alias("identical"),
        *[F.col(f"changed_{c}") for c in cols],
    )
