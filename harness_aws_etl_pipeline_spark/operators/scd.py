"""Slowly-changing-dimension (SCD Type 2) history.

The warehouse-standard way to keep DIMENSION history: instead of
overwriting a customer/product row when an attribute changes, close
the old version (``valid_to``) and open a new one (``valid_from``),
so every fact can be joined to the attribute values that were true
WHEN IT HAPPENED (``fact.ts BETWEEN valid_from AND valid_to`` — the
engine's ``asof_join``/``range_join`` family consumes exactly this
shape).

Two entry points:

- :func:`scd2_history` — rebuild the full version history from an
  attribute-change EVENT LOG (one row per observation). One window
  per key: consecutive duplicate observations collapse (no spurious
  versions), ``valid_to`` = next change's timestamp, open versions
  get NULL ``valid_to`` and ``is_current``. Cost: one shuffle on the
  key + a per-key sort — the same shape as any sessionization.
- :func:`scd2_apply` — incremental maintenance: fold a batch of
  CURRENT snapshots into an existing SCD-2 table. Unchanged keys pass
  through untouched; changed keys get their open version closed and a
  new version opened; brand-new keys open their first version. The
  plan is one left join of the open slice against the batch plus
  unions — history rows (already closed) are never rewritten, which
  is what makes this cheap on an append-mostly dimension: pair with
  ``SnapTable.merge`` keyed on (key, valid_from) so only files
  holding touched keys rewrite.

Determinism: version boundaries are the observation timestamps
themselves (no wall clock anywhere), ties on (key, ts) break by the
attribute tuple, and change detection is NULL-safe (``<=>``) — so
the history is bit-identical across runs, partitionings, and engines
(the catalog leg re-derives it in DuckDB with the same LEAD window).

Reference scope note: the reference keeps only latest-state metadata
rows (etl/src/load/metadata.py:50-174, status overwritten per job) —
this extends the engine's warehouse tier with the versioned-dimension
pattern its BI layer (etl/README.md:688-695) would need for
point-in-time-correct dashboards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_history", "scd2_apply"]


def _neq_any(cols: list[str], left: str, right: str) -> F.Column:
    """NULL-safe 'any attribute differs' between two prefixed sides."""
    pred = F.lit(False)
    for c in cols:
        pred = pred | ~F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}"))
    return pred


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """Version history from an observation log: one row per
    ``(key, run of identical consecutive attribute values)`` with
    ``valid_from`` (first observation of the run), ``valid_to`` (the
    NEXT run's start, NULL while open) and ``is_current``.

    Consecutive observations with identical attributes collapse into
    one version — re-observing an unchanged row never fabricates
    history. Attribute comparison is NULL-safe."""
    attrs = attr_cols or [c for c in df.columns if c not in (key_col, ts_col)]
    if not attrs:
        raise ValueError("no attribute columns to version")
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in attrs]
    )
    changed = F.lit(False)
    for c in attrs:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    # first row per key: every lag is NULL -> eqNullSafe false vs
    # non-null attr... but an all-NULL attr row would compare equal to
    # the missing predecessor; anchor on row_number instead
    first = F.row_number().over(w) == 1
    runs = (
        df.select(key_col, ts_col, *attrs)
        .withColumn("_chg", (first | changed).cast("int"))
        .withColumn("_ver", F.sum("_chg").over(w))
    )
    out = (
        runs.groupBy(key_col, "_ver", *attrs)
        .agg(F.min(ts_col).alias("valid_from"))
    )
    # ties on valid_from (two distinct observations at one instant —
    # possible in derived logs) break by the attribute tuple, keeping
    # the version chain deterministic across engines
    w2 = Window.partitionBy(key_col).orderBy(
        "valid_from", *[F.col(c) for c in attrs]
    )
    return (
        out.withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_ver")
        .select(key_col, *attrs, "valid_from", "valid_to", "is_current")
    )


def scd2_apply(
    dim: DataFrame,
    batch: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """Fold a batch of current snapshots (one row per key, observed at
    ``batch[ts_col]``) into an existing SCD-2 ``dim`` (the
    :func:`scd2_history` schema). Returns the new full table:

    - closed history rows pass through untouched;
    - an open version whose attributes MATCH its batch row stays open
      (no spurious versions);
    - an open version whose attributes differ closes at the batch
      timestamp, and the batch row opens as the new current version;
    - keys new to the dimension open their first version.

    Batch contract: one CURRENT row per key. A non-conforming batch
    (duplicate keys) is collapsed DETERMINISTICALLY to the latest
    observation per key — greatest ``ts_col``, ties broken by the
    attribute tuple (descending) — instead of silently fanning the
    full join out into duplicate open versions. The collapse is one
    window over the (small) batch, not the dimension."""
    attrs = attr_cols or [
        c
        for c in batch.columns
        if c not in (key_col, ts_col)
    ]
    w_dedup = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), *[F.col(c).desc() for c in attrs]
    )
    batch = (
        batch.withColumn("_rn", F.row_number().over(w_dedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    closed = dim.filter(~F.col("is_current"))
    open_ = dim.filter(F.col("is_current")).alias("o")
    b = (
        batch.select(
            key_col, F.col(ts_col).alias("_batch_ts"), *attrs
        ).alias("b")
    )
    joined = open_.join(b, on=F.col(f"o.{key_col}") == F.col(f"b.{key_col}"), how="full")
    diff = _neq_any(attrs, "o", "b")
    o_key = F.col(f"o.{key_col}")
    b_key = F.col(f"b.{key_col}")

    def _side(side: str, valid_from, valid_to, is_current):
        return F.struct(
            F.coalesce(o_key, b_key).alias(key_col),
            *[F.col(f"{side}.{c}").alias(c) for c in attrs],
            valid_from.alias("valid_from"),
            valid_to.alias("valid_to"),
            is_current.alias("is_current"),
        )

    rows = joined.select(
        F.when(
            b_key.isNull(),  # open version, no batch row: unchanged
            F.array(_side("o", F.col("o.valid_from"), F.col("o.valid_to"), F.lit(True))),
        )
        .when(
            o_key.isNull(),  # brand-new key: first version opens
            F.array(_side("b", F.col("_batch_ts"), F.lit(None).cast(dim.schema["valid_to"].dataType), F.lit(True))),
        )
        .when(
            diff,  # changed: close the open version, open the new one
            F.array(
                _side("o", F.col("o.valid_from"), F.col("_batch_ts"), F.lit(False)),
                _side("b", F.col("_batch_ts"), F.lit(None).cast(dim.schema["valid_to"].dataType), F.lit(True)),
            ),
        )
        .otherwise(  # same attributes: the open version stays open
            F.array(_side("o", F.col("o.valid_from"), F.col("o.valid_to"), F.lit(True)))
        )
        .alias("_rows")
    ).select(F.explode("_rows").alias("_r")).select("_r.*")
    return closed.unionByName(rows)
