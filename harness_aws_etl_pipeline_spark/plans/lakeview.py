"""Incrementally-maintained rollup over ANY lake table — the
materialized-view refresh pattern generalized from
:class:`~harness_aws_etl_pipeline_spark.plans.incremental_view.IncrementalRollup`
(SnapTable-only) to every change-capture source ``lake_changes``
dispatches to: SnapTable, Delta, Iceberg, Hudi.

Two fold modes:

- **append-only** (default): the delta is "rows added since the last
  folded cursor"; distributive aggregates (SUM / COUNT / MIN / MAX)
  combine group-by-group. Rewriting commits surface the change
  reader's policy error — never silent double-counting.
- **change_rows=True**: the delta is a change-row stream
  (``_change_type`` labeled). Inserts/post-images ADD, deletes/
  pre-images RETRACT — SUM and COUNT stay exact through updates and
  deletes (the classic retractable-aggregate incremental view
  maintenance). MIN/MAX are NOT retractable and reject up front.
  Retraction needs full pre-image values, so sources whose delete
  rows are key-only reject at fold time via a null guard: Iceberg
  equality-delete windows and Hudi log-block streams cannot retract
  (Hudi change streams carry no pre-images at all and reject at
  construction); Delta CDF and SnapTable CDF (update_preimage/
  postimage pairs) and Iceberg position-delete windows fold exactly.

Refresh cost is O(changes), not O(table). Exactly-once without a
side channel: the view is a SnapTable whose txn ledger stores the
last folded cursor under ``app_id = "lv:<name>"`` keyed by a
MONOTONIC per-format integer (snaptable/delta version, Iceberg
SEQUENCE NUMBER — snapshot ids are random and cannot order a ledger
— and the numeric Hudi instant); the combined rows land in ONE
atomic merge commit, and a replayed refresh short-circuits on the
ledger.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable
from harness_aws_etl_pipeline_spark.sources.lakeread import (
    detect_lake_format,
    lake_changes,
    read_lake,
)

__all__ = ["LakeRollup"]

_COMBINERS = {
    "sum": F.sum,
    "count": F.sum,
    "min": F.min,
    "max": F.max,
}
_RETRACTABLE = ("sum", "count")
_ADD_TYPES = ("insert", "update_postimage")
_SUB_TYPES = ("delete", "update_preimage")


def _cursor_state(spark: SparkSession, path: str) -> tuple[str, object, int]:
    """(format, native cursor, monotonic int) of the CURRENT state —
    the native cursor feeds ``lake_changes``, the monotonic int keys
    the view's txn ledger."""
    kind = detect_lake_format(spark, path)
    if kind == "snaptable":
        v = SnapTable(spark, path).current_version()
        if v is None:
            raise ValueError(f"no snaptable snapshot at {path!r}")
        return kind, v, int(v)
    if kind == "delta":
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_snapshot,
        )

        v = delta_snapshot(spark, path)["version"]
        return kind, v, int(v)
    if kind == "iceberg":
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            _snapshot_meta,
            iceberg_snapshots,
        )

        snaps = iceberg_snapshots(spark, path)
        if not snaps:
            raise ValueError(f"no Iceberg snapshot at {path!r}")
        sid = snaps[-1]["snapshot_id"]
        seq = (_snapshot_meta(spark, path).get(sid) or {}).get("seq") or 0
        return kind, sid, int(seq)
    if kind == "hudi":
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_timeline,
        )

        tl = hudi_timeline(spark, path)
        if not tl:
            raise ValueError(f"no completed Hudi commit at {path!r}")
        inst = tl[-1]["instant"]
        return kind, inst, int(inst)
    raise ValueError(
        f"{kind!r} layouts have no change-capture log; LakeRollup "
        "needs a snaptable/delta/iceberg/hudi source"
    )


def _native_cursor_for(
    spark: SparkSession, path: str, kind: str, mono: int
):
    """Map a ledger's monotonic int back to the format's native
    cursor (identity except Iceberg, whose random snapshot ids are
    looked up by sequence number)."""
    if kind != "iceberg":
        return str(mono).zfill(14) if kind == "hudi" else int(mono)
    from harness_aws_etl_pipeline_spark.sources.icebergread import (
        _snapshot_meta,
    )

    for sid, m in _snapshot_meta(spark, path).items():
        if int(m.get("seq") or 0) == mono:
            return sid
    raise ValueError(
        f"no retained Iceberg snapshot with sequence number {mono} at "
        f"{path!r} (expired?); rebuild the view"
    )


def _guard_null_groups(agg: DataFrame, group_cols: list[str]) -> None:
    """An incremental fold whose delta holds NULL group values would
    silently accumulate duplicate NULL-group rows — the view's keyed
    merge cannot address a NULL key (SQL join semantics). The partial
    aggregate is group-level small, so this probe is cheap."""
    cond = F.lit(False)
    for g in group_cols:
        cond = cond | F.col(g).isNull()
    if agg.filter(cond).limit(1).count():
        raise ValueError(
            "the fold delta carries NULL group-by values; the view's "
            "keyed merge cannot address a NULL group — coalesce the "
            "group column upstream"
        )


class LakeRollup:
    """A gold rollup ``SELECT group_cols, aggs FROM <lake table>
    GROUP BY group_cols`` maintained incrementally from the table's
    change feed. ``aggs`` maps output column name →
    ("sum"|"count"|"min"|"max", source Column)."""

    def __init__(
        self,
        spark: SparkSession,
        source_path: str,
        view_path: str,
        name: str,
        group_cols: list[str],
        aggs: dict[str, tuple[str, Column]],
        change_rows: bool = False,
    ):
        if not group_cols or not aggs:
            raise ValueError("LakeRollup needs group_cols and aggs")
        bad = [k for k, (kind, _) in aggs.items() if kind not in _COMBINERS]
        if bad:
            raise ValueError(
                f"non-distributive aggregate kinds for {bad}; supported: "
                f"{sorted(_COMBINERS)}"
            )
        if change_rows:
            nr = [
                k
                for k, (kind, _) in aggs.items()
                if kind not in _RETRACTABLE
            ]
            if nr:
                raise ValueError(
                    f"aggregates {nr} are not retractable; change-row "
                    "folding supports sum/count only (min/max need the "
                    "append-only path or a rebuild)"
                )
        self.spark = spark
        self.source_path = source_path.rstrip("/")
        self.change_rows = bool(change_rows)
        if self.change_rows and detect_lake_format(
            spark, self.source_path
        ) == "hudi":
            raise ValueError(
                "Hudi change streams carry POST-images only (no "
                "update_preimage rows), so updates cannot be "
                "retracted; use append-only mode or a SnapTable/"
                "Delta source"
            )
        self.table = SnapTable(spark, view_path)
        self.app_id = f"lv:{name}"
        self.group_cols = list(group_cols)
        self.aggs = dict(aggs)

    # ------------------------------------------------------------ fold

    def _partial(self, rows: DataFrame) -> DataFrame:
        exprs = []
        for out, (kind, col) in self.aggs.items():
            fn = F.count if kind == "count" else _COMBINERS[kind]
            exprs.append(fn(col).alias(out))
        return rows.groupBy(*self.group_cols).agg(*exprs)

    def _partial_changes(self, rows: DataFrame) -> DataFrame:
        """Signed partial aggregate of a change-row delta: adds minus
        retractions per group. A retraction row with a NULL aggregate
        source (key-only delete — Iceberg equality deletes, Hudi
        delete blocks) cannot retract and fails the whole fold
        loudly BEFORE anything commits."""
        sign = (
            F.when(F.col("_change_type").isin(*_ADD_TYPES), F.lit(1))
            .when(F.col("_change_type").isin(*_SUB_TYPES), F.lit(-1))
            .otherwise(F.lit(None))
        )
        labeled = rows.withColumn("__sign", sign)
        # both guards in ONE job over the delta
        needed = [c for _, (k, c) in self.aggs.items() if k == "sum"]
        any_null = F.lit(False)
        for c in needed:
            any_null = any_null | c.isNull()
        null_group = F.lit(False)
        for g in self.group_cols:
            null_group = null_group | F.col(g).isNull()
        checks = labeled.agg(
            F.sum(F.col("__sign").isNull().cast("long")).alias("unk"),
            F.sum(
                ((F.col("__sign") == -1) & any_null).cast("long")
            ).alias("holes"),
            F.sum(null_group.cast("long")).alias("ng"),
        ).collect()[0]
        if checks["ng"]:
            raise ValueError(
                "change rows carry NULL group-by values; the view's "
                "keyed merge cannot address a NULL group (SQL join "
                "semantics) — coalesce the group column upstream"
            )
        if checks["unk"]:
            ct = (
                labeled.filter(F.col("__sign").isNull())
                .limit(1)
                .collect()[0]["_change_type"]
            )
            raise ValueError(
                f"unknown _change_type {ct!r} in the change stream"
            )
        if checks["holes"]:
            raise ValueError(
                "retraction rows carry NULL aggregate sources "
                "(key-only deletes — equality deletes or delete "
                "blocks); exact retraction needs full pre-images "
                "— rebuild the view from a snapshot instead"
            )
        exprs = []
        for out, (kind, col) in self.aggs.items():
            src = F.lit(1) if kind == "count" else col
            exprs.append(F.sum(F.col("__sign") * src).alias(out))
        return labeled.groupBy(*self.group_cols).agg(*exprs)

    # --------------------------------------------------------- refresh

    def last_folded(self) -> int | None:
        cur = self.table.current_version()
        if cur is None:
            return None
        return (self.table.manifest(cur).get("txns") or {}).get(self.app_id)

    def refresh(self) -> dict:
        """Fold the source's changes since the last refresh into the
        view. First call aggregates the full current snapshot; later
        calls aggregate ONLY the delta. Returns ``{"folded_to":
        monotonic cursor, "skipped": bool, ...merge stats}``."""
        kind, native, mono = _cursor_state(self.spark, self.source_path)
        last = self.last_folded()
        if last is not None and mono <= last:
            return {"folded_to": last, "skipped": True}

        if last is None:
            delta = read_lake(self.spark, self.source_path)
            agg = self._partial(delta)
        else:
            since = _native_cursor_for(
                self.spark, self.source_path, kind, last
            )
            delta = lake_changes(
                self.spark,
                self.source_path,
                since,
                native,
                change_rows=self.change_rows,
            )
            agg = (
                self._partial_changes(delta)
                if self.change_rows
                else self._partial(delta)
            )
            _guard_null_groups(agg, self.group_cols)

        if last is not None:
            existing = self.table.read()
            combined = (
                agg.unionByName(
                    existing.join(
                        agg.select(*self.group_cols),
                        self.group_cols,
                        "leftsemi",
                    )
                )
                .groupBy(*self.group_cols)
                .agg(
                    *[
                        F.sum(F.col(out)).alias(out)
                        if kind in _RETRACTABLE and self.change_rows
                        else _COMBINERS[kind](F.col(out)).alias(out)
                        for out, (kind, _) in self.aggs.items()
                    ]
                )
            )
            # combining widens sum types (decimal(28,2)→(38,2));
            # conform back to the view's stored types so the merge
            # never sees a schema conflict
            vtypes = {f.name: f.dataType for f in existing.schema.fields}
            combined = combined.select(
                *self.group_cols,
                *[
                    F.col(out).cast(vtypes[out]).alias(out)
                    if out in vtypes
                    else F.col(out)
                    for out in self.aggs
                ],
            )
        else:
            combined = agg

        out = self.table.merge(
            combined, self.group_cols, txn=(self.app_id, mono)
        )
        if out.get("skipped"):
            return {"folded_to": self.last_folded(), "skipped": True}
        return {"folded_to": mono, "skipped": False, **out}

    def read(self) -> DataFrame:
        return self.table.read()
