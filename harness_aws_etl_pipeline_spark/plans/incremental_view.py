"""Incrementally-maintained rollup over a snapshot table — the
materialized-view refresh pattern the gold tier needs at 100 TB.

A gold aggregate (revenue by date, events by type, …) over an
append-only silver table does not need to re-scan silver on every
refresh: :meth:`~harness_aws_etl_pipeline_spark.sinks.snaptable.SnapTable.read_changes`
answers "which rows arrived since the version I folded in" from
manifest metadata, and for DISTRIBUTIVE aggregates (SUM / COUNT /
MIN / MAX) the delta's partial aggregate combines with the stored
rollup group-by-group. Refresh cost is O(new rows), not O(table).

The refresh is exactly-once without any side channel: the gold
table's own txn ledger stores the last silver version folded in
(``app_id = "iv:<view name>"``, ``batch_id = silver version``), and
the combined rows land in ONE atomic merge commit. A crashed refresh
re-runs from the same recorded version; a replayed refresh
short-circuits on the ledger.

Non-goals, stated: AVG and other algebraic aggregates must be stored
as (sum, count) pairs by the caller; holistic aggregates (DISTINCT,
percentiles) cannot be folded incrementally and need the full-scan
path. Rewrite commits on silver (merge/delete/overwrite) break the
append-only premise — refresh() surfaces ``read_changes``' policy
error instead of silently double-counting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

__all__ = ["IncrementalRollup"]

# distributive combiners: how two partial aggregates of the same
# group merge. COUNT combines by SUM — the only asymmetric case.
_COMBINERS = {
    "sum": F.sum,
    "count": F.sum,
    "min": F.min,
    "max": F.max,
}


class IncrementalRollup:
    """A gold rollup ``SELECT group_cols, aggs FROM silver GROUP BY
    group_cols`` maintained incrementally.

    ``aggs`` maps output column name → ("sum"|"count"|"min"|"max",
    source expression). Example::

        iv = IncrementalRollup(
            spark, silver, str(gold_path), "daily_rev",
            group_cols=["order_date"],
            aggs={
                "line_cnt": ("count", F.lit(1)),
                "revenue": ("sum", F.col("l_quantity") * F.col("l_extendedprice")),
            },
        )
        iv.refresh()   # folds in whatever silver appended since last time
    """

    def __init__(
        self,
        spark: SparkSession,
        source: SnapTable,
        view_path: str,
        name: str,
        group_cols: list[str],
        aggs: dict[str, tuple[str, Column]],
    ):
        if not group_cols or not aggs:
            raise ValueError("IncrementalRollup needs group_cols and aggs")
        bad = [k for k, (kind, _) in aggs.items() if kind not in _COMBINERS]
        if bad:
            raise ValueError(
                f"non-distributive aggregate kinds for {bad}; supported: "
                f"{sorted(_COMBINERS)} (store AVG as sum+count; DISTINCT "
                f"and percentiles need the full-scan path)"
            )
        self.spark = spark
        self.source = source
        self.table = SnapTable(spark, view_path)
        self.app_id = f"iv:{name}"
        self.group_cols = list(group_cols)
        self.aggs = dict(aggs)

    def _partial(self, rows: DataFrame) -> DataFrame:
        exprs = []
        for out, (kind, col) in self.aggs.items():
            fn = F.count if kind == "count" else _COMBINERS[kind]
            exprs.append(fn(col).alias(out))
        return rows.groupBy(*self.group_cols).agg(*exprs)

    def last_folded_version(self) -> int | None:
        cur = self.table.current_version()
        if cur is None:
            return None
        return (self.table.manifest(cur).get("txns") or {}).get(self.app_id)

    def refresh(self) -> dict:
        """Fold silver's appends since the last refresh into the view.

        First call aggregates the full current snapshot; later calls
        aggregate ONLY the delta and merge it group-by-group. Returns
        ``{"folded_to": version, "skipped": bool, ...merge stats}``.
        """
        src_version = self.source.current_version()
        if src_version is None:
            return {"folded_to": None, "skipped": True}
        last = self.last_folded_version()
        if last is not None and src_version <= last:
            return {"folded_to": last, "skipped": True}

        if last is None:
            delta = self.source.read(version=src_version)
        else:
            delta = self.source.read_changes(last, to_version=src_version)
        agg = self._partial(delta)
        if last is not None:
            from harness_aws_etl_pipeline_spark.plans.lakeview import (
                _guard_null_groups,
            )

            _guard_null_groups(agg, self.group_cols)

        if last is not None:
            existing = self.table.read()
            # strict unionByName: if the aggs config changed since the
            # view was built, the stored rollup lacks the new column and
            # a silent null-fill would commit delta-only values as
            # all-time aggregates — fail loudly and force a rebuild
            combined = (
                agg.unionByName(
                    existing.join(
                        agg.select(*self.group_cols), self.group_cols, "leftsemi"
                    )
                )
                .groupBy(*self.group_cols)
                .agg(
                    *[
                        _COMBINERS[kind](F.col(out)).alias(out)
                        for out, (kind, _) in self.aggs.items()
                    ]
                )
            )
        else:
            combined = agg

        out = self.table.merge(
            combined,
            self.group_cols,
            txn=(self.app_id, src_version),
        )
        if out.get("skipped"):
            return {"folded_to": self.last_folded_version(), "skipped": True}
        return {"folded_to": src_version, "skipped": False, **out}

    def read(self) -> DataFrame:
        return self.table.read()
