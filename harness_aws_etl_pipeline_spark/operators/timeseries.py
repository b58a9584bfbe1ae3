"""Time-series gap filling: the date spine.

Trend dashboards and window analytics assume a DENSE time axis — a
day with no orders must appear as 0, not vanish (a 7-day moving
average over a sparse axis silently averages the wrong days; lag/lead
step over holes). The warehouse fix is the date-spine pattern:
generate the full calendar between the data's bounds, cross it with
the group domain, left-join the actuals, fill the holes.

Spark-first shape: the spine is ``sequence(min_d, max_d, interval)``
exploded — one 1-row aggregate for the bounds, one broadcast of the
(tiny) spine × groups frame builder side, and a left join keyed on
(group, date). No UDFs; the spine never exceeds
``days × |groups|`` rows, and the join shuffles only the aggregated
actuals (already one row per group-day), never the raw facts.

Reference scope note: the reference's dashboard spec calls for daily
trends (etl/README.md:692) over job-date-partitioned output — this
supplies the dense-axis guarantee those trends assume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["date_spine", "fill_date_gaps"]


def date_spine(
    df: DataFrame,
    date_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Every (group, date) combination between the GLOBAL min/max of
    ``date_col`` — one row per group per calendar day, whether or not
    the group has data that day. Groups are the distinct values
    observed in ``df``; the date bounds are global so every group
    shares one axis (what a multi-series chart needs)."""
    groups = group_cols or []
    bounds = df.agg(
        F.min(F.col(date_col).cast("date")).alias("_mn"),
        F.max(F.col(date_col).cast("date")).alias("_mx"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("_mn", "_mx", F.expr("interval 1 day"))
        ).alias(date_col)
    )
    if not groups:
        return spine
    dom = df.select(*groups).distinct()
    return dom.crossJoin(F.broadcast(spine))


def fill_date_gaps(
    df: DataFrame,
    date_col: str,
    group_cols: list[str] | None = None,
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """``df`` (one row per (group, date) — aggregate first) re-laid on
    the dense spine: missing (group, day) combinations appear with
    the ``fill`` value per column (default 0 — pass ``{col: None}``
    to keep NULL). Existing rows pass through unchanged.

    An empty ``df`` returns empty (no bounds → no spine)."""
    groups = group_cols or []
    value_cols = [
        c for c in df.columns if c != date_col and c not in groups
    ]
    spine = date_spine(df, date_col, groups)
    keyed = df.withColumn(date_col, F.col(date_col).cast("date"))
    out = spine.join(keyed, on=[*groups, date_col], how="left")
    fills = fill or {}
    for c in value_cols:
        v = fills.get(c, 0)
        if v is not None:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out
