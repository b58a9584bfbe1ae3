"""[EXT] As-of (time-travel) join — an operator Spark has no native
form of (SURVEY §2.7 flags it for similarity post-filtering and
point-in-time feature lookup).

``as_of_join(left, right, ...)`` matches every left row with the
LATEST right row of the same key whose time is ≤ the left row's time
(optionally within a tolerance) — the point-in-time-correct join used
for feature stores and market data.

Implementation is a composition of existing DataFrame ops (the (a)
path from the build brief): tag sides → union → one window per key
ordered by (time, side) → ``last(struct(...), ignorenulls=True)``
carries the most recent right-side ROW (one struct, so per-column
NULLs on the matched row survive) forward onto each left row. ONE shuffle
on the key, no range explosion, no per-row Python — at 100 TB this is
a single sort-within-partitions pass, strictly cheaper than the
naive inequality join (which Catalyst can only plan as a broadcast
nested loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    on: str | None = None,
    bucket_width_seconds: float = 3600,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval range join: left rows whose ``left_point``
    falls in ``[right_start, right_end)`` (plus an optional equi-key).

    Naive formulation (``l.t >= r.start AND l.t < r.end``) gives
    Catalyst only inequality predicates → broadcast-nested-loop, which
    is O(|L|·|R|) and falls over at scale. This implementation maps
    both sides onto fixed-width time buckets (intervals explode to the
    buckets they span), equi-joins on (bucket [, key]) — a plain
    shuffled hash join — and re-applies the exact range predicate to
    strip false bucket-mates. Cost: O(|L| + Σ interval spans + matches).
    Pick ``bucket_width_seconds`` near the median interval length so
    most intervals explode to ~2 buckets.
    """
    if how not in ("inner",):
        raise ValueError("range_join currently supports inner joins")

    # All bucket math in integer microseconds: Spark timestamps are
    # µs-resolution, so this is exact (a float epsilon like 1e-9 s is
    # below the double ULP near the current epoch and silently rounds
    # away). pmod-based floor division is a true floor for pre-1970
    # (negative-µs) timestamps too, where SQL `div` truncates toward
    # zero and would disagree with the point-side bucket. Round (not
    # truncate) so fractional widths work — int(0.5)*1e6 would be a
    # zero width, i.e. NULL pmod buckets and a silently empty join.
    width_us = int(round(bucket_width_seconds * 1_000_000))
    if width_us < 1:
        raise ValueError(
            f"bucket_width_seconds must be >= 1 microsecond, got "
            f"{bucket_width_seconds!r}"
        )

    def _micros(c: str) -> Column:
        return F.unix_micros(F.col(c).cast("timestamp"))

    def _floor_bucket(m: Column) -> Column:
        return ((m - F.pmod(m, F.lit(width_us))) / F.lit(width_us)).cast(
            "long"
        )

    lb = left.withColumn("__bucket", _floor_bucket(_micros(left_point)))
    # degenerate intervals (end <= start) match nothing and would make
    # the bucket sequence count DOWN — drop them before exploding
    right = right.filter(F.col(right_end) > F.col(right_start))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                _floor_bucket(_micros(right_start)),
                # end is exclusive: an interval ending exactly on a
                # bucket boundary does not reach that bucket (−1 µs is
                # exact at timestamp resolution)
                _floor_bucket(_micros(right_end) - F.lit(1)),
            )
        ),
    )
    keys = ["__bucket"] + ([on] if on else [])
    joined = lb.join(rb, keys).filter(
        (F.col(left_point) >= F.col(right_start))
        & (F.col(left_point) < F.col(right_end))
    )
    return joined.drop("__bucket")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: str | None = None,
    bucket_width_seconds: float = 3600,
) -> DataFrame:
    """Interval-overlap join: pairs whose half-open intervals
    ``[left_start, left_end)`` and ``[right_start, right_end)``
    intersect (plus an optional equi-key) — the second member of the
    range-join family (:func:`range_join` is the point-in-interval
    case).

    Same scale story: the naive ``l.s < r.e AND r.s < l.e``
    formulation plans as a broadcast nested loop. Here BOTH sides
    explode onto the fixed-width buckets they span and equi-join on
    (bucket [, key]). An overlapping pair shares every bucket their
    intersection spans — to emit it exactly once WITHOUT a distinct
    (a shuffle over the whole result), the join keeps only the FIRST
    shared bucket: the bucket of ``greatest(left_start, right_start)``,
    which both sides provably cover. Cost: O(Σ spans + matches), one
    shuffle, no dedup pass.
    """
    width_us = int(round(bucket_width_seconds * 1_000_000))
    if width_us < 1:
        raise ValueError(
            f"bucket_width_seconds must be >= 1 microsecond, got "
            f"{bucket_width_seconds!r}"
        )

    def _micros(c: str) -> Column:
        return F.unix_micros(F.col(c).cast("timestamp"))

    def _floor_bucket(m: Column) -> Column:
        return ((m - F.pmod(m, F.lit(width_us))) / F.lit(width_us)).cast("long")

    def _explode(df: DataFrame, start: str, end: str, first_col: str) -> DataFrame:
        return (
            df.filter(F.col(end) > F.col(start))
            .withColumn(first_col, _floor_bucket(_micros(start)))
            .withColumn(
                "__bucket",
                F.explode(
                    F.sequence(
                        F.col(first_col),
                        _floor_bucket(_micros(end) - F.lit(1)),
                    )
                ),
            )
        )

    lb = _explode(left, left_start, left_end, "__l_first")
    rb = _explode(right, right_start, right_end, "__r_first")
    keys = ["__bucket"] + ([on] if on else [])
    joined = (
        lb.join(rb, keys)
        # exact overlap predicate strips false bucket-mates …
        .filter(
            (F.col(left_start) < F.col(right_end))
            & (F.col(right_start) < F.col(left_end))
        )
        # … and the first-shared-bucket condition makes each pair
        # unique: greatest(l_first, r_first) is the bucket of the
        # later start, which both exploded sides contain
        .filter(F.col("__bucket") == F.greatest("__l_first", "__r_first"))
    )
    return joined.drop("__bucket", "__l_first", "__r_first")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` row
    with the same ``on`` key and ``right_time <= left_time``.

    Unmatched left rows keep nulls (left-join semantics). Right rows
    at exactly ``left_time`` DO match (>= semantics, like DuckDB's
    ASOF JOIN). ``tolerance_seconds`` voids matches older than the
    tolerance. Output: all left columns + ``<right_time><suffix>`` +
    ``<col><suffix>`` for each value column.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_time)
    ]

    lhs = left.withColumn("__side", F.lit(1)).withColumn(
        "__t", F.col(left_time)
    )
    for c in value_cols:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None))
    rhs = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in value_cols],
    )
    for c in left.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    unioned = lhs.unionByName(rhs.select(*lhs.columns))

    # right rows sort before left rows at equal time → >= matching;
    # value columns as the final sort key make the carried match
    # deterministic when several right rows share (key, time) — the
    # greatest value-tuple wins, independent of partition order
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col("__t"),
            F.col("__side"),
            *[F.col(c).asc_nulls_first() for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Carry ONE struct per right row (never null for a right row, even
    # when every value column is) so all carried columns come from the
    # single matched row and that row's NULLs are preserved. Carrying
    # each column independently would skip a NULL on the matched row
    # and surface a STALE older value — and could mix columns from
    # different right rows (DuckDB/reference ASOF returns the matched
    # row's NULL as-is).
    match = F.last(
        F.when(
            F.col("__side") == 0,
            F.struct(
                F.col("__t").alias("__match_t"),
                *[F.col(c) for c in value_cols],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    carried: list[Column] = [
        match[c].alias(f"{c}{suffix}") for c in value_cols
    ]
    carried.append(match["__match_t"].alias(f"{right_time}{suffix}"))
    out = unioned.select("*", *carried).filter(F.col("__side") == 1)

    if tolerance_seconds is not None:
        # integer-microsecond gap so sub-second tolerances work
        # (unix_timestamp truncates to whole seconds and would judge a
        # 0.6 s gap as 0 s, wrongly keeping matches outside a 0.5 s
        # tolerance)
        fresh = (
            F.unix_micros(F.col(left_time).cast("timestamp"))
            - F.unix_micros(F.col(f"{right_time}{suffix}").cast("timestamp"))
            <= F.lit(int(round(tolerance_seconds * 1_000_000)))
        )
        for c in value_cols:
            out = out.withColumn(
                f"{c}{suffix}", F.when(fresh, F.col(f"{c}{suffix}"))
            )
        out = out.withColumn(
            f"{right_time}{suffix}", F.when(fresh, F.col(f"{right_time}{suffix}"))
        )
    return out.drop("__side", "__t")
