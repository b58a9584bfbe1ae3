"""Mergeable frequency sketch: space-saving heavy hitters.

Why a sketch when ``groupBy(key).count()`` is already distributed:
the exact plan's shuffle carries one row per DISTINCT key per map
partition — fine for bounded domains, catastrophic for unbounded ones
(n-gram shingles, URLs, user agents over 100 TB: billions of keys,
the shuffle IS the job, and a single hot-key investigation doesn't
want to pay it). The space-saving summary (Metwally et al., "Efficient
Computation of Frequent and Top-k Elements in Data Streams", 2005)
bounds the per-partition state AND the shuffle to ``capacity`` rows
per input partition regardless of key cardinality — a narrow
``capacity × partitions`` merge instead of a full-width exchange —
while keeping SOUND per-key bounds, merged with the summary algebra
of Agarwal et al., "Mergeable Summaries" (PODS 2012):

- per partition, every tracked key carries ``(cnt, err)`` with
  ``cnt - err <= true_p <= cnt``;
- a key ABSENT from a partition's summary has
  ``true_p <= floor_p`` where ``floor_p`` is the minimum tracked
  count if that partition ever evicted, else exactly 0;
- merged: ``count_min = Σ_present (cnt-err)`` and ``count_max =
  Σ_present cnt + Σ_absent floor_p``; any key whose true global
  count exceeds ``Σ_p floor_p`` is CERTAIN to be in the candidate
  set, and ``guaranteed`` marks keys whose lower bound beats every
  possible outside count — certainly among the true top k.

Determinism: eviction depends on arrival order, so bounds can differ
across partitionings — EXCEPT when no partition ever evicts
(``capacity`` ≥ per-partition distinct keys), where the summary is
provably the exact per-partition count map and the result equals the
exact groupBy, independent of order. The catalog oracle leg runs in
that regime (bounded-domain column), so DuckDB re-derives it exactly;
the adversarial regimes are pinned by tests/test_sketches.py.

Reference scope note: the reference pipeline (etl/src/transform/
transformer.py) has no sketch operators — this extends the engine's
profiling family (HLL distinct ratios, exact/approx percentiles) for
the 100 TB corpus workload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "heavy_hitters",
    "heavy_hitters_by",
    "merged_bounds",
    "partition_summaries",
]

_SUMMARY_SCHEMA = "pid int, key string, cnt long, err long, is_floor boolean"
_GROUPED_SCHEMA = (
    "pid int, grp string, key string, cnt long, err long, is_floor boolean"
)


def _hh_source(df: DataFrame, col: str, weight: str | None) -> DataFrame:
    return df.select(
        F.col(col).cast("string").alias("_hh_key"),
        (
            F.col(weight).cast("long") if weight else F.lit(1).cast("long")
        ).alias("_hh_w"),
    ).where(F.col("_hh_key").isNotNull() & (F.col("_hh_w") >= 1))


def partition_summaries(src: DataFrame, cap: int) -> DataFrame:
    """Per-partition space-saving summaries of a ``(_hh_key, _hh_w)``
    frame: ≤ ``cap`` tracked ``(pid, key, cnt, err)`` rows plus ONE
    floor row per partition (``is_floor``, key NULL, cnt = the
    partition's absent-key upper bound). The building block shared by
    :func:`heavy_hitters` (one-shot merge) and
    ``IncrementalHeavyHitters`` (cross-batch merge)."""

    def _sketch(batches):
        import heapq

        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        counts: dict[str, list[int]] = {}  # key -> [cnt, err]
        heap: list[tuple[int, str]] = []  # (cnt, key), stale-tolerant
        evicted = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            agg = pdf.groupby("_hh_key", sort=False)["_hh_w"].sum()
            for key, w in agg.items():
                w = int(w)
                ent = counts.get(key)
                if ent is not None:
                    ent[0] += w
                    heapq.heappush(heap, (ent[0], key))
                elif len(counts) < cap:
                    counts[key] = [w, 0]
                    heapq.heappush(heap, (w, key))
                else:
                    evicted = True
                    while True:  # pop to the first non-stale minimum
                        c, mk = heapq.heappop(heap)
                        e = counts.get(mk)
                        if e is not None and e[0] == c:
                            break
                    m = counts.pop(mk)[0]
                    counts[key] = [m + w, m]
                    heapq.heappush(heap, (m + w, key))
                if len(heap) > 4 * cap:
                    # stale entries dominate (every increment pushes a
                    # fresh tuple and stale ones persist until popped):
                    # rebuild from live counts so heap stays O(cap),
                    # keeping the bounded-per-partition-state claim true
                    # for the heap too, not just `counts`
                    heap = [(e[0], k2) for k2, e in counts.items()]
                    heapq.heapify(heap)
        floor = min(e[0] for e in counts.values()) if evicted and counts else 0
        rows = [(pid, key, e[0], e[1], False) for key, e in counts.items()]
        rows.append((pid, None, floor, 0, True))
        out = pd.DataFrame(rows, columns=["pid", "key", "cnt", "err", "is_floor"])
        out["key"] = out["key"].astype(object)
        yield out

    return src.mapInPandas(_sketch, _SUMMARY_SCHEMA)


def merged_bounds(summ: DataFrame) -> DataFrame:
    """Merge per-source summaries (the :func:`partition_summaries`
    shape — ``pid`` is any source id) into sound global bounds:
    ``(key, count_min, count_max, _tf)`` where ``_tf`` is the summed
    floor (the best possible count of a key tracked by NO source)."""
    floors = summ.where("is_floor").select("pid", F.col("cnt").alias("_floor"))
    total_floor = floors.agg(
        F.coalesce(F.sum("_floor"), F.lit(0)).cast("long").alias("_tf")
    )
    return (
        summ.where(~F.col("is_floor"))
        .join(F.broadcast(floors), "pid", "left")
        .groupBy("key")
        .agg(
            F.sum(F.col("cnt") - F.col("err")).alias("_lb_raw"),
            F.sum("cnt").alias("_ub_present"),
            F.sum(F.coalesce("_floor", F.lit(0))).alias("_pf"),
        )
        .crossJoin(F.broadcast(total_floor))
        .select(
            "key",
            F.greatest(F.col("_lb_raw"), F.lit(0)).cast("long").alias("count_min"),
            (F.col("_ub_present") + F.col("_tf") - F.col("_pf"))
            .cast("long")
            .alias("count_max"),
            "_tf",
        )
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    capacity: int | None = None,
    weight: str | None = None,
) -> DataFrame:
    """Approximate top-``k`` most frequent values of ``df[col]`` with
    sound error bounds, in one narrow pass.

    Returns ``(rank INT, key STRING, count_min BIGINT, count_max
    BIGINT, guaranteed BOOLEAN)`` ordered by rank — candidates ranked
    by ``count_max`` desc then key asc; ``count_min <= true count <=
    count_max`` always holds, and ``guaranteed`` is true iff the key
    is CERTAINLY among the true top ``k`` (its lower bound beats the
    best possible count of every candidate ranked below it and of
    every untracked key).

    ``capacity`` is the per-partition summary size (default
    ``max(16*k, 256)``); per-partition error is at most
    ``rows_in_partition / capacity``. ``weight`` names an integer
    column: a weighted row is equivalent to that many unit rows
    (weights < 1 dropped, like the graph operators). NULL keys are
    dropped. Keys are compared as strings (cast once on entry).

    Scale shape: one ``mapInPandas`` pass over the input (per-batch
    pandas pre-aggregation, heap-tracked eviction), then all merging
    runs on the ``capacity × partitions``-row summary — the only
    wide operation the input pays is its own scan. The final ranking
    window is a single-partition sort of the summary (bounded,
    documented); the result is eagerly localCheckpoint-ed so the
    summary cache is released before return.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    cap = capacity if capacity is not None else max(16 * k, 256)
    if cap < k:
        raise ValueError(f"capacity={cap} must be >= k={k}")

    src = _hh_source(df, col, weight)
    summ = partition_summaries(src, cap).persist()
    try:
        cand = merged_bounds(summ)
        ranked = cand.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("count_max"), F.asc("key"))),
        )
        outside = ranked.agg(
            F.max(F.when(F.col("rank") > k, F.col("count_max"))).alias("_ob")
        )
        out = (
            ranked.where(F.col("rank") <= k)
            .crossJoin(F.broadcast(outside))
            .select(
                F.col("rank").cast("int").alias("rank"),
                "key",
                "count_min",
                "count_max",
                (
                    F.col("count_min")
                    > F.greatest(F.coalesce(F.col("_ob"), F.lit(0)), F.col("_tf"))
                ).alias("guaranteed"),
            )
            .orderBy("rank")
            .localCheckpoint(eager=True)
        )
    finally:
        summ.unpersist()
    return out


def heavy_hitters_by(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 10,
    capacity: int | None = None,
    weight: str | None = None,
) -> DataFrame:
    """Per-group approximate top-``k``: the most frequent ``key_col``
    values WITHIN each ``group_col`` value, with the same sound
    space-saving bounds as :func:`heavy_hitters` (top URLs per host,
    top n-grams per language, top user agents per day).

    Returns ``(grp STRING, rank INT, key STRING, count_min BIGINT,
    count_max BIGINT, guaranteed BOOLEAN)`` — all bound/guarantee
    semantics hold per group independently (each group's summary,
    floors, and outside-candidate comparison never mix with another
    group's).

    State and shuffle are bounded by ``capacity × groups-per-
    partition`` rows per input partition: the group dimension is for
    MODERATE cardinality (languages, days, a watchlist of hosts) —
    for millions of groups, repartition by group first so each task
    holds few groups, or use the exact per-group rank (the
    ``anchor_text_index`` pattern) when keys-per-group are bounded.
    A group never seen by a partition contributes floor 0 there, so
    skew across groups costs nothing extra. Exactness regime, NULL
    handling, and weighting follow :func:`heavy_hitters` (NULL
    groups are dropped with NULL keys)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cap = capacity if capacity is not None else max(16 * k, 256)
    if cap < k:
        raise ValueError(f"capacity={cap} must be >= k={k}")

    src = df.select(
        F.col(group_col).cast("string").alias("_hh_grp"),
        F.col(key_col).cast("string").alias("_hh_key"),
        (
            F.col(weight).cast("long") if weight else F.lit(1).cast("long")
        ).alias("_hh_w"),
    ).where(
        F.col("_hh_grp").isNotNull()
        & F.col("_hh_key").isNotNull()
        & (F.col("_hh_w") >= 1)
    )

    def _sketch(batches):
        import heapq

        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        # per group: (counts: key -> [cnt, err], heap, evicted flag)
        groups: dict[str, tuple[dict, list, list]] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            agg = pdf.groupby(["_hh_grp", "_hh_key"], sort=False)["_hh_w"].sum()
            for (grp, key), w in agg.items():
                w = int(w)
                st = groups.get(grp)
                if st is None:
                    st = groups[grp] = ({}, [], [False])
                counts, heap, evicted = st
                ent = counts.get(key)
                if ent is not None:
                    ent[0] += w
                    heapq.heappush(heap, (ent[0], key))
                elif len(counts) < cap:
                    counts[key] = [w, 0]
                    heapq.heappush(heap, (w, key))
                else:
                    evicted[0] = True
                    while True:  # pop to the first non-stale minimum
                        c, mk = heapq.heappop(heap)
                        e = counts.get(mk)
                        if e is not None and e[0] == c:
                            break
                    m = counts.pop(mk)[0]
                    counts[key] = [m + w, m]
                    heapq.heappush(heap, (m + w, key))
                if len(heap) > 4 * cap:
                    heap = [(e[0], k2) for k2, e in counts.items()]
                    heapq.heapify(heap)
                    groups[grp] = (counts, heap, evicted)
        rows = []
        for grp, (counts, _heap, evicted) in groups.items():
            floor = (
                min(e[0] for e in counts.values())
                if evicted[0] and counts
                else 0
            )
            rows += [
                (pid, grp, key, e[0], e[1], False) for key, e in counts.items()
            ]
            rows.append((pid, grp, None, floor, 0, True))
        out = pd.DataFrame(
            rows, columns=["pid", "grp", "key", "cnt", "err", "is_floor"]
        )
        for c in ("grp", "key"):
            out[c] = out[c].astype(object)
        yield out

    summ = src.mapInPandas(_sketch, _GROUPED_SCHEMA).persist()
    try:
        floors = summ.where("is_floor").select(
            "pid", "grp", F.col("cnt").alias("_floor")
        )
        total_floor = floors.groupBy("grp").agg(
            F.coalesce(F.sum("_floor"), F.lit(0)).cast("long").alias("_tf")
        )
        cand = (
            summ.where(~F.col("is_floor"))
            .join(F.broadcast(floors), ["pid", "grp"], "left")
            .groupBy("grp", "key")
            .agg(
                F.sum(F.col("cnt") - F.col("err")).alias("_lb_raw"),
                F.sum("cnt").alias("_ub_present"),
                F.sum(F.coalesce("_floor", F.lit(0))).alias("_pf"),
            )
            .join(F.broadcast(total_floor), "grp")
            .select(
                "grp",
                "key",
                F.greatest(F.col("_lb_raw"), F.lit(0)).cast("long").alias("count_min"),
                (F.col("_ub_present") + F.col("_tf") - F.col("_pf"))
                .cast("long")
                .alias("count_max"),
                "_tf",
            )
        )
        w = Window.partitionBy("grp").orderBy(F.desc("count_max"), F.asc("key"))
        ranked = cand.withColumn("rank", F.row_number().over(w))
        outside = ranked.groupBy("grp").agg(
            F.max(F.when(F.col("rank") > k, F.col("count_max"))).alias("_ob")
        )
        out = (
            ranked.where(F.col("rank") <= k)
            .join(F.broadcast(outside), "grp")
            .select(
                "grp",
                F.col("rank").cast("int").alias("rank"),
                "key",
                "count_min",
                "count_max",
                (
                    F.col("count_min")
                    > F.greatest(F.coalesce(F.col("_ob"), F.lit(0)), F.col("_tf"))
                ).alias("guaranteed"),
            )
            .orderBy("grp", "rank")
            .localCheckpoint(eager=True)
        )
    finally:
        summ.unpersist()
    return out
