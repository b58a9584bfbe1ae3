"""KMV (k-minimum-values) distinct sketches: cardinality + overlap
estimation WITHOUT the join.

The planning questions a 100-TB corpus asks before running anything
expensive — "how many distinct documents does each shard hold", "how
much does crawl A overlap crawl B", "is this source worth
deduplicating against that one" — need distinct counts and set
overlaps, and the exact answers cost a full-width shuffle (distinct)
or a join of two corpora. A KMV sketch (Bar-Yossef et al. 2002;
Beyer et al., "On Synopses for Distinct-Value Estimation Under
Multiset Operations", SIGMOD 2007) is the k smallest DISTINCT hash
values of a set: ~k rows summarize any cardinality, sketches of two
corpora merge by "k smallest of the union" (exactly equal to
sketching the union — the property the tests pin), the Jaccard
estimator is a counting query over two sketches, and the distinct
estimator is ``(k-1) / U(h_k)`` with ``U`` the hash-fraction of the
k-th value (EXACT below k distinct).

Determinism is structural, not arithmetic: "the k smallest values of
a fixed hash function" is a pure set property — independent of row
order, partitioning, and engine. The hash is md5 (bit-identical in
Spark, DuckDB, and hashlib; fixed-width hex compares in numeric
order), the fraction is the first 15 hex chars (60 bits) parsed with
``conv`` / ``CAST('0x'||… AS BIGINT)``, so the catalog oracle
re-derives sketches AND estimates verbatim.

Scale shape: one ``mapInPandas`` pass keeps the k smallest distinct
hashes per partition (per-batch unique → merge-prune, bounded
memory, no local sort), then the global merge is
``distinct → orderBy → limit k`` over ≤ k × partitions short
strings — the input pays only its scan, never a distinct shuffle.

Reference scope note: the reference pipeline profiles exact distinct
counts only (etl/src/transform/transformer.py quality report) — this
extends the sketch family (HLL ratios, space-saving heavy hitters)
with multiset-operable synopses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kmv_distinct_estimate",
    "kmv_jaccard",
    "kmv_merge",
    "kmv_sketch",
]

_FRAC_DEN = float(1 << 60)  # 15 hex chars


def _hash_col(col: Column) -> Column:
    return F.md5(col.cast("string").cast("binary"))


def kmv_sketch(df: DataFrame, col: str, k: int = 1024) -> DataFrame:
    """The k smallest distinct md5 values of ``df[col]`` as a 1-column
    frame ``(h string)`` — THE canonical KMV synopsis (NULLs dropped,
    values hashed via their string form). Fewer than k distinct
    values → the full distinct hash set (the estimator is then
    exact)."""
    if k < 2:
        raise ValueError("k must be >= 2 (the estimator divides by k-1)")
    src = df.select(_hash_col(F.col(col)).alias("h")).where(F.col("h").isNotNull())

    def _kmin_part(batches):
        import numpy as np
        import pandas as pd

        arr = np.array([], dtype=object)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            arr = np.unique(np.concatenate([arr, pdf["h"].unique()]))[:k]
        out = pd.DataFrame({"h": arr})
        out["h"] = out["h"].astype(object)
        yield out

    return (
        src.mapInPandas(_kmin_part, "h string")
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 1024) -> DataFrame:
    """Merge two sketches: k smallest of the union — PROVABLY equal
    to sketching the concatenated inputs (each discarded value was
    above ≥ k surviving values in its own sketch). Sketches built
    with smaller k than requested cap the merged precision at that
    k; pass the common k."""
    return a.union(b).distinct().orderBy("h").limit(k)


def kmv_distinct_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """1-row ``(sketch_rows BIGINT, exact BOOLEAN, distinct_est
    DOUBLE)``: exact row count below k, else ``(k-1)/U(h_k)`` with
    ``U`` the 60-bit hash fraction of the LARGEST sketch value. The
    arithmetic (parse → divide → divide → round 4) runs in one fixed
    order so engines agree bit-for-bit."""
    frac = F.conv(F.substring(F.max("h"), 1, 15), 16, 10).cast("double") / F.lit(
        _FRAC_DEN
    )
    cnt = F.count(F.lit(1))
    return sketch.agg(
        cnt.cast("long").alias("sketch_rows"),
        (cnt < k).alias("exact"),
        F.round(
            F.when(cnt < k, cnt.cast("double")).otherwise(F.lit(float(k - 1)) / frac),
            4,
        ).alias("distinct_est"),
    )


def kmv_jaccard(
    a: DataFrame,
    b: DataFrame,
    k: int = 1024,
    inputs_materialized: bool = False,
) -> DataFrame:
    """1-row ``(union_basis BIGINT, inter_cnt BIGINT, jaccard_est
    DOUBLE)``: over the k smallest values of the merged sketch (a
    uniform sample of the union), the fraction present in BOTH
    sketches estimates ``|A∩B| / |A∪B|`` (Beyer et al. §5). Exact
    when both inputs had < k distinct values.

    ``inputs_materialized=True`` skips the internal lineage cut —
    pass it when the caller already localCheckpoint-ed/persisted the
    sketches (e.g. to share them with :func:`kmv_distinct_estimate`)."""
    if not inputs_materialized:
        # each sketch is referenced twice (merge basis + membership
        # flag); an un-cut sketch plan would re-run its corpus scan
        # per reference
        a = a.localCheckpoint(eager=True)
        b = b.localCheckpoint(eager=True)
    basis = kmv_merge(a, b, k)
    flagged = (
        basis.join(a.withColumn("_in_a", F.lit(True)), "h", "left")
        .join(b.withColumn("_in_b", F.lit(True)), "h", "left")
    )
    cnt = F.count(F.lit(1))
    inter = F.count(F.when(F.col("_in_a") & F.col("_in_b"), F.lit(1)))
    return flagged.agg(
        cnt.cast("long").alias("union_basis"),
        inter.cast("long").alias("inter_cnt"),
        F.round(inter.cast("double") / cnt, 4).alias("jaccard_est"),
    )
