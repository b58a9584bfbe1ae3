"""[EXT] Semantic deduplication over embedding columns (SemDeDup-style).

MinHash/SimHash catch *lexical* near-duplicates; semantic duplicates —
paraphrases, translations of the same boilerplate, re-rendered pages —
share almost no n-grams but sit on top of each other in embedding
space.  The published recipe (SemDeDup, arXiv:2303.09540; used for
LAION/C4 pruning) is:

1. k-means-cluster the embeddings (cheap coarse partition),
2. inside each cluster compute pairwise cosine similarity,
3. treat pairs above a high threshold (~0.95) as semantic duplicates
   and keep ONE representative per duplicate group — the paper keeps
   the item FARTHEST from the centroid (low centroid-cosine), arguing
   edge examples carry more signal than redundant near-centroid ones.

Reference parity note: the reference pipeline has no vector operators
at all (``etl/src/transform/transformer.py`` is pandas column
hygiene); this module is part of the [EXT] LLM-training-data surface.

Scale design (100 TB of embeddings):
- The quantizer is ``similarity.ivf_centroids`` — a k×dim model,
  sampled-seeded, Lloyd via ``applyInPandas``; assignment is a
  broadcast-model matmul with ZERO shuffle (``_assign_nearest``).
- The pairwise stage never goes global: the only shuffle is the
  groupBy on ``centroid_id``, and the m×m work is per-cluster.  k is
  the knob — pick k ≈ N/5000 so clusters stay vectorizable (the paper
  uses 50 k clusters for LAION-440M, same ratio).
- ``max_cluster_size`` caps the quadratic term — the m×m gram matrix
  is materialized per cell, so the default 4096 bounds it at ~134 MB
  of doubles; oversized clusters are deterministically sub-split by
  ``xxhash64(id)`` before the pairwise pass (duplicates landing in different sub-splits are then missed —
  the standard recall-for-boundedness trade, same shape as the LSH
  ``max_bucket_size`` caps; k-means skew is the vector twin of a hot
  LSH bucket).
- Rows whose vector is NULL/ragged/NaN can't be judged: they are KEPT
  (``centroid_id`` NULL), never silently dropped.

Keep policies (all deterministic):
- ``policy="greedy"`` (default, the paper's shape): scan the cluster
  in priority order, keep an item iff its rounded cosine to every
  ALREADY-KEPT item is below the threshold.  Chain duplicates
  collapse to one survivor.
- ``policy="dominance"``: keep an item iff NO earlier-priority item
  (kept or not) is within the threshold.  One vectorized triangular
  mask instead of a sequential scan — and, unlike greedy, expressible
  as a pure self-join, which is what the DuckDB oracle checks
  (``catalog_ext.q_fuzzy_dedup_verify``).  The two differ only on
  chains (A~B, B~C, A≁C: greedy keeps {A, C}, dominance keeps {A}).

Priority order: ``order="centroid_far"`` (paper: ascending cosine to
the assigned centroid, ties by id) or ``order="min_id"`` (plain id —
the oracle contract, no centroid join needed).

Cosines are compared ROUNDED to 6 dp, matching
``similarity.embedding_near_dup_pairs`` — rounding first absorbs
float-summation-order noise between engines so threshold-boundary
pairs land on the same side everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.functions.vectors import cosine_similarity
from harness_aws_etl_pipeline_spark.operators.similarity import (
    _assign_nearest,
    _assign_nearest_expr,
    _dim_of,
    _vec_matrix,
    ivf_centroids,
)

__all__ = [
    "semantic_dedup_flags",
    "semantic_dedup",
    "semantic_dedup_stats",
    "cluster_embeddings",
]

_VALID_POLICIES = ("greedy", "dominance")
_VALID_ORDERS = ("centroid_far", "min_id")


def _is_valid_vec(vec_col: str, dim: int):
    c = F.col(vec_col)
    return (
        c.isNotNull()
        & (F.size(c) == dim)
        & ~F.exists(c, lambda x: F.isnan(x.cast("double")))
    )


def _split_oversized(
    assigned: DataFrame, id_col: str, max_cluster_size: int
) -> DataFrame:
    """Add ``__cell``: the pairwise-comparison unit.  Equal to the
    cluster for normal clusters; oversized ones are sub-split
    deterministically by ``xxhash64(id)`` so no cell exceeds the cap.
    One size-profile aggregate + a broadcast join of (cluster → #subs).
    """
    sizes = (
        assigned.groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__subs", F.greatest(F.ceil(F.col("__n") / max_cluster_size), F.lit(1))
        )
        .select("centroid_id", "__subs")
    )
    return (
        assigned.join(F.broadcast(sizes), "centroid_id")
        .withColumn(
            "__cell",
            F.concat_ws(
                "#",
                F.col("centroid_id"),
                F.pmod(F.xxhash64(F.col(id_col)), F.col("__subs")),
            ),
        )
        .drop("__subs")
    )


def semantic_dedup_flags(
    df: DataFrame,
    *,
    centroids: DataFrame | None = None,
    k: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    policy: str = "greedy",
    order: str = "centroid_far",
    arrow: bool = True,
    max_cluster_size: int = 4096,
) -> DataFrame:
    """Per-row keep/drop decision: ``(id_col, centroid_id, keep)``.

    ``centroids`` overrides the learned quantizer (fixed literals make
    the whole operator oracle-reproducible); otherwise
    ``ivf_centroids(df, k)`` is trained first.  ``arrow=False`` routes
    assignment and the pairwise stage through pure column expressions
    (sequential cosine folds — bit-reproducible in SQL); only
    ``policy="dominance"`` is available there, because greedy's
    sequential scan has no join formulation.
    """
    if policy not in _VALID_POLICIES:
        raise ValueError(f"policy must be one of {_VALID_POLICIES}, got {policy!r}")
    if order not in _VALID_ORDERS:
        raise ValueError(f"order must be one of {_VALID_ORDERS}, got {order!r}")
    if not arrow and policy == "greedy":
        raise ValueError(
            "policy='greedy' needs the Arrow path (sequential per-cluster "
            "scan); use policy='dominance' with arrow=False"
        )
    if dim is None:
        dim = _dim_of(df, vec_col)
    if centroids is None:
        centroids = ivf_centroids(df, k=k, id_col=id_col, vec_col=vec_col)

    valid = df.select(id_col, vec_col).filter(_is_valid_vec(vec_col, dim))
    invalid = (
        df.select(id_col)
        .join(valid.select(id_col), id_col, "left_anti")
        .select(
            F.col(id_col),
            F.lit(None).cast("long").alias("centroid_id"),
            F.lit(True).alias("keep"),
        )
    )

    assign = _assign_nearest if arrow else _assign_nearest_expr
    assigned = assign(valid, centroids, id_col, vec_col)
    if order == "centroid_far":
        assigned = assigned.join(
            F.broadcast(centroids), "centroid_id"
        ).withColumn(
            "__ord", F.round(cosine_similarity(vec_col, "centroid"), 6)
        ).drop("centroid")
    else:
        assigned = assigned.withColumn("__ord", F.lit(0.0))
    assigned = _split_oversized(assigned, id_col, max_cluster_size)

    if arrow:
        flags = _flags_arrow(assigned, id_col, vec_col, dim, threshold, policy)
    else:
        flags = _flags_expr(assigned, id_col, vec_col, threshold)
    return flags.unionByName(invalid)


def _flags_arrow(
    assigned: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float,
    policy: str,
) -> DataFrame:
    """Per-cell pairwise pass: one normalized gram matrix, then either
    the greedy sequential scan or the dominance triangular mask."""
    import numpy as np
    import pandas as pd

    def _dedup(pdf: "pd.DataFrame") -> "pd.DataFrame":
        m = len(pdf)
        # priority order: __ord asc, id asc (both paths set __ord)
        pdf = pdf.sort_values(["__ord", id_col], kind="mergesort").reset_index(
            drop=True
        )
        mat, _ = _vec_matrix(pdf[vec_col], dim)
        n = np.linalg.norm(mat, axis=1)
        unit = mat / np.where(n == 0.0, 1.0, n)[:, None]
        sims = np.round(unit @ unit.T, 6)
        keep = np.ones(m, dtype=bool)
        if policy == "greedy":
            for i in range(1, m):
                if np.any(sims[i, :i][keep[:i]] >= threshold):
                    keep[i] = False
        else:  # dominance: any earlier item within threshold
            tri = np.tril(sims >= threshold, k=-1)
            keep = ~tri.any(axis=1)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "centroid_id": pdf["centroid_id"].astype("int64"),
                "keep": keep,
            }
        )

    id_type = assigned.schema[id_col].dataType.simpleString()
    return assigned.groupBy("__cell").applyInPandas(
        _dedup, f"{id_col} {id_type}, centroid_id long, keep boolean"
    )


def _flags_expr(
    assigned: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Dominance as a pure self-join (the oracle-reproducible shape):
    drop i iff some j in the same cell with earlier priority has
    rounded cosine ≥ threshold.  All-pairs within a cell — the cap in
    ``_split_oversized`` bounds the quadratic term."""
    a = assigned.select(
        F.col("__cell"),
        F.col(id_col).alias("__ida"),
        F.col(vec_col).alias("__va"),
        F.col("__ord").alias("__orda"),
    )
    b = assigned.select(
        F.col("__cell"),
        F.col(id_col).alias("__idb"),
        F.col(vec_col).alias("__vb"),
        F.col("__ord").alias("__ordb"),
    )
    earlier = (F.col("__ordb") < F.col("__orda")) | (
        (F.col("__ordb") == F.col("__orda")) & (F.col("__idb") < F.col("__ida"))
    )
    dominated = (
        a.join(b, "__cell")
        .filter(earlier)
        .filter(F.round(cosine_similarity("__va", "__vb"), 6) >= threshold)
        .select(F.col("__ida").alias(id_col))
        .distinct()
    )
    return (
        assigned.join(dominated.withColumn("__dom", F.lit(True)), id_col, "left")
        .select(
            F.col(id_col),
            F.col("centroid_id"),
            F.coalesce(~F.col("__dom"), F.lit(True)).alias("keep"),
        )
    )


def semantic_dedup(df: DataFrame, **kwargs) -> DataFrame:
    """The deduplicated corpus: rows flagged ``keep`` (plus every
    invalid-vector row), original schema unchanged."""
    id_col = kwargs.get("id_col", "vec_id")
    flags = semantic_dedup_flags(df, **kwargs)
    return df.join(flags.filter("keep").select(id_col), id_col, "left_semi")


def semantic_dedup_stats(df: DataFrame, **kwargs) -> DataFrame:
    """1-row panel: totals, kept/dropped, clusters touched, the number
    of clusters that actually contained duplicates — and the cap-hit
    counters (``sem_oversized_clusters`` / ``sem_split_cells``): how
    many clusters exceeded ``max_cluster_size`` and how many extra
    sub-cells the deterministic sub-split created.  The sub-split
    bounds the m×m gram matrix but trades recall (pairs across
    sub-cells are never compared) — on a skewed embedding space that
    trade should surface as a number, not a silent recall drop."""
    cap = int(kwargs.get("max_cluster_size", 4096))
    flags = semantic_dedup_flags(df, **kwargs)
    per_cluster = flags.filter(F.col("centroid_id").isNotNull()).groupBy(
        "centroid_id"
    ).agg(
        F.sum(F.when(~F.col("keep"), 1).otherwise(0)).alias("__drops"),
        F.count(F.lit(1)).alias("__n"),
    )
    return flags.agg(
        F.count(F.lit(1)).cast("long").alias("sem_total"),
        F.sum(F.when(F.col("centroid_id").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("sem_valid"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("sem_kept"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0))
        .cast("long")
        .alias("sem_dropped"),
    ).crossJoin(
        per_cluster.agg(
            F.count(F.lit(1)).cast("long").alias("sem_clusters"),
            F.sum(F.when(F.col("__drops") > 0, 1).otherwise(0))
            .cast("long")
            .alias("sem_dup_clusters"),
            F.coalesce(
                F.sum(F.when(F.col("__n") > cap, 1).otherwise(0)), F.lit(0)
            )
            .cast("long")
            .alias("sem_oversized_clusters"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__n") > cap,
                        F.ceil(F.col("__n") / cap) - F.lit(1),
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("sem_split_cells"),
        )
    )


def cluster_embeddings(
    df: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    centroids: DataFrame | None = None,
    arrow: bool = True,
) -> DataFrame:
    """Corpus clustering facade: the rows of ``df`` plus
    ``centroid_id`` (NULL for invalid vectors) — the k-means surface
    users reach for directly (topic buckets, stratified eval splits,
    SemDeDup's first stage) without the dedup semantics.

    Same machinery as :func:`semantic_dedup_flags`: learned
    ``ivf_centroids`` quantizer (or fixed ``centroids``), broadcast-
    model assignment with zero shuffle on the Arrow path.
    """
    if dim is None:
        dim = _dim_of(df, vec_col)
    if centroids is None:
        centroids = ivf_centroids(df, k=k, id_col=id_col, vec_col=vec_col)
    assign = _assign_nearest if arrow else _assign_nearest_expr
    valid = df.filter(_is_valid_vec(vec_col, dim))
    invalid = df.join(valid.select(id_col), id_col, "left_anti").withColumn(
        "centroid_id", F.lit(None).cast("long")
    )
    return assign(valid, centroids, id_col, vec_col).unionByName(invalid)
