"""Unified deduplication facade — one entry point over the whole
family (the engine-user surface; each strategy remains individually
importable for tuning).

    deduplicate(df, method="exact")                      # T3
    deduplicate(df, method="hash", subset=["text"])      # 8-byte key
    deduplicate(df, method="ngram", threshold=0.8)       # exact Jaccard
    deduplicate(df, method="minhash", threshold=0.8)     # LSH, approx
    deduplicate(df, method="simhash", max_hamming=3)
    deduplicate(df, method="embedding", threshold=0.95,
                vec_col="embedding")
    deduplicate(df, method="semantic", threshold=0.95,
                vec_col="embedding")                     # SemDeDup
    deduplicate(df, method="image", payload_col="payload",
                max_hamming=3)                           # pHash
    deduplicate(df, method="audio", payload_col="payload",
                max_hamming=5, band_bits=8)              # Haitsma-Kalker

Most near-dup methods resolve candidate pairs → connected components →
keep the min-id representative per cluster (deduplicate_near), so the
result is always "the corpus with duplicates removed", regardless of
method.  "semantic" differs by design: its survivors come from
SemDeDup's per-cluster keep policy (keep the farthest-from-centroid
representative), not min-id components — see operators/semdedup.py.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from harness_aws_etl_pipeline_spark.operators.dedup import (
    deduplicate_by_hash,
    deduplicate_exact,
)
from harness_aws_etl_pipeline_spark.operators.dedup_fuzzy import (
    deduplicate_near,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)

METHODS = (
    "exact",
    "hash",
    "ngram",
    "minhash",
    "simhash",
    "embedding",
    "semantic",
    "image",
    "audio",
)


def deduplicate(
    df: DataFrame,
    method: str = "exact",
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    payload_col: str = "payload",
    subset: list[str] | None = None,
    threshold: float = 0.8,
    max_hamming: int = 3,
    n: int = 5,
    **kwargs: Any,
) -> DataFrame:
    """Deduplicated DataFrame via the chosen strategy (see module doc)."""
    if method == "exact":
        return deduplicate_exact(df, subset=subset)
    if method == "hash":
        return deduplicate_by_hash(df, subset=subset)
    if method == "ngram":
        pairs = ngram_jaccard_pairs(
            df, id_col=id_col, text_col=text_col, n=n, threshold=threshold, **kwargs
        ).select("doc_a", "doc_b")
        return deduplicate_near(df, pairs, id_col=id_col)
    if method == "minhash":
        pairs = minhash_dedup_pairs(
            df, id_col=id_col, text_col=text_col, n=n, threshold=threshold, **kwargs
        ).select("doc_a", "doc_b")
        return deduplicate_near(df, pairs, id_col=id_col)
    if method == "simhash":
        sketches = simhash(df, id_col=id_col, text_col=text_col)
        pairs = simhash_near_pairs(sketches, max_hamming=max_hamming).select(
            "doc_a", "doc_b"
        )
        return deduplicate_near(df, pairs, id_col=id_col)
    if method == "embedding":
        from harness_aws_etl_pipeline_spark.operators.similarity import (
            embedding_near_dup_pairs,
        )

        pairs = (
            embedding_near_dup_pairs(
                df, threshold=threshold, id_col=id_col, vec_col=vec_col, **kwargs
            )
            .selectExpr("id_a AS doc_a", "id_b AS doc_b")
        )
        return deduplicate_near(df, pairs, id_col=id_col)
    if method == "semantic":
        from harness_aws_etl_pipeline_spark.operators.semdedup import semantic_dedup

        return semantic_dedup(
            df, threshold=threshold, id_col=id_col, vec_col=vec_col, **kwargs
        )
    if method == "image":
        from harness_aws_etl_pipeline_spark.operators.imagehash import (
            image_near_dup_pairs,
        )

        pairs = image_near_dup_pairs(
            df,
            payload_col=payload_col,
            id_col=id_col,
            max_hamming=max_hamming,
            **kwargs,
        ).select("doc_a", "doc_b")
        return deduplicate_near(df, pairs, id_col=id_col)
    if method == "audio":
        from harness_aws_etl_pipeline_spark.operators.audiohash import (
            audio_near_dup_pairs,
        )

        pairs = audio_near_dup_pairs(
            df,
            payload_col=payload_col,
            id_col=id_col,
            max_hamming=max_hamming,
            **kwargs,
        ).select("doc_a", "doc_b")
        return deduplicate_near(df, pairs, id_col=id_col)
    raise ValueError(f"unknown dedup method {method!r}; choose from {METHODS}")


def dedup_cap_stats(df: DataFrame, method: str = "minhash", **kwargs: Any) -> DataFrame:
    """Cap-hit observability panel for the bucketed blockings (see
    :func:`dedup_fuzzy.bucket_cap_stats`): how many buckets a skewed
    corpus pushes over the occupancy cap, how many rows sit in them,
    and the upper bound on candidate pairs the cap silently drops."""
    from harness_aws_etl_pipeline_spark.operators.dedup_fuzzy import (
        bucket_cap_stats,
    )

    return bucket_cap_stats(df, method=method, **kwargs)


def similarity_search(
    candidates: DataFrame,
    queries: DataFrame,
    method: str = "brute",
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kwargs: Any,
) -> DataFrame:
    """Unified ANN facade: exact ('brute' zip_with / 'brute_arrow'
    BLAS) or approximate ('lsh', 'ivf', 'pq') top-k — all return
    (query_id, rank, neighbor_id, cosine/score).  'pq' trains (or
    reuses ``kwargs["model"]``) product-quantization codebooks and
    scans m-byte codes via ADC — the memory-bounded path: the corpus
    side ships codes, never raw vectors."""
    from harness_aws_etl_pipeline_spark.operators import similarity as S

    if method == "brute":
        return S.brute_force_topk(candidates, queries, k, id_col, vec_col)
    if method == "brute_arrow":
        return S.brute_force_topk_arrow(candidates, queries, k, id_col, vec_col)
    if method == "lsh":
        dim = kwargs.pop("dim", None) or S._dim_of(candidates, vec_col)
        return S.lsh_bucketed_topk(
            candidates, queries, dim, k, id_col, vec_col, **kwargs
        )
    if method == "ivf":
        return S.ivf_topk(
            candidates, queries, k, id_col=id_col, vec_col=vec_col, **kwargs
        )
    if method == "pq":
        from harness_aws_etl_pipeline_spark.operators.pq import (
            pq_encode,
            pq_topk,
            train_pq,
        )

        model = kwargs.pop("model", None)
        rerank = kwargs.pop("rerank", False)
        shortlist = kwargs.pop("shortlist", None)
        if model is None:
            model = train_pq(
                candidates, vec_col=vec_col, id_col=id_col, **kwargs
            )
        enc = pq_encode(candidates, model, vec_col=vec_col)
        return pq_topk(
            enc,
            queries,
            model,
            topk=k,
            id_col=id_col,
            vec_col=vec_col,
            rerank_with=candidates if rerank else None,
            shortlist=shortlist,
        )
    if method == "ivfpq":
        # residual IVF-PQ (build_ivfpq): probe nprobe of nlist
        # inverted lists on the q·c + q·r̂ score — the deployment-
        # shape path (persist index/centroids/model for reuse)
        from harness_aws_etl_pipeline_spark.operators.pq import (
            build_ivfpq,
            ivfpq_topk,
        )

        rerank = kwargs.pop("rerank", False)
        shortlist = kwargs.pop("shortlist", None)
        nprobe = kwargs.pop("nprobe", 4)
        min_candidates = kwargs.pop("min_candidates", None)
        target_recall = kwargs.pop("target_recall", None)
        index, cents, model = build_ivfpq(
            candidates, id_col=id_col, vec_col=vec_col, **kwargs
        )
        if target_recall is not None:
            # nprobe="auto": derive it from the measured coverage
            # curve on the query sample (pq.calibrate_nprobe)
            from harness_aws_etl_pipeline_spark.operators.pq import (
                calibrate_nprobe,
            )

            nprobe = calibrate_nprobe(
                index, cents, queries, candidates,
                target_recall=target_recall, topk=k,
                id_col=id_col, vec_col=vec_col,
            )["nprobe"]
        return ivfpq_topk(
            index,
            queries,
            model,
            cents,
            nprobe=nprobe,
            topk=k,
            id_col=id_col,
            vec_col=vec_col,
            rerank_with=candidates if rerank else None,
            shortlist=shortlist,
            min_candidates=min_candidates,
        )
    raise ValueError(
        f"unknown similarity method {method!r}; choose "
        "brute/brute_arrow/lsh/ivf/pq/ivfpq"
    )
