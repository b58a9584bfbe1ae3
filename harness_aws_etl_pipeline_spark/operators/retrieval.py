"""BM25 full-text retrieval over a document corpus.

Completes the term-analytics family (``textops.tf_idf`` scores terms;
this ranks DOCUMENTS for queries): the classic probabilistic ranking
function (Robertson & Spärck Jones / Okapi BM25, with the
always-positive Lucene idf variant ``ln(1 + (N − df + ½)/(df + ½))``)
— the standard first-stage retriever next to the embedding ANN family
(`operators/similarity.py` / `operators/pq.py`), and the usual
lexical side of a hybrid lexical+vector retrieval stack.

Scale shape (the 100 TB story):

- the corpus side is the same explode → (doc, term) partial-aggregated
  rollup TF-IDF uses — one shuffle keyed on (doc_id, term), map-side
  combinable;
- the QUERY side is small by contract (a query workload, not a second
  corpus) and broadcasts; the ``tf ⋈ query-terms`` broadcast join
  prunes the corpus to rows whose term occurs in some query BEFORE any
  per-doc work, so the expensive per-(query, doc) stage only ever sees
  matching postings — the inverted-index access pattern expressed
  relationally;
- document frequencies ride the same pruned posting set (df of
  non-query terms is never needed), and ``min_df`` keeps the df frame
  broadcastable exactly as in ``tf_idf``;
- no UDFs anywhere; per-term contributions are rounded to scaled
  longs BEFORE the per-(query, doc) sum so the aggregate is
  partition-order-exact (float sums are not) and the rank order is
  bit-stable across runs, partitionings, and engines — ties broken by
  doc_id.

Reference scope note: the reference pipeline (etl/src/transform/
transformer.py) has no retrieval operator — this extends the engine
for the training-data workload (e.g. dataset search / eval-set
curation), same class as the dedup/ANN families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.functions.text import tokens

__all__ = ["bm25_scores", "bm25_topk"]

_SCALE = 1_000_000


def bm25_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query",
    k1: float = 1.2,
    b: float = 0.75,
    min_df: int = 1,
) -> DataFrame:
    """BM25 score of every (query, document) pair with ≥1 shared term.

    Returns ``(query_id, doc_id, score DOUBLE, score_scaled BIGINT)``
    — ``score_scaled`` is the exact integer sum of the 6-dp-scaled
    per-term contributions (use it for ordering; ``score`` is the
    human-readable ``score_scaled / 1e6``).

    Per shared term: ``qtf × idf × tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))``
    with ``idf = ln(1 + (N − df + ½)/(df + ½))`` (Lucene variant — never
    negative, so stopword-ish terms dampen instead of inverting ranks).
    ``dl`` is the whitespace-token count of the document, ``avgdl`` the
    corpus mean over all N docs (empty docs count in N, contribute 0
    length).
    """
    n_docs = docs.count()
    if n_docs == 0:
        return docs.sparkSession.createDataFrame(
            [],
            "query_id string, doc_id long, score double, score_scaled long",
        )
    terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.transform(tokens(text_col), F.lower)).alias("term"),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    # one-row broadcast: avgdl as the exact long total over double N —
    # same two-operand division on every engine
    avgdl = dl.agg(
        (F.sum("dl").cast("double") / F.lit(float(n_docs))).alias("_avgdl")
    )
    qterms = (
        queries.select(
            F.col(query_id_col).cast("string").alias("query_id"),
            F.explode(F.transform(tokens(query_col), F.lower)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    # broadcast query terms FIRST: prunes the posting list to query
    # vocabulary before df / dl / scoring ever run
    hits = tf.join(F.broadcast(qterms), "term")
    # df only of query-vocabulary terms: left-semi prune BEFORE the df
    # aggregate keeps every posting of a retained term (df per term is
    # unchanged) while the shuffle and the broadcast shrink from corpus
    # vocabulary to query vocabulary
    dfreq = (
        tf.join(F.broadcast(qterms.select("term").distinct()), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
    )
    contrib = F.round(F.col("qtf") * idf * tfn * _SCALE).cast("long")
    return (
        scored.withColumn("_c", contrib)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("_c").alias("score_scaled"))
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("score_scaled").cast("double") / _SCALE, 6).alias(
                "score"
            ),
            "score_scaled",
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    **kwargs,
) -> DataFrame:
    """Top-``k`` documents per query by BM25, deterministically ranked.

    ``(query_id, doc_id, score, rk)`` — ordered by the exact integer
    ``score_scaled`` (ties by doc_id), so ranks are bit-stable across
    partitionings and engines. One rank window per query partition on
    the already-pruned (query, doc) score set — query count bounds the
    partitions, match count bounds the rows; nothing here scales with
    corpus size except the pruned posting join in
    :func:`bm25_scores`.
    """
    scores = bm25_scores(docs, queries, **kwargs)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_scaled"), F.col("doc_id")
    )
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "doc_id", "score", "rk")
    )
