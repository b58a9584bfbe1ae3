"""[EXT] Benchmark decontamination (exact n-gram overlap removal).

Training corpora must not contain the evaluation benchmarks the model
is later scored on.  The published method (GPT-3 appendix C, PaLM,
Llama: "13-gram overlap") flags every training document that shares at
least one n-token shingle with any benchmark document, then drops (or
marks) the flagged documents.  This is EXACT substring-level overlap —
a different tool from the *fuzzy* cross-corpus joins already in this
engine (``dedup_fuzzy.minhash_join``, ``similarity.embedding_join``):
those find near-duplicate pairs with scores; this one answers the
binary "does any benchmark 13-gram appear verbatim?" question with no
approximation.

Reference parity note: the reference pipeline has no corpus-level text
operators (its transform tier is pandas column hygiene,
``etl/src/transform/transformer.py:39-93``); this module is part of
the [EXT] LLM-training-data surface layered on the same engine.

Scale design (100 TB corpus, bounded benchmark):
- The benchmark side is DISTINCT-aggregated to its n-gram set once.
  Real benchmark suites are tiny next to the corpus (thousands of
  documents → at most a few tens of millions of n-grams), so the
  default plan broadcasts the set and the corpus-side explode → join →
  per-doc partial-agg all happen map-side; the only shuffle carries
  ``(doc_id, partial hit count)`` — corpus-text-free and tiny.
- ``use_hash=True`` (default) joins on ``xxhash64`` of the shingle
  instead of the string: an 8-byte broadcast key and no corpus text in
  the join at all.  The string path exists for the exact-count oracle
  contract (collision-free by construction) and for audit output that
  must show WHICH n-gram hit.
- ``broadcast=False`` degrades to a plain shuffled join for the rare
  huge-benchmark case; AQE may still upgrade it back at runtime.
- Corpus-side shingles are ``array_distinct``-ed per document BEFORE
  the explode (``functions.text.shingles``), so a 13-gram repeated
  inside one document costs one candidate row, not one per repeat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.functions.text import shingles

__all__ = [
    "benchmark_ngrams",
    "contamination_hits",
    "flag_contaminated",
    "decontaminate",
    "contamination_stats",
    "contamination_by_benchmark",
]


def _doc_ngrams(
    df: DataFrame, n: int, text_col: str, id_col: str, use_hash: bool
) -> DataFrame:
    """(id, ngram) — one row per DISTINCT n-gram per document.

    The token array is materialized into a column before shingling —
    a HOF lambda re-evaluates raw outer expressions per element, so
    passing the tokenize expression directly would re-split the text
    per shingle index (the O(len²) trap ``functions.text.shingles``
    documents).
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    out = (
        df.select(F.col(id_col), toks.alias("_toks"))
        .select(
            F.col(id_col),
            F.explode(shingles("_toks", n, pretokenized=True)).alias("ngram"),
        )
    )
    if use_hash:
        out = out.select(id_col, F.xxhash64("ngram").alias("ngram"))
    return out


def benchmark_ngrams(
    bench: DataFrame,
    *,
    n: int = 13,
    text_col: str = "text",
    use_hash: bool = True,
) -> DataFrame:
    """The benchmark's distinct (lowercased, whitespace-tokenized)
    n-gram set — the blocklist the corpus is screened against.

    One column, ``ngram`` (string, or bigint xxhash64 when
    ``use_hash``).  Distinct-aggregated so the broadcast ships each
    n-gram once however often the benchmark repeats it.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    out = bench.select(toks.alias("_toks")).select(
        F.explode(shingles("_toks", n, pretokenized=True)).alias("ngram")
    )
    if use_hash:
        out = out.select(F.xxhash64("ngram").alias("ngram"))
    return out.distinct()


def contamination_hits(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    use_hash: bool = True,
    broadcast: bool = True,
) -> DataFrame:
    """Per-contaminated-document overlap counts.

    Returns ``(id_col, hit_ngrams)`` — one row per corpus document
    that shares ≥1 n-gram with the benchmark; ``hit_ngrams`` counts
    the distinct shared n-grams.  Documents with zero overlap do not
    appear (flag_contaminated left-joins them back).
    """
    blocklist = benchmark_ngrams(
        bench, n=n, text_col=bench_text_col, use_hash=use_hash
    )
    if broadcast:
        blocklist = F.broadcast(blocklist)
    doc_grams = _doc_ngrams(corpus, n, text_col, id_col, use_hash)
    return (
        doc_grams.join(blocklist, "ngram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hit_ngrams"))
    )


def flag_contaminated(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    use_hash: bool = True,
    broadcast: bool = True,
) -> DataFrame:
    """Corpus + ``_contaminated`` boolean + ``_hit_ngrams`` count.

    Non-destructive variant (audit / quarantine routing).  The join
    back to the corpus is on ``id_col``; the hit set follows the
    ``broadcast`` flag — usually tiny, but a heavily-contaminated
    corpus can flag a large fraction of itself, and that case must
    not OOM the driver on a forced broadcast.
    """
    hits = contamination_hits(
        corpus,
        bench,
        n=n,
        text_col=text_col,
        id_col=id_col,
        bench_text_col=bench_text_col,
        use_hash=use_hash,
        broadcast=broadcast,
    ).withColumnRenamed("hit_ngrams", "_hit_ngrams")
    if broadcast:
        hits = F.broadcast(hits)
    return (
        corpus.join(hits, id_col, "left")
        .withColumn("_hit_ngrams", F.coalesce(F.col("_hit_ngrams"), F.lit(0)))
        .withColumn("_contaminated", F.col("_hit_ngrams") > 0)
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    use_hash: bool = True,
    broadcast: bool = True,
) -> DataFrame:
    """The clean corpus: documents sharing NO n-gram with the benchmark.

    Anti-join against the contaminated-id set; the surviving rows keep
    the corpus schema unchanged.  The id set follows the ``broadcast``
    flag (see ``flag_contaminated``).
    """
    ids = contamination_hits(
        corpus,
        bench,
        n=n,
        text_col=text_col,
        id_col=id_col,
        bench_text_col=bench_text_col,
        use_hash=use_hash,
        broadcast=broadcast,
    ).select(id_col)
    if broadcast:
        ids = F.broadcast(ids)
    return corpus.join(ids, id_col, "left_anti")


def contamination_by_benchmark(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "qid",
    bench_text_col: str = "text",
    use_hash: bool = True,
    broadcast: bool = True,
) -> DataFrame:
    """Per-benchmark-item leak report: which eval items are burned.

    For each benchmark document with ≥1 corpus overlap, returns
    ``(bench_id_col, leaked_ngrams, corpus_docs)`` — how many of its
    distinct n-grams appear in the corpus, and how many distinct
    corpus documents hit it.  The number an eval owner needs: a
    benchmark item leaked into thousands of training documents cannot
    be scored even after decontamination fails partway.

    Same broadcast shape as :func:`contamination_hits`, but the
    blocklist keeps the benchmark id (slightly larger broadcast when
    items share n-grams — still benchmark-sized).
    """
    if bench_id_col == id_col:
        raise ValueError(
            "bench_id_col must differ from id_col (both sides appear "
            "in the same join)"
        )
    bench_grams = _doc_ngrams(bench, n, bench_text_col, bench_id_col, use_hash)
    if broadcast:
        bench_grams = F.broadcast(bench_grams)
    doc_grams = _doc_ngrams(corpus, n, text_col, id_col, use_hash)
    hits = doc_grams.join(bench_grams, "ngram")
    return hits.groupBy(bench_id_col).agg(
        F.countDistinct("ngram").alias("leaked_ngrams"),
        F.countDistinct(id_col).alias("corpus_docs"),
    )


def contamination_stats(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    use_hash: bool = True,
    broadcast: bool = True,
) -> DataFrame:
    """1-row decontamination report.

    ``bench_ngrams`` (blocklist size), ``contaminated_docs``,
    ``hits_total`` (distinct (doc, n-gram) overlaps), ``clean_docs``,
    ``clean_chars`` (surviving corpus volume).  Single crossJoin of
    three 1-row aggregate legs — the corpus is scanned twice (hit join
    + totals), the benchmark once.
    """
    kw = dict(
        n=n,
        text_col=text_col,
        id_col=id_col,
        bench_text_col=bench_text_col,
        use_hash=use_hash,
        broadcast=broadcast,
    )
    hits = contamination_hits(corpus, bench, **kw)
    hit_agg = hits.agg(
        F.count(F.lit(1)).alias("contaminated_docs"),
        F.coalesce(F.sum("hit_ngrams"), F.lit(0)).cast("long").alias("hits_total"),
    )
    bl = benchmark_ngrams(bench, n=n, text_col=bench_text_col, use_hash=use_hash).agg(
        F.count(F.lit(1)).alias("bench_ngrams")
    )
    clean = decontaminate(corpus, bench, **kw).agg(
        F.count(F.lit(1)).alias("clean_docs"),
        F.coalesce(F.sum(F.length(text_col)), F.lit(0))
        .cast("long")
        .alias("clean_chars"),
    )
    return bl.crossJoin(hit_agg).crossJoin(clean)
