"""[EXT] Exact duplicated-span removal — substring-level dedup at
token granularity (the ExactSubstr recipe of Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better").

Document- and line-level dedup miss the common web-corpus failure
where a long boilerplate passage (license header, navigation block,
quoted article) is embedded inside otherwise-distinct documents.
Suffix arrays find those spans on one machine; this module gets the
same effect distributed, with k-token resolution:

1. **Position grams** — per doc, every k-token window becomes one
   (doc, pos, gram-hash) row: a `posexplode` of a `transform`-built
   gram array, all JVM expressions. Linear in corpus tokens.
2. **Canonical-first aggregation** — one `groupBy(gram)` computing
   `(count, min(struct(doc_id, pos)))`. Both aggregates combine
   map-side, so a gram repeated a million times ships one row per
   partition — a hot boilerplate gram is NOT a hot shuffle key the
   way a join would make it.
3. **Mark + merge** — a position is removable when its gram occurs
   ≥ 2 times corpus-wide and it is not the canonical first
   occurrence.  Overlapping/adjacent removable windows merge into
   spans with the classic islands pattern (running max over a
   per-doc window — one shuffle by doc).
4. **Rebuild** — tokens outside removed spans are reassembled in
   order (`filter` + `array_join`, no Python).

The FIRST occurrence of every duplicated passage survives, so shared
content is kept exactly once corpus-wide — the Lee et al. policy —
and the operator is deterministic: canonical choice is (doc_id, pos)
order, never hash order.

Hash note: grams are compared by xxhash64 of the space-joined window.
Collisions at 2^64 are negligible for dedup purposes, and all
downstream decisions depend only on hash EQUALITY, so an oracle can
re-derive every output with the gram STRINGS as keys.

Scale: two shuffles (gram groupBy; per-doc span merge), both on
8-byte or (8-byte, long) keys; no self-join of positions, no
quadratic candidate stage. The `min_count` threshold does for this
operator what frequency cutoffs do for the inverted-index family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.functions.text import tokens

__all__ = [
    "position_grams",
    "duplicated_spans",
    "merge_positions_to_spans",
    "remove_duplicated_spans",
    "remove_spans",
    "span_dedup_stats",
]


def position_grams(
    df: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, gram) — one row per k-token window (0-based token
    position), gram = xxhash64 of the space-joined window.  Docs with
    fewer than ``k`` tokens produce no rows."""
    toked = df.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("__toks")
    )
    n = F.size("__toks")
    ngrams = n - F.lit(k - 1)
    # build the gram array ONCE over a bound token column (HOF lambdas
    # re-evaluate outer expressions per element — the shingles() perf
    # note applies here verbatim); sequence(1, 0) counts DOWN, so
    # short docs need the explicit empty-array guard
    grams = F.when(ngrams < 1, F.array().cast("array<long>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), ngrams),
            lambda i: F.xxhash64(F.array_join(F.slice("__toks", i, k), " ")),
        )
    )
    return toked.select(
        "doc_id", F.posexplode(grams).alias("pos", "gram")
    )


def duplicated_spans(
    df: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """(doc_id, span_start, span_end) — merged token spans (end
    EXCLUSIVE) covered by duplicated k-grams, excluding each gram's
    canonical first occurrence.  A doc that shares a 60-token passage
    with an earlier doc gets one (start, start+60)-ish span, not 11
    overlapping windows."""
    pg = position_grams(df, k, id_col, text_col)
    # count + canonical-first in ONE partial-aggregatable pass: no
    # window over the gram key, so a hot boilerplate gram stays cheap
    firsts = pg.groupBy("gram").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min(F.struct("doc_id", "pos")).alias("__first"),
    )
    marked = (
        pg.join(firsts, "gram")
        .filter(
            (F.col("__cnt") >= min_count)
            & ~(
                (F.col("doc_id") == F.col("__first.doc_id"))
                & (F.col("pos") == F.col("__first.pos"))
            )
        )
        .select("doc_id", "pos")
    )
    return merge_positions_to_spans(marked, k)


def merge_positions_to_spans(marked: DataFrame, k: int) -> DataFrame:
    """Islands merge of removable window positions: ``(doc_id, pos)``
    rows → merged ``(doc_id, span_start, span_end)`` token spans (end
    exclusive).  Windows [pos, pos+k) overlap/touch when the next pos
    ≤ running end; span id = count of gap-starts so far.  One shuffle
    on doc_id."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_gap = marked.withColumn(
        "__is_start",
        F.when(
            F.col("pos") > F.coalesce(F.max(F.col("pos") + k).over(wprev), F.lit(-1)),
            1,
        ).otherwise(0),
    ).withColumn("__span", F.sum("__is_start").over(w))
    return (
        with_gap.groupBy("doc_id", "__span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def remove_duplicated_spans(
    df: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """The corpus with duplicated spans cut out: ``text_col`` rebuilt
    from the tokens outside every removed span (whitespace-normalized
    by construction), other columns untouched.  Docs with no
    duplicated span keep their rebuilt token stream too, so the
    operator is idempotent and the output is uniformly normalized."""
    spans = duplicated_spans(df, k, id_col, text_col, min_count)
    return remove_spans(df, spans, id_col=id_col, text_col=text_col)


def remove_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut explicit ``(doc_id, span_start, span_end)`` token spans out
    of ``text_col`` (the rebuild half of the operator, reusable by the
    incremental gate): tokens outside every span reassembled in order,
    other columns untouched."""
    # cast to int so the no-span fallback array below always matches
    # the joined column's type (callers may pass long-typed spans)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(
                F.col("span_start").cast("int").alias("span_start"),
                F.col("span_end").cast("int").alias("span_end"),
            )
        ).alias("__spans")
    )
    toked = df.withColumn("__toks", tokens(text_col))
    joined = toked.join(
        per_doc, toked[id_col] == per_doc["doc_id"], "left"
    ).drop(per_doc["doc_id"])
    idx = F.when(F.size("__toks") < 1, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), F.size("__toks") - 1)
    )
    kept = F.filter(
        F.zip_with(
            F.col("__toks"),
            idx,
            lambda t, i: F.struct(t.alias("t"), i.alias("p")),
        ),
        lambda s: ~F.exists(
            F.coalesce(
                F.col("__spans"),
                F.array().cast("array<struct<span_start:int,span_end:int>>"),
            ),
            lambda sp: (s["p"] >= sp["span_start"]) & (s["p"] < sp["span_end"]),
        ),
    )
    return joined.withColumn(
        text_col, F.array_join(F.transform(kept, lambda s: s["t"]), " ")
    ).drop("__toks", "__spans")


def span_dedup_stats(
    df: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """1-row panel: corpus token total, docs with ≥1 removed span,
    span count, tokens removed — the observability twin every other
    dedup family in this engine carries."""
    spans = duplicated_spans(df, k, id_col, text_col, min_count)
    totals = df.select(tokens(text_col).alias("__t")).agg(
        F.coalesce(F.sum(F.size("__t")), F.lit(0))
        .cast("long")
        .alias("span_tokens_total")
    )
    agg = spans.agg(
        F.count(F.lit(1)).cast("long").alias("spans_removed"),
        F.countDistinct("doc_id").cast("long").alias("span_docs_affected"),
        F.coalesce(F.sum(F.col("span_end") - F.col("span_start")), F.lit(0))
        .cast("long")
        .alias("span_tokens_removed"),
    )
    return totals.crossJoin(agg)
