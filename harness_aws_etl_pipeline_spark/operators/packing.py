"""[EXT] Sequence packing — bin documents into fixed-token training rows.

Training consumes fixed-length sequences (e.g. 8192 tokens); feeding
one short document per sequence wastes the remainder as padding.
Packing greedily co-locates documents into bins of ``capacity`` tokens
so padding waste is bounded, a standard pretraining-data step.

Reference parity note: no analogue in the reference (its unit of work
is a whole file, ``etl/src/load/loader.py:42-75``); [EXT] layer.

Scale design (100 TB): packing is embarrassingly parallel across hash
buckets — documents are routed to ``buckets`` groups by a stable key
hash, and each group is packed independently by an Arrow-batched
``applyInPandas`` (first-fit-decreasing, pure numpy-int loop on one
group's token counts; a group is ~corpus/buckets docs, so ``buckets``
sizes executor memory).  Bin ids are globally unique without
coordination: ``bucket * 2^40 + local_index``.  Cross-bucket waste is
at most one underfull bin per bucket — negligible beyond a few
thousand docs per bucket.

Determinism: group membership is a key hash, the in-group order is
(tokens desc, id), so the packing is a pure function of the corpus —
independent of partition layout, rerun-stable.

Oversized documents (> capacity tokens) are CLAMPED to capacity and
packed alone (``_truncated`` flag); splitting them into continuation
chunks is ``textops.chunk_documents``'s job upstream.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from harness_aws_etl_pipeline_spark.functions.text import word_count

__all__ = ["pack_sequences", "packing_stats", "materialize_packed"]

_BIN_STRIDE = 1 << 40  # bins per bucket namespace


def pack_sequences(
    df: DataFrame,
    capacity: int,
    token_expr: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> DataFrame:
    """Assign each document to a packed bin.

    Returns ``(id_col, n_tokens, bin_id, _truncated)`` where
    ``n_tokens`` is the clamped token count that entered the bin.
    First-fit-decreasing per hash bucket; see module docstring for the
    determinism and scale contract.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    tok = token_expr if token_expr is not None else word_count(text_col)
    prepared = df.select(
        F.col(id_col),
        F.least(tok.cast("long"), F.lit(capacity)).alias("n_tokens"),
        (tok > capacity).alias("_truncated"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets)).alias("_bucket"),
    )

    id_field = prepared.schema[id_col]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("n_tokens", T.LongType()),
            T.StructField("bin_id", T.LongType()),
            T.StructField("_truncated", T.BooleanType()),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["_bucket"].iloc[0])
        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []  # current fill per open bin
        assign: list[int] = []
        for n in pdf["n_tokens"].to_numpy():
            n = int(n)
            # first-fit over open bins (decreasing sizes keep this list
            # short: once fills pass capacity-n the scan stops early)
            for b, fill in enumerate(fills):
                if fill + n <= capacity:
                    fills[b] = fill + n
                    assign.append(b)
                    break
            else:
                fills.append(n)
                assign.append(len(fills) - 1)
        pdf["bin_id"] = [bucket * _BIN_STRIDE + b for b in assign]
        return pdf[[id_col, "n_tokens", "bin_id", "_truncated"]]

    return prepared.groupBy("_bucket").applyInPandas(_pack, out_schema)


def packing_stats(
    df: DataFrame,
    capacity: int,
    token_expr: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> DataFrame:
    """One-row invariant panel for a packing pass.

    The bin *assignment* is engine-internal (tie-order inside FFD), so
    the panel pins what any correct packing must satisfy — and states
    the engine-independent legs exactly:

    - ``docs_packed`` / ``token_total``: every document appears once;
      token mass is conserved post-clamp (both exactly recomputable by
      an independent engine from the raw corpus).
    - ``truncated_docs``: docs clamped to capacity (exact).
    - ``overfull_bins``: must be 0 — no bin exceeds capacity.
    - ``bins_ok``: bins_used is within [ceil(token_total/capacity),
      docs_packed] — packing achieved at least trivial consolidation
      and created no phantom bins.
    """
    packed = pack_sequences(df, capacity, token_expr, text_col, id_col, buckets)
    bins = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("docs")
    )
    doc_agg = packed.agg(
        F.count(F.lit(1)).cast("long").alias("docs_packed"),
        F.sum("n_tokens").cast("long").alias("token_total"),
        F.sum(F.col("_truncated").cast("int")).cast("long").alias("truncated_docs"),
    )
    bin_agg = bins.agg(
        F.count(F.lit(1)).cast("long").alias("_bins_used"),
        F.sum((F.col("fill") > capacity).cast("int"))
        .cast("long")
        .alias("overfull_bins"),
    )
    return doc_agg.crossJoin(bin_agg).select(
        "docs_packed",
        "token_total",
        "truncated_docs",
        "overfull_bins",
        (
            (F.col("_bins_used") >= F.ceil(F.col("token_total") / capacity))
            & (F.col("_bins_used") <= F.col("docs_packed"))
        ).alias("bins_ok"),
    )


def materialize_packed(
    df: DataFrame,
    capacity: int,
    token_expr: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
    separator: str = "\n\n",
    with_text: bool = True,
) -> DataFrame:
    """Build the actual training sequences from a packing pass.

    One row per bin: ``(bin_id, n_docs, total_tokens, fill_fraction,
    doc_ids, packed_text?)``.  Members are ordered by (n_tokens DESC,
    id ASC) — the FFD consideration order — so the sequence layout is
    a pure function of the data, reproducible under any partition
    arrangement.  Truncated members contribute their CLAMPED token
    count to ``total_tokens`` but their FULL text to ``packed_text``
    (clamping is the token-budget accounting; cutting text mid-token
    is the tokenizer's job downstream).

    Scale: one shuffle on ``bin_id``; a bin holds ≤ capacity tokens of
    text by construction, so the per-group ``collect_list`` is bounded
    by the packing capacity, not the corpus.
    """
    assignments = pack_sequences(df, capacity, token_expr, text_col, id_col, buckets)
    joined = assignments.join(
        df.select(F.col(id_col), F.col(text_col)), id_col
    )
    member = F.struct(
        (-F.col("n_tokens")).alias("_ord"),
        F.col(id_col).alias("m_id"),
        F.col("n_tokens").alias("m_tokens"),
        F.col(text_col).alias("m_text"),
    )
    grouped = joined.groupBy("bin_id").agg(
        F.array_sort(F.collect_list(member)).alias("members")
    )
    out = grouped.select(
        "bin_id",
        F.size("members").alias("n_docs"),
        F.aggregate(
            "members", F.lit(0).cast("long"), lambda a, m: a + m["m_tokens"]
        ).alias("total_tokens"),
        F.transform("members", lambda m: m["m_id"]).alias("doc_ids"),
        *(
            [
                F.array_join(
                    F.transform("members", lambda m: m["m_text"]), separator
                ).alias("packed_text")
            ]
            if with_text
            else []
        ),
    )
    return out.withColumn(
        "fill_fraction",
        F.round(F.col("total_tokens") / F.lit(float(capacity)), 4),
    )
