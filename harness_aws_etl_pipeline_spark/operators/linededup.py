"""[EXT] Line-level corpus deduplication (CCNet/Gopher-style).

Web-scraped training corpora carry massive line-level boilerplate —
cookie banners, nav menus, footers — that repeats across millions of
documents.  Removing lines that occur more than *k* times corpus-wide
(rather than deduplicating whole documents) is the CCNet preprocessing
step, and is distinct from the document-level exact/MinHash dedup in
``dedup.py`` / ``dedup_fuzzy.py``.

Reference parity note: the reference pipeline has no corpus-level text
operators at all (its transform tier is pandas column hygiene,
``etl/src/transform/transformer.py:39-93``); this module is part of the
[EXT] LLM-training-data surface layered on the same engine.

Scale design (100 TB):
- One ``posexplode`` over the document scan → (doc, pos, line).  No
  Python; the split and explode are whole-stage-codegen expressions.
- Frequent-line discovery is a single ``groupBy(key).count()`` —
  partial aggregation combines map-side, so a line repeated 10 M times
  contributes one row per input partition to the shuffle, not 10 M
  rows.  Boilerplate skew therefore does NOT need salting.
- Removal is a shuffle join of lines against the frequent-line set on
  the normalized line string (``use_hash_key=True`` narrows the
  shuffle key to an 8-byte xxhash64 for wide lines — same trick as
  ``dedup.deduplicate_by_hash``).  The frequent set is usually small
  enough to broadcast, but is NOT assumed broadcastable: at 100 TB the
  long tail of k-plus lines can be billions of rows, so the default
  plan is a plain shuffled join and AQE may downgrade it to broadcast
  when the set is actually small.
- Reassembly sorts each document's surviving lines by position inside
  an ``array_sort(collect_list(struct(pos, line)))`` — one shuffle on
  doc id, no window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "explode_lines",
    "frequent_lines",
    "remove_frequent_lines",
    "line_dedup_stats",
]


def _norm_key(line: Column) -> Column:
    """Normalized match key: case-folded, whitespace-trimmed."""
    return F.lower(F.trim(line))


def explode_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """(id, pos, line, key) — one row per physical unit.

    ``pos`` is the 0-based unit index inside the document; ``key`` is
    the normalized form used for frequency counting and matching.
    ``sep`` picks the unit: ``"\\n"`` (default) is CCNet line-level
    dedup; ``"\\n\\n"`` makes the whole family operate on PARAGRAPHS
    (repeated quote blocks, license preambles) with identical plans.
    The separator is a regex-escaped literal.
    """
    import re as _re

    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
            "pos", "line"
        ),
    ).withColumn("key", _norm_key(F.col("line")))


def frequent_lines(
    df: DataFrame,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Normalized lines occurring ≥ ``min_count`` times corpus-wide.

    Blank lines (empty after trim) are never reported — they are
    document structure, not boilerplate content.  Returns
    ``(key, line_cnt, doc_cnt)``.
    """
    lines = explode_lines(df, text_col, id_col, sep)
    return (
        lines.filter(F.length("key") > 0)
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("line_cnt"),
            F.countDistinct(id_col).alias("doc_cnt"),
        )
        .filter(F.col("line_cnt") >= min_count)
    )


def remove_frequent_lines(
    df: DataFrame,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_hash_key: bool = False,
    sep: str = "\n",
) -> DataFrame:
    """Strip corpus-frequent lines from every document.

    Returns the input columns with ``text_col`` rewritten to the
    surviving lines (original order and casing preserved, joined with
    ``\\n``) plus ``_lines_removed`` (count per doc).  A document whose
    every line was boilerplate survives with empty text — dropping is
    the caller's policy (``filter(length(text) > 0)``), not ours.

    ``use_hash_key=True`` joins on ``xxhash64(key)`` instead of the
    string — an 8-byte shuffle key for long lines; identical output
    absent 64-bit collisions (engine-internal fast path; the string
    join is the oracle-exact default).
    """
    lines = explode_lines(df, text_col, id_col, sep)
    freq = frequent_lines(df, min_count, text_col, id_col, sep).select("key")
    if use_hash_key:
        lines = lines.withColumn("_jk", F.xxhash64("key"))
        freq = freq.select(F.xxhash64("key").alias("_jk")).distinct()
        kept = lines.join(freq, "_jk", "left_anti").drop("_jk")
        removed_per_doc = lines.join(freq, "_jk", "left_semi")
    else:
        kept = lines.join(freq, "key", "left_anti")
        removed_per_doc = lines.join(freq, "key", "left_semi")

    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.getField("line"),
            ),
        ).alias("_clean_text")
    )
    removals = removed_per_doc.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_lines_removed")
    )
    out = (
        df.join(rebuilt, id_col, "left")
        .join(removals, id_col, "left")
        .withColumn(text_col, F.coalesce("_clean_text", F.lit("")))
        .withColumn("_lines_removed", F.coalesce("_lines_removed", F.lit(0)))
        .drop("_clean_text")
    )
    return out


def line_dedup_stats(
    df: DataFrame,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row corpus summary of a line-dedup pass (the oracle panel
    shape): total lines, distinct frequent keys, lines that would be
    removed, docs touched, and total characters surviving (length of
    every cleaned document summed — order-free, so an independent
    engine can verify it without reconstructing line order)."""
    cleaned = remove_frequent_lines(df, min_count, text_col, id_col)
    freq = frequent_lines(df, min_count, text_col, id_col)
    totals = explode_lines(df, text_col, id_col).agg(
        F.count(F.lit(1)).cast("long").alias("lines_total")
    )
    agg = cleaned.agg(
        F.sum(F.when(F.col("_lines_removed") > 0, 1).otherwise(0))
        .cast("long")
        .alias("docs_changed"),
        F.sum("_lines_removed").cast("long").alias("lines_removed"),
        F.sum(F.length(text_col)).cast("long").alias("chars_after"),
    )
    return totals.crossJoin(agg).crossJoin(
        freq.agg(F.count(F.lit(1)).cast("long").alias("dup_line_keys"))
    )
