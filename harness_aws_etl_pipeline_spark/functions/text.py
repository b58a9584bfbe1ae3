"""Text-analysis column expressions (all JVM-side, codegen-friendly).

Building blocks for the [EXT] training-data text operators: language
ID, quality scoring, token counting, shingling for near-dup detection.
Everything here is a ``Column -> Column`` expression built from
``pyspark.sql.functions`` — no Python UDFs in the hot path, so these
stay inside whole-stage codegen and scale linearly with input.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A word as a run of alphanumerics — the "BPE-ish" token boundary used
# for token counting (splits punctuation off words).
TOKEN_PATTERN = "[A-Za-z0-9]+"

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "from",
]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (empty strings filtered)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def word_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def token_count_regex(col: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    """Count of regex-token matches (``regexp_count``, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(pattern))


def shingles(col: Column | str, n: int = 5, *, pretokenized: bool = False) -> Column:
    """Distinct n-token shingles as space-joined strings.

    ``transform`` over token positions + ``slice`` — pure built-ins, no
    UDF. Used by n-gram Jaccard and MinHash dedup; at 100 TB the
    shingle explosion is the dominant cost, so the shingle list is
    deduplicated per document *before* any explode.

    PERF: the transform lambda references the token array, and a HOF
    lambda re-evaluates outer EXPRESSIONS per element — so callers on a
    hot path should materialize ``tokens(text)`` into a column first
    and pass it with ``pretokenized=True`` (a bound attribute is an
    O(1) lookup; the raw expression re-tokenizes per shingle index,
    O(len²) per doc).
    """
    if pretokenized:
        toks = F.col(col) if isinstance(col, str) else col
    else:
        toks = tokens(col)
    nsh = F.size(toks) - F.lit(n - 1)
    # guard: F.sequence(1, 0) counts DOWN and slice(…, 0, n) is an
    # error — docs shorter than n tokens get an empty shingle set
    return F.when(nsh < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), nsh),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )
    )


def dup_line_fraction(col: Column | str) -> Column:
    """Gopher-style repetition signal: fraction of non-empty lines that
    duplicate an earlier line (0 when the doc has no non-empty lines).
    Repetitious machine-generated text scores high; prose scores ~0.
    Pure JVM array expressions — no shuffle, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(F.split(c, "\n"), lambda ln: ln != "")
    n = F.size(lines)
    return F.when(
        n > 0,
        (n - F.size(F.array_distinct(lines))).cast("double") / n,
    ).otherwise(F.lit(0.0))


def dup_word_fraction(col: Column | str) -> Column:
    """Fraction of whitespace tokens that duplicate an earlier token —
    the word-level repetition signal (high for keyword-stuffed or
    looping generations)."""
    toks = tokens(col)
    n = F.size(toks)
    return F.when(
        n > 0,
        (n - F.size(F.array_distinct(toks))).cast("double") / n,
    ).otherwise(F.lit(0.0))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(col) if isinstance(col, str) else col
    clean = F.regexp_replace(c, "[A-Za-z0-9 ]", "")
    return F.when(F.length(c) > 0, F.length(clean) / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are (lowercase) stopwords.

    The membership test is ``isin`` over string literals (an In
    predicate) rather than ``array_contains`` on a constructed array —
    a HOF lambda re-evaluates outer expressions per element, which
    would rebuild the stopword array for every token."""
    toks = tokens(col)
    sw = [w for w in (stopwords or EN_STOPWORDS)]
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*sw)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def top_ngram_fraction(toks: Column, n: int) -> Column:
    """Fraction of the document's tokens covered by its single most
    frequent n-gram — the Gopher repetition signal for n ≥ 2 (a page
    where one 2-gram covers 20%+ of the text is template spam).

    ``toks`` MUST be a bound token-array column (not a raw expression)
    — a HOF lambda re-evaluates raw outer expressions per element (the
    re-tokenization trap documented on :func:`shingles`).  The most
    frequent gram is found as the LONGEST EQUAL RUN of the SORTED gram
    array — one ``array_sort`` + one ``aggregate`` fold with a
    (prev, run, best) struct accumulator, O(L log L) per document and
    entirely accumulator-local (no expression re-evaluation).  The
    naive formulation (count each distinct gram via a nested filter)
    is O(L²) with per-element re-eval and measured 20× slower over the
    sf0.1 corpus; the two compute the identical number, which is all
    the SQL oracle checks.

    Token-based (each occurrence of the winning n-gram covers n
    tokens), where the paper counts characters — same signal, exactly
    reproducible in SQL without character bookkeeping.
    """
    ngrams = F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    # longest equal run in the sorted array == max occurrence count.
    # Grams are space-joined non-empty tokens, so "" is a safe
    # never-matches initial sentinel for prev.
    run_state = F.aggregate(
        F.array_sort(ngrams),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    return F.when(
        F.size(toks) >= n,
        (run_state["best"] * n).cast("double") / F.size(toks),
    ).otherwise(F.lit(0.0))
