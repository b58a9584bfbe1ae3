"""[EXT] Document quality-filter presets (Gopher / C4 rule bundles).

Production corpus pipelines don't score documents — they GATE them on
published heuristic rule sets.  This module packages the two canonical
bundles as named, individually-reportable rules over pure column
expressions (every predicate is JVM-side, codegen-friendly, and
re-derivable in SQL — the report leg is oracle-checked):

- ``gopher`` (Rae et al. 2021, appendix A1.1 — the MassiveText rules,
  the subset expressible without a tokenizer): word-count range, mean
  word length range, symbol-to-word ratio, alphabetic-word ratio,
  required-stopword hits, duplicate-line / duplicate-word fractions,
  bullet-line and ellipsis-line fractions.
- ``c4`` (Raffel et al. 2020, the C4 cleaning rules at document
  granularity): ≥3 sentences, no ``{`` (code/markup), no
  "lorem ipsum", terminal-punctuation presence.  (C4's line-level
  terminal-punct KEEP is line surgery, not a document gate — that
  lives in ``linededup``-style line ops; here the document-level
  gates.)

Thresholds are keyword-overridable; the defaults are the published
numbers.  Rules return "passes" booleans; failures are collected by
NAME into ``_qf_failed`` so a corpus report can say *which* rule costs
what — the number production teams actually tune on.

Scale: everything is a single projection over the scan (no shuffle, no
Python).  The report is one aggregate pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.functions.text import (
    dup_line_fraction,
    dup_word_fraction,
    top_ngram_fraction,
)

__all__ = [
    "PRESETS",
    "preset_rules",
    "apply_quality_filters",
    "quality_filter_report",
]

# Gopher's required-stopword list (appendix A1.1: "contains at least
# TWO of the following")
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _toks(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def _nonempty_lines(text: Column) -> Column:
    return F.filter(F.split(text, "\n"), lambda ln: F.trim(ln) != "")


def _gopher_rules(
    text: Column,
    toks_bound: Column | None = None,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
    max_dup_line_fraction: float = 0.3,
    max_dup_word_fraction: float = 0.5,
    max_bullet_line_fraction: float = 0.9,
    max_ellipsis_line_fraction: float = 0.3,
    max_top2gram_fraction: float = 0.20,
    max_top3gram_fraction: float = 0.18,
    max_top4gram_fraction: float = 0.16,
) -> dict[str, Column]:
    # the n-gram repetition rules walk the token array per distinct
    # gram — against a raw tokenize EXPRESSION that re-splits the text
    # per element (cubic per doc); apply/report materialize the array
    # into a column first and pass it here as a bound attribute
    toks = toks_bound if toks_bound is not None else _toks(text)
    n = F.size(toks)
    lines = _nonempty_lines(text)
    nl = F.size(lines)
    mean_len = F.when(
        n > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        ).cast("double")
        / n,
    ).otherwise(F.lit(0.0))
    symbols = F.regexp_count(text, F.lit("#")) + F.regexp_count(
        text, F.lit(r"\.\.\.")
    )
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    # array_intersect evaluates each side ONCE — a filter-lambda over
    # the stopword array would re-tokenize the text per stopword (the
    # HOF re-evaluation trap functions/text.py documents)
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, F.lower)),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    bullets = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]"))
    )
    ellipses = F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"\.\.\.$")))
    return {
        "word_count": (n >= min_words) & (n <= max_words),
        "mean_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "symbol_ratio": F.when(
            n > 0, symbols.cast("double") / n < max_symbol_word_ratio
        ).otherwise(F.lit(False)),
        "alpha_ratio": F.when(
            n > 0, alpha_words.cast("double") / n >= min_alpha_word_ratio
        ).otherwise(F.lit(False)),
        "stopwords": stop_hits >= min_stopword_hits,
        "dup_lines": dup_line_fraction(text) <= max_dup_line_fraction,
        "dup_words": dup_word_fraction(text) <= max_dup_word_fraction,
        "bullet_lines": F.when(
            nl > 0, bullets.cast("double") / nl <= max_bullet_line_fraction
        ).otherwise(F.lit(True)),
        "ellipsis_lines": F.when(
            nl > 0, ellipses.cast("double") / nl <= max_ellipsis_line_fraction
        ).otherwise(F.lit(True)),
        # Gopher's top-n-gram repetition caps (token-covered fraction;
        # the paper counts characters — documented deviation in
        # functions/text.py). Thresholds are the published A1.1 numbers.
        "top2gram": top_ngram_fraction(toks, 2) <= max_top2gram_fraction,
        "top3gram": top_ngram_fraction(toks, 3) <= max_top3gram_fraction,
        "top4gram": top_ngram_fraction(toks, 4) <= max_top4gram_fraction,
    }


def _c4_rules(
    text: Column,
    *,
    min_sentences: int = 3,
) -> dict[str, Column]:
    sentences = F.size(
        F.filter(F.split(text, r"[.!?]"), lambda s: F.trim(s) != "")
    )
    # a doc with no terminal punctuation at all splits into ONE
    # "sentence" — require the punctuation to exist too
    has_punct = text.rlike(r"[.!?]")
    return {
        "min_sentences": has_punct & (sentences >= min_sentences),
        "no_curly_brace": ~text.contains("{"),
        "no_lorem_ipsum": ~F.lower(text).contains("lorem ipsum"),
    }


PRESETS = ("gopher", "c4")


def preset_rules(
    preset: str,
    text: Column,
    toks_bound: Column | None = None,
    **thresholds,
) -> dict[str, Column]:
    """rule name → "passes" boolean Column for the chosen preset.

    ``toks_bound``: optionally a MATERIALIZED token-array column for
    the gopher rules — callers projecting over many documents should
    provide it (see ``_gopher_rules``); ``apply_quality_filters`` and
    ``quality_filter_report`` do this automatically."""
    if preset == "gopher":
        return _gopher_rules(text, toks_bound, **thresholds)
    if preset == "c4":
        return _c4_rules(text, **thresholds)
    raise ValueError(f"unknown preset {preset!r}; choose from {PRESETS}")


def apply_quality_filters(
    df: DataFrame,
    preset: str = "gopher",
    text_col: str = "text",
    mode: str = "flag",
    **thresholds,
) -> DataFrame:
    """Gate the corpus on a preset.

    ``mode="flag"`` (default) adds ``_qf_failed`` (array of failed
    rule names) and ``_qf_pass`` (boolean) — quarantine routing keeps
    the rejects inspectable.  ``mode="filter"`` returns only passing
    rows with the original schema.
    """
    if mode not in ("flag", "filter"):
        raise ValueError(f"mode must be 'flag' or 'filter', got {mode!r}")
    staged = df.withColumn("__qf_toks", _toks(F.col(text_col)))
    rules = preset_rules(
        preset, F.col(text_col), F.col("__qf_toks"), **thresholds
    )
    failed = F.filter(
        F.array(
            *[
                F.when(~passes, F.lit(name)).otherwise(F.lit(None))
                for name, passes in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    flagged = (
        staged.withColumn("_qf_failed", failed)
        .withColumn("_qf_pass", F.size("_qf_failed") == 0)
        .drop("__qf_toks")
    )
    if mode == "flag":
        return flagged
    return flagged.filter("_qf_pass").drop("_qf_failed", "_qf_pass")


def quality_filter_report(
    df: DataFrame,
    preset: str = "gopher",
    text_col: str = "text",
    **thresholds,
) -> DataFrame:
    """1-row report: per-rule fail counts (independent — a doc failing
    two rules counts in both) + docs passing every rule.  One
    aggregate pass over one projection."""
    staged = df.withColumn("__qf_toks", _toks(F.col(text_col)))
    rules = preset_rules(
        preset, F.col(text_col), F.col("__qf_toks"), **thresholds
    )
    aggs = [
        F.sum(F.when(~passes, 1).otherwise(0))
        .cast("long")
        .alias(f"qf_{name}_fail")
        for name, passes in rules.items()
    ]
    all_pass = None
    for passes in rules.values():
        all_pass = passes if all_pass is None else (all_pass & passes)
    aggs.append(F.sum(F.when(all_pass, 1).otherwise(0)).cast("long").alias("qf_pass_cnt"))
    return staged.agg(*aggs)
