"""[EXT] Corpus diagnostics: one-pass summary + version-over-version
drift comparison.

Before a training run, corpus teams review a small set of numbers —
volume, per-domain token shares, quality-gate yield, length
distribution — and compare them against the previous corpus version:
a domain whose share silently doubled, or a gate whose yield halved,
is a pipeline bug caught before it becomes a training run.

:func:`corpus_report` computes the summary in TWO jobs (one corpus
aggregate + one per-domain aggregate — each a single pass with
map-side partials); :func:`compare_corpus_reports` diffs two reports
driver-side (they are model-sized dicts) and flags drifts beyond a
relative threshold.

Everything here reuses the oracle-checked building blocks
(``functions.text`` token counts, the Gopher gate) rather than
re-deriving its own signals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.functions.text import tokens, word_count

__all__ = ["corpus_report", "compare_corpus_reports"]


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    domain_col: str | None = "source",
    filter_preset: str | None = "gopher",
) -> dict:
    """Model-sized summary dict:

    ``{"docs", "tokens", "chars", "token_p50", "token_mean",
    "gate_pass" (when filter_preset), "domains": {domain: {"docs",
    "tokens", "share"}}}``.  ``domain_col=None`` / ``filter_preset=
    None`` skip those sections.
    """
    # tokenize ONCE into a bound column: the aggregate legs AND the
    # gate rules (whose repetition checks walk the array per distinct
    # gram) all read it — a raw expression would re-split per use
    staged = df.withColumn("__toks", tokens(text_col)).withColumn(
        "__tok_cnt", F.size("__toks")
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.coalesce(F.sum("__tok_cnt"), F.lit(0)).cast("long").alias("tokens"),
        F.coalesce(F.sum(F.length(text_col)), F.lit(0)).cast("long").alias("chars"),
        F.coalesce(F.expr("percentile_approx(__tok_cnt, 0.5)"), F.lit(0))
        .cast("long")
        .alias("token_p50"),
        F.round(F.coalesce(F.avg("__tok_cnt"), F.lit(0.0)), 2).alias("token_mean"),
    ]
    if filter_preset is not None:
        from harness_aws_etl_pipeline_spark.operators.filters import preset_rules

        rules = preset_rules(filter_preset, F.col(text_col), F.col("__toks"))
        all_pass = None
        for p in rules.values():
            all_pass = p if all_pass is None else (all_pass & p)
        aggs.append(
            F.sum(F.when(all_pass, 1).otherwise(0)).cast("long").alias("gate_pass")
        )
    row = staged.agg(*aggs).collect()[0].asDict()

    out = dict(row)
    if domain_col is not None and domain_col in df.columns:
        per = (
            df.groupBy(domain_col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("docs"),
                F.coalesce(F.sum(word_count(text_col)), F.lit(0))
                .cast("long")
                .alias("tokens"),
            )
            .collect()
        )
        total = max(out["tokens"], 1)
        out["domains"] = {
            str(r[domain_col]): {
                "docs": r["docs"],
                "tokens": r["tokens"],
                "share": round(r["tokens"] / total, 4),
            }
            for r in per
        }
    return out


def compare_corpus_reports(
    old: dict, new: dict, *, drift_threshold: float = 0.2
) -> dict:
    """Drift diff of two reports.

    Returns ``{"metrics": {name: {"old", "new", "rel_change"}},
    "domains": {domain: {"old_share", "new_share", "delta"}},
    "flags": [str, ...]}`` — a flag per metric whose relative change
    exceeds ``drift_threshold``, per domain whose token SHARE moved by
    more than ``drift_threshold`` (absolute), and per domain that
    appeared or vanished.
    """
    flags: list[str] = []
    metrics: dict = {}
    for k in ("docs", "tokens", "chars", "token_p50", "token_mean", "gate_pass"):
        if k not in old or k not in new:
            continue
        o, n = float(old[k]), float(new[k])
        rel = (n - o) / o if o else (0.0 if n == 0 else float("inf"))
        metrics[k] = {"old": old[k], "new": new[k], "rel_change": round(rel, 4)}
        if abs(rel) > drift_threshold:
            flags.append(f"{k}: {old[k]} -> {new[k]} ({rel:+.1%})")

    domains: dict = {}
    od = old.get("domains", {})
    nd = new.get("domains", {})
    for dom in sorted(set(od) | set(nd)):
        os_ = od.get(dom, {}).get("share", 0.0)
        ns = nd.get(dom, {}).get("share", 0.0)
        domains[dom] = {
            "old_share": os_,
            "new_share": ns,
            "delta": round(ns - os_, 4),
        }
        if dom not in od:
            flags.append(f"domain appeared: {dom} (share {ns:.2%})")
        elif dom not in nd:
            flags.append(f"domain vanished: {dom} (was {os_:.2%})")
        elif abs(ns - os_) > drift_threshold:
            flags.append(f"domain share drift: {dom} {os_:.2%} -> {ns:.2%}")
    return {"metrics": metrics, "domains": domains, "flags": flags}
