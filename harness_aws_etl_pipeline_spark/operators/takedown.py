"""Takedown / right-to-erasure pass — corpus governance at scale.

A production training corpus receives removal obligations continuously
(DMCA notices, GDPR erasure, opt-out lists, licensing changes). The
reference pipeline has no governance surface; at 100 TB "grep and
rewrite" is not an operator, so the engine provides one:

- :class:`TakedownRules` — a declarative rule set: document ids,
  URL/source regex patterns, exact content hashes (md5 of the text).
- :func:`apply_takedown` — ONE scan: every rule evaluated as a column
  predicate, rows matching any rule dropped. Rule lists ride the plan
  as literals/broadcasts; nothing shuffles.
- :func:`takedown_report` — the audit trail: per-rule match counts +
  kept/removed totals in one aggregation pass (conditional sums), the
  evidence a compliance process needs WITHOUT materializing matched
  content anywhere.
- :func:`apply_takedown_ids` — the bulk-id path for blocklists too
  large for a literal (millions of ids): anti-join, broadcast when the
  list is small enough.

Scale: id/hash/pattern rules are all single-pass column predicates
(broadcast-sized by contract — a rule set is human-curated, not
data-sized); the bulk-id path is the standard anti-join whose build
side is the blocklist. Re-running after new notices is incremental by
construction: apply to the snapshot table's current state and MERGE.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "TakedownRules",
    "apply_takedown",
    "apply_takedown_ids",
    "takedown_from_table",
    "takedown_predicate",
    "takedown_report",
]


@dataclass(frozen=True)
class TakedownRules:
    """Declarative removal rules. ``ids`` and ``content_hashes`` are
    exact matches; ``url_patterns`` are regexes evaluated with
    ``rlike`` against ``url_col`` (Java regex — keep patterns in the
    RE2-safe subset if an external oracle re-derives them)."""

    ids: tuple = ()
    url_patterns: tuple[str, ...] = ()
    content_hashes: tuple[str, ...] = ()

    def __post_init__(self):
        object.__setattr__(self, "ids", tuple(self.ids))
        object.__setattr__(self, "url_patterns", tuple(self.url_patterns))
        object.__setattr__(self, "content_hashes", tuple(self.content_hashes))
        if not (self.ids or self.url_patterns or self.content_hashes):
            raise ValueError("empty rule set: nothing to take down")


def _rule_predicates(
    rules: TakedownRules,
    id_col: str,
    url_col: str | None,
    text_col: str | None,
) -> list[tuple[str, Column]]:
    """(rule_name, hit_predicate) per rule — names are stable so the
    report schema is deterministic for a given rule set."""
    preds: list[tuple[str, Column]] = []
    if rules.ids:
        preds.append(("ids", F.col(id_col).isin(list(rules.ids))))
    for i, pat in enumerate(rules.url_patterns):
        if url_col is None:
            raise ValueError("url_patterns given but url_col is None")
        preds.append((f"url_pattern_{i}", F.col(url_col).rlike(pat)))
    if rules.content_hashes:
        if text_col is None:
            raise ValueError("content_hashes given but text_col is None")
        preds.append(
            (
                "content_hashes",
                F.md5(F.col(text_col)).isin(list(rules.content_hashes)),
            )
        )
    return preds


def apply_takedown(
    df: DataFrame,
    rules: TakedownRules,
    id_col: str = "doc_id",
    url_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Rows matching NO rule — the surviving corpus. One scan, pure
    column predicates (null url/text never matches a rule)."""
    # null-safe: a NULL predicate result means "did not match"
    return df.filter(
        ~takedown_predicate(rules, id_col=id_col, url_col=url_col,
                            text_col=text_col)
    )


def takedown_report(
    df: DataFrame,
    rules: TakedownRules,
    id_col: str = "doc_id",
    url_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """One-row audit frame: ``total`` / ``removed`` / ``kept`` +
    ``matched_<rule>`` per rule (a row matching several rules counts
    in each, and once in ``removed``). Single aggregation pass."""
    preds = _rule_predicates(rules, id_col, url_col, text_col)
    any_hit = preds[0][1]
    for _, p in preds[1:]:
        any_hit = any_hit | p
    any_hit = F.coalesce(any_hit, F.lit(False))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("total"),
        F.sum(any_hit.cast("long")).cast("long").alias("removed"),
        F.sum((~any_hit).cast("long")).cast("long").alias("kept"),
    ]
    for name, p in preds:
        aggs.append(
            F.sum(F.coalesce(p, F.lit(False)).cast("long"))
            .cast("long")
            .alias(f"matched_{name}")
        )
    return df.agg(*aggs)


def takedown_predicate(
    rules: TakedownRules,
    id_col: str = "doc_id",
    url_col: str | None = None,
    text_col: str = "text",
) -> Column:
    """The any-rule-hit predicate as a reusable Column (NULL-safe
    false) — what :func:`apply_takedown` negates, exposed for callers
    that push the hit condition elsewhere (e.g. a snapshot-table
    delete)."""
    preds = _rule_predicates(rules, id_col, url_col, text_col)
    hit = preds[0][1]
    for _, p in preds[1:]:
        hit = hit | p
    return F.coalesce(hit, F.lit(False))


def takedown_from_table(
    table,
    rules: TakedownRules,
    id_col: str = "doc_id",
    url_col: str | None = None,
    text_col: str = "text",
) -> dict:
    """Erasure against a :class:`~..sinks.snaptable.SnapTable`: audit
    counts on the CURRENT snapshot, then a transactional
    ``delete_where`` of the hit predicate — files without matches stay
    untouched (probe-then-rewrite), the delete is one commit, and the
    pre-delete version remains readable for compliance review via time
    travel until snapshots are expired.

    Returns the audit report dict + ``version`` / ``files_rewritten``
    from the commit."""
    report = (
        takedown_report(
            table.read(), rules, id_col=id_col, url_col=url_col,
            text_col=text_col,
        )
        .collect()[0]
        .asDict()
    )
    res = table.delete_where(
        takedown_predicate(rules, id_col=id_col, url_col=url_col,
                           text_col=text_col)
    )
    return {**report, **res}


def apply_takedown_ids(
    df: DataFrame,
    blocked: DataFrame,
    id_col: str = "doc_id",
    broadcast: bool = True,
    bloom: bool = False,
) -> DataFrame:
    """Bulk-id erasure: anti-join against a blocklist FRAME (the path
    for opt-out lists beyond literal size). ``broadcast=True`` ships
    the blocklist to every task (right for human-scale lists, up to
    ~tens of millions of ids); ``False`` falls back to a shuffled
    anti-join for blocklists that are themselves data-scale —
    and ``bloom=True`` upgrades THAT regime to the Bloom-routed
    anti-join (operators/bloomjoin.py): rows the bitmap rejects are
    definitively clean and skip the shuffle entirely, so the exchange
    is sized by (matches + ~1% fp) rather than by the corpus.
    Output is identical in all three modes."""
    b = blocked.select(F.col(blocked.columns[0]).alias(id_col)).distinct()
    if bloom:
        from harness_aws_etl_pipeline_spark.operators.bloomjoin import (
            bloom_anti_join,
        )

        return bloom_anti_join(df, b, id_col)
    if broadcast:
        b = F.broadcast(b)
    return df.join(b, on=id_col, how="left_anti")
