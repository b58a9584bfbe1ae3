"""Data-quality expectations — declarative checks evaluated in ONE
aggregate pass.

The reference's validation (transformer.py:230-255) is descriptive
profiling; expectations are the enforcement surface layered on top:
each expectation is a named row-level predicate, and ``check`` counts
violations for ALL of them in a single scan (conditional sums — never
one job per rule). ``enforce`` turns the report into a hard gate.

Designed to ride the write action via ``observe`` as well
(``as_observed``) so a guarded pipeline stays one-pass end to end.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: Column  # True = row OK
    description: str = ""


def expect_not_null(column: str) -> Expectation:
    return Expectation(f"{column}_not_null", F.col(column).isNotNull())


def expect_between(column: str, lo: Any, hi: Any) -> Expectation:
    return Expectation(
        f"{column}_between",
        F.col(column).isNull() | F.col(column).between(lo, hi),
    )


def expect_in(column: str, allowed: list) -> Expectation:
    return Expectation(
        f"{column}_in_set",
        F.col(column).isNull() | F.col(column).isin(allowed),
    )


def expect_unique(column: str) -> Expectation:
    """Marker for a table-level uniqueness check (needs its own
    aggregate — handled separately in :func:`check`)."""
    return Expectation(f"{column}_unique", F.lit(True), description=f"unique:{column}")


def check(df: DataFrame, expectations: list[Expectation]) -> dict[str, Any]:
    """Violation counts per expectation + total rows, one scan (plus
    one distinct-count aggregate per uniqueness expectation)."""
    row_level = [e for e in expectations if not e.description.startswith("unique:")]
    unique = [e for e in expectations if e.description.startswith("unique:")]

    aggs = [F.count(F.lit(1)).alias("__rows")]
    for e in row_level:
        aggs.append(F.sum((~e.predicate).cast("long")).alias(e.name))
    for e in unique:
        col = e.description.split(":", 1)[1]
        aggs.append(
            (F.count(col) - F.countDistinct(col)).alias(e.name)
        )
    row = df.agg(*aggs).first()
    total = int(row["__rows"])
    violations = {e.name: int(row[e.name] or 0) for e in expectations}
    return {
        "rows": total,
        "violations": violations,
        "passed": all(v == 0 for v in violations.values()),
    }


def enforce(df: DataFrame, expectations: list[Expectation]) -> dict[str, Any]:
    """Hard gate: raise ValueError naming the failing expectations."""
    report = check(df, expectations)
    if not report["passed"]:
        failing = {k: v for k, v in report["violations"].items() if v}
        raise ValueError(f"data-quality expectations failed: {failing}")
    return report


def quarantine(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(good, bad) split on the row-level predicates — the
    continue-with-clean-rows alternative to ``enforce``. Uniqueness
    markers are ignored here (not row-local)."""
    preds = [
        e.predicate for e in expectations if not e.description.startswith("unique:")
    ]
    if not preds:
        return df, df.limit(0)
    ok = preds[0]
    for p in preds[1:]:
        ok = ok & p
    # null-safe split: a predicate evaluating to SQL NULL (e.g.
    # `col > 5` on a null cell) must land the row in `bad`, not vanish
    # from both sides (filter(ok) and filter(~ok) each drop NULL)
    ok = F.coalesce(ok, F.lit(False))
    return df.filter(ok), df.filter(~ok)
