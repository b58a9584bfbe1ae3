"""§2.12 — the TransformationRule extensibility contract.

The reference ships a stub ``TransformationRule(name, condition,
action)`` whose ``apply`` is a placeholder (reference:
etl/src/transform/transformer.py:257-272). This module realizes it as
the engine's user-extension surface: a rule is a named transformation
applied in sequence by a :class:`RuleSet`.

Three rule constructors cover the intended shapes:

- :func:`column_rule` — conditional column mutation
  (``when(condition, value)``), pure Column expressions, codegen'd.
- :func:`filter_rule` — conditional row retention.
- :func:`pandas_rule` — arbitrary user logic as an Arrow-batched
  ``mapInPandas`` pass (the sanctioned escape hatch; never
  row-at-a-time Python UDFs).

Rules compose into the same logical plan as the built-in pipeline —
a RuleSet of N column rules is N nested projections that Catalyst
collapses into one.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TransformationRule:
    """Named DataFrame→DataFrame transformation."""

    name: str
    action: Callable[[DataFrame], DataFrame]
    description: str = ""

    def apply(self, df: DataFrame) -> DataFrame:
        return self.action(df)


def column_rule(
    name: str,
    condition: Column,
    column: str,
    value: Column | Any,
    description: str = "",
) -> TransformationRule:
    """Set ``column`` to ``value`` where ``condition`` holds (existing
    value elsewhere; creates the column if missing, null elsewhere)."""
    value_col = value if isinstance(value, Column) else F.lit(value)

    def _apply(df: DataFrame) -> DataFrame:
        otherwise = F.col(column) if column in df.columns else F.lit(None)
        return df.withColumn(column, F.when(condition, value_col).otherwise(otherwise))

    return TransformationRule(name, _apply, description)


def filter_rule(name: str, condition: Column, description: str = "") -> TransformationRule:
    """Keep only rows satisfying ``condition``."""
    return TransformationRule(name, lambda df: df.filter(condition), description)


def pandas_rule(
    name: str,
    fn: Callable[[Iterator[Any]], Iterator[Any]],
    schema: str,
    description: str = "",
) -> TransformationRule:
    """Arbitrary vectorized logic via ``mapInPandas`` (Arrow batches)."""
    return TransformationRule(name, lambda df: df.mapInPandas(fn, schema), description)


class RuleSet:
    """Ordered rule application with an audit trail.

    ``apply`` returns the transformed DataFrame plus the list of rule
    names applied — the engine's stats surface for custom transforms
    (the reference's per-step ``stats`` dict, transformer.py:52-90).
    """

    def __init__(self, rules: list[TransformationRule] | None = None):
        self.rules: list[TransformationRule] = list(rules or [])

    def add(self, rule: TransformationRule) -> "RuleSet":
        self.rules.append(rule)
        return self

    def apply(self, df: DataFrame) -> tuple[DataFrame, list[str]]:
        applied = []
        for rule in self.rules:
            df = rule.apply(df)
            applied.append(rule.name)
        return df, applied
