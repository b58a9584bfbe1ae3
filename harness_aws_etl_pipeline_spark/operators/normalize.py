"""T1 — column-name normalization.

Same semantics as the reference's column cleaning (reference:
etl/src/transform/transformer.py:95-112): lowercase, spaces → ``_``,
strip non-word characters, collapse runs of ``_``, trim leading/trailing
``_``.

Column names are driver-side metadata in Spark exactly as they are in
pandas, so this is a zero-data-movement ``toDF`` rename — Catalyst sees
only aliased attributes; no shuffle, no scan change.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_WS = re.compile(r"\s+")
_NON_WORD = re.compile(r"[^\w]")
_MULTI_UNDERSCORE = re.compile(r"_+")


def normalize_name(name: str) -> str:
    """Normalize one column name: lowercase, ``\\s+``→``_``, drop
    non-word chars, collapse ``_+``, strip ``_``."""
    out = name.strip().lower()
    out = _WS.sub("_", out)
    out = _NON_WORD.sub("", out)
    out = _MULTI_UNDERSCORE.sub("_", out)
    return out.strip("_")


def normalize_column_names(df: DataFrame) -> DataFrame:
    """Rename every column of ``df`` with :func:`normalize_name`.

    Collisions (two source names normalizing to the same target) get a
    positional suffix ``_2``, ``_3``, … so the result is always a valid
    schema.
    """
    seen: dict[str, int] = {}
    new_names: list[str] = []
    for c in df.columns:
        base = normalize_name(c) or "col"
        n = seen.get(base, 0) + 1
        seen[base] = n
        new_names.append(base if n == 1 else f"{base}_{n}")
    return df.toDF(*new_names)
