"""Multi-level aggregation: ROLLUP / CUBE / GROUPING SETS.

The reference's gold tier documents single-level rollups
(etl/README.md:116-145 — grouped daily/regional aggregates); BI
consumers of the same tables immediately ask for subtotal levels
("by flag and status, by flag alone, and overall") — the classic
multi-level lattice. Spark computes every level in ONE pass
(`Expand` + a single shuffle on the expanded keys) instead of one
job per level, which is the whole point at 100 TB: a p-level rollup
is p× cheaper than p separate groupBys because the fact scan and the
shuffle are shared.

Shape notes:

- `Expand` multiplies the MAP-side rows by the number of grouping
  sets (rollup p+1, cube 2^p) BEFORE the partial aggregate; with
  low-cardinality keys the partial agg collapses them immediately,
  so the shuffle stays |sets|·|groups| rows — fine for the profiling
  grain this is meant for. For high-cardinality keys prefer explicit
  `grouping_sets_agg` with only the levels you need.
- Every function appends a ``_gid`` BIGINT — the packed grouping
  bits (bit i set ⟺ key i is rolled up at that row, leftmost key =
  highest bit; the Postgres/Spark GROUPING() convention) — so
  subtotal rows are distinguishable from genuine NULL key values.
  ``_gid`` is exact integer arithmetic re-derivable by any engine
  with GROUPING(), which is what lets the catalog value-oracle the
  whole lattice cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["rollup_agg", "cube_agg", "grouping_sets_agg"]


def _gid(keys: list[str]) -> Column:
    """Packed grouping bits: Σ grouping(kᵢ) << (p−1−i) — explicit
    per-key bits rather than grouping_id() so the bit order is pinned
    by THIS code, not an engine default."""
    p = len(keys)
    out = F.lit(0).cast("long")
    for i, k in enumerate(keys):
        out = out + F.grouping(k).cast("long") * F.lit(1 << (p - 1 - i))
    return out.alias("_gid")


def rollup_agg(df: DataFrame, keys: list[str], *aggs: Column) -> DataFrame:
    """All p+1 prefix levels of ``keys`` — (k1..kp), (k1..kp-1), …,
    grand total — in one pass: ``keys… , _gid, aggs…``. Subtotal rows
    carry NULL in the rolled-up keys and the corresponding ``_gid``
    bits set."""
    if not keys:
        raise ValueError("keys must be non-empty")
    return df.rollup(*keys).agg(_gid(keys), *aggs)


def cube_agg(df: DataFrame, keys: list[str], *aggs: Column) -> DataFrame:
    """All 2^p subsets of ``keys`` in one pass — same contract as
    :func:`rollup_agg`. Mind the Expand factor: 2^p map-side copies;
    keep p small (profiling grain) or use :func:`grouping_sets_agg`."""
    if not keys:
        raise ValueError("keys must be non-empty")
    return df.cube(*keys).agg(_gid(keys), *aggs)


def grouping_sets_agg(
    df: DataFrame,
    sets: list[list[str]],
    *aggs: Column,
) -> DataFrame:
    """Exactly the requested grouping sets (each a subset of the union
    of all listed keys), one pass. The output carries the UNION of all
    keys (NULL where a key is not in a row's set) + ``_gid`` + aggs.
    The Expand factor is |sets| — the scale-conscious choice when the
    cube lattice is mostly unwanted."""
    if not sets:
        raise ValueError("sets must be non-empty")
    keys: list[str] = []
    for s in sets:
        for k in s:
            if k not in keys:
                keys.append(k)
    return df.groupingSets([list(s) for s in sets], *keys).agg(
        _gid(keys), *aggs
    )
