"""Blocked fuzzy string join — approximate entity matching.

Joining two name/title/address lists on "close enough" strings is the
entity-resolution primitive (vendor reconciliation, author matching,
product dedup across catalogs). The naive formulation is a cross join
with a ``levenshtein ≤ k`` filter — O(|L|·|R|) comparisons, dead at
scale. The standard fix is BLOCKING: only pairs that agree on cheap
invariants of any ≤ k-edit match are compared at all.

Blocking invariants used (both PROVABLY safe for edit distance ≤ k —
no true match is lost):

- length band: ``|len(a) − len(b)| ≤ k`` (each edit changes length by
  at most 1) — expressed by joining on length-bucket ids, each side
  exploded onto the ⌈(2k+1)/band⌉ buckets it can reach;
- optional prefix agreement (``prefix_len`` > 0): first characters
  equal — NOT edit-safe (an edit can change the first letter) but the
  classic recall/cost dial; off by default so default results are
  exactly the naive join's.

Everything is JVM-side: the block key is an equi-join key (hash
shuffle on (bucket[, prefix])), the verify is the codegen
``levenshtein`` with Spark's built-in ≤-threshold early exit. The
result carries the distance for downstream scoring.

Reference scope note: the reference has no string matching at all
(its only key matching is a DynamoDB point lookup,
etl/src/load/metadata.py:189-196); this extends the engine's dedup/
similarity families with the lexical entity-resolution join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fuzzy_string_join"]


def fuzzy_string_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    prefix_len: int = 0,
) -> DataFrame:
    """Pairs with ``levenshtein(left_col, right_col) ≤ max_dist``.

    Returns every left column + every right column (collisions
    suffixed ``_r``) + ``edit_dist INT``. With ``prefix_len=0`` the
    result EQUALS the naive cross-join filter (length banding is
    lossless for edit distance); ``prefix_len>0`` additionally
    requires the first characters to match — cheaper, may drop
    matches whose edits touch the prefix. NULL strings never match."""
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    band = max_dist + 1  # bucket width: a ≤k partner is in ±1 bucket
    lc, rc = F.col("_fl"), F.col("_fr")
    overlap = set(left.columns) & set(right.columns)
    r = right
    for c in overlap:
        r = r.withColumnRenamed(c, f"{c}_r")
    right_out = f"{right_col}_r" if right_col in overlap else right_col
    l_keyed = left.where(F.col(left_col).isNotNull()).withColumn(
        "_fl", F.col(left_col)
    )
    r_keyed = r.where(F.col(right_out).isNotNull()).withColumn(
        "_fr", F.col(right_out)
    )
    # left explodes onto its bucket and both neighbours; right keeps
    # one bucket — every pair within the length band meets exactly
    # once on the right's own bucket id
    l_b = l_keyed.withColumn(
        "_bk",
        F.explode(
            F.array(
                (F.floor(F.length(lc) / band) - 1).cast("long"),
                F.floor(F.length(lc) / band).cast("long"),
                (F.floor(F.length(lc) / band) + 1).cast("long"),
            )
        ),
    )
    r_b = r_keyed.withColumn("_bk", F.floor(F.length(rc) / band).cast("long"))
    keys = ["_bk"]
    if prefix_len > 0:
        l_b = l_b.withColumn("_pf", F.substring(lc, 1, prefix_len))
        r_b = r_b.withColumn("_pf", F.substring(rc, 1, prefix_len))
        keys.append("_pf")
    return (
        l_b.join(r_b, keys)
        .withColumn(
            "edit_dist",
            F.levenshtein(lc, rc, max_dist),
        )
        # threshold form returns -1 past the cutoff
        .filter(
            (F.col("edit_dist") >= 0)
            & (F.abs(F.length(lc) - F.length(rc)) <= max_dist)
        )
        .drop("_fl", "_fr", "_bk", *(["_pf"] if prefix_len > 0 else []))
    )
