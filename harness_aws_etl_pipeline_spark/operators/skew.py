"""Skew mitigation: salted aggregation and salted broadcast-free join.

At 100 TB a single hot key (one viral user_id, one empty-string
default) can put an entire shuffle partition on one executor. Two
mitigations ship here alongside session-wide AQE skew-join splitting
(session.py sets ``spark.sql.adaptive.skewJoin.enabled``):

- :func:`salted_aggregate` — two-phase aggregation: rows get a random
  salt in [0, buckets); phase 1 aggregates on (key, salt) spreading a
  hot key over ``buckets`` reducers, phase 2 merges the partials.
  Works for any algebraic aggregate (sum/count/min/max, and avg as
  sum+count).
- :func:`salted_join` — replicate-and-salt for joining a skewed fact
  to a dimension too big to broadcast: fact rows get salt r ∈ [0, R);
  the dimension is exploded R× with every salt value; the join key
  becomes (key, salt), splitting each hot key across R reducers at the
  cost of an R× dimension replication.

The salt column uses ``rand(seed)`` — per-row, uniform, and cheap; the
seed only fixes the distribution shape, results are salt-invariant by
construction (the merge phase removes it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs`` maps column → one of sum|count|min|max|avg. Returns one
    row per key with columns named ``<fn>_<col>`` (``count`` uses the
    column name it counted).
    """
    salted = df.withColumn("__salt", (F.rand(seed) * buckets).cast("int"))

    phase1_exprs: list[Column] = []
    phase2_exprs: list[Column] = []
    for col, fn in aggs.items():
        out = f"{fn}_{col}"
        if fn == "sum":
            phase1_exprs.append(F.sum(col).alias(out))
            phase2_exprs.append(F.sum(out).alias(out))
        elif fn == "count":
            phase1_exprs.append(F.count(col).alias(out))
            phase2_exprs.append(F.sum(out).cast("long").alias(out))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(out))
            phase2_exprs.append(F.min(out).alias(out))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(out))
            phase2_exprs.append(F.max(out).alias(out))
        elif fn == "avg":
            phase1_exprs.append(F.sum(col).alias(f"__s_{col}"))
            phase1_exprs.append(F.count(col).alias(f"__c_{col}"))
            phase2_exprs.append(
                (F.sum(f"__s_{col}") / F.sum(f"__c_{col}")).alias(out)
            )
        else:
            raise ValueError(f"unsupported aggregate {fn!r}")

    partial = salted.groupBy(*keys, "__salt").agg(*phase1_exprs)
    return partial.groupBy(*keys).agg(*phase2_exprs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    replication: int = 8,
    seed: int = 42,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the fact side, replicate the dim side.

    Use when the dim side exceeds the broadcast threshold but a few
    fact keys are hot. Each hot key's rows spread over ``replication``
    reducers; the dim pays a ``replication``× blow-up (bounded, chosen
    by the caller). Join output is identical to ``fact.join(dim, key,
    how)`` for inner/left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    f_salted = fact.withColumn("__salt", (F.rand(seed) * replication).cast("int"))
    d_replicated = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(replication)]))
    )
    out = f_salted.join(d_replicated, [key, "__salt"], how)
    return out.drop("__salt")
