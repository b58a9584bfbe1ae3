"""[EXT] Pandas UDAF + grouped-map surfaces — the remaining
user-extension shapes beside mapInPandas (multimodal/shingling) and
applyInPandasWithState (streaming/stateful):

- :func:`median_udaf` — a GROUPED_AGG pandas_udf: per-group exact
  median (interpolated). Arrow ships each group's column once; numpy
  computes. Deterministic: sorting exact doubles, no accumulation
  order. (The built-in ``percentile`` covers this too — the UDAF form
  is the template for aggregates Spark genuinely lacks.)
- :func:`zscore_per_group` — ``groupBy().applyInPandas`` grouped-map:
  full-group transforms (normalization, per-group model scoring) where
  every output row needs its whole group. Shuffles once on the key;
  each group must fit one worker's memory — at 100 TB that means
  grouping keys with bounded cardinality per key, or pre-aggregating.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_udaf(v: pd.Series) -> float:  # type: ignore[misc]
    return float(v.median())


def group_medians(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-key exact median via the GROUPED_AGG pandas UDAF.

    Rounded to 6 dp: pandas interpolates ``(a+b)/2`` while SQL engines
    compute ``a+(b-a)*0.5`` — identical mathematically, but they can
    differ in the final ULP, which a raw value-hash would notice.
    """
    return (
        df.groupBy(key)
        .agg(F.round(median_udaf(F.col(value)), 6).alias("median_value"))
        .orderBy(key)
    )


def zscore_per_group(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-group z-score normalization via applyInPandas (grouped map).

    Output schema = input + ``zscore``; groups with zero variance get
    zscore 0.0.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    # fresh StructType: StructType.add() MUTATES in place, and
    # df.schema is cached on the DataFrame — add()ing to it corrupts
    # the source frame's column list
    schema = StructType(
        list(df.schema.fields) + [StructField("zscore", DoubleType(), True)]
    )

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value].std(ddof=0)
        if std and std > 0:
            pdf["zscore"] = (pdf[value] - pdf[value].mean()) / std
        else:
            pdf["zscore"] = 0.0
        return pdf

    return df.groupBy(key).applyInPandas(_norm, schema)
