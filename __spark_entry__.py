"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``harness_aws_etl_pipeline_spark`` (see
SURVEY.md §2 for the operator inventory each entry covers); this module
just exposes the catalog in the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# self-locate: the engine package lives beside this file — keep imports
# working no matter how/where the driver loads this module from
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: G2 revenue rollup
    (fact⋈fact join + grouped aggregation + sort)."""
    from harness_aws_etl_pipeline_spark.plans.catalog import CATALOG

    return CATALOG["g2_revenue_rollup"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from harness_aws_etl_pipeline_spark.plans.catalog import CATALOG

    return {name: spec.builder for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; entries without an oracle
    (engine-specific hashing) are omitted → rows-only check."""
    from harness_aws_etl_pipeline_spark.plans.catalog import CATALOG

    return {
        name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None
    }
