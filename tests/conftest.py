"""Shared fixtures: one session-scoped SparkSession + canonical frames
(mirroring the reference's conftest fixture strategy,
tests/conftest.py:20-63, minus the AWS mocks which have no equivalent
here — local FS stands in for S3)."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from harness_aws_etl_pipeline_spark.session import get_spark

# ---------------------------------------------------------------------
# Sharded full-suite runs (tests/shardrunner.py): a full `pytest tests/`
# invocation is split BY FILE across worker subprocesses, each a normal
# sequential pytest with its own session-scoped SparkSession. Targeted
# runs (single file, -k, -m, < SHARD_MIN items) stay in-process, so
# debugging behavior is unchanged. Disable with SPARK_GRAFT_PAR=0.
pytest_plugins = ("shardrunner",)


@pytest.fixture(scope="session")
def spark():
    extra = {}
    wh = os.environ.get("SPARK_GRAFT_WAREHOUSE")
    if wh:  # per-shard warehouse: managed-table tests must not collide
        extra["spark.sql.warehouse.dir"] = wh
    s = get_spark(
        "engine-tests", master="local[4]", shuffle_partitions=4,
        extra_conf=extra or None,
    )
    yield s


@pytest.fixture
def sample_df(spark):
    return spark.createDataFrame(
        [
            (1, "Alice", 34.5, "2024-01-15"),
            (2, "Bob", 12.0, "2024-02-20"),
            (3, "Carol", 99.9, "2024-03-25"),
        ],
        "id long, name string, amount double, created_date string",
    )


@pytest.fixture
def df_with_nulls(spark):
    return spark.createDataFrame(
        [
            (1, "a", 1.0),
            (2, None, 2.0),
            (3, "c", None),
            (4, None, None),
        ],
        "id long, name string, amount double",
    )
