"""Incrementally-maintained rollup: delta-fold refresh over a
snapshot table, checked against the full re-aggregation after every
step."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.plans.incremental_view import (
    IncrementalRollup,
)
from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable


@pytest.fixture
def silver(spark, tmp_path):
    return SnapTable(spark, str(tmp_path / "silver"))


def _rows(spark, rows):
    return spark.createDataFrame(rows, "day string, qty long, price double")


def _view(spark, silver, tmp_path):
    return IncrementalRollup(
        spark,
        silver,
        str(tmp_path / "gold"),
        "daily",
        group_cols=["day"],
        aggs={
            "cnt": ("count", F.lit(1)),
            "qty_sum": ("sum", F.col("qty")),
            "max_price": ("max", F.col("price")),
        },
    )


def _full(silver_df):
    return {
        r["day"]: (r["cnt"], r["qty_sum"], r["max_price"])
        for r in silver_df.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("qty").alias("qty_sum"),
            F.max("price").alias("max_price"),
        )
        .collect()
    }


def _got(view):
    return {
        r["day"]: (r["cnt"], r["qty_sum"], r["max_price"])
        for r in view.read().collect()
    }


class TestIncrementalRollup:
    def test_refresh_matches_full_reaggregation(self, spark, silver, tmp_path):
        iv = _view(spark, silver, tmp_path)
        silver.write(
            _rows(spark, [("d1", 2, 1.5), ("d1", 3, 9.0), ("d2", 1, 4.0)]),
            mode="overwrite",
        )
        out = iv.refresh()
        assert out["skipped"] is False and out["folded_to"] == 0
        assert _got(iv) == _full(silver.read())

        # two more appends, one refresh folding both
        silver.write(_rows(spark, [("d1", 10, 0.5), ("d3", 7, 2.0)]))
        silver.write(_rows(spark, [("d2", 5, 99.0)]))
        out = iv.refresh()
        assert out["folded_to"] == 2
        assert _got(iv) == _full(silver.read())
        # untouched group d1's... every group was touched here; check
        # a third wave touching only one group leaves others intact
        silver.write(_rows(spark, [("d3", 1, 1.0)]))
        before = _got(iv)
        iv.refresh()
        after = _got(iv)
        assert after == _full(silver.read())
        assert after["d1"] == before["d1"] and after["d2"] == before["d2"]

    def test_refresh_idempotent_and_skips(self, spark, silver, tmp_path):
        iv = _view(spark, silver, tmp_path)
        silver.write(_rows(spark, [("d1", 1, 1.0)]), mode="overwrite")
        iv.refresh()
        out = iv.refresh()  # nothing new
        assert out["skipped"] is True and out["folded_to"] == 0
        assert _got(iv) == _full(silver.read())

    def test_source_rewrite_surfaces_policy_error(self, spark, silver, tmp_path):
        iv = _view(spark, silver, tmp_path)
        silver.write(
            _rows(spark, [("d1", 1, 1.0), ("d2", 2, 2.0)]), mode="overwrite"
        )
        iv.refresh()
        silver.delete_where("day = 'd1'")
        with pytest.raises(ValueError, match="append delta"):
            iv.refresh()

    def test_non_distributive_rejected(self, spark, silver, tmp_path):
        with pytest.raises(ValueError, match="non-distributive"):
            IncrementalRollup(
                spark,
                silver,
                str(tmp_path / "g2"),
                "bad",
                group_cols=["day"],
                aggs={"p50": ("percentile", F.col("qty"))},
            )

    def test_empty_source_skips(self, spark, silver, tmp_path):
        iv = _view(spark, silver, tmp_path)
        assert iv.refresh()["skipped"] is True


class TestSchemaDriftRefused:
    def test_changed_aggs_fail_loudly(self, spark, silver, tmp_path):
        """Adding an aggregate to an existing view must raise, not
        silently commit delta-only values as all-time aggregates."""
        iv = _view(spark, silver, tmp_path)
        silver.write(_rows(spark, [("d1", 1, 1.0)]), mode="overwrite")
        iv.refresh()
        silver.write(_rows(spark, [("d1", 2, 2.0)]))
        iv2 = IncrementalRollup(
            spark,
            silver,
            str(tmp_path / "gold"),
            "daily",
            group_cols=["day"],
            aggs={
                "cnt": ("count", F.lit(1)),
                "qty_sum": ("sum", F.col("qty")),
                "max_price": ("max", F.col("price")),
                "min_qty": ("min", F.col("qty")),  # NEW aggregate
            },
        )
        with pytest.raises(Exception):
            iv2.refresh()
        # the stored rollup is untouched by the failed refresh
        assert _got(iv) == {"d1": (1, 1, 1.0)}
