"""SCD Type-2 history (operators/scd.py): run-collapsing version
rebuild, NULL-safe change detection, incremental apply semantics
(unchanged/changed/new keys), apply ≡ rebuild over the concatenated
log, and point-in-time join correctness."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.scd import scd2_apply, scd2_history


def _d(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture()
def log(spark):
    # customer 1: city changes twice with a redundant re-observation;
    # customer 2: single version; customer 3: NULL city then a value
    rows = [
        (1, _d("2024-01-01"), "oslo", "gold"),
        (1, _d("2024-02-01"), "oslo", "gold"),  # no change -> no version
        (1, _d("2024-03-01"), "bergen", "gold"),
        (1, _d("2024-05-01"), "bergen", "silver"),
        (2, _d("2024-01-15"), "paris", "gold"),
        (3, _d("2024-02-10"), None, "bronze"),
        (3, _d("2024-04-10"), "lyon", "bronze"),
    ]
    return spark.createDataFrame(
        rows, "cust long, ts timestamp, city string, tier string"
    )


class TestHistory:
    def test_runs_collapse_and_ranges_chain(self, spark, log):
        hist = scd2_history(log, "cust", "ts").collect()
        byk = {}
        for r in hist:
            byk.setdefault(r["cust"], []).append(r)
        for k in byk:
            byk[k].sort(key=lambda r: r["valid_from"])
        c1 = byk[1]
        assert len(c1) == 3  # redundant re-observation collapsed
        assert [r["city"] for r in c1] == ["oslo", "bergen", "bergen"]
        assert [r["tier"] for r in c1] == ["gold", "gold", "silver"]
        # ranges chain exactly: valid_to == next valid_from
        for a, b in zip(c1, c1[1:]):
            assert a["valid_to"] == b["valid_from"]
        assert c1[-1]["valid_to"] is None and c1[-1]["is_current"]
        assert sum(r["is_current"] for r in c1) == 1
        assert len(byk[2]) == 1 and byk[2][0]["is_current"]
        # NULL city -> value IS a change (null-safe comparison)
        assert len(byk[3]) == 2 and byk[3][0]["city"] is None

    def test_point_in_time_join(self, spark, log):
        hist = scd2_history(log, "cust", "ts")
        facts = spark.createDataFrame(
            [(1, _d("2024-04-01")), (1, _d("2024-06-01")), (3, _d("2024-03-01"))],
            "cust long, fts timestamp",
        )
        got = {
            (r["cust"], r["fts"]): (r["city"], r["tier"])
            for r in facts.join(
                hist,
                (facts.cust == hist.cust)
                & (facts.fts >= hist.valid_from)
                & (facts.fts < F.coalesce(hist.valid_to, F.lit("9999-01-01").cast("timestamp"))),
            )
            .select(facts.cust, "fts", "city", "tier")
            .collect()
        }
        assert got[(1, _d("2024-04-01"))] == ("bergen", "gold")
        assert got[(1, _d("2024-06-01"))] == ("bergen", "silver")
        assert got[(3, _d("2024-03-01"))] == (None, "bronze")

    def test_partitioning_invariance(self, spark, log):
        key = lambda t: tuple((x is None, str(x)) for x in t)
        a = sorted(map(tuple, scd2_history(log.repartition(1), "cust", "ts").collect()), key=key)
        b = sorted(map(tuple, scd2_history(log.repartition(7, "tier"), "cust", "ts").collect()), key=key)
        assert a == b

    def test_no_attrs_raises(self, spark):
        df = spark.createDataFrame([(1, _d("2024-01-01"))], "k long, ts timestamp")
        with pytest.raises(ValueError, match="no attribute"):
            scd2_history(df, "k", "ts")


class TestApply:
    def test_apply_equals_rebuild(self, spark, log):
        """Folding a later snapshot batch into the built dimension
        must equal rebuilding from the concatenated log."""
        dim = scd2_history(log, "cust", "ts")
        batch = spark.createDataFrame(
            [
                (1, _d("2024-07-01"), "bergen", "silver"),  # unchanged
                (2, _d("2024-07-01"), "nice", "gold"),      # changed
                (4, _d("2024-07-01"), "rome", "bronze"),    # new key
            ],
            "cust long, ts timestamp, city string, tier string",
        )
        applied = scd2_apply(dim, batch, "cust", "ts")
        rebuilt = scd2_history(log.unionByName(batch), "cust", "ts")
        key = lambda t: tuple((x is None, str(x)) for x in t)
        norm = lambda df: sorted(
            map(tuple, df.select("cust", "city", "tier", "valid_from",
                                 "valid_to", "is_current").collect()),
            key=key,
        )
        assert norm(applied) == norm(rebuilt)

    def test_apply_counts(self, spark, log):
        dim = scd2_history(log, "cust", "ts")
        batch = spark.createDataFrame(
            [(2, _d("2024-08-01"), "nice", "gold")],
            "cust long, ts timestamp, city string, tier string",
        )
        out = scd2_apply(dim, batch, "cust", "ts")
        assert out.count() == dim.count() + 1  # one closed + one opened
        cur2 = out.filter((F.col("cust") == 2) & F.col("is_current")).first()
        assert cur2["city"] == "nice"
        old2 = out.filter((F.col("cust") == 2) & ~F.col("is_current")).first()
        assert old2["valid_to"] == _d("2024-08-01")

    def test_duplicate_key_batch_collapses_to_latest(self, spark, log):
        """A non-conforming batch (same key twice) must not fan out
        duplicate open versions — it collapses deterministically to
        the latest observation per key (ts desc, attr tie-break)."""
        dim = scd2_history(log, "cust", "ts")
        dup_batch = spark.createDataFrame(
            [
                (2, _d("2024-08-01"), "nice", "gold"),
                (2, _d("2024-09-01"), "lille", "gold"),   # latest wins
                (2, _d("2024-07-01"), "paris", "gold"),
                # tie on ts: attr tuple descending -> 'zurich' beats 'basel'
                (4, _d("2024-08-01"), "basel", "gold"),
                (4, _d("2024-08-01"), "zurich", "gold"),
            ],
            "cust long, ts timestamp, city string, tier string",
        )
        out = scd2_apply(dim, dup_batch, "cust", "ts")
        # exactly ONE open version per key, always
        open_counts = (
            out.filter(F.col("is_current"))
            .groupBy("cust")
            .count()
            .collect()
        )
        assert all(r["count"] == 1 for r in open_counts)
        cur2 = out.filter((F.col("cust") == 2) & F.col("is_current")).first()
        assert cur2["city"] == "lille" and cur2["valid_from"] == _d("2024-09-01")
        cur4 = out.filter((F.col("cust") == 4) & F.col("is_current")).first()
        assert cur4["city"] == "zurich"
        # equal to applying only the collapsed batch
        collapsed = spark.createDataFrame(
            [
                (2, _d("2024-09-01"), "lille", "gold"),
                (4, _d("2024-08-01"), "zurich", "gold"),
            ],
            "cust long, ts timestamp, city string, tier string",
        )
        exp = scd2_apply(dim, collapsed, "cust", "ts")
        norm = lambda df: sorted(
            map(tuple, df.select("cust", "city", "tier", "valid_from",
                                 "valid_to", "is_current").collect()),
            key=str,
        )
        assert norm(out) == norm(exp)
