"""IncrementalTransitions (operators/incremental.py): cross-batch
Markov matrix — exactness vs the one-shot operator on the
concatenated stream, boundary stitching, replay short-circuit, and
late-batch drop accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.eventseq import (
    transition_counts,
)
from harness_aws_etl_pipeline_spark.operators.incremental import (
    IncrementalTransitions,
)

SCHEMA = "u long, t long, e string"

B1 = [(1, 1, "a"), (1, 2, "b"), (2, 1, "a")]
B2 = [(1, 3, "a"), (2, 2, "c"), (3, 1, "b")]
B3 = [(1, 4, "b"), (3, 2, "b"), (3, 3, "a")]


def _it(spark, tmp_path):
    return IncrementalTransitions(
        spark, str(tmp_path / "trans_state"), "u", "t", "e"
    )


class TestIncrementalTransitions:
    def test_matches_one_shot_on_concatenation(self, spark, tmp_path):
        it = _it(spark, tmp_path)
        for i, batch in enumerate((B1, B2, B3)):
            rep = it.process_batch(
                spark.createDataFrame(batch, SCHEMA), txn=("t", i)
            )
            assert rep["skipped"] is False
            assert rep["late_actors"] == 0
        got = {
            (r["prev_state"], r["state"]): (r["cnt"], r["p"])
            for r in it.matrix().collect()
        }
        exp = {
            (r["prev_state"], r["state"]): (r["cnt"], r["p"])
            for r in transition_counts(
                spark.createDataFrame(B1 + B2 + B3, SCHEMA), "u", "t", "e"
            ).collect()
        }
        assert got == exp
        # the boundary steps exist: user1 b(t2)→a(t3) spans B1→B2
        assert got[("b", "a")][0] >= 1

    def test_replay_short_circuits(self, spark, tmp_path):
        it = _it(spark, tmp_path)
        it.process_batch(spark.createDataFrame(B1, SCHEMA), txn=("r", 0))
        v = it.table.current_version()
        rep = it.process_batch(spark.createDataFrame(B1, SCHEMA), txn=("r", 0))
        assert rep["skipped"] is True
        assert it.table.current_version() == v

    def test_late_batch_dropped_and_reported(self, spark, tmp_path):
        it = _it(spark, tmp_path)
        it.process_batch(spark.createDataFrame(B2, SCHEMA), txn=("l", 0))
        # B1 is OLDER than B2 per actor — boundary must not count
        rep = it.process_batch(spark.createDataFrame(B1, SCHEMA), txn=("l", 1))
        assert rep["late_actors"] == 2  # users 1 and 2 regress
        got = {
            (r["prev_state"], r["state"]): r["cnt"]
            for r in it.matrix().collect()
        }
        # B1's within-batch a→b still counted; no bogus a→a boundary
        assert got[("a", "b")] == 1
        assert ("a", "a") not in got

    def test_late_batch_does_not_regress_tails(self, spark, tmp_path):
        """After a late batch, the stored tail must KEEP the newest
        endpoint — the next in-order batch stitches from the fresh
        state, not the late batch's stale one."""
        it = _it(spark, tmp_path)
        # user 1 up to (t=3, 'a')
        it.process_batch(spark.createDataFrame(B2, SCHEMA), txn=("g", 0))
        # late replay of B1 (user 1 ends at t=2 'b') regresses nothing
        rep = it.process_batch(spark.createDataFrame(B1, SCHEMA), txn=("g", 1))
        assert rep["late_actors"] == 2
        # in-order batch: boundary must stitch a(t3)→z, not b(t2)→z
        it.process_batch(
            spark.createDataFrame([(1, 9, "z")], SCHEMA), txn=("g", 2)
        )
        got = {
            (r["prev_state"], r["state"]): r["cnt"]
            for r in it.matrix().collect()
        }
        assert got[("a", "z")] == 1
        assert ("b", "z") not in got

    def test_actor_tails_survive_absent_batches(self, spark, tmp_path):
        it = _it(spark, tmp_path)
        it.process_batch(spark.createDataFrame(B1, SCHEMA), txn=("s", 0))
        # batch without user 2
        it.process_batch(
            spark.createDataFrame([(1, 3, "c")], SCHEMA), txn=("s", 1)
        )
        # user 2 returns two batches later: boundary a→z must stitch
        it.process_batch(
            spark.createDataFrame([(2, 9, "z")], SCHEMA), txn=("s", 2)
        )
        got = {
            (r["prev_state"], r["state"]): r["cnt"]
            for r in it.matrix().collect()
        }
        assert got[("a", "z")] == 1

    def test_empty_state_matrix(self, spark, tmp_path):
        it = _it(spark, tmp_path)
        assert it.matrix().count() == 0


class TestIncrementalEwma:
    """IncrementalEwma: batch-boundary-invisible smoothing — folding
    batches equals timeseries.ewma on the concatenation bit for bit;
    late rows dropped+counted; replay short-circuits."""

    VALS = [10.0, 20.0, 15.0, 7.5, 33.25, 1.0]

    def _batches(self, spark):
        rows = [("g", i, v) for i, v in enumerate(self.VALS)]
        rows += [("h", i, float(i * 2)) for i in range(4)]
        by_batch = [
            [r for r in rows if r[1] < 2],
            [r for r in rows if 2 <= r[1] < 4],
            [r for r in rows if r[1] >= 4],
        ]
        return [
            spark.createDataFrame(b, "g string, t long, v double")
            for b in by_batch
        ]

    def test_equals_batch_operator_on_concatenation(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalEwma,
        )
        from harness_aws_etl_pipeline_spark.operators.timeseries import ewma

        ie = IncrementalEwma(
            spark, str(tmp_path / "ewma_state"), "t", "v", ["g"], alpha=0.3
        )
        got = {}
        for i, b in enumerate(self._batches(spark)):
            rep = ie.process_batch(b, txn=("e", i))
            assert rep["late_rows"] == 0
            for r in rep["smoothed"].collect():
                got[(r["g"], r["t"])] = r["ewma"]
        full = spark.createDataFrame(
            [("g", i, v) for i, v in enumerate(self.VALS)]
            + [("h", i, float(i * 2)) for i in range(4)],
            "g string, t long, v double",
        )
        exp = {
            (r["g"], r["t"]): r["ewma"]
            for r in ewma(full, "t", "v", ["g"], alpha=0.3).collect()
        }
        assert got == exp  # bit-for-bit, across batch boundaries

    def test_replay_and_late_rows(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalEwma,
        )

        ie = IncrementalEwma(
            spark, str(tmp_path / "st"), "t", "v", ["g"], alpha=0.5
        )
        b0 = spark.createDataFrame(
            [("g", 5, 1.0), ("g", 6, 2.0)], "g string, t long, v double"
        )
        ie.process_batch(b0, txn=("r", 0))
        rep = ie.process_batch(b0, txn=("r", 0))
        assert rep["skipped"] is True and rep["smoothed"] is None
        # late rows (t <= stored last_ord=6) dropped and counted
        mixed = spark.createDataFrame(
            [("g", 6, 9.0), ("g", 4, 9.0), ("g", 7, 3.0)],
            "g string, t long, v double",
        )
        rep = ie.process_batch(mixed, txn=("r", 1))
        assert rep["late_rows"] == 2
        sm = {r["t"]: r["ewma"] for r in rep["smoothed"].collect()}
        # continues from s=0.5*2+0.5*1=1.5 → 0.5*3+0.5*1.5
        assert sm == {7: 0.5 * 3.0 + 0.5 * 1.5}

    def test_guards(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalEwma,
        )

        with pytest.raises(ValueError, match="group_cols"):
            IncrementalEwma(spark, str(tmp_path / "x"), "t", "v", [])
        with pytest.raises(ValueError, match="alpha"):
            IncrementalEwma(
                spark, str(tmp_path / "y"), "t", "v", ["g"], alpha=0.0
            )
