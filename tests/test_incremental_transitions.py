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
