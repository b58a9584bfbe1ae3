"""IncrementalQuantiles (operators/incremental.py): exactness while
nothing compresses, sound rank windows under forced compression and
heavy ties, bounded state, and exactly-once replay."""

from __future__ import annotations

import pytest

from harness_aws_etl_pipeline_spark.operators.incremental import (
    IncrementalQuantiles,
)

QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _true_rank(stream, val):
    return sum(1 for x in stream if x <= val)


def _fold(spark, iq, batches, col="v"):
    stream = []
    for b, vals in enumerate(batches):
        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        r = iq.process_batch(df, col, txn=("iq_test", b))
        stream.extend(float(v) for v in vals)
    return stream, r


def _assert_sound(iq, stream):
    # the contract: the TRUE rank of the reported value (count of
    # stream elements <= it — tie mass included, which can push it
    # past the requested target) falls inside [rank_lo, rank_hi]
    n = len(stream)
    for e in iq.quantiles(QS):
        assert e["n"] == n
        true = _true_rank(stream, e["value"])
        assert e["rank_lo"] <= true <= e["rank_hi"], (
            e, true, sorted(stream)[:10]
        )


class TestExactRegime:
    def test_small_batches_stay_exact(self, spark, tmp_path):
        iq = IncrementalQuantiles(
            spark, str(tmp_path / "st"), capacity=256, batch_k=64
        )
        batches = [
            [i * 7 % 50 for i in range(40)],
            [100 + i for i in range(30)],
            [i * 0.5 for i in range(20)],
        ]
        stream, last = _fold(spark, iq, batches)
        assert last["err"] == 0
        srt = sorted(stream)
        import math

        for e in iq.quantiles(QS):
            target = max(1, math.ceil(e["q"] * len(stream)))
            # with err 0 the reported value IS the target order stat
            assert e["value"] == srt[target - 1]
        _assert_sound(iq, stream)


class TestCompressedRegime:
    def test_trim_pressure_bounds_sound(self, spark, tmp_path):
        iq = IncrementalQuantiles(
            spark, str(tmp_path / "st"), capacity=16, batch_k=8
        )
        batches = [
            [(i * 37 + b * 11) % 199 for i in range(100)] for b in range(4)
        ]
        stream, last = _fold(spark, iq, batches)
        assert last["err"] > 0          # compression really fired
        assert last["rows"] <= 16       # state stays bounded
        _assert_sound(iq, stream)

    def test_heavy_ties(self, spark, tmp_path):
        iq = IncrementalQuantiles(
            spark, str(tmp_path / "st"), capacity=8, batch_k=4
        )
        batches = [[5.0] * 60 + [1.0] * 5 + [9.0] * 5 for _ in range(3)]
        stream, _ = _fold(spark, iq, batches)
        _assert_sound(iq, stream)
        med = next(e for e in iq.quantiles([0.5]))
        assert med["value"] == 5.0

    def test_skew_and_outliers(self, spark, tmp_path):
        iq = IncrementalQuantiles(
            spark, str(tmp_path / "st"), capacity=12, batch_k=6
        )
        batches = [
            [0.001 * i for i in range(80)] + [1e6, 1e7],
            [50.0] * 90,
        ]
        stream, _ = _fold(spark, iq, batches)
        _assert_sound(iq, stream)


class TestLifecycle:
    def test_replay_short_circuits(self, spark, tmp_path):
        iq = IncrementalQuantiles(spark, str(tmp_path / "st"))
        df = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
        r1 = iq.process_batch(df, "v", txn=("app", 1))
        r2 = iq.process_batch(df, "v", txn=("app", 1))
        assert r2["skipped"] is True
        assert next(iter(iq.quantiles([0.5])))["n"] == 10
        assert r1["n"] == 10

    def test_nulls_skipped_and_empty_batch(self, spark, tmp_path):
        iq = IncrementalQuantiles(spark, str(tmp_path / "st"))
        df = spark.createDataFrame(
            [(1.0,), (None,), (3.0,)], "v double"
        )
        r = iq.process_batch(df, "v", txn=("app", 1))
        assert r["n"] == 2
        empty = spark.createDataFrame([], "v double")
        r2 = iq.process_batch(empty, "v", txn=("app", 2))
        assert r2["n"] == 2 and r2["skipped"] is False
        # the empty batch still committed its ledger entry
        r3 = iq.process_batch(df, "v", txn=("app", 2))
        assert r3["skipped"] is True

    def test_bad_params_raise(self, spark, tmp_path):
        with pytest.raises(ValueError):
            IncrementalQuantiles(spark, str(tmp_path / "st"), capacity=2)
        iq = IncrementalQuantiles(spark, str(tmp_path / "st"))
        with pytest.raises(ValueError):
            iq.quantiles([1.5])
