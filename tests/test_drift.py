"""Distribution drift (operators/drift.py): exact KS against the
closed-form two-sample statistic, TVD identities (0 on identical, 1 on
disjoint, symmetry), PSI on hand-computable fixtures, χ² shape, empty/
NULL handling, and partitioning invariance of the two-level prefix."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.drift import (
    chi2_drift,
    ks_statistic,
    psi,
    psi_report,
    tvd_drift,
)


def _vals(spark, xs, col="x"):
    return spark.createDataFrame([(float(v),) for v in xs], f"{col} double")


def _cats(spark, xs, col="c"):
    return spark.createDataFrame([(v,) for v in xs], f"{col} string")


def _naive_ks(a, b):
    pts = sorted(set(a) | set(b))
    best = 0.0
    for x in pts:
        f1 = sum(1 for v in a if v <= x) / len(a)
        f2 = sum(1 for v in b if v <= x) / len(b)
        best = max(best, abs(f1 - f2))
    return best


class TestKS:
    def test_matches_naive_definition(self, spark):
        a = [1, 2, 2, 3, 5, 8, 13, 21, 34, 55]
        b = [1, 4, 4, 6, 9, 9, 10, 30]
        r = ks_statistic(_vals(spark, a), _vals(spark, b), "x").first()
        assert r["n_ref"] == len(a) and r["n_cur"] == len(b)
        assert r["ks"] == pytest.approx(_naive_ks(a, b), abs=1e-12)
        assert int(r["ks_num"]) == round(r["ks"] * len(a) * len(b))

    def test_identical_is_zero_and_disjoint_is_one(self, spark):
        a = _vals(spark, [1, 2, 3, 4, 5])
        assert ks_statistic(a, _vals(spark, [1, 2, 3, 4, 5]), "x").first()["ks"] == 0.0
        assert (
            ks_statistic(a, _vals(spark, [10, 11, 12]), "x").first()["ks"] == 1.0
        )

    def test_partitioning_invariance(self, spark):
        import random

        rng = random.Random(7)
        a = [rng.gauss(0, 1) for _ in range(500)]
        b = [rng.gauss(0.4, 1.2) for _ in range(400)]
        base = ks_statistic(_vals(spark, a), _vals(spark, b), "x").first()
        alt = ks_statistic(
            _vals(spark, a).repartition(17),
            _vals(spark, b).repartition(3),
            "x",
            num_range_parts=5,
        ).first()
        assert int(base["ks_num"]) == int(alt["ks_num"])
        assert base["ks"] == alt["ks"]
        assert base["ks"] == pytest.approx(_naive_ks(a, b), abs=1e-12)

    def test_nulls_excluded_and_empty_side_null(self, spark):
        a = spark.createDataFrame([(1.0,), (None,), (2.0,)], "x double")
        b = spark.createDataFrame([(None,)], "x double")
        r = ks_statistic(a, b, "x").first()
        assert r["n_ref"] == 2 and r["n_cur"] == 0 and r["ks"] is None
        both = ks_statistic(b, b, "x").first()
        assert both["n_ref"] == 0 and both["ks"] is None


class TestTVD:
    def test_identities(self, spark):
        a = _cats(spark, ["a", "a", "b", "c"])
        same = tvd_drift(a, _cats(spark, ["a", "a", "b", "c"]), "c").first()
        assert same["tvd"] == 0.0
        disj = tvd_drift(a, _cats(spark, ["z", "z"]), "c").first()
        assert disj["tvd"] == 1.0

    def test_exact_value_and_symmetry(self, spark):
        a = _cats(spark, ["a"] * 3 + ["b"] * 1)          # p = (.75, .25, 0)
        b = _cats(spark, ["a"] * 1 + ["b"] * 2 + ["c"])  # q = (.25, .5, .25)
        r = tvd_drift(a, b, "c").first()
        assert r["tvd"] == pytest.approx(0.5, abs=1e-12)  # .5*(0.5+.25+.25)
        assert int(r["tvd_num"]) == 16  # |3*4-1*4| + |1*4-2*4| + |0-1*4|
        s = tvd_drift(b, a, "c").first()
        assert s["tvd"] == r["tvd"]

    def test_empty_side(self, spark):
        a = _cats(spark, ["a"])
        e = spark.createDataFrame([], "c string")
        assert tvd_drift(a, e, "c").first()["tvd"] is None


class TestPSI:
    def test_zero_on_identical(self, spark):
        a = _vals(spark, range(100))
        r = psi(a, _vals(spark, range(100)), "x", bins=10).first()
        assert r["psi"] == pytest.approx(0.0, abs=1e-9)

    def test_hand_computed_two_bins(self, spark):
        # ref: 50/50 over [0,1); cur: 80/20 -> psi = (.3)ln(.8/.5)+(-.3)ln(.2/.5)
        ref = _vals(spark, [0.1] * 5 + [0.9] * 5)
        cur = _vals(spark, [0.1] * 8 + [0.9] * 2)
        exp = 0.3 * math.log(0.8 / 0.5) + (-0.3) * math.log(0.2 / 0.5)
        r = psi(ref, cur, "x", bins=2, lo=0.0, hi=1.0).first()
        assert r["psi"] == pytest.approx(exp, rel=1e-9)

    def test_report_grid_from_reference_and_clamping(self, spark):
        ref = _vals(spark, [0, 1, 2, 3, 4])
        cur = _vals(spark, [-5, 9, 2])  # outside ref bounds -> edge bins
        rep = psi_report(ref, cur, "x", bins=4).collect()
        assert len(rep) == 4
        assert sum(r["ref_cnt"] for r in rep) == 5
        assert sum(r["cur_cnt"] for r in rep) == 3
        assert rep[0]["cur_cnt"] >= 1 and rep[-1]["cur_cnt"] >= 1

    def test_empty_reference_raises(self, spark):
        e = spark.createDataFrame([], "x double")
        with pytest.raises(ValueError, match="no non-NULL"):
            psi_report(e, _vals(spark, [1.0]), "x")


class TestChi2:
    def test_zero_on_identical_and_positive_on_shift(self, spark):
        a = _cats(spark, ["a"] * 30 + ["b"] * 20)
        same = chi2_drift(a, _cats(spark, ["a"] * 30 + ["b"] * 20), "c").first()
        assert same["chi2"] == pytest.approx(0.0, abs=1e-9)
        assert same["dof"] == 1 and same["categories"] == 2
        moved = chi2_drift(a, _cats(spark, ["a"] * 5 + ["b"] * 45), "c").first()
        assert moved["chi2"] > 10

    def test_single_category_null(self, spark):
        a = _cats(spark, ["a", "a"])
        assert chi2_drift(a, _cats(spark, ["a"]), "c").first()["chi2"] is None


class TestCli:
    def test_drift_cli_numeric_and_categorical(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main

        ref, cur = str(tmp_path / "ref"), str(tmp_path / "cur")
        _vals(spark, [1, 2, 3, 4, 5, 6, 7, 8]).write.parquet(ref)
        _vals(spark, [5, 6, 7, 8, 9, 10]).write.parquet(cur)
        rc = main(["drift", "--reference", ref, "--current", cur,
                   "--col", "x", "--bins", "4"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["n_ref"] == 8 and res["n_cur"] == 6
        assert 0 < res["ks"] <= 1 and len(res["bins"]) == 4
        refc, curc = str(tmp_path / "refc"), str(tmp_path / "curc")
        _cats(spark, ["a", "a", "b"]).write.parquet(refc)
        _cats(spark, ["b", "b", "c"]).write.parquet(curc)
        rc = main(["drift", "--reference", refc, "--current", curc,
                   "--col", "c", "--kind", "categorical"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["tvd"] == pytest.approx(2.0 / 3.0, abs=1e-12)
        assert res["categories"] == 3 and res["dof"] == 2


class TestDriftCells:
    def test_exact_contingency_table(self, spark):
        from harness_aws_etl_pipeline_spark.operators.drift import (
            chi2_drift,
            drift_cells,
        )

        ref = spark.createDataFrame(
            [("a",), ("a",), ("b",), (None,)], "v string"
        )
        cur = spark.createDataFrame([("a",), ("c",)], "v string")
        got = {
            r["value"]: (r["ref_cnt"], r["cur_cnt"])
            for r in drift_cells(ref, cur, "v").collect()
        }
        assert got == {"a": (2, 1), "b": (1, 0), "c": (0, 1)}
        # chi2 consumes the same table: categories count agrees
        assert chi2_drift(ref, cur, "v").first()["categories"] == 3


class TestIncrementalDrift:
    def test_folding_equals_one_shot(self, spark, tmp_path):
        """Cells after N batches == drift_cells(ref, concat(batches));
        report matches tvd_drift / chi2_drift on the same frames."""
        from harness_aws_etl_pipeline_spark.operators.drift import (
            chi2_drift,
            drift_cells,
            tvd_drift,
        )
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalDrift,
        )

        ref = spark.createDataFrame(
            [("a",)] * 5 + [("b",)] * 3 + [(None,)], "v string"
        )
        b1 = spark.createDataFrame([("a",), ("a",), ("c",)], "v string")
        b2 = spark.createDataFrame([("b",), ("c",), (None,)], "v string")
        mon = IncrementalDrift(spark, str(tmp_path / "drift"), "v")
        mon.set_reference(ref, txn=("d", 0))
        mon.process_batch(b1, txn=("d", 1))
        mon.process_batch(b2, txn=("d", 2))
        got = {
            r["value"]: (r["ref_cnt"], r["cur_cnt"])
            for r in mon.cells().collect()
        }
        want = {
            r["value"]: (r["ref_cnt"], r["cur_cnt"])
            for r in drift_cells(ref, b1.unionByName(b2), "v").collect()
        }
        assert got == want
        rep = mon.report().first()
        tv = tvd_drift(ref, b1.unionByName(b2), "v").first()
        ch = chi2_drift(ref, b1.unionByName(b2), "v").first()
        assert rep["tvd_num"] == tv["tvd_num"]
        assert rep["tvd"] == tv["tvd"]
        assert abs(rep["chi2"] - ch["chi2"]) < 1e-12
        assert rep["categories"] == ch["categories"]

    def test_replay_short_circuits_and_reference_reset(
        self, spark, tmp_path
    ):
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalDrift,
        )

        mon = IncrementalDrift(spark, str(tmp_path / "d2"), "v")
        ref = spark.createDataFrame([("a",), ("b",)], "v string")
        mon.set_reference(ref, txn=("r", 0))
        b = spark.createDataFrame([("a",)], "v string")
        r1 = mon.process_batch(b, txn=("r", 1))
        assert r1["skipped"] is False
        v = mon.table.current_version()
        r2 = mon.process_batch(b, txn=("r", 1))  # replay
        assert r2["skipped"] is True
        assert mon.table.current_version() == v
        # new reference resets the accumulated current side
        mon.set_reference(ref, txn=("r", 2))
        assert mon.report().first()["n_cur"] == 0

    def test_requires_reference(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalDrift,
        )

        mon = IncrementalDrift(spark, str(tmp_path / "d3"), "v")
        b = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError, match="set_reference"):
            mon.process_batch(b, txn=("x", 0))


class TestIncrementalDriftStreaming:
    def test_foreach_batch_monitor_end_to_end(self, spark, tmp_path):
        """readStream → foreachBatch(process_batch) with AvailableNow:
        the monitor folds a real micro-batch stream, and re-running
        the same stream over a fresh checkpoint replays into the txn
        ledger short-circuit instead of double-counting."""
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalDrift,
        )

        mon = IncrementalDrift(spark, str(tmp_path / "dstate"), "v")
        mon.set_reference(
            spark.createDataFrame(
                [("a",)] * 3 + [("b",)], "v string"
            ),
            txn=("stream-drift-ref", 0),
        )
        src = tmp_path / "src"
        src.mkdir()
        spark.createDataFrame(
            [("a",), ("c",), ("c",)], "v string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))

        def fold(batch_df, batch_id):
            mon.process_batch(batch_df, txn=("stream-drift", batch_id))

        def run(ckpt):
            q = (
                spark.readStream.schema("v string")
                .parquet(str(src / "b0"))
                .writeStream.foreachBatch(fold)
                .option("checkpointLocation", str(tmp_path / ckpt))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run("ckpt1")
        rep1 = mon.report().first()
        assert (rep1["n_ref"], rep1["n_cur"]) == (4, 3)
        v = mon.table.current_version()
        # same data, FRESH checkpoint → same batch_id 0 → ledger skip
        run("ckpt2")
        rep2 = mon.report().first()
        assert (rep2["n_ref"], rep2["n_cur"]) == (4, 3)
        assert mon.table.current_version() == v


class TestGridBin:
    def test_cells_match_histogram_and_clamp(self, spark):
        from harness_aws_etl_pipeline_spark.operators.drift import grid_bin
        from harness_aws_etl_pipeline_spark.operators.histogram import (
            histogram,
        )

        df = spark.createDataFrame(
            [(v,) for v in (0.0, 2.5, 9.99, -5.0, 15.0, None)],
            "v double",
        )
        got = [
            r[0]
            for r in df.select(grid_bin("v", 0.0, 10.0, 4)).collect()
        ]
        assert got == [0, 1, 3, 0, 3, None]  # clamped edges, NULL kept
        # per-bin counts equal histogram's with the same pinned bounds
        h = {
            r["bin"]: r["cnt"]
            for r in histogram(df, "v", bins=4, lo=0.0, hi=10.0).collect()
        }
        from collections import Counter

        assert Counter(x for x in got if x is not None) == {
            b: c for b, c in h.items() if c
        }

    def test_numeric_monitor_composition(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.drift import grid_bin
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalDrift,
        )

        mon = IncrementalDrift(spark, str(tmp_path / "num"), "bin")
        ref = spark.createDataFrame(
            [(float(v),) for v in range(10)], "x double"
        ).select(grid_bin("x", 0.0, 10.0, 5).alias("bin"))
        mon.set_reference(ref, txn=("n", 0))
        cur = spark.createDataFrame(
            [(9.0,), (9.5,), (99.0,)], "x double"
        ).select(grid_bin("x", 0.0, 10.0, 5).alias("bin"))
        mon.process_batch(cur, txn=("n", 1))
        cells = {
            r["value"]: (r["ref_cnt"], r["cur_cnt"])
            for r in mon.cells().collect()
        }
        assert cells["4"] == (2, 3)  # 8,9 ref; 9,9.5,clamped-99 cur
        assert mon.report().first()["tvd"] > 0

    def test_guards(self, spark):
        import pytest as _pytest

        from harness_aws_etl_pipeline_spark.operators.drift import grid_bin

        with _pytest.raises(ValueError):
            grid_bin("v", 1.0, 1.0)
        with _pytest.raises(ValueError):
            grid_bin("v", 0.0, 1.0, 0)
