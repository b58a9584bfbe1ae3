"""Incremental corpus dedup: batch-vs-state LSH gatekeeping with
snapshot-table signature state and exactly-once batch commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.incremental import (
    IncrementalDeduper,
)

from tests.tiers import deep

LOREM = (
    "the quick brown fox jumps over the lazy dog while the rain "
    "in spain stays mainly in the plain and every good boy does fine "
)
OTHER = (
    "completely different content about spark catalyst optimizer "
    "rules and adaptive query execution planning with shuffle "
    "partition coalescing and broadcast join thresholds tuned well "
)
THIRD = (
    "a third unrelated passage mentions minhash signatures locality "
    "sensitive hashing banding buckets jaccard similarity estimation "
    "and connected components over candidate duplicate pairs today "
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture
def dd(spark, tmp_path):
    return IncrementalDeduper(
        spark, str(tmp_path / "state"), threshold=0.5
    )


class TestIncrementalDedup:
    def test_first_batch_all_accepted(self, spark, dd):
        out = dd.process_batch(
            _docs(spark, [(1, LOREM), (2, OTHER)])
        )
        assert sorted(
            r["doc_id"] for r in out["accepted_ids"].collect()
        ) == [1, 2]
        assert out["dups_vs_state"].count() == 0
        assert out["skipped"] is False
        assert dd.table.count_rows() == 2

    def test_cross_batch_dup_detected_and_rejected(self, spark, dd):
        dd.process_batch(_docs(spark, [(1, LOREM), (2, OTHER)]))
        # batch 2: near-copy of doc 1 (one word changed), plus new doc
        near = LOREM.replace("lazy", "sleepy")
        out = dd.process_batch(_docs(spark, [(10, near), (11, THIRD)]))
        assert [r["doc_id"] for r in out["accepted_ids"].collect()] == [11]
        dups = out["dups_vs_state"].collect()
        assert len(dups) == 1
        assert (dups[0]["doc_id"], dups[0]["state_id"]) == (10, 1)
        assert dups[0]["est_jaccard"] >= 0.5
        # state took only the survivor
        assert dd.table.count_rows() == 3

    def test_batch_internal_dup_keeps_min_id(self, spark, dd):
        out = dd.process_batch(
            _docs(spark, [(5, LOREM), (3, LOREM), (7, OTHER)])
        )
        assert sorted(
            r["doc_id"] for r in out["accepted_ids"].collect()
        ) == [3, 7]
        losers = {
            r["doc_id"]: r["kept_id"] for r in out["dups_in_batch"].collect()
        }
        assert losers == {5: 3}

    def test_short_docs_bypass_unsigned(self, spark, dd):
        out = dd.process_batch(
            _docs(spark, [(1, LOREM), (2, "too short")])
        )
        assert [r["doc_id"] for r in out["unsigned_ids"].collect()] == [2]
        assert [r["doc_id"] for r in out["accepted_ids"].collect()] == [1]
        assert dd.table.count_rows() == 1

    def test_replayed_batch_short_circuits(self, spark, dd):
        dd.process_batch(
            _docs(spark, [(1, LOREM)]), txn=("appX", 0)
        )
        out = dd.process_batch(
            _docs(spark, [(1, LOREM)]), txn=("appX", 0)
        )
        assert out["skipped"] is True
        assert dd.table.count_rows() == 1
        # and the version did not advance
        assert out["state_version"] == 0

    def test_three_batches_growing_state(self, spark, dd):
        dd.process_batch(_docs(spark, [(1, LOREM)]), txn=("a", 0))
        dd.process_batch(_docs(spark, [(2, OTHER)]), txn=("a", 1))
        near3 = THIRD.replace("today", "tomorrow")
        dd.process_batch(_docs(spark, [(3, THIRD)]), txn=("a", 2))
        out = dd.process_batch(
            _docs(spark, [(9, near3), (10, LOREM + OTHER)]), txn=("a", 3)
        )
        dups = {r["doc_id"]: r["state_id"] for r in out["dups_vs_state"].collect()}
        assert dups == {9: 3}, "dup found against a THREE-batch-old state"
        assert dd.table.count_rows() == 4
        # the evidence trail survives in table history
        assert [h["operation"] for h in dd.table.history()][-1] == "append"

    def test_bad_band_config_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError, match="divide evenly"):
            IncrementalDeduper(
                spark, str(tmp_path / "x"), num_hashes=64, bands=7
            )


class TestEmptyBatchDtypes:
    """Regression pins for the all-rows-skipped Arrow dtype bug: a
    mapInPandas batch that drops every row must still yield
    schema-compatible (object-dtyped) empty columns."""

    def test_all_short_docs_partition(self, spark):
        from harness_aws_etl_pipeline_spark.operators.dedup_fuzzy import (
            hashed_shingle_sets,
            minhash_signatures,
        )

        docs = spark.createDataFrame(
            [(i, "tiny") for i in range(8)], "doc_id long, text string"
        ).repartition(4)
        assert minhash_signatures(docs).count() == 0
        assert minhash_signatures(docs, hash_fn="md5").count() == 0
        # shingle sets keep short docs as empty-set rows (by design) —
        # the hazard is only the Arrow cast, which this exercises too
        sh = hashed_shingle_sets(docs)
        assert sh.count() == 8
        assert sh.filter("set_size != 0").count() == 0

    def test_all_null_payload_frames(self, spark):
        from harness_aws_etl_pipeline_spark.operators.multimodal import (
            sample_frames,
        )

        df = spark.createDataFrame(
            [(1, "video/ppm-seq", None), (2, "video/ppm-seq", None)],
            "media_id long, modality string, payload binary",
        ).repartition(2)
        assert sample_frames(df, decode=True).count() == 0


class TestIncrementalEmbeddingDedup:
    @pytest.fixture
    def ed(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalEmbeddingDeduper,
        )

        return IncrementalEmbeddingDeduper(
            spark, str(tmp_path / "estate"), threshold=0.9, dim=8
        )

    @staticmethod
    def _vecs(spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_cross_batch_vector_dup(self, spark, ed):
        v1 = [1.0, 0.0, 0.5, 0.2, 0.0, 0.9, 0.1, 0.3]
        v2 = [0.0, 1.0, 0.0, 0.8, 0.2, 0.0, 0.7, 0.0]
        out1 = ed.process_batch(self._vecs(spark, [(1, v1), (2, v2)]))
        assert sorted(r["vec_id"] for r in out1["accepted_ids"].collect()) == [1, 2]
        near = [x + 0.001 for x in v1]
        ortho = [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0]
        out2 = ed.process_batch(self._vecs(spark, [(10, near), (11, ortho)]))
        assert [r["vec_id"] for r in out2["accepted_ids"].collect()] == [11]
        dups = out2["dups_vs_state"].collect()
        assert len(dups) == 1 and dups[0]["state_id"] == 1
        assert dups[0]["cosine"] >= 0.9
        assert ed.table.count_rows() == 3

    def test_internal_vector_dup_keeps_min(self, spark, ed):
        v = [0.3, 0.1, 0.9, 0.0, 0.5, 0.5, 0.2, 0.8]
        w = [0.9, 0.0, 0.0, 0.1, 0.0, 0.0, 0.8, 0.0]
        out = ed.process_batch(
            self._vecs(spark, [(7, v), (4, [x * 2 for x in v]), (9, w)])
        )
        # cosine(v, 2v) == 1 → same cluster, min id 4 kept
        assert sorted(r["vec_id"] for r in out["accepted_ids"].collect()) == [4, 9]
        losers = {r["vec_id"]: r["kept_id"] for r in out["dups_in_batch"].collect()}
        assert losers == {7: 4}

    def test_replay_short_circuits(self, spark, ed):
        v = [1.0] * 8
        ed.process_batch(self._vecs(spark, [(1, v)]), txn=("e", 0))
        out = ed.process_batch(self._vecs(spark, [(1, v)]), txn=("e", 0))
        assert out["skipped"] is True
        assert ed.table.count_rows() == 1


class TestStreamingGate:
    def test_foreach_batch_gate_end_to_end(self, spark, tmp_path):
        """readStream → foreachBatch(process_batch) with AvailableNow:
        the gate consumes a real micro-batch stream, and re-running
        the same stream over a fresh checkpoint replays the batch into
        the txn ledger short-circuit instead of double-counting."""
        import pyspark.sql.functions as F

        dd = IncrementalDeduper(spark, str(tmp_path / "sstate"))
        src = tmp_path / "src"
        src.mkdir()
        spark.createDataFrame(
            [(1, LOREM), (2, OTHER)], "doc_id long, text string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))

        def gate(batch_df, batch_id):
            dd.process_batch(batch_df, txn=("stream-gate", batch_id))

        def run(ckpt):
            q = (
                spark.readStream.schema("doc_id long, text string")
                .parquet(str(src / "b0"))
                .writeStream.foreachBatch(gate)
                .option("checkpointLocation", str(tmp_path / ckpt))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run("ckpt1")
        assert dd.table.count_rows() == 2
        # same data, FRESH checkpoint → same batch_id 0 → ledger skip
        run("ckpt2")
        assert dd.table.count_rows() == 2
        assert dd.table.current_version() == 0


class TestMaintain:
    @deep
    def test_maintain_compacts_daily_buildup(self, spark, dd):
        for i in range(6):
            doc = (i + 1) * 1000
            text = " ".join(f"w{i}x{j}" for j in range(40))  # distinct/batch
            dd.process_batch(
                _docs(spark, [(doc, text)]), txn=("daily", i)
            )
        files_before = len(
            dd.table.manifest(dd.table.current_version())["files"]
        )
        assert files_before >= 4, "daily appends must accumulate files"
        rows_before = dd.table.count_rows()
        # keep_last=1: the pre-compact snapshot still references every
        # daily txn dir, so only dropping it frees them for vacuum
        out = dd.maintain(keep_last=1, vacuum_min_age_seconds=0)
        assert out["compacted"] == files_before
        assert out["dirs_vacuumed"] >= 1
        assert dd.table.count_rows() == rows_before
        # the ledger survives maintenance: replays still short-circuit
        replay = dd.process_batch(
            _docs(spark, [(1000, LOREM)]), txn=("daily", 0)
        )
        assert replay["skipped"] is True


class TestSimhashJoin:
    def test_cross_corpus_simhash(self, spark):
        from harness_aws_etl_pipeline_spark.operators.dedup_fuzzy import (
            simhash_join,
        )

        left = _docs(
            spark,
            [(1, LOREM), (2, OTHER)],
        )
        right = _docs(
            spark,
            [(10, LOREM.replace("lazy", "sleepy")), (11, THIRD), (12, LOREM)],
        )
        got = {
            (r["left_id"], r["right_id"]): r["hamming"]
            # band_bits=8 → 8 bands → guaranteed recall for hamming ≤ 7
            for r in simhash_join(
                left, right, max_hamming=7, band_bits=8
            ).collect()
        }
        assert (1, 12) in got and got[(1, 12)] == 0, "exact copy at hamming 0"
        # one word changed out of ~30 flips the bits whose token-vote
        # margin was 1 — measured hamming 7 for this pair (deterministic)
        assert got.get((1, 10)) == 7
        assert all(k[0] != 2 for k in got), "OTHER matches nothing"

    def test_empty_docs_do_not_cross_pair(self, spark):
        from harness_aws_etl_pipeline_spark.operators.dedup_fuzzy import (
            simhash_join,
        )

        left = _docs(spark, [(i, "") for i in range(30)] + [(100, LOREM)])
        right = _docs(spark, [(i + 1000, "") for i in range(30)])
        # zero-sketch empties all land in one band key per band; the
        # occupancy cap (here: below 30) must suppress the 30x30 blowup
        got = simhash_join(left, right, max_bucket_size=10).collect()
        assert got == []


    def test_pigeonhole_guarantee_enforced(self, spark):
        from harness_aws_etl_pipeline_spark.operators.dedup_fuzzy import (
            simhash_join,
        )

        left = _docs(spark, [(1, LOREM)])
        with pytest.raises(ValueError, match="recall guarantee"):
            # 4 bands guarantee only hamming <= 3
            simhash_join(left, left, max_hamming=8, band_bits=16)
        with pytest.raises(ValueError, match="divide 64"):
            simhash_join(left, left, max_hamming=3, band_bits=12)


class TestMaintainFreshGate:
    def test_maintain_before_first_batch_is_noop(self, spark, tmp_path):
        dd = IncrementalDeduper(spark, str(tmp_path / "fresh"))
        out = dd.maintain()
        assert out == {
            "compacted": 0,
            "snapshots_expired": 0,
            "dirs_vacuumed": 0,
            "version": None,
        }


class TestIncrementalSpanDeduper:
    BOILER = " ".join(f"sb{i}" for i in range(12))

    def _dd(self, spark, tmp_path, name="spanstate"):
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalSpanDeduper,
        )

        return IncrementalSpanDeduper(spark, str(tmp_path / name), k=8)

    def test_batch_internal_and_cross_batch(self, spark, tmp_path):
        dd = self._dd(spark, tmp_path)
        b1 = spark.createDataFrame(
            [
                (1, " ".join(f"u{i}" for i in range(6)) + " " + self.BOILER),
                (2, " ".join(f"v{i}" for i in range(6)) + " " + self.BOILER),
            ],
            "doc_id long, text string",
        )
        out1 = dd.process_batch(b1, txn=("t", 0))
        texts1 = {r.doc_id: r.text for r in out1["cleaned"].collect()}
        assert self.BOILER in texts1[1]          # canonical first kept
        assert self.BOILER not in texts1[2]      # batch-internal copy cut
        assert out1["new_grams"] > 0

        # batch 2: one doc repeating the passage (cut vs STATE), one new
        b2 = spark.createDataFrame(
            [
                (10, " ".join(f"w{i}" for i in range(6)) + " " + self.BOILER),
                (11, " ".join(f"x{i}" for i in range(20))),
            ],
            "doc_id long, text string",
        )
        out2 = dd.process_batch(b2, txn=("t", 1))
        texts2 = {r.doc_id: r.text for r in out2["cleaned"].collect()}
        assert self.BOILER not in texts2[10]
        assert texts2[10].startswith("w0")
        assert texts2[11] == " ".join(f"x{i}" for i in range(20))

    def test_replay_short_circuits(self, spark, tmp_path):
        dd = self._dd(spark, tmp_path, "spanstate2")
        b = spark.createDataFrame(
            [(1, " ".join(f"y{i}" for i in range(10)))],
            "doc_id long, text string",
        )
        out1 = dd.process_batch(b, txn=("app", 7))
        v1 = out1["state_version"]
        out2 = dd.process_batch(b, txn=("app", 7))
        assert out2["skipped"] is True
        assert out2["state_version"] == v1

    def test_new_grams_not_recommitted(self, spark, tmp_path):
        dd = self._dd(spark, tmp_path, "spanstate3")
        b = spark.createDataFrame(
            [(1, " ".join(f"z{i}" for i in range(10)))],
            "doc_id long, text string",
        )
        out1 = dd.process_batch(b, txn=("a", 0))
        # identical content, new txn: every gram already in state
        b2 = spark.createDataFrame(
            [(2, " ".join(f"z{i}" for i in range(10)))],
            "doc_id long, text string",
        )
        out2 = dd.process_batch(b2, txn=("a", 1))
        assert out1["new_grams"] == 3            # 10 tokens, k=8 -> 3 windows
        assert out2["new_grams"] == 0
        # and the duplicate content is fully cut
        (r,) = out2["cleaned"].collect()
        assert r.text == ""

    @deep

    def test_track_hits_prune_plateaus_state_keeps_boilerplate(
        self, spark, tmp_path
    ):
        """Long-run state-growth bound: with track_hits + singleton-age
        pruning the state PLATEAUS (each batch adds singleton grams,
        maintain() drops the aged-out ones) while planted recurring
        boilerplate — whose last_seq keeps advancing — is never pruned
        and keeps being caught in every batch."""
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalSpanDeduper,
        )

        dd = IncrementalSpanDeduper(
            spark, str(tmp_path / "spanstate5"), k=8, track_hits=True
        )
        boiler = " ".join(f"bb{i}" for i in range(8))  # exactly one gram
        sizes, pruned_total = [], 0
        for b in range(8):
            uniq = " ".join(f"u{b}x{i}" for i in range(8))
            docs = spark.createDataFrame(
                [(b * 10 + 1, f"{uniq} {boiler}")], "doc_id long, text string"
            )
            out = dd.process_batch(docs, txn=("lr", b))
            (row,) = out["cleaned"].collect()
            if b == 0:
                assert "bb0" in row.text  # canonical first kept
            else:
                assert "bb0" not in row.text  # boilerplate still caught
                assert out["hit_grams"] >= 1
            m = dd.maintain(
                prune_singletons_older_than=3,
                keep_last=1,
                vacuum_min_age_seconds=0,
            )
            pruned_total += m["pruned_grams"]
            sizes.append(dd.table.count_rows())
        assert pruned_total > 0
        # steady state: the last three sizes are flat (no linear growth)
        assert sizes[-1] == sizes[-2] == sizes[-3], sizes
        # and far below the unpruned footprint (9 grams/batch * 8)
        assert sizes[-1] < 60, sizes
        # the recurring gram is still in state (refreshed, not pruned)
        state = dd.state_grams()
        assert state.filter(F.col("last_seq") > F.col("batch_seq")).count() >= 1

    def test_track_hits_replay_short_circuits(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalSpanDeduper,
        )

        dd = IncrementalSpanDeduper(
            spark, str(tmp_path / "spanstate6"), k=8, track_hits=True
        )
        b = spark.createDataFrame(
            [(1, " ".join(f"r{i}" for i in range(10)))],
            "doc_id long, text string",
        )
        out1 = dd.process_batch(b, txn=("th", 0))
        out2 = dd.process_batch(b, txn=("th", 0))
        assert out2["skipped"] is True
        assert out2["state_version"] == out1["state_version"]

    def test_pre_commit_sees_cleaned(self, spark, tmp_path):
        dd = self._dd(spark, tmp_path, "spanstate4")
        seen = {}
        b = spark.createDataFrame(
            [(1, " ".join(f"q{i}" for i in range(10)))],
            "doc_id long, text string",
        )
        dd.process_batch(
            b, txn=("h", 0), pre_commit=lambda df: seen.update(n=df.count())
        )
        assert seen["n"] == 1


class TestIncrementalHeavyHitters:
    def _ihh(self, spark, tmp_path, capacity=1024):
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalHeavyHitters,
        )

        return IncrementalHeavyHitters(
            spark, str(tmp_path / "hh_state"), capacity=capacity
        )

    def test_exact_regime_equals_running_groupby(self, spark, tmp_path):
        ihh = self._ihh(spark, tmp_path)
        b1 = spark.createDataFrame(
            [("a",)] * 5 + [("b",)] * 3 + [("c",)], "k string"
        ).repartition(3)
        b2 = spark.createDataFrame(
            [("b",)] * 4 + [("d",)] * 2, "k string"
        ).repartition(2)
        ihh.process_batch(b1, "k", txn=("t", 0))
        out = ihh.process_batch(b2, "k", txn=("t", 1))
        assert out["floor"] == 0 and out["tracked_keys"] == 4
        top = {r["key"]: r for r in ihh.top(4).collect()}
        # running exact counts: b=7, a=5, d=2, c=1
        for key, cnt in (("b", 7), ("a", 5), ("d", 2), ("c", 1)):
            assert top[key]["count_min"] == top[key]["count_max"] == cnt
        ranks = [r["key"] for r in ihh.top(4).collect()]
        assert ranks == ["b", "a", "d", "c"]
        assert all(r["guaranteed"] for r in ihh.top(2).collect())

    def test_replay_short_circuits(self, spark, tmp_path):
        ihh = self._ihh(spark, tmp_path)
        b = spark.createDataFrame([("x",)] * 3, "k string")
        ihh.process_batch(b, "k", txn=("app", 7))
        v = ihh.table.current_version()
        replay = ihh.process_batch(b, "k", txn=("app", 7))
        assert replay["skipped"] and ihh.table.current_version() == v
        assert ihh.top(1).first()["count_max"] == 3  # not double-counted

    def test_bounds_sound_under_trim_pressure(self, spark, tmp_path):
        # capacity 4 with 30 distinct keys per batch: state must trim
        # every batch, yet the hot key's true count stays inside
        # [count_min, count_max] and untracked keys stay under floor
        ihh = self._ihh(spark, tmp_path, capacity=4)
        import random

        rng = random.Random(7)
        true_counts: dict[str, int] = {}
        for b in range(4):
            rows = [("hot",)] * 50
            for i in range(60):
                rows.append((f"k{rng.randrange(30)}",))
            for (k,) in rows:
                true_counts[k] = true_counts.get(k, 0) + 1
            df = spark.createDataFrame(rows, "k string").repartition(3)
            out = ihh.process_batch(df, "k", txn=("p", b))
            assert out["tracked_keys"] <= 4
        state = {
            r["key"]: r
            for r in ihh.state_summary().where("NOT is_floor").collect()
        }
        floor = ihh.state_summary().where("is_floor").first()["cnt"]
        assert "hot" in state, "the true heavy hitter must survive trims"
        hot = state["hot"]
        assert hot["cnt"] - hot["err"] <= true_counts["hot"] <= hot["cnt"]
        for k, true in true_counts.items():
            if k not in state:
                assert true <= floor, (k, true, floor)

    def test_weighted_and_empty_batch(self, spark, tmp_path):
        ihh = self._ihh(spark, tmp_path)
        df = spark.createDataFrame([("u", 10), ("v", 1)], "k string, w int")
        ihh.process_batch(df, "k", weight="w", txn=("w", 0))
        empty = spark.createDataFrame([], "k string, w int")
        out = ihh.process_batch(empty, "k", weight="w", txn=("w", 1))
        assert not out["skipped"]
        top = ihh.top(2).collect()
        assert [(r["key"], r["count_max"]) for r in top] == [("u", 10), ("v", 1)]

    def test_maintain_before_first_batch(self, spark, tmp_path):
        ihh = self._ihh(spark, tmp_path)
        rep = ihh.maintain()
        assert rep["version"] is None

    def test_foreach_batch_stream_end_to_end(self, spark, tmp_path):
        """readStream → foreachBatch(process_batch) with AvailableNow:
        the sketch folds a real micro-batch stream, and replaying the
        same stream over a fresh checkpoint hits the txn ledger
        short-circuit instead of double-counting."""
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalHeavyHitters,
        )

        ihh = IncrementalHeavyHitters(spark, str(tmp_path / "hh_sstate"))
        src = tmp_path / "hh_src"
        src.mkdir()
        spark.createDataFrame(
            [("a",)] * 6 + [("b",)] * 2, "k string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / "b0"))

        def fold(batch_df, batch_id):
            ihh.process_batch(batch_df, "k", txn=("hh-stream", batch_id))

        def run(ckpt):
            q = (
                spark.readStream.schema("k string")
                .parquet(str(src / "b0"))
                .writeStream.foreachBatch(fold)
                .option("checkpointLocation", str(tmp_path / ckpt))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run("hck1")
        assert ihh.top(1).first()["count_max"] == 6
        run("hck2")  # fresh checkpoint: same batch_id 0 → ledger skip
        assert ihh.top(1).first()["count_max"] == 6  # not 12


class TestIncrementalDistinct:
    def test_fold_equals_one_shot_sketch(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalDistinct,
        )
        from harness_aws_etl_pipeline_spark.operators.kmv import kmv_sketch

        k = 16
        d = IncrementalDistinct(spark, str(tmp_path / "kmv"), "v", k=k)
        batches = [
            [(f"u{i}",) for i in range(0, 40)],
            [(f"u{i}",) for i in range(20, 70)],   # overlaps batch 1
            [(f"u{i}",) for i in range(60, 100)],
        ]
        for i, b in enumerate(batches):
            rep = d.process_batch(
                spark.createDataFrame(b, "v string"), txn=("t", i)
            )
            assert rep["skipped"] is False
        concat = spark.createDataFrame(
            [r for b in batches for r in b], "v string"
        )
        got = sorted(r.h for r in d.sketch().collect())
        want = sorted(r.h for r in kmv_sketch(concat, "v", k=k).collect())
        assert got == want  # bit-identical to sketching all history

    def test_exact_below_k_and_estimate_above(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalDistinct,
        )

        d = IncrementalDistinct(spark, str(tmp_path / "kmv"), "v", k=64)
        rep = d.process_batch(
            spark.createDataFrame([(f"x{i}",) for i in range(30)], "v string"),
            txn=("t", 0),
        )
        assert rep["exact"] is True and rep["distinct_est"] == 30.0
        rep = d.process_batch(
            spark.createDataFrame(
                [(f"y{i}",) for i in range(1000)], "v string"
            ),
            txn=("t", 1),
        )
        assert rep["exact"] is False
        # standard error ~1/sqrt(k-1) ≈ 12.6% at k=64 — allow 4 sigma
        assert abs(rep["distinct_est"] - 1030) / 1030 < 0.5
        assert rep["sketch_rows"] == 64

    def test_replay_short_circuits(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalDistinct,
        )

        d = IncrementalDistinct(spark, str(tmp_path / "kmv"), "v", k=8)
        d.process_batch(
            spark.createDataFrame([("a",), ("b",)], "v string"), txn=("t", 0)
        )
        v = d.table.current_version()
        rep = d.process_batch(
            spark.createDataFrame([("c",)], "v string"), txn=("t", 0)
        )
        assert rep["skipped"] is True
        assert d.table.current_version() == v
        assert d.estimate().first()["distinct_est"] == 2.0

    def test_k_guard(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.incremental import (
            IncrementalDistinct,
        )

        with pytest.raises(ValueError, match="k must be"):
            IncrementalDistinct(spark, str(tmp_path / "kmv"), "v", k=1)
