"""Snapshot-manifest transactional table: atomic visibility, optimistic
concurrency, time travel, stats-pruned merge, idempotent streaming
commits, compaction and vacuum.

The acid tests mirror what the staged-upsert suite could NOT assert:
a reader concurrent with a multi-file commit sees a whole snapshot,
never a mix (here: any retained version reproduces exactly)."""

from __future__ import annotations

import json
import threading

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.snaptable import (
    CommitConflict,
    SnapTable,
)

from tests.tiers import deep


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture
def table(spark, tmp_path):
    return SnapTable(spark, str(tmp_path / "tbl"))


class TestWriteRead:
    def test_overwrite_then_read(self, spark, table):
        df = spark.range(10).withColumn("v", F.col("id") * 2)
        out = table.write(df, mode="overwrite")
        assert out["version"] == 0 and out["rows_added"] == 10
        assert _rows(table.read()) == _rows(df)

    def test_append_accumulates(self, spark, table):
        table.write(spark.range(5), mode="overwrite")
        table.write(spark.range(5, 8), mode="append")
        assert sorted(r["id"] for r in table.read().collect()) == list(range(8))

    def test_append_creates_table(self, spark, table):
        table.write(spark.range(3), mode="append")
        assert table.read().count() == 3

    def test_empty_batch_commits_no_files(self, spark, table):
        table.write(spark.range(4), mode="overwrite")
        out = table.write(spark.range(0), mode="append")
        assert out["files_added"] == 0
        assert table.read().count() == 4

    def test_read_missing_table_raises(self, table):
        with pytest.raises(FileNotFoundError):
            table.read()

    def test_bad_mode_and_fmt_rejected(self, spark, table, tmp_path):
        with pytest.raises(ValueError):
            table.write(spark.range(1), mode="sideways")
        with pytest.raises(ValueError):
            SnapTable(spark, str(tmp_path / "x"), fmt="avro")


class TestTimeTravel:
    def test_versions_reproduce(self, spark, table):
        table.write(spark.range(3), mode="overwrite")
        table.write(spark.range(3, 6), mode="append")
        table.write(spark.range(100, 101), mode="overwrite")
        assert sorted(r["id"] for r in table.read(version=0).collect()) == [0, 1, 2]
        assert sorted(r["id"] for r in table.read(version=1).collect()) == list(range(6))
        assert [r["id"] for r in table.read(version=2).collect()] == [100]

    def test_history(self, spark, table):
        table.write(spark.range(3), mode="overwrite")
        table.write(spark.range(2), mode="append")
        hist = table.history()
        assert [h["version"] for h in hist] == [1, 0]
        assert hist[0]["operation"] == "append"
        assert hist[0]["rows"] == 5

    def test_expire_snapshots_shrinks_window(self, spark, table):
        for i in range(4):
            table.write(spark.range(i, i + 1), mode="append")
        out = table.expire_snapshots(keep_last=2)
        assert out["retained"] == [2, 3]
        with pytest.raises(ValueError):
            table.read(version=0)
        assert table.read(version=3).count() == 4


class TestSchemaEvolution:
    def test_append_new_column_reads_as_null(self, spark, table):
        table.write(
            spark.createDataFrame([(1, "a")], "id long, name string"),
            mode="overwrite",
        )
        table.write(
            spark.createDataFrame(
                [(2, "b", 9.5)], "id long, name string, score double"
            ),
            mode="append",
        )
        got = {r["id"]: (r["name"], r["score"]) for r in table.read().collect()}
        assert got == {1: ("a", None), 2: ("b", 9.5)}

    def test_type_conflict_rejected(self, spark, table):
        table.write(
            spark.createDataFrame([(1,)], "id long"), mode="overwrite"
        )
        with pytest.raises(ValueError, match="schema conflict"):
            table.write(
                spark.createDataFrame([("x",)], "id string"), mode="append"
            )


class TestStatsPruning:
    def test_where_prunes_files_and_is_exact(self, spark, table):
        # range-clustered write → each file owns a narrow id range
        table.write(
            spark.range(1000).withColumn("v", F.col("id") % 7),
            mode="overwrite",
            cluster_by=["id"],
            target_files=8,
        )
        m = table.manifest(0)
        assert len(m["files"]) > 1, "need multiple files to prove pruning"
        kept, total = table.pruned_file_count([("id", "=", 3)])
        assert kept < total
        got = table.read(where=[("id", ">=", 10), ("id", "<", 13)])
        assert sorted(r["id"] for r in got.collect()) == [10, 11, 12]

    def test_unstatable_filters_keep_all_files(self, spark, table):
        table.write(spark.range(10), mode="overwrite")  # no stats_cols
        kept, total = table.pruned_file_count([("id", "=", 3)])
        assert kept == total  # no stats → conservative keep
        assert table.read(where=[("id", "=", 3)]).count() == 1


class TestMerge:
    def test_upsert_semantics(self, spark, table):
        base = spark.createDataFrame(
            [(i, f"old{i}") for i in range(10)], "k long, v string"
        )
        table.write(base, mode="overwrite", cluster_by=["k"])
        batch = spark.createDataFrame(
            [(3, "new3"), (7, "new7"), (42, "new42")], "k long, v string"
        )
        out = table.merge(batch, ["k"])
        got = {r["k"]: r["v"] for r in table.read().collect()}
        assert got[3] == "new3" and got[7] == "new7" and got[42] == "new42"
        assert got[0] == "old0" and len(got) == 11
        assert out["version"] == 1

    def test_merge_rewrites_only_hit_files(self, spark, table):
        table.write(
            spark.range(1000).withColumnRenamed("id", "k").withColumn(
                "v", F.lit("old")
            ),
            mode="overwrite",
            cluster_by=["k"],
            target_files=8,
        )
        total = len(table.manifest(0)["files"])
        assert total > 1
        batch = spark.createDataFrame([(5, "new")], "k long, v string")
        out = table.merge(batch, ["k"])
        assert out["files_rewritten"] < total
        assert out["files_kept"] == total - out["files_rewritten"]
        got = table.read()
        assert got.count() == 1000
        assert got.filter("k = 5").collect()[0]["v"] == "new"

    def test_merge_into_empty_creates(self, spark, table):
        table.merge(
            spark.createDataFrame([(1, "a")], "k long, v string"), ["k"]
        )
        assert table.read().count() == 1

    def test_merge_no_hits_appends(self, spark, table):
        table.write(
            spark.createDataFrame([(1, "a")], "k long, v string"),
            mode="overwrite",
            cluster_by=["k"],
        )
        out = table.merge(
            spark.createDataFrame([(2, "b")], "k long, v string"), ["k"]
        )
        assert out["files_rewritten"] == 0
        assert table.read().count() == 2

    def test_merge_schema_evolution(self, spark, table):
        table.write(
            spark.createDataFrame([(1, "a")], "k long, v string"),
            mode="overwrite",
            cluster_by=["k"],
        )
        table.merge(
            spark.createDataFrame(
                [(1, "a2", 5.0)], "k long, v string, extra double"
            ),
            ["k"],
        )
        row = table.read().collect()[0]
        assert (row["v"], row["extra"]) == ("a2", 5.0)

    def test_merge_needs_keys(self, spark, table):
        with pytest.raises(ValueError):
            table.merge(spark.range(1), [])


class TestDelete:
    def test_delete_where(self, spark, table):
        table.write(
            spark.range(100).withColumn("v", F.col("id") % 10),
            mode="overwrite",
            cluster_by=["id"],
        )
        out = table.delete_where("id >= 90")
        assert table.read().count() == 90
        assert table.read().filter("id >= 90").count() == 0
        assert out["files_rewritten"] >= 1
        # untouched rows still intact at the new version
        assert table.read().filter("id = 0").count() == 1

    def test_delete_no_match_is_noop(self, spark, table):
        table.write(spark.range(5), mode="overwrite")
        v0 = table.current_version()
        out = table.delete_where("id > 999")
        assert out["files_rewritten"] == 0
        assert table.current_version() == v0

    def test_delete_everything(self, spark, table):
        table.write(spark.range(5), mode="overwrite")
        table.delete_where("id >= 0")
        assert table.read().count() == 0


class TestConcurrency:
    def test_racing_appends_both_land(self, spark, table):
        table.write(spark.range(0, 1), mode="overwrite")
        errs = []

        def appender(lo):
            try:
                t = SnapTable(spark, table.path)
                t.write(spark.range(lo, lo + 5), mode="append")
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [
            threading.Thread(target=appender, args=(lo,))
            for lo in (100, 200, 300)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        ids = sorted(r["id"] for r in table.read().collect())
        assert ids == [0] + list(range(100, 105)) + list(
            range(200, 205)
        ) + list(range(300, 305))
        # versions are a linear history: one commit per writer
        # (v0 overwrite + three appends)
        assert table.current_version() == 3

    def test_cas_refuses_second_commit_same_version(self, spark, table):
        table.write(spark.range(1), mode="overwrite")
        m = dict(table.manifest(0))
        assert table._try_commit(m, 0) is False

    def test_exhausted_retries_raise(self, spark, table, monkeypatch):
        table.write(spark.range(1), mode="overwrite")
        monkeypatch.setattr(
            SnapTable, "_try_commit", lambda self, m, v: False
        )
        with pytest.raises(CommitConflict):
            table.write(spark.range(1), mode="append", max_retries=2)


class TestStreamingIdempotence:
    def test_replayed_batch_skipped(self, spark, table):
        sink = table.foreach_batch_writer("appA")
        sink(spark.range(3), 0)
        sink(spark.range(3, 6), 1)
        sink(spark.range(3, 6), 1)  # replay — must be a no-op
        sink(spark.range(10, 11), 0)  # stale replay — also a no-op
        assert table.read().count() == 6
        assert table.manifest(table.current_version())["txns"] == {"appA": 1}

    def test_two_apps_independent_ledgers(self, spark, table):
        table.foreach_batch_writer("appA")(spark.range(2), 0)
        table.foreach_batch_writer("appB")(spark.range(10, 12), 0)
        assert table.read().count() == 4

    def test_keyed_streaming_merge(self, spark, table):
        sink = table.foreach_batch_writer("appK", key_cols=["k"])
        sink(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), 0)
        sink(spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"), 1)
        sink(spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"), 1)
        got = {r["k"]: r["v"] for r in table.read().collect()}
        assert got == {1: "a", 2: "B", 3: "c"}

    def test_real_stream_foreach_batch(self, spark, table, tmp_path):
        src = tmp_path / "stream_src"
        src.mkdir()
        spark.range(20).withColumn("v", F.col("id") * 10).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / "b0"))
        stream = (
            spark.readStream.schema("id long, v long")
            .parquet(str(src / "b0"))
        )
        q = (
            stream.writeStream.foreachBatch(table.foreach_batch_writer("live"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert table.read().count() == 20


class TestMaintenance:
    def test_compact_preserves_rows(self, spark, table):
        for i in range(6):
            table.write(spark.range(i * 10, i * 10 + 10), mode="append")
        before = _rows(table.read())
        nfiles_before = len(table.manifest(table.current_version())["files"])
        out = table.compact(target_file_bytes=1 << 30)
        assert out["compacted"] == nfiles_before
        m = table.manifest(table.current_version())
        assert len(m["files"]) < nfiles_before
        assert m["operation"] == "compact"
        assert _rows(table.read()) == before

    def test_vacuum_collects_unreferenced(self, spark, table):
        table.write(spark.range(5), mode="overwrite", cluster_by=["id"])
        table.write(spark.range(5), mode="overwrite")  # v0 files now orphan-able
        table.expire_snapshots(keep_last=1)
        out = table.vacuum(min_age_seconds=0)
        assert len(out["removed"]) == 1
        assert table.read().count() == 5  # live snapshot untouched

    def test_vacuum_dry_run_keeps_files(self, spark, table):
        table.write(spark.range(5), mode="overwrite")
        table.write(spark.range(5), mode="overwrite")
        table.expire_snapshots(keep_last=1)
        out = table.vacuum(dry_run=True, min_age_seconds=0)
        assert len(out["removed"]) == 1
        assert len(table.vacuum(dry_run=True, min_age_seconds=0)["removed"]) == 1  # still there

    def test_vacuum_respects_time_travel(self, spark, table):
        table.write(spark.range(5), mode="overwrite")
        table.write(spark.range(9), mode="overwrite")
        out = table.vacuum(min_age_seconds=0)  # both snapshots retained → nothing to remove
        assert out["removed"] == []
        assert table.read(version=0).count() == 5


class TestCrashWindow:
    def test_orphaned_txn_dir_invisible_and_vacuumable(self, spark, table):
        """A writer that dies AFTER writing data files but BEFORE the
        manifest rename leaves no trace in any read; vacuum collects
        the orphan."""
        table.write(spark.range(5), mode="overwrite")
        # simulate the crash: data files exist, no commit
        table._write_data_files(spark.range(99, 105), [], None)
        assert table.read().count() == 5
        out = table.vacuum(min_age_seconds=0)
        assert len(out["removed"]) == 1
        assert table.read().count() == 5

    def test_staged_manifest_tmp_never_visible(self, spark, table):
        table.write(spark.range(3), mode="overwrite")
        # a stray .tmp manifest must not count as a version
        table.fs.write_bytes(
            table._log + "/.tmp-deadbeef.json", b"{}"
        )
        assert table.versions() == [0]
        assert table.read().count() == 3


class TestMergeRaceAndModel:
    def test_merge_racing_append_loses_cas_and_recomputes(self, spark, table):
        """A merge that loses the CAS to a concurrent append must land
        on the NEXT version with the append's rows intact — the retry
        recomputes survivors against the winner's snapshot."""
        table.write(
            spark.createDataFrame(
                [(i, "old") for i in range(10)], "k long, v string"
            ),
            mode="overwrite",
            cluster_by=["k"],
        )
        real_commit = SnapTable._try_commit
        fired = {"n": 0}

        def racing_commit(self_, manifest, version):
            # on the merge's FIRST commit attempt, sneak an append in
            # first so the merge's CAS loses
            if manifest["operation"] == "merge" and fired["n"] == 0:
                fired["n"] += 1
                other = SnapTable(spark, self_.path)
                other.write(
                    spark.createDataFrame(
                        [(100, "appended")], "k long, v string"
                    ),
                    mode="append",
                )
                self_._manifest_cache.clear()
            return real_commit(self_, manifest, version)

        try:
            SnapTable._try_commit = racing_commit
            out = table.merge(
                spark.createDataFrame([(3, "new3")], "k long, v string"),
                ["k"],
            )
        finally:
            SnapTable._try_commit = real_commit
        assert fired["n"] == 1
        got = {r["k"]: r["v"] for r in table.read().collect()}
        assert got[3] == "new3"
        assert got[100] == "appended", "append that won the race survives"
        assert len(got) == 11
        assert out["version"] == table.current_version()

    @deep

    def test_model_based_op_sequence(self, spark, table):
        """Deterministic pseudo-random sequence of write/merge/delete/
        compact ops, checked after every step against a dict model —
        the state-machine pin for snapshot semantics."""
        import random

        rng = random.Random(20260814)
        model: dict[int, int] = {}

        def check():
            got = {r["k"]: r["v"] for r in table.read().collect()}
            assert got == model

        table.write(
            spark.createDataFrame([(0, 0)], "k long, v long"),
            mode="overwrite",
            cluster_by=["k"],
        )
        model = {0: 0}
        for step in range(12):
            op = rng.choice(["append", "merge", "delete", "compact", "overwrite"])
            if op == "append":
                ks = [rng.randrange(1000, 2000) for _ in range(3)]
                rows = [(k, step) for k in ks]
                table.write(
                    spark.createDataFrame(rows, "k long, v long"),
                    mode="append",
                )
                # append does NOT dedup keys; keep model keys fresh to
                # stay a function (duplicate appends would make the
                # table a multiset — merge is the keyed path)
                for k in ks:
                    if k in model:
                        model.pop(k)
                        table.delete_where(f"k = {k} and v != {step}")
                    model[k] = step
            elif op == "merge":
                ks = rng.sample(sorted(model) or [0], min(2, len(model)))
                ks.append(rng.randrange(5000, 6000))
                rows = [(k, 100 + step) for k in ks]
                table.merge(
                    spark.createDataFrame(rows, "k long, v long"), ["k"]
                )
                for k in ks:
                    model[k] = 100 + step
            elif op == "delete":
                if model:
                    victim = rng.choice(sorted(model))
                    table.delete_where(f"k = {victim}")
                    model.pop(victim)
            elif op == "compact":
                table.compact(target_file_bytes=1 << 30)
            else:
                rows = [(k, 777) for k in rng.sample(range(100), 4)]
                table.write(
                    spark.createDataFrame(rows, "k long, v long"),
                    mode="overwrite",
                    cluster_by=["k"],
                )
                model = {k: 777 for k, _ in rows}
            check()


class TestReviewRegressions:
    """Pins for the round-4 self-review findings."""

    def test_delete_keeps_null_predicate_rows(self, spark, table):
        # three-valued logic: NOT(v='a') is NULL for v IS NULL — those
        # rows never matched the delete and must survive the rewrite
        table.write(
            spark.createDataFrame(
                [(1, "a"), (2, None), (3, "b")], "id long, v string"
            ),
            mode="overwrite",
        )
        table.delete_where("v = 'a'")
        got = sorted((r["id"], r["v"]) for r in table.read().collect())
        assert got == [(2, None), (3, "b")]

    def test_object_store_scheme_refused(self, spark, tmp_path):
        with pytest.raises(ValueError, match="commit coordinator"):
            SnapTable(spark, "s3a://bucket/tbl")
        # atomic-rename schemes pass the guard
        SnapTable(spark, str(tmp_path / "ok"))

    def test_decimal_stats_not_collected(self, spark, table):
        # str(Decimal) does not sort numerically → decimal columns are
        # excluded from stats so they can never mis-prune
        df = spark.sql(
            "SELECT id, CAST(id AS DECIMAL(10,2)) AS amount "
            "FROM range(10)"
        )
        table.write(
            df, mode="overwrite", stats_cols=["id", "amount"]
        )
        stats = table.manifest(0)["files"][0]["stats"]
        assert "id" in stats and "amount" not in stats
        # and a predicate over the unstatted column stays exact
        assert table.read(where=[("amount", ">=", 5)]).count() == 5

    def test_vacuum_age_guard_protects_inflight_writer(self, spark, table):
        table.write(spark.range(3), mode="overwrite")
        # writer mid-flight: data files written, manifest not committed
        table._write_data_files(spark.range(50, 55), [], None)
        out = table.vacuum()  # default 24 h window
        assert out["removed"] == [] and out["skipped_young"] == 1
        # past the window the same dir is collectable
        assert len(table.vacuum(min_age_seconds=0)["removed"]) == 1

    def test_compact_retries_past_racing_append(self, spark, table):
        for i in range(3):
            table.write(spark.range(i, i + 1), mode="append")
        real_commit = SnapTable._try_commit
        fired = {"n": 0}

        def racing_commit(self_, manifest, version):
            if manifest["operation"] == "compact" and fired["n"] == 0:
                fired["n"] += 1
                SnapTable(spark, self_.path).write(
                    spark.range(100, 101), mode="append"
                )
                self_._manifest_cache.clear()
            return real_commit(self_, manifest, version)

        try:
            SnapTable._try_commit = racing_commit
            out = table.compact(target_file_bytes=1 << 30)
        finally:
            SnapTable._try_commit = real_commit
        assert fired["n"] == 1
        assert out["compacted"] >= 3
        ids = sorted(r["id"] for r in table.read().collect())
        assert ids == [0, 1, 2, 100], "racer's append survives the compact"


class TestReadChanges:
    def test_append_deltas_exact(self, spark, table):
        table.write(spark.range(3), mode="overwrite")
        table.write(spark.range(10, 13), mode="append")
        table.write(spark.range(20, 22), mode="append")
        ch = table.read_changes(0)
        got = sorted(
            (r["id"], r["_commit_version"]) for r in ch.collect()
        )
        assert got == [(10, 1), (11, 1), (12, 1), (20, 2), (21, 2)]
        # windowed read
        assert sorted(
            r["id"] for r in table.read_changes(0, to_version=1).collect()
        ) == [10, 11, 12]
        assert table.read_changes(2).count() == 0

    def test_compact_in_range_is_transparent(self, spark, table):
        table.write(spark.range(2), mode="overwrite")
        table.write(spark.range(10, 12), mode="append")
        table.compact(target_file_bytes=1 << 30)
        table.write(spark.range(20, 21), mode="append")
        got = sorted(r["id"] for r in table.read_changes(0).collect())
        assert got == [10, 11, 20], "compact adds files but no rows"

    def test_rewrite_in_range_policies(self, spark, table):
        table.write(
            spark.createDataFrame([(1, "a")], "k long, v string"),
            mode="overwrite",
            cluster_by=["k"],
        )
        table.merge(
            spark.createDataFrame([(1, "A"), (2, "b")], "k long, v string"),
            ["k"],
        )
        with pytest.raises(ValueError, match="not an append delta"):
            table.read_changes(0)
        inc = {r["k"]: r["v"] for r in
               table.read_changes(0, on_rewrite="include").collect()}
        assert inc == {1: "A", 2: "b"}  # at-least-once: survivor re-appears
        assert table.read_changes(0, on_rewrite="skip").count() == 0

    def test_schema_evolution_across_deltas(self, spark, table):
        table.write(
            spark.createDataFrame([(1,)], "id long"), mode="overwrite"
        )
        table.write(
            spark.createDataFrame([(2,)], "id long"), mode="append"
        )
        table.write(
            spark.createDataFrame([(3, "x")], "id long, tag string"),
            mode="append",
        )
        got = sorted(
            (r["id"], r["tag"]) for r in table.read_changes(0).collect()
        )
        assert got == [(2, None), (3, "x")]

    def test_expired_window_refused(self, spark, table):
        for i in range(4):
            table.write(spark.range(i, i + 1), mode="append")
        table.expire_snapshots(keep_last=2)
        with pytest.raises(ValueError, match="retained endpoints"):
            table.read_changes(0)


class TestZOrder:
    def test_zorder_prunes_on_every_dimension(self, spark, table, tmp_path):
        # 100x100 grid; 16 files. Lexicographic clustering on (x, y)
        # prunes only on x; the z-curve prunes on BOTH dimensions.
        grid = spark.range(10_000).select(
            (F.col("id") % 100).alias("x"),
            (F.col("id") / 100).cast("long").alias("y"),
        )
        table.write(
            grid, mode="overwrite", zorder_by=["x", "y"], target_files=16
        )
        for col in ("x", "y"):
            kept, total = table.pruned_file_count(
                [(col, ">=", 10), (col, "<", 15)]
            )
            assert total == 16
            assert kept < total, f"z-order failed to prune on {col}"
        # exactness of the pruned read
        got = table.read(
            where=[("x", ">=", 10), ("x", "<", 12), ("y", "=", 50)]
        )
        assert sorted((r["x"], r["y"]) for r in got.collect()) == [
            (10, 50), (11, 50),
        ]

        lex = SnapTable(spark, str(tmp_path / "lex"))
        lex.write(
            grid, mode="overwrite", cluster_by=["x", "y"], target_files=16
        )
        kept_x, _ = lex.pruned_file_count([("x", ">=", 10), ("x", "<", 15)])
        kept_y, total = lex.pruned_file_count([("y", ">=", 10), ("y", "<", 15)])
        assert kept_x < total
        assert kept_y == total, (
            "lexicographic clustering cannot prune the trailing dim — "
            "this is the gap z-order closes"
        )

    def test_zorder_constant_and_null_columns_safe(self, spark, table):
        df = spark.range(100).select(
            F.lit(7).cast("long").alias("c"),
            F.col("id").alias("x"),
            F.when(F.col("id") % 2 == 0, F.col("id")).alias("maybe"),
        )
        table.write(df, mode="overwrite", zorder_by=["c", "x", "maybe"])
        assert table.read().count() == 100


class TestMetadataCount:
    def test_count_rows_matches_scan(self, spark, table):
        table.write(spark.range(123), mode="overwrite")
        table.write(spark.range(7), mode="append")
        assert table.count_rows() == 130 == table.read().count()
        assert table.count_rows(version=0) == 123
        table.delete_where("id < 10")
        # removes ids 0-9 from the base AND all 7 appended rows
        assert table.count_rows() == table.read().count() == 113


class TestPruningSoundnessProperty:
    def test_file_may_match_is_conservative(self):
        """Property: whenever _file_may_match prunes a file (returns
        False), NO value in [min, max] can satisfy the predicate —
        pruning may keep too much, never too little."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from harness_aws_etl_pipeline_spark.sinks.snaptable import (
            _file_may_match,
        )

        values = st.one_of(
            st.integers(-1000, 1000),
            st.floats(-1000, 1000, allow_nan=False),
            st.text("abcxyz", min_size=0, max_size=4),
        )

        @settings(max_examples=500, deadline=None)
        @given(
            lo=values,
            hi=values,
            v=values,
            op=st.sampled_from(["=", "<", "<=", ">", ">="]),
            probe=values,
        )
        def check(lo, hi, v, op, probe):
            if type(lo) is not type(hi) or (
                isinstance(lo, (int, float)) != isinstance(hi, (int, float))
            ):
                return
            if hi < lo:
                lo, hi = hi, lo
            stats = {"c": {"min": lo, "max": hi}}
            kept = _file_may_match(stats, "c", op, v)
            if kept:
                return  # keeping is always sound
            # pruned: no in-range value may satisfy the predicate
            try:
                in_range = lo <= probe <= hi
            except TypeError:
                return
            if not in_range:
                return
            sat = {
                "=": probe == v,
                "<": probe < v,
                "<=": probe <= v,
                ">": probe > v,
                ">=": probe >= v,
            }[op]
            assert not sat, (lo, hi, op, v, probe)

        check()


class TestRestore:
    def test_restore_old_snapshot(self, spark, table):
        table.write(spark.range(5), mode="overwrite")
        table.write(spark.range(100, 103), mode="overwrite")
        out = table.restore(0)
        assert out["restored_from"] == 0 and out["version"] == 2
        assert sorted(r["id"] for r in table.read().collect()) == list(range(5))
        # history preserved: the "bad" snapshot is still readable
        assert table.read(version=1).count() == 3
        # restored files are re-referenced → vacuum keeps them even
        # after the bad snapshot is expired
        table.expire_snapshots(keep_last=1)
        table.vacuum(min_age_seconds=0)
        assert table.read().count() == 5

    def test_restore_carries_txn_ledger_forward(self, spark, table):
        table.write(spark.range(2), mode="overwrite", txn=("app", 0))
        table.write(spark.range(5, 7), mode="append", txn=("app", 1))
        table.restore(0)
        # exactly-once accounting survives the rollback: batch 1 is
        # still recorded as committed, so a replay stays a no-op
        out = table.write(spark.range(5, 7), mode="append", txn=("app", 1))
        assert out["skipped"] is True
        assert table.read().count() == 2

    def test_restore_reads_as_rewrite_in_changes(self, spark, table):
        table.write(spark.range(2), mode="overwrite")
        table.write(spark.range(10, 12), mode="append")
        table.restore(0)
        with pytest.raises(ValueError, match="not an append delta"):
            table.read_changes(0)


class TestZOrderDates:
    def test_zorder_over_date_and_key(self, spark, table):
        # 64 days x 100 keys; z-order on (event_date, k) prunes BOTH
        df = spark.range(6400).select(
            F.date_add(F.lit("2024-01-01"), (F.col("id") / 100).cast("int")).alias(
                "event_date"
            ),
            (F.col("id") % 100).alias("k"),
        )
        table.write(
            df, mode="overwrite", zorder_by=["event_date", "k"], target_files=16
        )
        kept_d, total = table.pruned_file_count(
            [("event_date", ">=", "2024-01-10"), ("event_date", "<", "2024-01-15")]
        )
        kept_k, _ = table.pruned_file_count([("k", ">=", 10), ("k", "<", 15)])
        assert total == 16
        assert kept_d < total, "date dimension must prune"
        assert kept_k < total, "key dimension must prune"
        got = table.read(
            where=[("event_date", "=", "2024-01-10"), ("k", "=", 50)]
        )
        assert got.count() == 1


class TestOrcFormat:
    def test_orc_roundtrip_merge_and_prune(self, spark, tmp_path):
        t = SnapTable(spark, str(tmp_path / "orc_tbl"), fmt="orc")
        t.write(
            spark.range(1000).withColumnRenamed("id", "k").withColumn(
                "v", F.lit("old")
            ),
            mode="overwrite",
            cluster_by=["k"],
            target_files=8,
        )
        out = t.merge(
            spark.createDataFrame([(5, "new")], "k long, v string"), ["k"]
        )
        assert out["files_rewritten"] < 8
        got = t.read(where=[("k", ">=", 3), ("k", "<", 8)])
        vals = {r["k"]: r["v"] for r in got.collect()}
        assert vals[5] == "new" and vals[3] == "old" and len(vals) == 5
        kept, total = t.pruned_file_count([("k", "=", 5)])
        assert kept < total


class TestOptimize:
    @deep
    def test_optimize_restores_pruning_after_appends(self, spark, table):
        # unordered appends → stats overlap → no pruning; optimize
        # z-orders the whole table and pruning comes back
        import random

        rng = random.Random(5)
        ids = list(range(4000))
        rng.shuffle(ids)
        for chunk in range(4):
            rows = [(i, i % 7) for i in ids[chunk * 1000:(chunk + 1) * 1000]]
            table.write(
                spark.createDataFrame(rows, "id long, v long"),
                mode="append",
                stats_cols=["id"],
                target_files=4,
            )
        kept_before, total_before = table.pruned_file_count([("id", "=", 50)])
        before = _rows(table.read())
        out = table.optimize(["id"], target_files=16)
        assert out["rewritten"] > 0
        kept_after, total_after = table.pruned_file_count([("id", "=", 50)])
        assert kept_after / total_after < kept_before / total_before
        assert kept_after <= 2
        assert _rows(table.read()) == before, "row set unchanged"
        # transparent to incremental consumers
        v_opt = table.current_version()
        table.write(spark.createDataFrame([(9999, 0)], "id long, v long"),
                    mode="append")
        got = sorted(
            r["id"] for r in table.read_changes(v_opt - 1).collect()
        )
        assert got == [9999], "optimize adds no rows to the change feed"


class TestEvolvedColumnPruning:
    def test_where_on_column_added_later(self, spark, table):
        """Old files lack the evolved column: no stats → kept
        conservatively; unified-schema read nulls the column → the row
        filter excludes those rows → result exact."""
        table.write(
            spark.createDataFrame([(1,), (2,)], "id long"), mode="overwrite"
        )
        table.write(
            spark.createDataFrame(
                [(3, 30), (4, 40)], "id long, score long"
            ),
            mode="append",
            stats_cols=["score"],
        )
        got = table.read(where=[("score", ">=", 35)])
        assert [(r["id"], r["score"]) for r in got.collect()] == [(4, 40)]
        kept, total = table.pruned_file_count([("score", ">=", 35)])
        assert kept < total  # new files' stats still prune


class TestRenameCasAtomicity:
    def test_hadoopfs_local_cas_exactly_one_winner(self, spark, tmp_path):
        """Regression for the round-9 soak failure: HadoopFS once
        implemented rename_if_absent as exists()+rename(), and
        Hadoop's LOCAL rename overwrites an existing destination — two
        racing committers could both report success, silently losing a
        snapshot version. The local-scheme path must CAS through the
        hard-link protocol: exactly ONE winner per destination under a
        thread hammer."""
        import threading

        from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

        fs = get_fs(str(tmp_path), spark)
        assert type(fs).__name__ == "HadoopFS"  # the adapter under test
        rounds, nthreads = 60, 4
        for r in range(rounds):
            dst = str(tmp_path / f"v{r}.json")
            srcs = []
            for t in range(nthreads):
                p = str(tmp_path / f".tmp-{r}-{t}")
                fs.write_bytes(p, f"writer-{t}".encode())
                srcs.append(p)
            wins = []
            barrier = threading.Barrier(nthreads)

            def racer(i):
                barrier.wait()
                if fs.rename_if_absent(srcs[i], dst):
                    wins.append(i)

            ts = [
                threading.Thread(target=racer, args=(i,))
                for i in range(nthreads)
            ]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            assert len(wins) == 1, f"round {r}: winners {wins}"
            assert fs.read_bytes(dst) == f"writer-{wins[0]}".encode()


class TestUpdateWhere:
    def test_update_where_basic(self, spark, table):
        table.write(
            spark.range(100).withColumn("v", F.col("id") % 10),
            mode="overwrite",
            cluster_by=["id"],
        )
        out = table.update_where({"v": "v + 100"}, "id >= 90")
        assert out["rows_updated"] == 10
        assert out["files_rewritten"] >= 1
        got = table.read()
        assert got.count() == 100  # row set unchanged
        assert got.filter("id >= 90 AND v < 100").count() == 0
        assert got.filter("id < 90 AND v >= 100").count() == 0
        assert table.history()[0]["operation"] == "update"

    def test_update_no_match_is_noop(self, spark, table):
        table.write(spark.range(5), mode="overwrite")
        v0 = table.current_version()
        out = table.update_where({"id": "id + 1"}, "id > 999")
        assert out == {
            "version": v0, "files_rewritten": 0, "rows_updated": 0
        }
        assert table.current_version() == v0

    def test_null_predicate_rows_pass_through(self, spark, table):
        table.write(
            spark.createDataFrame(
                [(1, "a"), (2, None), (3, "b")], "id long, s string"
            ),
            mode="overwrite",
        )
        out = table.update_where({"id": "id * 10"}, F.col("s") == "a")
        assert out["rows_updated"] == 1
        got = {r.s: r.id for r in table.read().collect()}
        assert got == {"a": 10, None: 2, "b": 3}  # NULL pred row KEPT as-is

    def test_type_preserved_and_unknown_column_rejected(self, spark, table):
        table.write(
            spark.range(4).withColumn("v", F.col("id").cast("int")),
            mode="overwrite",
        )
        table.update_where({"v": "CAST(v AS DOUBLE) * 2.5"}, "id >= 2")
        # assignment result is cast BACK to the declared int type
        assert dict(table.read().dtypes)["v"] == "int"
        assert {r.v for r in table.read().filter("id >= 2").collect()} == {
            5, 7
        }
        with pytest.raises(ValueError, match="unknown columns"):
            table.update_where({"nope": "1"}, "id = 0")
        with pytest.raises(ValueError, match="empty assignments"):
            table.update_where({}, "id = 0")

    def test_untouched_files_not_rewritten(self, spark, table):
        # two well-separated clusters -> distinct files via cluster_by
        table.write(
            spark.range(100).withColumn("v", F.lit(0)),
            mode="overwrite",
            cluster_by=["id"],
            target_files=4,
        )
        before = {
            f["path"] for f in table.manifest(table.current_version())["files"]
        }
        out = table.update_where({"v": "1"}, "id < 10")
        after = {
            f["path"] for f in table.manifest(table.current_version())["files"]
        }
        # only the files containing id<10 were replaced
        assert out["files_rewritten"] < len(before)
        assert len(before & after) == len(before) - out["files_rewritten"]


class TestBloomCols:
    def test_bloom_files_larger_and_reads_identical(self, spark, tmp_path):
        """pyarrow in this environment cannot expose bloom footers, so
        the write-side pin is the size delta: identical data written
        with bloom_cols must be strictly larger (the serialized bloom
        bitset), and every read/DML path stays byte-equivalent."""
        df = spark.range(20_000).select(
            (F.col("id") * 2654435761 % 1_000_003).alias("k"),
            F.col("id").alias("v"),
        )
        plain = SnapTable(spark, str(tmp_path / "plain"))
        plain.write(df, mode="overwrite", target_files=1)
        bloomed = SnapTable(
            spark, str(tmp_path / "bloomed"), bloom_cols=["k"]
        )
        bloomed.write(df, mode="overwrite", target_files=1)
        size = lambda t: sum(  # noqa: E731
            f["bytes"] for f in t.manifest(t.current_version())["files"]
        )
        assert size(bloomed) > size(plain)
        # point lookup returns the same rows through either table
        want = sorted(r.v for r in plain.read().filter("k = 42").collect())
        got = sorted(r.v for r in bloomed.read().filter("k = 42").collect())
        assert got == want
        assert bloomed.read().count() == 20_000

    def test_bloom_survives_update_and_compact_rewrites(
        self, spark, tmp_path
    ):
        t = SnapTable(spark, str(tmp_path / "t"), bloom_cols=["k"])
        t.write(
            spark.range(1000).select(
                F.col("id").alias("k"), F.lit(0).alias("v")
            ),
            mode="overwrite",
        )
        t.update_where({"v": "1"}, "k < 10")
        assert t.read().filter("v = 1").count() == 10
        t.write(
            spark.range(1000, 2000).select(
                F.col("id").alias("k"), F.lit(0).alias("v")
            ),
            mode="append",
        )
        t.compact(target_file_bytes=1 << 30)
        assert t.read().count() == 2000

    def test_bloom_requires_parquet(self, spark, tmp_path):
        with pytest.raises(ValueError, match="parquet"):
            SnapTable(spark, str(tmp_path / "t"), fmt="orc", bloom_cols=["k"])

    def test_bloom_skips_absent_columns(self, spark, tmp_path):
        # schema-evolution append without the bloom column must not fail
        t = SnapTable(spark, str(tmp_path / "t"), bloom_cols=["missing"])
        t.write(spark.range(5), mode="overwrite")
        assert t.read().count() == 5


class TestUpdateConcurrency:
    def test_update_races_with_append(self, spark, table):
        """An update_where racing concurrent appends must retry
        against the winner's snapshot: no appended row may be lost,
        and the update's predicate semantics hold on whatever snapshot
        it finally committed against (every-check-then-act in the
        commit path is a CAS — the round-9 durability lesson)."""
        import threading as th

        table.write(
            spark.range(50).withColumn("v", F.lit(0)), mode="overwrite"
        )
        errs = []

        def appender(lo):
            try:
                t = SnapTable(spark, table.path)
                t.write(
                    spark.range(lo, lo + 10).withColumn("v", F.lit(0)),
                    mode="append",
                )
            except Exception as e:  # pragma: no cover
                errs.append(e)

        def updater():
            try:
                t = SnapTable(spark, table.path)
                t.update_where({"v": "v + 1"}, "id < 25", max_retries=8)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [
            th.Thread(target=appender, args=(100,)),
            th.Thread(target=updater),
            th.Thread(target=appender, args=(200,)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        got = table.read()
        ids = sorted(r["id"] for r in got.collect())
        assert ids == list(range(50)) + list(range(100, 110)) + list(
            range(200, 210)
        )
        # rows the update targeted are updated exactly once; appended
        # rows (whether they landed before or after the update) were
        # either untouched (committed after) or correctly predicated
        assert got.filter("id < 25 AND v != 1").count() == 0
        assert got.filter("id >= 25 AND id < 50 AND v != 0").count() == 0
