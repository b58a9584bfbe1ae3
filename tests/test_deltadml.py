"""Deletion-vector DELETE (sinks/deltadml.py): DV write path — inline
and sidecar vectors, protocol upgrade, DV union on repeat deletes,
partitioned predicates, bounds."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.deltadml import delta_delete_where
from harness_aws_etl_pipeline_spark.sinks.deltawrite import write_delta
from harness_aws_etl_pipeline_spark.sources.deltaread import (
    delta_snapshot,
    read_delta,
)


class TestDeleteWhere:
    def test_inline_dv_delete_and_time_travel(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_delta(spark, spark.range(20).withColumn("v", F.lit("a")), t)
        rep = delta_delete_where(spark, t, "id % 5 = 0")
        assert rep["rows_deleted"] == 4 and rep["version"] == 1
        got = {r.id for r in read_delta(spark, t).collect()}
        assert got == set(range(20)) - {0, 5, 10, 15}
        # time travel still sees everything; protocol upgraded
        assert read_delta(spark, t, version=0).count() == 20
        proto = delta_snapshot(spark, t)["protocol"]
        assert proto["minReaderVersion"] == 3
        assert "deletionVectors" in proto["readerFeatures"]
        # no parquet was rewritten — the same data files are live
        assert rep["files_touched"] >= 1

    def test_repeat_delete_unions_dvs(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_delta(spark, spark.range(10).withColumn("v", F.lit("a")), t)
        delta_delete_where(spark, t, "id < 3")
        rep = delta_delete_where(spark, t, "id >= 8")
        assert rep["rows_deleted"] == 2
        got = {r.id for r in read_delta(spark, t).collect()}
        assert got == {3, 4, 5, 6, 7}
        # deleting already-deleted rows is a no-op commit
        rep = delta_delete_where(spark, t, "id < 3")
        assert rep["rows_deleted"] == 0 and rep["files_touched"] == 0
        assert read_delta(spark, t).count() == 5

    def test_sidecar_dv_for_large_deletes(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_delta(
            spark,
            spark.range(20000).withColumn("v", F.lit("x")).coalesce(1),
            t,
        )
        rep = delta_delete_where(spark, t, "id % 2 = 0")
        assert rep["rows_deleted"] == 10000
        # a .bin sidecar exists and the read path applies it
        assert glob.glob(str(tmp_path / "t" / "deletion_vector_*.bin"))
        out = read_delta(spark, t)
        assert out.count() == 10000
        assert out.agg(F.min("id")).collect()[0][0] == 1

    def test_partition_predicate(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, i % 2) for i in range(10)], "id long, g int"
        )
        write_delta(spark, df, t, partition_by=["g"])
        rep = delta_delete_where(spark, t, "g = 1 AND id > 5")
        assert rep["rows_deleted"] == 2  # ids 7, 9
        got = {(r.id, r.g) for r in read_delta(spark, t).collect()}
        assert got == {(i, i % 2) for i in range(10)} - {(7, 1), (9, 1)}

    def test_bulk_bound(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_delta(spark, spark.range(100).withColumn("v", F.lit("a")), t)
        with pytest.raises(ValueError, match="rewrite-based"):
            delta_delete_where(spark, t, "id >= 0", max_deleted_rows=10)

    def test_changes_window_rejects_dv_commit(self, spark, tmp_path):
        """A DV delete re-adds the same path — append-only change
        capture must refuse the window (the reader-side guard closes
        the loop on the writer)."""
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        t = str(tmp_path / "t")
        write_delta(spark, spark.range(6).withColumn("v", F.lit("a")), t)
        delta_delete_where(spark, t, "id = 0")
        with pytest.raises(ValueError, match="append-only"):
            delta_changes(spark, t, since_version=0)

    def test_concurrent_dv_delete_is_unioned_not_overwritten(
        self, spark, tmp_path, monkeypatch
    ):
        """A delete that commits a DV for the same file between our
        snapshot and our winning commit must be unioned in on retry —
        not silently overwritten (which would resurrect its rows)."""
        import harness_aws_etl_pipeline_spark.sinks.deltadml as dml

        t = str(tmp_path / "t")
        write_delta(
            spark, spark.range(10).withColumn("v", F.lit("a")).coalesce(1), t
        )
        real_get_fs = dml.get_fs
        state = {"raced": False}

        class RacingFs:
            def __init__(self, inner):
                self._inner = inner

            def __getattr__(self, name):
                return getattr(self._inner, name)

            def rename_if_absent(self, src, dst):
                if not state["raced"]:
                    state["raced"] = True
                    # concurrent winner lands a DV for the same file
                    delta_delete_where(spark, t, "id = 7")
                return self._inner.rename_if_absent(src, dst)

        monkeypatch.setattr(
            dml, "get_fs", lambda p, s: RacingFs(real_get_fs(p, s))
        )
        rep = delta_delete_where(spark, t, "id < 3")
        assert rep["retries"] == 1 and rep["rows_deleted"] == 3
        got = {r.id for r in read_delta(spark, t).collect()}
        assert got == {3, 4, 5, 6, 8, 9}  # 7 stays deleted


class TestChangeDataFeed:
    """Round 12: Delta CDF — delta_delete_where(change_data=True)
    writes _change_data/ files + cdc actions; delta_changes(cdf=True)
    replays them as row-level changes."""

    def test_delete_optimize_changes_sequence(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.compact import (
            delta_optimize,
        )
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        t = str(tmp_path / "t")
        write_delta(spark, spark.range(10).withColumn("v", F.lit("a")), t)
        rep = delta_delete_where(
            spark, t, "id in (2, 7)", change_data=True
        )
        assert rep["rows_deleted"] == 2
        assert glob.glob(str(tmp_path / "t" / "_change_data" / "*.parquet"))
        # append then OPTIMIZE (dataChange=false rewrite) in the window
        write_delta(
            spark,
            spark.range(10, 12).withColumn("v", F.lit("b")),
            t,
            mode="append",
        )
        delta_optimize(spark, t, small_file_bytes=1 << 30)
        ch = delta_changes(spark, t, since_version=0, cdf=True)
        got = {
            (r.id, r.v, r._change_type, r._commit_version)
            for r in ch.collect()
        }
        assert got == {
            (2, "a", "delete", 1),
            (7, "a", "delete", 1),
            (10, "b", "insert", 2),
            (11, "b", "insert", 2),
        }
        # live table agrees with replaying the changes over version 0
        assert {r.id for r in read_delta(spark, t).collect()} == (
            set(range(10)) - {2, 7}
        ) | {10, 11}

    def test_cdf_auto_enabled_by_table_property(self, spark, tmp_path):
        import json as _json

        t = str(tmp_path / "t")
        write_delta(spark, spark.range(6).withColumn("v", F.lit("a")), t)
        # plant the table property the way a foreign writer would
        log = tmp_path / "t" / "_delta_log"
        v0 = _json.loads(
            [
                ln
                for ln in (log / f"{0:020d}.json").read_text().splitlines()
                if '"metaData"' in ln
            ][0]
        )
        v0["metaData"]["configuration"] = {
            "delta.enableChangeDataFeed": "true"
        }
        actions = []
        for ln in (log / f"{0:020d}.json").read_text().splitlines():
            if '"metaData"' in ln:
                actions.append(_json.dumps(v0))
            elif ln.strip():
                actions.append(ln)
        (log / f"{0:020d}.json").write_text("\n".join(actions) + "\n")
        delta_delete_where(spark, t, "id = 1")  # change_data=None → auto
        assert glob.glob(str(tmp_path / "t" / "_change_data" / "*.parquet"))

    def test_window_without_cdf_still_rejects(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        t = str(tmp_path / "t")
        write_delta(spark, spark.range(6).withColumn("v", F.lit("a")), t)
        delta_delete_where(spark, t, "id = 1", change_data=False)
        with pytest.raises(ValueError, match="without change data"):
            delta_changes(spark, t, since_version=0, cdf=True)
        # and the append-only mode rejects as before
        with pytest.raises(ValueError, match="append-only"):
            delta_changes(spark, t, since_version=0)

    def test_cdf_empty_window_schema(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        t = str(tmp_path / "t")
        write_delta(spark, spark.range(3).withColumn("v", F.lit("a")), t)
        ch = delta_changes(spark, t, since_version=0, cdf=True)
        assert ch.count() == 0
        assert set(ch.columns) == {"id", "v", "_change_type", "_commit_version"}

    def test_partitioned_cdf_delete(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        t = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, i % 2, f"v{i}") for i in range(8)],
            "id long, p int, v string",
        )
        write_delta(spark, df, t, partition_by=["p"])
        delta_delete_where(spark, t, "p = 1 and id < 4", change_data=True)
        ch = delta_changes(spark, t, since_version=0, cdf=True)
        got = {(r.id, r.p, r._change_type) for r in ch.collect()}
        assert got == {(1, 1, "delete"), (3, 1, "delete")}


class TestUpdateWhere:
    """Round 12: delta_update_where — DV the old rows + append the
    updated copies in one atomic commit."""

    def test_update_and_time_travel(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_update_where,
        )

        t = str(tmp_path / "t")
        write_delta(spark, spark.range(10).withColumn("v", F.lit("a")), t)
        rep = delta_update_where(
            spark, t, "id >= 8", {"v": "concat(v, '-up')"}
        )
        assert rep["rows_updated"] == 2 and rep["version"] == 1
        assert rep["files_added"] >= 1 and rep["files_touched"] >= 1
        got = {(r.id, r.v) for r in read_delta(spark, t).collect()}
        assert got == {(i, "a") for i in range(8)} | {
            (8, "a-up"), (9, "a-up")
        }
        # time travel: old values intact
        assert {
            r.v for r in read_delta(spark, t, version=0).collect()
        } == {"a"}
        # no-op predicate commits nothing
        rep = delta_update_where(spark, t, "id = 999", {"v": "'x'"})
        assert rep["rows_updated"] == 0 and rep["version"] == 1

    def test_update_skips_already_deleted_rows(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_update_where,
        )

        t = str(tmp_path / "t")
        write_delta(spark, spark.range(6).withColumn("v", F.lit("a")), t)
        delta_delete_where(spark, t, "id = 3")
        rep = delta_update_where(spark, t, "id >= 3", {"v": "'up'"})
        # id=3 is deleted — must NOT be resurrected as an updated copy
        assert rep["rows_updated"] == 2
        got = {(r.id, r.v) for r in read_delta(spark, t).collect()}
        assert got == {(0, "a"), (1, "a"), (2, "a"), (4, "up"), (5, "up")}

    def test_update_cdf(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_update_where,
        )
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        t = str(tmp_path / "t")
        write_delta(spark, spark.range(4).withColumn("v", F.lit("a")), t)
        delta_update_where(
            spark, t, "id = 1", {"v": "'b'"}, change_data=True
        )
        ch = delta_changes(spark, t, 0, cdf=True)
        got = {(r.id, r.v, r._change_type) for r in ch.collect()}
        assert got == {
            (1, "a", "update_preimage"),
            (1, "b", "update_postimage"),
        }

    def test_partitioned_update_and_partition_migration(
        self, spark, tmp_path
    ):
        """Round-12 follow-up: partitioned tables update end to end;
        a SET that changes the partition column MIGRATES the row into
        its new hive partition with recorded partitionValues."""
        import glob

        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_update_where,
        )
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_snapshot,
        )

        t = str(tmp_path / "t")
        write_delta(
            spark,
            spark.range(6).withColumn("p", F.col("id") % 2),
            t,
            partition_by=["p"],
        )
        rep = delta_update_where(spark, t, "id = 1", {"p": "7"})
        assert rep["rows_updated"] == 1
        got = {(r.id, r.p) for r in read_delta(spark, t).collect()}
        assert got == {(0, 0), (2, 0), (4, 0), (3, 1), (5, 1), (1, 7)}
        assert glob.glob(str(tmp_path / "t" / "p=7" / "*.parquet"))
        snap = delta_snapshot(spark, t)
        migrated = [
            add
            for add in snap["files"].values()
            if add.get("partitionValues", {}).get("p") == "7"
        ]
        assert migrated and migrated[0].get("dataChange") is True
        # predicate over the partition column also works
        rep = delta_update_where(spark, t, "p = 7", {"id": "id + 100"})
        assert rep["rows_updated"] == 1
        assert (101, 7) in {
            (r.id, r.p) for r in read_delta(spark, t).collect()
        }


class TestMerge:
    """Round 12: delta_merge — keyed upsert completing the DML triad
    (iceberg_upsert / hudi_upsert siblings)."""

    def test_merge_updates_and_inserts(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_merge,
        )

        t = str(tmp_path / "t")
        write_delta(
            spark,
            spark.createDataFrame(
                [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
            ),
            t,
        )
        rep = delta_merge(
            spark,
            spark.createDataFrame(
                [(2, "b2"), (9, "i")], "id long, v string"
            ),
            t,
            keys=["id"],
        )
        assert rep["rows_updated"] == 1 and rep["rows_inserted"] == 1
        got = {(r.id, r.v) for r in read_delta(spark, t).collect()}
        assert got == {(1, "a"), (2, "b2"), (3, "c"), (9, "i")}
        # repeat merge of the same keys is latest-wins again
        delta_merge(
            spark,
            spark.createDataFrame([(9, "i2")], "id long, v string"),
            t,
            keys=["id"],
        )
        got = {(r.id, r.v) for r in read_delta(spark, t).collect()}
        assert got == {(1, "a"), (2, "b2"), (3, "c"), (9, "i2")}

    def test_merge_cdf_labels(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_merge,
        )
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        t = str(tmp_path / "t")
        write_delta(
            spark,
            spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
            t,
        )
        delta_merge(
            spark,
            spark.createDataFrame(
                [(2, "b2"), (7, "n")], "id long, v string"
            ),
            t,
            keys=["id"],
            change_data=True,
        )
        ch = delta_changes(spark, t, 0, cdf=True)
        got = {(r.id, r.v, r._change_type) for r in ch.collect()}
        assert got == {
            (2, "b", "update_preimage"),
            (2, "b2", "update_postimage"),
            (7, "n", "insert"),
        }

    def test_merge_guards(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_merge,
        )

        t = str(tmp_path / "t")
        write_delta(
            spark,
            spark.createDataFrame([(1, "a")], "id long, v string"),
            t,
        )
        with pytest.raises(ValueError, match="unique"):
            delta_merge(
                spark,
                spark.createDataFrame(
                    [(2, "x"), (2, "y")], "id long, v string"
                ),
                t, keys=["id"],
            )
        with pytest.raises(ValueError, match="missing"):
            delta_merge(
                spark,
                spark.createDataFrame([(1, "x")], "id long, v string"),
                t, keys=["nope"],
            )
        with pytest.raises(ValueError, match="lacks table columns"):
            delta_merge(
                spark,
                spark.createDataFrame([(1,)], "id long"),
                t, keys=["id"],
            )

    def test_merge_pure_insert_and_changes_compose(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_merge,
        )
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        t = str(tmp_path / "t")
        write_delta(
            spark,
            spark.createDataFrame([(1, "a")], "id long, v string"),
            t,
        )
        rep = delta_merge(
            spark,
            spark.createDataFrame([(5, "n")], "id long, v string"),
            t,
            keys=["id"],
        )
        assert rep["rows_updated"] == 0 and rep["rows_inserted"] == 1
        assert rep["files_touched"] == 0
        # a pure-insert merge IS append-only representable
        got = {
            (r.id, r.v) for r in delta_changes(spark, t, 0).collect()
        }
        assert got == {(5, "n")}

    def test_concurrent_delete_conflict_raises(
        self, spark, tmp_path, monkeypatch
    ):
        """A delete landing between the merge's scan and its commit,
        touching a matched row, must abort the merge — committing
        would resurrect the deleted row as its updated copy."""
        import harness_aws_etl_pipeline_spark.sinks.deltadml as dml

        t = str(tmp_path / "t")
        write_delta(
            spark,
            spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
            t,
        )
        real = dml._dv_descriptors
        state = {"raced": False}

        def racing(fs, base, matches):
            if not state["raced"]:
                state["raced"] = True
                delta_delete_where(spark, t, "id = 2")
            return real(fs, base, matches)

        monkeypatch.setattr(dml, "_dv_descriptors", racing)
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_merge,
        )

        with pytest.raises(ValueError, match="concurrently"):
            delta_merge(
                spark,
                spark.createDataFrame([(2, "b2")], "id long, v string"),
                t,
                keys=["id"],
            )
        # the aborted merge left no data behind
        got = {(r.id, r.v) for r in read_delta(spark, t).collect()}
        assert got == {(1, "a")}


class TestDmlCli:
    def test_cli_update_and_merge(self, spark, tmp_path, capsys):
        import json as _json

        from harness_aws_etl_pipeline_spark.cli import main

        t = str(tmp_path / "t")
        write_delta(
            spark,
            spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
            t,
        )
        rc = main([
            "delta", "--path", t,
            "--update-where", "id = 1", "--set", "v=concat(v, '!')",
        ])
        assert rc == 0
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["action"] == "delta_update" and rep["rows_updated"] == 1

        src = tmp_path / "src"
        spark.createDataFrame(
            [(2, "b2"), (3, "c")], "id long, v string"
        ).write.parquet(str(src))
        rc = main([
            "delta", "--path", t, "--merge", str(src), "--keys", "id",
        ])
        assert rc == 0
        rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["action"] == "delta_merge"
        assert rep["rows_updated"] == 1 and rep["rows_inserted"] == 1
        got = {(r.id, r.v) for r in read_delta(spark, t).collect()}
        assert got == {(1, "a!"), (2, "b2"), (3, "c")}


class TestMergeNonUniqueTable:
    def test_key_matching_multiple_rows_replaces_all(self, spark, tmp_path):
        """A non-unique table: one incoming key replaces EVERY live
        row carrying it — rows_replaced reports the removed count."""
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_merge,
        )

        t = str(tmp_path / "t")
        write_delta(
            spark,
            spark.createDataFrame(
                [(1, "a"), (1, "a2"), (2, "b")], "id long, v string"
            ),
            t,
        )
        rep = delta_merge(
            spark,
            spark.createDataFrame([(1, "one")], "id long, v string"),
            t,
            keys=["id"],
        )
        assert rep["rows_updated"] == 1 and rep["rows_replaced"] == 2
        assert rep["rows_inserted"] == 0
        got = {(r.id, r.v) for r in read_delta(spark, t).collect()}
        assert got == {(1, "one"), (2, "b")}


class TestPartitionedMerge:
    def test_merge_into_partitioned_table(self, spark, tmp_path):
        import glob

        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_merge,
        )
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        t = str(tmp_path / "t")
        write_delta(
            spark,
            spark.createDataFrame(
                [(1, 0, "a"), (2, 1, "b")], "id long, p int, v string"
            ),
            t,
            partition_by=["p"],
        )
        rep = delta_merge(
            spark,
            spark.createDataFrame(
                # key 2 migrates partitions 1 -> 0; key 9 inserts
                [(2, 0, "b2"), (9, 1, "n")], "id long, p int, v string"
            ),
            t,
            keys=["id"],
            change_data=True,
        )
        assert rep["rows_updated"] == 1 and rep["rows_inserted"] == 1
        got = {(r.id, r.p, r.v) for r in read_delta(spark, t).collect()}
        assert got == {(1, 0, "a"), (2, 0, "b2"), (9, 1, "n")}
        assert glob.glob(str(tmp_path / "t" / "p=0" / "*.parquet"))
        ch = delta_changes(spark, t, 0, cdf=True)
        labels = {(r.id, r.p, r._change_type) for r in ch.collect()}
        assert (2, 1, "update_preimage") in labels
        assert (2, 0, "update_postimage") in labels
        assert (9, 1, "insert") in labels


class TestAdviceRegressionsR13:
    def test_update_interdependent_sets_swap(self, spark, tmp_path):
        """All SET expressions evaluate against the PRE-update row
        (SQL UPDATE semantics): {'a': 'b', 'b': 'a'} swaps."""
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_update_where,
        )

        t = str(tmp_path / "t")
        write_delta(
            spark,
            spark.createDataFrame(
                [(1, 10, 20), (2, 30, 40)], "id long, a long, b long"
            ),
            t,
        )
        rep = delta_update_where(
            spark, t, "id = 1", {"a": "b", "b": "a"}
        )
        assert rep["rows_updated"] == 1
        got = {(r.id, r.a, r.b) for r in read_delta(spark, t).collect()}
        assert got == {(1, 20, 10), (2, 30, 40)}

    def test_pure_insert_merge_keeps_protocol(self, spark, tmp_path):
        """A merge that matches nothing writes no DVs and must NOT
        upgrade the table protocol to reader v3."""
        import glob
        import json

        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_merge,
        )

        t = str(tmp_path / "t")
        write_delta(
            spark,
            spark.createDataFrame([(1, "a")], "id long, v string"),
            t,
        )
        rep = delta_merge(
            spark,
            spark.createDataFrame([(9, "n")], "id long, v string"),
            t,
            keys=["id"],
        )
        assert rep["rows_inserted"] == 1 and rep["rows_updated"] == 0
        commit = sorted(glob.glob(f"{t}/_delta_log/*.json"))[-1]
        actions = [
            json.loads(line)
            for line in open(commit)
            if line.strip()
        ]
        assert not any("protocol" in a for a in actions), actions
        # an actually-matching merge still upgrades
        rep = delta_merge(
            spark,
            spark.createDataFrame([(1, "up")], "id long, v string"),
            t,
            keys=["id"],
        )
        assert rep["rows_updated"] == 1
        commit = sorted(glob.glob(f"{t}/_delta_log/*.json"))[-1]
        actions = [
            json.loads(line)
            for line in open(commit)
            if line.strip()
        ]
        protos = [a["protocol"] for a in actions if "protocol" in a]
        assert protos and protos[0]["minReaderVersion"] == 3
        got = {(r.id, r.v) for r in read_delta(spark, t).collect()}
        assert got == {(1, "up"), (9, "n")}


class TestColumnMappedDml:
    """Round 13: DML on column-mapped tables — the scan restores
    logical names, staged files follow the physical layout, and
    partitionValues keys stay physical."""

    @staticmethod
    def _commit(t, v, actions):
        import json as _json
        import pathlib

        log = pathlib.Path(t) / "_delta_log"
        log.mkdir(parents=True, exist_ok=True)
        (log / f"{v:020d}.json").write_text(
            "\n".join(_json.dumps(a) for a in actions) + "\n"
        )

    def _name_mapped_table(self, spark, tmp_path, partition=False):
        import json as _json

        t = str(tmp_path / "t")
        fields = [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-aa"}},
            {"name": "v", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-bb"}},
        ]
        pcols = []
        if partition:
            fields.append(
                {"name": "p", "type": "integer", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 3,
                              "delta.columnMapping.physicalName": "col-pp"}}
            )
            pcols = ["p"]
        schema = _json.dumps({"type": "struct", "fields": fields})
        meta = {
            "metaData": {
                "id": "tbl-cm",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema,
                "partitionColumns": pcols,
                "configuration": {"delta.columnMapping.mode": "name"},
            }
        }
        import glob as _glob
        import shutil

        stage = tmp_path / "stage"
        rows = [(i, f"v{i}") for i in range(6)]
        adds = []
        if partition:
            for pval in (0, 1):
                spark.createDataFrame(
                    [(i, s) for i, s in rows if i % 2 == pval],
                    "`col-aa` long, `col-bb` string",
                ).coalesce(1).write.mode("overwrite").parquet(str(stage))
                rel = f"col-pp={pval}/f{pval}.parquet"
                (tmp_path / "t" / f"col-pp={pval}").mkdir(
                    parents=True, exist_ok=True
                )
                shutil.move(
                    _glob.glob(str(stage / "*.parquet"))[0],
                    str(tmp_path / "t" / rel),
                )
                adds.append(
                    {"add": {"path": rel,
                             "partitionValues": {"col-pp": str(pval)},
                             "size": 1, "modificationTime": 0,
                             "dataChange": True}}
                )
        else:
            spark.createDataFrame(
                rows, "`col-aa` long, `col-bb` string"
            ).coalesce(1).write.mode("overwrite").parquet(str(stage))
            (tmp_path / "t").mkdir(parents=True, exist_ok=True)
            shutil.move(
                _glob.glob(str(stage / "*.parquet"))[0],
                str(tmp_path / "t" / "f0.parquet"),
            )
            adds.append(
                {"add": {"path": "f0.parquet", "partitionValues": {},
                         "size": 1, "modificationTime": 0,
                         "dataChange": True}}
            )
        self._commit(t, 0, [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            meta, *adds,
        ])
        return t

    def _id_mapped_table(self, spark, tmp_path):
        import glob as _glob
        import json as _json
        import shutil

        from pyspark.sql import types as T

        t = str(tmp_path / "t")
        schema = _json.dumps({
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName": "col-aa"}},
                {"name": "v", "type": "string", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 2,
                              "delta.columnMapping.physicalName": "col-bb"}},
            ],
        })
        st = T.StructType([
            T.StructField("col-aa", T.LongType(), True,
                          {"parquet.field.id": 1}),
            T.StructField("col-bb", T.StringType(), True,
                          {"parquet.field.id": 2}),
        ])
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        stage = tmp_path / "stage"
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(6)], st
        ).coalesce(1).write.mode("overwrite").parquet(str(stage))
        (tmp_path / "t").mkdir(parents=True, exist_ok=True)
        shutil.move(
            _glob.glob(str(stage / "*.parquet"))[0],
            str(tmp_path / "t" / "f0.parquet"),
        )
        self._commit(t, 0, [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": {
                "id": "tbl-id",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema,
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "id"},
            }},
            {"add": {"path": "f0.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0,
                     "dataChange": True}},
        ])
        return t

    def test_name_mapped_update_merge_delete(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_merge,
            delta_update_where,
        )

        t = self._name_mapped_table(spark, tmp_path)
        rep = delta_update_where(
            spark, t, "id = 1", {"v": "concat(v, '-up')"}
        )
        assert rep["rows_updated"] == 1
        got = {(r.id, r.v) for r in read_delta(spark, t).collect()}
        assert got == {(i, f"v{i}") for i in range(6) if i != 1} | {
            (1, "v1-up")
        }
        # staged files carry PHYSICAL column names
        snap = delta_snapshot(spark, t)
        new_keys = [k for k in snap["files"] if k != "f0.parquet"]
        assert new_keys
        import posixpath as _pp

        sch = spark.read.parquet(
            _pp.join(t, new_keys[0])
        ).schema
        assert [f.name for f in sch.fields] == ["col-aa", "col-bb"]
        # merge: update + insert
        rep = delta_merge(
            spark,
            spark.createDataFrame(
                [(2, "V2"), (9, "n")], "id long, v string"
            ),
            t,
            keys=["id"],
        )
        assert rep["rows_updated"] == 1 and rep["rows_inserted"] == 1
        got = {(r.id, r.v) for r in read_delta(spark, t).collect()}
        assert got == {(0, "v0"), (1, "v1-up"), (2, "V2"), (3, "v3"),
                       (4, "v4"), (5, "v5"), (9, "n")}
        # delete composes with the DVs
        rep = delta_delete_where(spark, t, "id >= 4 AND id < 9")
        assert rep["rows_deleted"] == 2
        got = {r.id for r in read_delta(spark, t).collect()}
        assert got == {0, 1, 2, 3, 9}

    def test_name_mapped_partitioned_update(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_update_where,
        )

        t = self._name_mapped_table(spark, tmp_path, partition=True)
        rep = delta_update_where(
            spark, t, "p = 1 AND id = 1", {"v": "'up'"}
        )
        assert rep["rows_updated"] == 1
        got = {(r.id, r.v, r.p) for r in read_delta(spark, t).collect()}
        assert got == {
            (i, f"v{i}", i % 2) for i in range(6) if i != 1
        } | {(1, "up", 1)}
        # new add actions carry PHYSICAL partitionValues keys
        snap = delta_snapshot(spark, t)
        new = [
            add
            for k, add in snap["files"].items()
            if not k.startswith("col-pp=") or "/f" not in k
        ]
        assert any(
            "col-pp" in (add.get("partitionValues") or {}) for add in new
        )

    def test_id_mapped_update_and_merge(self, spark, tmp_path):
        import pyarrow.parquet as pq

        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_merge,
            delta_update_where,
        )

        t = self._id_mapped_table(spark, tmp_path)
        rep = delta_update_where(spark, t, "id = 0", {"v": "'up'"})
        assert rep["rows_updated"] == 1
        got = {(r.id, r.v) for r in read_delta(spark, t).collect()}
        assert got == {(i, f"v{i}") for i in range(1, 6)} | {(0, "up")}
        # the staged file carries parquet FIELD IDS (id-mode readers
        # resolve by id; names are immaterial)
        snap = delta_snapshot(spark, t)
        new_keys = [k for k in snap["files"] if k != "f0.parquet"]
        assert new_keys
        import posixpath as _pp

        psch = pq.read_schema(_pp.join(t, new_keys[0]))
        ids = {
            psch.field(i).name: (psch.field(i).metadata or {}).get(
                b"PARQUET:field_id"
            )
            for i in range(len(psch.names))
        }
        assert set(ids.values()) == {b"1", b"2"}
        rep = delta_merge(
            spark,
            spark.createDataFrame([(5, "V5"), (7, "n")],
                                  "id long, v string"),
            t,
            keys=["id"],
        )
        assert rep["rows_updated"] == 1 and rep["rows_inserted"] == 1
        got = {(r.id, r.v) for r in read_delta(spark, t).collect()}
        assert got == {(0, "up"), (1, "v1"), (2, "v2"), (3, "v3"),
                       (4, "v4"), (5, "V5"), (7, "n")}

    def test_mapped_cdf_write_and_read(self, spark, tmp_path):
        """Round 13 follow-up: CDF on column-mapped tables — DML
        writes PHYSICAL-layout change files; delta_changes(cdf=True)
        reads them back with logical names."""
        import json as _json

        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_update_where,
        )
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        t = self._name_mapped_table(spark, tmp_path)
        # flip on CDF via a metadata commit (carrying the mapping)
        log = sorted(glob.glob(f"{t}/_delta_log/*.json"))[0]
        meta = next(
            _json.loads(line)
            for line in open(log)
            if '"metaData"' in line
        )
        meta["metaData"]["configuration"][
            "delta.enableChangeDataFeed"
        ] = "true"
        self._commit(t, 1, [meta])
        rep = delta_update_where(
            spark, t, "id = 1", {"v": "concat(v, '-up')"}
        )
        assert rep["rows_updated"] == 1
        # the change file itself follows the physical layout
        cdc = glob.glob(f"{t}/_change_data/*.parquet")
        assert cdc
        psch = spark.read.parquet(cdc[0]).schema
        assert {f.name for f in psch.fields} == {
            "col-aa", "col-bb", "_change_type"
        }
        got = {
            (r.id, r.v, r._change_type)
            for r in delta_changes(spark, t, 1, cdf=True).collect()
        }
        assert got == {
            (1, "v1", "update_preimage"),
            (1, "v1-up", "update_postimage"),
        }

    def test_id_mapped_cdf_read(self, spark, tmp_path):
        import json as _json

        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_delete_where,
        )
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        t = self._id_mapped_table(spark, tmp_path)
        log = sorted(glob.glob(f"{t}/_delta_log/*.json"))[0]
        meta = next(
            _json.loads(line)
            for line in open(log)
            if '"metaData"' in line
        )
        meta["metaData"]["configuration"][
            "delta.enableChangeDataFeed"
        ] = "true"
        self._commit(t, 1, [meta])
        rep = delta_delete_where(spark, t, "id IN (0, 3)")
        assert rep["rows_deleted"] == 2
        got = {
            (r.id, r.v, r._change_type)
            for r in delta_changes(spark, t, 1, cdf=True).collect()
        }
        assert got == {(0, "v0", "delete"), (3, "v3", "delete")}


class TestNestedIdMappedDml:
    """Round 13: DML on id-mapped tables with NESTED mapped columns —
    field ids attach at every level via a metadata-carrying plan
    schema (the old loud reject is gone)."""

    def _nested_id_table(self, spark, tmp_path):
        import glob as _glob
        import json as _json
        import shutil

        from pyspark.sql import types as T

        t = str(tmp_path / "t")
        schema = _json.dumps({
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName": "col-aa"}},
                {"name": "s", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 2,
                              "delta.columnMapping.physicalName": "col-ss"},
                 "type": {"type": "struct", "fields": [
                     {"name": "a", "type": "long", "nullable": True,
                      "metadata": {"delta.columnMapping.id": 3,
                                   "delta.columnMapping.physicalName": "col-a"}},
                     {"name": "b", "type": "string", "nullable": True,
                      "metadata": {"delta.columnMapping.id": 4,
                                   "delta.columnMapping.physicalName": "col-b"}},
                 ]}},
            ],
        })
        st = T.StructType([
            T.StructField("col-aa", T.LongType(), True,
                          {"parquet.field.id": 1}),
            T.StructField("col-ss", T.StructType([
                T.StructField("col-a", T.LongType(), True,
                              {"parquet.field.id": 3}),
                T.StructField("col-b", T.StringType(), True,
                              {"parquet.field.id": 4}),
            ]), True, {"parquet.field.id": 2}),
        ])
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        stage = tmp_path / "stage"
        spark.createDataFrame(
            [(i, (i * 10, f"v{i}")) for i in range(4)], st
        ).coalesce(1).write.mode("overwrite").parquet(str(stage))
        (tmp_path / "t").mkdir(parents=True, exist_ok=True)
        shutil.move(
            _glob.glob(str(stage / "*.parquet"))[0],
            str(tmp_path / "t" / "f0.parquet"),
        )
        TestColumnMappedDml._commit(t, 0, [
            {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
            {"metaData": {
                "id": "tbl-nid",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema,
                "partitionColumns": [],
                "configuration": {"delta.columnMapping.mode": "id"},
            }},
            {"add": {"path": "f0.parquet", "partitionValues": {},
                     "size": 1, "modificationTime": 0,
                     "dataChange": True}},
        ])
        return t

    def test_update_and_merge_round_trip(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_merge,
            delta_update_where,
        )

        t = self._nested_id_table(spark, tmp_path)
        base = {(r.id, r.s["a"], r.s["b"])
                for r in read_delta(spark, t).collect()}
        assert base == {(i, i * 10, f"v{i}") for i in range(4)}

        rep = delta_update_where(
            spark, t, "id = 1",
            {"s": "named_struct('a', s.a + 5, 'b', 'UP')"},
        )
        assert rep["rows_updated"] == 1
        got = {(r.id, r.s["a"], r.s["b"])
               for r in read_delta(spark, t).collect()}
        assert got == {(0, 0, "v0"), (1, 15, "UP"),
                       (2, 20, "v2"), (3, 30, "v3")}

        # keyed merge: replace id=2, insert id=9
        src = spark.createDataFrame(
            [(2, (222, "m2")), (9, (99, "m9"))],
            "id long, s struct<a: long, b: string>",
        )
        delta_merge(spark, src, t, keys=["id"])
        got = {(r.id, r.s["a"], r.s["b"])
               for r in read_delta(spark, t).collect()}
        assert got == {(0, 0, "v0"), (1, 15, "UP"),
                       (2, 222, "m2"), (3, 30, "v3"), (9, 99, "m9")}
        # the staged files carry field ids at the nested level
        import glob as _glob

        import pyarrow.parquet as pq

        newest = max(
            _glob.glob(str(tmp_path / "t" / "*.parquet")),
            key=lambda p: p,
        )
        txt = str(pq.ParquetFile(newest).schema)
        assert "field_id=3" in txt and "field_id=4" in txt
