"""Native Hudi CoW writer (sinks/hudiwrite.py): append/overwrite round
trips through the in-repo reader, replacecommit supersession, instant
CAS race, incremental changes over written commits."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.hudiwrite import write_hudi
from harness_aws_etl_pipeline_spark.sources.hudiread import (
    hudi_changes,
    hudi_snapshot,
    hudi_timeline,
    read_hudi,
)


class TestRoundTrip:
    def test_append_and_changes(self, spark, tmp_path):
        t = str(tmp_path / "t")
        rep = write_hudi(spark, spark.range(4).withColumn("v", F.lit("a")), t)
        assert rep["action"] == "commit" and rep["files_added"] >= 1
        first = rep["instant"]
        time.sleep(0.01)
        write_hudi(spark, spark.range(4, 6).withColumn("v", F.lit("b")), t)
        got = {(r.id, r.v) for r in read_hudi(spark, t).collect()}
        assert got == {
            (0, "a"), (1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b")
        }
        # time travel to the first instant
        assert read_hudi(spark, t, as_of_instant=first).count() == 4
        # incremental: appends are representable
        inc = {(r.id, r.v) for r in hudi_changes(spark, t, first).collect()}
        assert inc == {(4, "b"), (5, "b")}

    def test_overwrite_is_replacecommit(self, spark, tmp_path):
        t = str(tmp_path / "t")
        rep0 = write_hudi(
            spark, spark.range(5).withColumn("v", F.lit("old")), t
        )
        time.sleep(0.01)
        rep = write_hudi(
            spark,
            spark.range(9, 11).withColumn("v", F.lit("new")),
            t,
            mode="overwrite",
        )
        assert rep["action"] == "replacecommit"
        assert rep["groups_replaced"] >= 1
        got = {(r.id, r.v) for r in read_hudi(spark, t).collect()}
        assert got == {(9, "new"), (10, "new")}
        # old groups still on disk; time travel sees them
        old = {
            (r.id, r.v)
            for r in read_hudi(spark, t, as_of_instant=rep0["instant"]).collect()
        }
        assert old == {(i, "old") for i in range(5)}
        actions = [x["action"] for x in hudi_timeline(spark, t)]
        assert actions == ["commit", "replacecommit"]
        snap = hudi_snapshot(spark, t)
        assert snap["file_groups"] == rep["files_added"]

    def test_concurrent_appenders_both_land(self, spark, tmp_path):
        import threading

        t = str(tmp_path / "t")
        write_hudi(spark, spark.range(0).withColumn("v", F.lit("")), t)
        errs: list[Exception] = []

        def go(lo: int):
            try:
                write_hudi(
                    spark,
                    spark.range(lo, lo + 2).withColumn("v", F.lit(str(lo))),
                    t,
                )
            except Exception as e:  # noqa: BLE001 - surfaced below
                errs.append(e)

        th = [threading.Thread(target=go, args=(lo,)) for lo in (10, 20)]
        for x in th:
            x.start()
        for x in th:
            x.join()
        assert not errs
        assert {r.id for r in read_hudi(spark, t).collect()} == {
            10, 11, 20, 21
        }

    def test_guards(self, spark, tmp_path):
        with pytest.raises(ValueError, match="mode"):
            write_hudi(spark, spark.range(1), str(tmp_path / "t"), mode="upsert")
        mor = tmp_path / "mor" / ".hoodie"
        mor.mkdir(parents=True)
        (mor / "hoodie.properties").write_text(
            "hoodie.table.name=m\nhoodie.table.type=MERGE_ON_READ\n"
        )
        with pytest.raises(ValueError, match="MERGE_ON_READ"):
            write_hudi(spark, spark.range(1), str(tmp_path / "mor"))

    def test_overwrite_replaces_concurrently_appended_group(
        self, spark, tmp_path, monkeypatch
    ):
        """An append that commits while the overwrite stages/retries
        must still be superseded: partitionToReplaceFileIds is
        recomputed from the live snapshot inside the retry loop."""
        import harness_aws_etl_pipeline_spark.sinks.hudiwrite as hw

        t = str(tmp_path / "t")
        write_hudi(spark, spark.range(5).withColumn("v", F.lit("old")), t)
        real_get_fs = hw.get_fs
        state = {"raced": False}

        class RacingFs:
            def __init__(self, inner):
                self._inner = inner

            def __getattr__(self, name):
                return getattr(self._inner, name)

            def rename_if_absent(self, src, dst):
                if not state["raced"]:
                    state["raced"] = True
                    write_hudi(
                        spark,
                        spark.range(3).withColumn("v", F.lit("race")),
                        t,
                    )
                    return False  # we lost the instant claim
                return self._inner.rename_if_absent(src, dst)

        monkeypatch.setattr(
            hw, "get_fs", lambda p, s: RacingFs(real_get_fs(p, s))
        )
        rep = write_hudi(
            spark,
            spark.range(2).withColumn("v", F.lit("new")),
            t,
            mode="overwrite",
        )
        assert rep["retries"] == 1 and rep["action"] == "replacecommit"
        got = {(r.id, r.v) for r in read_hudi(spark, t).collect()}
        assert got == {(0, "new"), (1, "new")}  # the raced append is gone


class TestMorUpsert:
    def test_upsert_creates_then_updates(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_snapshot,
            read_hudi,
        )

        t = str(tmp_path / "t")
        rep = hudi_upsert(
            spark,
            spark.createDataFrame(
                [(1, "a"), (2, "b")], "id long, v string"
            ),
            t,
            key_col="id",
        )
        assert rep["new_groups"] == 1 and rep["rows_upserted"] == 2
        got = {
            (r.id, r.v) for r in read_hudi(spark, t, drop_meta=True).collect()
        }
        assert got == {(1, "a"), (2, "b")}
        # update one key, insert another — the update must land on the
        # EXISTING file group's log (no new group for it)
        rep = hudi_upsert(
            spark,
            spark.createDataFrame(
                [(2, "b2"), (3, "c")], "id long, v string"
            ),
            t,
            key_col="id",
        )
        assert rep["groups_logged"] == 1 and rep["new_groups"] == 1
        got = {
            (r.id, r.v) for r in read_hudi(spark, t, drop_meta=True).collect()
        }
        assert got == {(1, "a"), (2, "b2"), (3, "c")}
        snap = hudi_snapshot(spark, t)
        assert snap["table_type"] == "MERGE_ON_READ"

    def test_upsert_onto_base_file_group(self, spark, tmp_path):
        """A MOR table with a parquet base slice: the upsert's update
        block must attach to the base file's group and merge over it."""
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            read_hudi,
        )

        # build the base via the existing MOR fixture helpers
        from tests.test_hudiread import T1, _commit, _mor_base, _props

        _props(tmp_path, ttype="MERGE_ON_READ")
        _commit(tmp_path, T1)
        _mor_base(
            spark, tmp_path, "g1", T1, [("k1", 1, "a"), ("k2", 2, "b")]
        )
        t = str(tmp_path)
        rep = hudi_upsert(
            spark,
            spark.createDataFrame(
                [("k2", "", 2, "b2")],
                "_hoodie_record_key string, _hoodie_partition_path string,"
                " id long, v string",
            ),
            t,
            key_col="_hoodie_record_key",
        )
        assert rep["groups_logged"] == 1 and rep["new_groups"] == 0
        got = {(r.id, r.v) for r in read_hudi(spark, t).collect()}
        assert got == {(1, "a"), (2, "b2")}

    def test_upsert_as_of_sees_history(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_timeline,
            read_hudi,
        )

        t = str(tmp_path / "t")
        hudi_upsert(
            spark,
            spark.createDataFrame([(1, "v1")], "id long, v string"),
            t, key_col="id",
        )
        hudi_upsert(
            spark,
            spark.createDataFrame([(1, "v2")], "id long, v string"),
            t, key_col="id",
        )
        first = hudi_timeline(spark, t)[0]["instant"]
        assert {
            r.v for r in read_hudi(spark, t, as_of_instant=first).collect()
        } == {"v1"}
        assert {r.v for r in read_hudi(spark, t).collect()} == {"v2"}

    def test_row_gate_fires_before_routing_join(
        self, spark, tmp_path, monkeypatch
    ):
        """r11 verdict fix: max_upsert_rows must gate BEFORE the
        key-routing join can materialize anything driver-side — an
        oversized frame fails loudly on a join-free path."""
        import harness_aws_etl_pipeline_spark.sinks.hudiwrite as hw
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )

        t = str(tmp_path / "t")
        hudi_upsert(
            spark,
            spark.createDataFrame([(1, "a")], "id long, v string"),
            t, key_col="id",
        )

        def boom(*a, **k):
            raise AssertionError("routing join ran before the row gate")

        monkeypatch.setattr(hw, "_keys_with_groups", boom)
        with pytest.raises(ValueError, match="rows"):
            hudi_upsert(
                spark,
                spark.createDataFrame(
                    [(i, "x") for i in range(5)], "id long, v string"
                ),
                t, key_col="id", max_upsert_rows=2,
            )

    def test_racing_upserts_do_not_share_log_paths(
        self, spark, tmp_path, monkeypatch
    ):
        """r11 ADVICE fix: two upserts racing on the SAME file group
        must write distinct log files (per-attempt write token) — the
        CAS loser's cleanup must never delete the winner's committed
        log, and the retry must see the winner's bumped log version."""
        import harness_aws_etl_pipeline_spark.sinks.hudiwrite as hw
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            read_hudi,
        )

        t = str(tmp_path / "t")
        hudi_upsert(
            spark,
            spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
            t, key_col="id",
        )
        real_get_fs = hw.get_fs
        state = {"raced": False}

        class RacingFs:
            def __init__(self, inner):
                self._inner = inner

            def __getattr__(self, name):
                return getattr(self._inner, name)

            def rename_if_absent(self, src, dst):
                if not state["raced"]:
                    state["raced"] = True
                    hudi_upsert(
                        spark,
                        spark.createDataFrame(
                            [(2, "inner")], "id long, v string"
                        ),
                        t, key_col="id",
                    )
                    return False  # we lost the instant claim
                return self._inner.rename_if_absent(src, dst)

        monkeypatch.setattr(
            hw, "get_fs", lambda p, s: RacingFs(real_get_fs(p, s))
        )
        rep = hudi_upsert(
            spark,
            spark.createDataFrame([(1, "outer")], "id long, v string"),
            t, key_col="id",
        )
        assert rep["retries"] == 1
        got = {
            (r.id, r.v)
            for r in read_hudi(spark, t, drop_meta=True).collect()
        }
        # the raced (committed) upsert's row must survive the loser's
        # cleanup; the retried upsert lands on a later instant
        assert got == {(1, "outer"), (2, "inner")}

    def test_genuine_file_name_meta_column_not_misused(
        self, spark, tmp_path
    ):
        """r11 ADVICE fix: genuine Hudi base files store the FULL file
        name (fid_token_instant.parquet) in _hoodie_file_name, never
        the bare fileId — routing must derive the fid from file
        metadata, not from that column."""
        import glob
        import shutil

        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            read_hudi,
        )
        from tests.test_hudiread import T1, _commit, _props

        _props(tmp_path, ttype="MERGE_ON_READ")
        _commit(tmp_path, T1)
        fname = f"g1_0-1-2_{T1}.parquet"
        stage = tmp_path / "stage"
        spark.createDataFrame(
            [
                (T1, f"{T1}_0_1", "k1", "", fname, 1, "a"),
                (T1, f"{T1}_0_2", "k2", "", fname, 2, "b"),
            ],
            "_hoodie_commit_time string, _hoodie_commit_seqno string, "
            "_hoodie_record_key string, _hoodie_partition_path string, "
            "_hoodie_file_name string, id long, v string",
        ).coalesce(1).write.mode("overwrite").parquet(str(stage))
        src = glob.glob(str(stage / "*.parquet"))[0]
        shutil.move(src, str(tmp_path / fname))

        rep = hudi_upsert(
            spark,
            spark.createDataFrame(
                [("k2", 2, "b2")],
                "_hoodie_record_key string, id long, v string",
            ),
            str(tmp_path),
            key_col="_hoodie_record_key",
        )
        assert rep["groups_logged"] == 1 and rep["new_groups"] == 0
        got = {(r.id, r.v) for r in read_hudi(spark, str(tmp_path)).collect()}
        assert got == {(1, "a"), (2, "b2")}

    def test_upsert_guards(self, spark, tmp_path):
        import pytest as _pytest

        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )

        t = str(tmp_path / "t")
        write_hudi(spark, spark.range(2).withColumn("v", F.lit("a")), t)
        with _pytest.raises(ValueError, match="COPY_ON_WRITE"):
            hudi_upsert(
                spark,
                spark.createDataFrame([(1, "x")], "id long, v string"),
                t, key_col="id",
            )
        with _pytest.raises(ValueError, match="not in the frame"):
            hudi_upsert(
                spark,
                spark.createDataFrame([(1, "x")], "id long, v string"),
                str(tmp_path / "t2"), key_col="nope",
            )
        with _pytest.raises(ValueError, match="rows"):
            hudi_upsert(
                spark,
                spark.createDataFrame(
                    [(i, "x") for i in range(5)], "id long, v string"
                ),
                str(tmp_path / "t3"), key_col="id", max_upsert_rows=2,
            )


class TestPartitionedWrites:
    """Round 12: hive-style partitioned layouts for CoW writes and
    partition-scoped (non-global simple index) MOR upserts."""

    def test_partitioned_cow_round_trip(self, spark, tmp_path):
        import glob

        t = str(tmp_path / "t")
        rep = write_hudi(
            spark,
            spark.createDataFrame(
                [(0, 1, "a"), (1, 2, "b")], "id long, p int, v string"
            ),
            t,
            partition_by=["p"],
        )
        first = rep["instant"]
        assert glob.glob(str(tmp_path / "t" / "p=1" / "*.parquet"))
        assert glob.glob(str(tmp_path / "t" / "p=2" / "*.parquet"))
        # data files still CONTAIN the partition column
        back = spark.read.parquet(
            *glob.glob(str(tmp_path / "t" / "p=1" / "*.parquet"))
        )
        assert "p" in back.columns
        # append WITHOUT partition_by inherits the recorded fields
        time.sleep(0.01)
        write_hudi(
            spark,
            spark.createDataFrame([(2, 1, "c")], "id long, p int, v string"),
            t,
        )
        got = {(r.id, r.p, r.v) for r in read_hudi(spark, t).collect()}
        assert got == {(0, 1, "a"), (1, 2, "b"), (2, 1, "c")}
        assert read_hudi(spark, t, as_of_instant=first).count() == 2
        with pytest.raises(ValueError, match="partition"):
            write_hudi(
                spark,
                spark.createDataFrame(
                    [(9, 9, "z")], "id long, p int, v string"
                ),
                t,
                partition_by=["v"],
            )

    def test_partitioned_overwrite_replaces_every_partition(
        self, spark, tmp_path
    ):
        t = str(tmp_path / "t")
        write_hudi(
            spark,
            spark.createDataFrame(
                [(0, 1, "old"), (1, 2, "old")], "id long, p int, v string"
            ),
            t,
            partition_by=["p"],
        )
        time.sleep(0.01)
        rep = write_hudi(
            spark,
            spark.createDataFrame([(7, 3, "new")], "id long, p int, v string"),
            t,
            mode="overwrite",
        )
        assert rep["action"] == "replacecommit"
        assert rep["groups_replaced"] >= 2
        got = {(r.id, r.p, r.v) for r in read_hudi(spark, t).collect()}
        assert got == {(7, 3, "new")}

    def test_partition_scoped_mor_upsert(self, spark, tmp_path):
        import glob

        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )

        t = str(tmp_path / "t")
        rep = hudi_upsert(
            spark,
            spark.createDataFrame(
                [(1, "x", "a"), (2, "x", "b"), (1, "y", "c")],
                "id long, region string, v string",
            ),
            t,
            key_col="id",
            partition_by=["region"],
        )
        # one new log-only group PER PARTITION
        assert rep["new_groups"] == 2 and rep["groups_logged"] == 0
        got = {
            (r.id, r.region, r.v)
            for r in read_hudi(spark, t, drop_meta=True).collect()
        }
        assert got == {(1, "x", "a"), (2, "x", "b"), (1, "y", "c")}
        # key 1 updated ONLY within partition x — the simple index is
        # partition-scoped, so (1, y) must keep its value
        rep = hudi_upsert(
            spark,
            spark.createDataFrame(
                [(1, "x", "a2")], "id long, region string, v string"
            ),
            t,
            key_col="id",
        )
        assert rep["groups_logged"] == 1 and rep["new_groups"] == 0
        got = {
            (r.id, r.region, r.v)
            for r in read_hudi(spark, t, drop_meta=True).collect()
        }
        assert got == {(1, "x", "a2"), (2, "x", "b"), (1, "y", "c")}
        # log files live inside their partition directories
        logs = glob.glob(str(tmp_path / "t" / "region=x" / ".*.log.*"))
        assert logs

    def test_partitioned_mor_compaction(self, spark, tmp_path):
        import glob

        from harness_aws_etl_pipeline_spark.sinks.compact import (
            hudi_compact,
        )
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )

        t = str(tmp_path / "t")
        hudi_upsert(
            spark,
            spark.createDataFrame(
                [(1, "x", "a"), (2, "y", "b")],
                "id long, region string, v string",
            ),
            t,
            key_col="id",
            partition_by=["region"],
        )
        hudi_upsert(
            spark,
            spark.createDataFrame(
                [(2, "y", "b2")], "id long, region string, v string"
            ),
            t,
            key_col="id",
        )
        rep = hudi_compact(spark, t)
        assert rep["groups_compacted"] == 2
        # compacted base slices land inside the partition dirs
        assert glob.glob(str(tmp_path / "t" / "region=x" / "*.parquet"))
        assert glob.glob(str(tmp_path / "t" / "region=y" / "*.parquet"))
        got = {
            (r.id, r.region, r.v)
            for r in read_hudi(spark, t, drop_meta=True).collect()
        }
        assert got == {(1, "x", "a"), (2, "y", "b2")}


class TestCliWrite:
    def test_cli_partitioned_write(self, spark, tmp_path, capsys):
        import glob
        import json

        from harness_aws_etl_pipeline_spark.cli import main

        src = tmp_path / "src"
        spark.createDataFrame(
            [(0, 1, "a"), (1, 2, "b")], "id long, p int, v string"
        ).write.parquet(str(src))
        t = tmp_path / "t"
        rc = main([
            "hudi", "--path", str(t), "--write", str(src),
            "--partition-by", "p",
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["action"] == "hudi_write" and rep["files_added"] >= 2
        assert glob.glob(str(t / "p=2" / "*.parquet"))
        assert read_hudi(spark, str(t)).count() == 2


class TestSchemaEvolution:
    """CoW appends evolve the schema (union footer reads); type
    conflicts and MOR log-only new columns reject loudly — before
    this, an evolved append's column silently vanished from reads."""

    def test_cow_append_new_column(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            read_hudi,
        )

        t = str(tmp_path / "t")
        write_hudi(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"), t
        )
        write_hudi(
            spark,
            spark.createDataFrame(
                [(2, "b", 9.5)], "id long, v string, score double"
            ),
            t,
        )
        df = read_hudi(spark, t)
        assert set(df.columns) == {"id", "v", "score"}
        assert sorted(tuple(r) for r in df.collect()) == [
            (1, "a", None),
            (2, "b", 9.5),
        ]

    def test_cow_type_conflict_rejects(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_hudi(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"), t
        )
        with pytest.raises(ValueError, match="schema conflict"):
            write_hudi(
                spark,
                spark.createDataFrame([("x", "c")], "id string, v string"),
                t,
            )
        # lossless widening is allowed in either direction
        write_hudi(
            spark,
            spark.createDataFrame([(3, "c")], "id int, v string"),
            t,
        )

    def test_mor_upsert_new_column_rejects(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )

        t = str(tmp_path / "t")
        hudi_upsert(
            spark,
            spark.createDataFrame([(1, "a")], "id long, v string"),
            t,
            key_col="id",
        )
        with pytest.raises(ValueError, match="log-only"):
            hudi_upsert(
                spark,
                spark.createDataFrame(
                    [(1, "A", 5)], "id long, v string, n long"
                ),
                t,
                key_col="id",
            )


class TestRecordedSchema:
    """Commit metadata records the table schema (extraMetadata.schema,
    the real-Hudi convention) so readers skip the footer-union pass;
    non-Avro-representable schemas skip recording and fall back."""

    def test_record_evolve_and_fallback(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_recorded_schema,
            read_hudi,
        )

        t = str(tmp_path / "t")
        write_hudi(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"), t
        )
        rec = hudi_recorded_schema(spark, t)
        assert [f.name for f in rec.fields] == ["id", "v"]
        # evolved append records the UNION schema
        write_hudi(
            spark,
            spark.createDataFrame(
                [(2, "b", 9.5)], "id long, v string, score double"
            ),
            t,
        )
        rec = hudi_recorded_schema(spark, t)
        assert [f.name for f in rec.fields] == ["id", "v", "score"]
        assert sorted(tuple(r) for r in read_hudi(spark, t).collect()) == [
            (1, "a", None),
            (2, "b", 9.5),
        ]

    def test_unmappable_skips_recording(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_recorded_schema,
            read_hudi,
        )

        t = str(tmp_path / "t")
        # array columns have no Avro mapping in this codec — the
        # write succeeds, recording is skipped, readers fall back to
        # the footer union (date/timestamp/decimal DO record now)
        write_hudi(
            spark,
            spark.createDataFrame(
                [(1, [1, 2])], "id long, xs array<long>"
            ),
            t,
        )
        assert hudi_recorded_schema(spark, t) is None
        assert read_hudi(spark, t).count() == 1

    def test_mor_and_compaction_carry_schema(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.compact import (
            hudi_compact,
        )
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_recorded_schema,
            read_hudi,
        )

        t = str(tmp_path / "t")
        hudi_upsert(
            spark,
            spark.createDataFrame([(1, "a")], "id long, v string"),
            t,
            key_col="id",
        )
        hudi_upsert(
            spark,
            spark.createDataFrame([(1, "A")], "id long, v string"),
            t,
            key_col="id",
        )
        rec = hudi_recorded_schema(spark, t)
        assert "_hoodie_record_key" in [f.name for f in rec.fields]
        hudi_compact(spark, t)
        assert hudi_recorded_schema(spark, t) is not None
        assert sorted(
            (r.id, r.v)
            for r in read_hudi(spark, t, drop_meta=True).collect()
        ) == [(1, "A")]


class TestLogicalTypeUpserts:
    """MOR upserts with date / timestamp / decimal columns — encoded
    as Avro logical types in the log blocks, zone-proof round trip."""

    def test_round_trip_under_non_utc_session(self, spark, tmp_path):
        import datetime
        import decimal

        from pyspark.sql import types as T

        from harness_aws_etl_pipeline_spark.sinks.compact import (
            hudi_compact,
        )
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            read_hudi,
        )

        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("d", T.DateType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("amt", T.DecimalType(10, 2)),
            ]
        )
        ts = datetime.datetime(
            2024, 3, 1, 12, 30, 45, 123456, tzinfo=datetime.timezone.utc
        )
        t = str(tmp_path / "t")
        tz = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        try:
            hudi_upsert(
                spark,
                spark.createDataFrame(
                    [(1, datetime.date(2024, 3, 1), ts,
                      decimal.Decimal("12.34"))],
                    schema,
                ),
                t,
                key_col="id",
            )
            hudi_upsert(
                spark,
                spark.createDataFrame(
                    [(1, datetime.date(2025, 1, 2), ts,
                      decimal.Decimal("-5.67")), (2, None, None, None)],
                    schema,
                ),
                t,
                key_col="id",
            )
            out = read_hudi(spark, t, drop_meta=True)
            got = {
                (r.id, r.d, r["um"], r.amt)
                for r in out.withColumn(
                    "um", F.unix_micros("ts")
                ).collect()
            }
            exp_um = int(ts.timestamp() * 1_000_000)
            assert got == {
                (1, datetime.date(2025, 1, 2), exp_um,
                 decimal.Decimal("-5.67")),
                (2, None, None, None),
            }
            # survives compaction (avro → parquet base slice)
            hudi_compact(spark, t)
            assert {
                (r.id, r.amt)
                for r in read_hudi(spark, t, drop_meta=True).collect()
            } == {(1, decimal.Decimal("-5.67")), (2, None)}
        finally:
            spark.conf.set("spark.sql.session.timeZone", tz)

    def test_unmappable_type_still_rejects(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )

        with pytest.raises(ValueError, match="Avro-mappable"):
            hudi_upsert(
                spark,
                spark.createDataFrame(
                    [(1, [1, 2])], "id long, xs array<long>"
                ),
                str(tmp_path / "t"),
                key_col="id",
            )


    def test_partitioned_evolved_append(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            read_hudi,
        )

        t = str(tmp_path / "t")
        write_hudi(
            spark,
            spark.createDataFrame(
                [(1, "a", 0)], "id long, v string, p int"
            ),
            t,
            partition_by=["p"],
        )
        write_hudi(
            spark,
            spark.createDataFrame(
                [(2, "b", 1, 9.5)], "id long, v string, p int, score double"
            ),
            t,
        )
        assert sorted(
            tuple(r) for r in read_hudi(spark, t).collect()
        ) == [(1, "a", 0, None), (2, "b", 1, 9.5)]
