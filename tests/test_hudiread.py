"""Hudi CoW reader (sources/hudiread.py): hand-built spec layouts —
file-group slice selection, as-of time travel, in-flight slices
ignored, partitioned walk, meta-column handling, MoR rejection."""

from __future__ import annotations

import glob
import shutil

import pytest

from harness_aws_etl_pipeline_spark.sources.hudiread import (
    hudi_changes,
    hudi_snapshot,
    hudi_timeline,
    read_hudi,
)

T1, T2, T3 = "20240101000000", "20240102000000", "20240103000000"


def _props(tmp_path, ttype="COPY_ON_WRITE"):
    h = tmp_path / ".hoodie"
    h.mkdir(exist_ok=True)
    (h / "hoodie.properties").write_text(
        f"#props\nhoodie.table.name=t\nhoodie.table.type={ttype}\n"
    )


def _commit(tmp_path, instant):
    (tmp_path / ".hoodie" / f"{instant}.commit").write_text("{}")


def _slice(spark, tmp_path, part, fid, instant, rows):
    stage = tmp_path / "stage"
    spark.createDataFrame(rows, "id long, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(stage))
    dest = tmp_path / part if part else tmp_path
    dest.mkdir(parents=True, exist_ok=True)
    src = glob.glob(str(stage / "*.parquet"))[0]
    shutil.move(src, str(dest / f"{fid}_0-1-2_{instant}.parquet"))


class TestHudi:
    def _table(self, spark, tmp_path):
        _props(tmp_path)
        _commit(tmp_path, T1)
        _commit(tmp_path, T2)
        # group g1 rewritten at T2; g2 only at T1; g3 in a partition;
        # g4 belongs to an UNCOMMITTED instant T3 and must be ignored
        _slice(spark, tmp_path, "", "g1", T1, [(1, "old")])
        _slice(spark, tmp_path, "", "g1", T2, [(1, "new")])
        _slice(spark, tmp_path, "", "g2", T1, [(2, "two")])
        _slice(spark, tmp_path, "p=1", "g3", T2, [(3, "part")])
        _slice(spark, tmp_path, "", "g4", T3, [(9, "inflight")])
        return tmp_path

    def test_snapshot_latest_slice_per_group(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        got = {(r.id, r.v) for r in read_hudi(spark, str(t)).collect()}
        assert got == {(1, "new"), (2, "two"), (3, "part")}
        snap = hudi_snapshot(spark, str(t))
        assert snap["instant"] == T2 and snap["file_groups"] == 3

    def test_as_of_time_travel(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        got = {
            (r.id, r.v)
            for r in read_hudi(spark, str(t), as_of_instant=T1).collect()
        }
        assert got == {(1, "old"), (2, "two")}
        # an instant between commits resolves to the newest <= it
        mid = "20240101120000"
        assert hudi_snapshot(spark, str(t), mid)["instant"] == T1
        with pytest.raises(ValueError, match="at or before"):
            hudi_snapshot(spark, str(t), "20230101000000")

    def test_replacecommit_excludes_replaced_file_groups(
        self, spark, tmp_path
    ):
        """Round-10: clustering / insert_overwrite write a
        .replacecommit whose partitionToReplaceFileIds lists the
        superseded file groups; the old fileIds stay on disk until
        cleaning, so the snapshot must exclude them or every affected
        row comes back twice."""
        import json

        _props(tmp_path)
        _commit(tmp_path, T1)
        _slice(spark, tmp_path, "", "g1", T1, [(1, "one")])
        _slice(spark, tmp_path, "", "g2", T1, [(2, "two")])
        _slice(spark, tmp_path, "p=1", "g3", T1, [(3, "three")])
        # T2 clusters g1+g2 into a NEW file group g9 (same rows)
        _slice(spark, tmp_path, "", "g9", T2, [(1, "one"), (2, "two")])
        (tmp_path / ".hoodie" / f"{T2}.replacecommit").write_text(
            json.dumps({
                "partitionToReplaceFileIds": {"": ["g1", "g2"]},
            })
        )
        got = {(r.id, r.v) for r in read_hudi(spark, str(tmp_path)).collect()}
        assert got == {(1, "one"), (2, "two"), (3, "three")}
        snap = hudi_snapshot(spark, str(tmp_path))
        assert snap["file_groups"] == 2  # g9 + g3; g1/g2 replaced
        # time travel BEFORE the replacecommit still sees g1/g2
        old = {
            (r.id, r.v)
            for r in read_hudi(spark, str(tmp_path), as_of_instant=T1).collect()
        }
        assert old == {(1, "one"), (2, "two"), (3, "three")}
        assert hudi_snapshot(spark, str(tmp_path), T1)["file_groups"] == 3

    def test_insert_overwrite_partition(self, spark, tmp_path):
        """insert_overwrite of one partition: stale rows must NOT
        resurface from the replaced group."""
        import json

        _props(tmp_path)
        _commit(tmp_path, T1)
        _slice(spark, tmp_path, "p=1", "g1", T1, [(1, "stale")])
        _slice(spark, tmp_path, "p=1", "g8", T2, [(1, "fresh")])
        (tmp_path / ".hoodie" / f"{T2}.replacecommit").write_text(
            json.dumps({"partitionToReplaceFileIds": {"p=1": ["g1"]}})
        )
        got = {(r.id, r.v) for r in read_hudi(spark, str(tmp_path)).collect()}
        assert got == {(1, "fresh")}

    def test_corrupt_replacecommit_rejected(self, spark, tmp_path):
        _props(tmp_path)
        _commit(tmp_path, T1)
        _slice(spark, tmp_path, "", "g1", T1, [(1, "one")])
        (tmp_path / ".hoodie" / f"{T2}.replacecommit").write_text("not json")
        with pytest.raises(ValueError, match="replacecommit"):
            hudi_snapshot(spark, str(tmp_path))

    def test_hudi_changes_append_only(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_changes,
        )

        _props(tmp_path)
        _commit(tmp_path, T1)
        _commit(tmp_path, T2)
        _slice(spark, tmp_path, "", "g1", T1, [(1, "one")])
        _slice(spark, tmp_path, "p=1", "g2", T1, [(2, "two")])
        _slice(spark, tmp_path, "", "g5", T2, [(5, "five")])
        got = {
            (r.id, r.v)
            for r in hudi_changes(spark, str(tmp_path), T1).collect()
        }
        assert got == {(5, "five")}
        # empty window
        assert hudi_changes(spark, str(tmp_path), T2).count() == 0

    def test_hudi_changes_rejects_rewrites_and_replacecommits(
        self, spark, tmp_path
    ):
        import json

        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_changes,
        )

        _props(tmp_path)
        _commit(tmp_path, T1)
        _commit(tmp_path, T2)
        _slice(spark, tmp_path, "", "g1", T1, [(1, "old")])
        _slice(spark, tmp_path, "", "g1", T2, [(1, "new")])  # rewrite
        with pytest.raises(ValueError, match="rewrite"):
            hudi_changes(spark, str(tmp_path), T1)
        # replacecommit in the window
        _slice(spark, tmp_path, "", "g9", T3, [(1, "clustered")])
        (tmp_path / ".hoodie" / f"{T3}.replacecommit").write_text(
            json.dumps({"partitionToReplaceFileIds": {"": ["g1"]}})
        )
        with pytest.raises(ValueError, match="replacecommit"):
            hudi_changes(spark, str(tmp_path), T2)

    def test_timeline_and_guards(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        tl = hudi_timeline(spark, str(t))
        assert [x["instant"] for x in tl] == [T1, T2]
        with pytest.raises(ValueError, match="not a Hudi table"):
            hudi_timeline(spark, str(tmp_path / "nowhere"))

    def test_stray_logs_on_cow_rejected(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        (t / f".g1_{T1}.log.1_0-1-2").write_bytes(b"")
        with pytest.raises(ValueError, match="COPY_ON_WRITE"):
            hudi_snapshot(spark, str(t))

    def test_drop_meta(self, spark, tmp_path):
        # a table whose files carry _hoodie_* columns
        _props(tmp_path)
        _commit(tmp_path, T1)
        stage = tmp_path / "stage"
        spark.createDataFrame(
            [(T1, "k1", 5, "x")],
            "_hoodie_commit_time string, _hoodie_record_key string, "
            "id long, v string",
        ).coalesce(1).write.mode("overwrite").parquet(str(stage))
        src = glob.glob(str(stage / "*.parquet"))[0]
        shutil.move(src, str(tmp_path / f"g_0-0-0_{T1}.parquet"))
        df = read_hudi(spark, str(tmp_path), drop_meta=True)
        assert set(df.columns) == {"id", "v"}
        assert read_hudi(spark, str(tmp_path)).columns[0].startswith("_hoodie")


class TestCli:
    def test_hudi_cli(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main

        t = TestHudi()._table(spark, tmp_path)
        rc = main(["hudi", "--path", str(t), "--timeline"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert [x["instant"] for x in rep["timeline"]] == [T1, T2]
        rc = main(["hudi", "--path", str(t), "--as-of", T1])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["instant"] == T1 and rep["rows"] == 2


# ---------------------------------------------------------------------------
# MERGE_ON_READ (round 11): log-file merging per hudi tech-specs
# ---------------------------------------------------------------------------

import json as _json

from harness_aws_etl_pipeline_spark.sources.hudilog import (
    decode_log_blocks,
    encode_avro_block,
    encode_command_block,
    encode_delete_block,
)

T4, T5 = "20240104000000", "20240105000000"

_AVRO = _json.dumps(
    {
        "type": "record",
        "name": "rec",
        "fields": [
            {"name": "_hoodie_record_key", "type": ["null", "string"]},
            {"name": "_hoodie_partition_path", "type": ["null", "string"]},
            {"name": "id", "type": ["null", "long"]},
            {"name": "v", "type": ["null", "string"]},
        ],
    }
)


def _deltacommit(tmp_path, instant):
    (tmp_path / ".hoodie" / f"{instant}.deltacommit").write_text("{}")


def _mor_base(spark, tmp_path, fid, instant, rows):
    stage = tmp_path / "stage"
    spark.createDataFrame(
        [(k, "", i, v) for k, i, v in rows],
        "_hoodie_record_key string, _hoodie_partition_path string, "
        "id long, v string",
    ).coalesce(1).write.mode("overwrite").parquet(str(stage))
    src = glob.glob(str(stage / "*.parquet"))[0]
    shutil.move(src, str(tmp_path / f"{fid}_0-1-2_{instant}.parquet"))


def _rec(k, i, v):
    return {
        "_hoodie_record_key": k,
        "_hoodie_partition_path": "",
        "id": i,
        "v": v,
    }


class TestMergeOnRead:
    def _mor_table(self, spark, tmp_path):
        """Base at T1 (groups g1, g2) + two logs on g1: updates/insert
        at T2, a delete at T3; an UNCOMMITTED T5 block rides log 2."""
        _props(tmp_path, ttype="MERGE_ON_READ")
        _commit(tmp_path, T1)
        _mor_base(spark, tmp_path, "g1", T1, [("k1", 1, "a"), ("k2", 2, "b")])
        _mor_base(spark, tmp_path, "g2", T1, [("k3", 3, "c")])
        _deltacommit(tmp_path, T2)
        _deltacommit(tmp_path, T3)
        (tmp_path / f".g1_{T1}.log.1_0-1-2").write_bytes(
            encode_avro_block(
                _AVRO, [_rec("k1", 1, "a2"), _rec("k4", 4, "d")], T2
            )
        )
        (tmp_path / f".g1_{T1}.log.2_0-1-2").write_bytes(
            encode_delete_block([("k2", "")], T3)
            + encode_avro_block(_AVRO, [_rec("k9", 9, "never")], T5)
        )
        return tmp_path

    def test_snapshot_merges_updates_inserts_deletes(self, spark, tmp_path):
        t = self._mor_table(spark, tmp_path)
        got = {(r.id, r.v) for r in read_hudi(spark, str(t)).collect()}
        assert got == {(1, "a2"), (3, "c"), (4, "d")}
        snap = hudi_snapshot(spark, str(t))
        assert snap["table_type"] == "MERGE_ON_READ"
        assert len(snap["log_files"]) == 2 and snap["file_groups"] == 2

    def test_as_of_instant_filters_log_blocks(self, spark, tmp_path):
        t = self._mor_table(spark, tmp_path)
        at2 = {
            (r.id, r.v)
            for r in read_hudi(spark, str(t), as_of_instant=T2).collect()
        }
        assert at2 == {(1, "a2"), (2, "b"), (3, "c"), (4, "d")}
        at1 = {
            (r.id, r.v)
            for r in read_hudi(spark, str(t), as_of_instant=T1).collect()
        }
        assert at1 == {(1, "a"), (2, "b"), (3, "c")}

    def test_log_only_file_group(self, spark, tmp_path):
        _props(tmp_path, ttype="MERGE_ON_READ")
        _deltacommit(tmp_path, T1)
        _deltacommit(tmp_path, T2)
        (tmp_path / f".gx_{T1}.log.1_0-1-2").write_bytes(
            encode_avro_block(_AVRO, [_rec("k1", 1, "a")], T1)
            + encode_avro_block(
                _AVRO, [_rec("k1", 1, "a2"), _rec("k2", 2, "b")], T2
            )
        )
        got = {(r.id, r.v) for r in read_hudi(spark, str(tmp_path)).collect()}
        assert got == {(1, "a2"), (2, "b")}

    def test_rollback_command_block_voids_target_instant(
        self, spark, tmp_path
    ):
        _props(tmp_path, ttype="MERGE_ON_READ")
        _deltacommit(tmp_path, T1)
        _deltacommit(tmp_path, T2)
        _deltacommit(tmp_path, T3)
        (tmp_path / f".gx_{T1}.log.1_0-1-2").write_bytes(
            encode_avro_block(_AVRO, [_rec("k1", 1, "keep")], T1)
            + encode_avro_block(_AVRO, [_rec("k1", 1, "bad")], T2)
            + encode_command_block(T3, T2)  # rollback of the T2 block
        )
        got = {(r.id, r.v) for r in read_hudi(spark, str(tmp_path)).collect()}
        assert got == {(1, "keep")}

    def test_later_block_in_same_instant_wins(self, spark, tmp_path):
        _props(tmp_path, ttype="MERGE_ON_READ")
        _deltacommit(tmp_path, T1)
        (tmp_path / f".gx_{T1}.log.1_0-1-2").write_bytes(
            encode_avro_block(_AVRO, [_rec("k1", 1, "first")], T1)
            + encode_avro_block(_AVRO, [_rec("k1", 1, "second")], T1)
        )
        got = {(r.id, r.v) for r in read_hudi(spark, str(tmp_path)).collect()}
        assert got == {(1, "second")}

    def test_foreign_block_types_reject_loudly(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.hudilog import (
            _frame_block,
            _T_PARQUET,
            H_INSTANT_TIME,
        )

        with pytest.raises(ValueError, match="parquet"):
            decode_log_blocks(
                _frame_block(_T_PARQUET, {H_INSTANT_TIME: T1}, b"xx")
            )

    def test_torn_tail_is_skipped(self, spark, tmp_path):
        good = encode_avro_block(_AVRO, [_rec("k1", 1, "a")], T1)
        torn = good + encode_avro_block(_AVRO, [_rec("k2", 2, "b")], T1)[:9]
        blocks = decode_log_blocks(torn)
        assert len(blocks) == 1 and blocks[0]["records"][0]["id"] == 1

    def test_changes_rejects_mor_with_logs(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_changes,
        )

        t = self._mor_table(spark, tmp_path)
        with pytest.raises(ValueError, match="log"):
            hudi_changes(spark, str(t), since_instant=T1)


class TestChangeRows:
    """Round 13: hudi_changes(change_rows=True) — the batch twin of
    hudi_nojar's readChangeFeed (MOR log blocks as change rows)."""

    def test_mor_upserts_and_delete_blocks(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )

        t = str(tmp_path / "t")
        r1 = hudi_upsert(
            spark,
            spark.createDataFrame(
                [(1, "a"), (2, "b")], "id long, v string"
            ),
            t,
            key_col="id",
        )
        r2 = hudi_upsert(
            spark,
            spark.createDataFrame(
                [(2, "B"), (3, "c")], "id long, v string"
            ),
            t,
            key_col="id",
        )
        ch = hudi_changes(
            spark, t, r1["instant"], change_rows=True
        )
        got = {
            (r.id, r.v, r._change_type, r._commit_version)
            for r in ch.collect()
        }
        assert got == {
            (2, "B", "upsert", int(r2["instant"])),
            (3, "c", "upsert", int(r2["instant"])),
        }

    def test_fixture_delete_block_and_new_group(self, spark, tmp_path):
        """Hand-built MOR layout: base group at T1, a new base group +
        a delete block + an update block at T2 — inserts labeled by
        the base file's instant, log rows by the block's."""
        _props(tmp_path, ttype="MERGE_ON_READ")
        _commit(tmp_path, T1)
        _mor_base(spark, tmp_path, "g1", T1,
                  [("k1", 1, "a"), ("k2", 2, "b")])
        _deltacommit(tmp_path, T2)
        _mor_base(spark, tmp_path, "g2", T2, [("k5", 5, "e")])
        (tmp_path / f".g1_{T1}.log.1_0-1-2").write_bytes(
            encode_delete_block([("k2", "")], T2)
            + encode_avro_block(_AVRO, [_rec("k1", 1, "a2")], T2)
        )
        ch = hudi_changes(
            spark, str(tmp_path), T1, change_rows=True
        )
        got = {
            (
                r._hoodie_record_key,
                r.id,
                r.v,
                r._change_type,
                r._commit_version,
            )
            for r in ch.collect()
        }
        assert got == {
            ("k5", 5, "e", "insert", int(T2)),
            ("k2", None, None, "delete", int(T2)),
            ("k1", 1, "a2", "upsert", int(T2)),
        }

    def test_compaction_rejects(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.compact import (
            hudi_compact,
        )
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )

        t = str(tmp_path / "t")
        r1 = hudi_upsert(
            spark,
            spark.createDataFrame([(1, "a")], "id long, v string"),
            t,
            key_col="id",
        )
        hudi_upsert(
            spark,
            spark.createDataFrame([(1, "a2")], "id long, v string"),
            t,
            key_col="id",
        )
        hudi_compact(spark, t)
        with pytest.raises(ValueError, match="change data"):
            hudi_changes(
                spark, t, r1["instant"], change_rows=True
            ).collect()

    def test_upsert_and_changes_cli(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )

        t = str(tmp_path / "t")
        r1 = hudi_upsert(
            spark,
            spark.createDataFrame([(1, "a")], "id long, v string"),
            t,
            key_col="id",
        )
        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(1, "A2"), (2, "b")], "id long, v string"
        ).write.parquet(src)
        rc = main([
            "hudi", "--path", t, "--upsert", src, "--key-col", "id",
        ])
        assert rc == 0
        json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        rc = main([
            "hudi", "--path", t, "--changes-since", r1["instant"],
            "--change-rows", "--show", "10",
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["action"] == "hudi_changes" and rep["change_rows"]
        got = {(p["id"], p["v"]) for p in rep["preview"]}
        assert got == {(1, "A2"), (2, "b")}
