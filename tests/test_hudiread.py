"""Hudi CoW reader (sources/hudiread.py): hand-built spec layouts —
file-group slice selection, as-of time travel, in-flight slices
ignored, partitioned walk, meta-column handling, MoR rejection."""

from __future__ import annotations

import glob
import shutil

import pytest

from harness_aws_etl_pipeline_spark.sources.hudiread import (
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

    def test_mor_rejected(self, spark, tmp_path):
        _props(tmp_path, ttype="MERGE_ON_READ")
        _commit(tmp_path, T1)
        with pytest.raises(ValueError, match="MERGE_ON_READ"):
            hudi_snapshot(spark, str(tmp_path))

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
