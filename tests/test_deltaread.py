"""Delta-protocol reader (sources/deltaread.py): hand-written logs
per PROTOCOL.md — snapshot fold, remove semantics, time travel,
partition-value recovery, checkpoint replay, protocol-2 rejection,
history."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sources.deltaread import (
    delta_history,
    delta_snapshot,
    read_delta,
)

_SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _meta(partition_cols=()):
    return {
        "metaData": {
            "id": "tbl-1",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _SCHEMA_JSON,
            "partitionColumns": list(partition_cols),
            "configuration": {},
        }
    }


def _commit(tmp_path, version, actions):
    log = tmp_path / "_delta_log"
    log.mkdir(exist_ok=True)
    (log / f"{version:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions)
    )


def _datafile(spark, tmp_path, name, rows):
    p = tmp_path / "stage" / name
    spark.createDataFrame(rows, "id long, v string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(p))
    import glob
    import shutil

    src = glob.glob(str(p / "*.parquet"))[0]
    shutil.move(src, str(tmp_path / name))
    return name


def _add(name, pv=None):
    return {
        "add": {
            "path": name,
            "partitionValues": pv or {},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }


class TestSnapshotFold:
    def _basic_table(self, spark, tmp_path):
        a = _datafile(spark, tmp_path, "part-a.parquet", [(1, "x"), (2, "y")])
        b = _datafile(spark, tmp_path, "part-b.parquet", [(3, "z")])
        c = _datafile(spark, tmp_path, "part-c.parquet", [(4, "w")])
        _commit(
            tmp_path, 0,
            [{"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
             _meta(), _add(a), _add(b),
             {"commitInfo": {"operation": "WRITE", "timestamp": 1000}}],
        )
        _commit(
            tmp_path, 1,
            [{"remove": {"path": b, "dataChange": True}}, _add(c),
             {"commitInfo": {"operation": "MERGE", "timestamp": 2000}}],
        )
        return tmp_path

    def test_read_latest_and_time_travel(self, spark, tmp_path):
        t = self._basic_table(spark, tmp_path)
        latest = {(r.id, r.v) for r in read_delta(spark, str(t)).collect()}
        assert latest == {(1, "x"), (2, "y"), (4, "w")}
        v0 = {(r.id, r.v) for r in read_delta(spark, str(t), version=0).collect()}
        assert v0 == {(1, "x"), (2, "y"), (3, "z")}

    def test_history_and_snapshot_shape(self, spark, tmp_path):
        t = self._basic_table(spark, tmp_path)
        h = delta_history(spark, str(t))
        assert [(x["version"], x["operation"], x["num_adds"], x["num_removes"])
                for x in h] == [(0, "WRITE", 2, 0), (1, "MERGE", 1, 1)]
        snap = delta_snapshot(spark, str(t), 1)
        assert snap["version"] == 1
        assert sorted(snap["files"]) == ["part-a.parquet", "part-c.parquet"]
        assert snap["partition_columns"] == []

    def test_version_out_of_range_and_not_delta(self, spark, tmp_path):
        t = self._basic_table(spark, tmp_path)
        with pytest.raises(ValueError, match="out of range"):
            read_delta(spark, str(t), version=9)
        with pytest.raises(ValueError, match="not a Delta table"):
            read_delta(spark, str(tmp_path / "nowhere"))

    def test_protocol_two_rejected(self, spark, tmp_path):
        a = _datafile(spark, tmp_path, "p.parquet", [(1, "x")])
        _commit(
            tmp_path, 0,
            [{"protocol": {"minReaderVersion": 3,
                           "readerFeatures": ["deletionVectors"]}},
             _meta(), _add(a)],
        )
        with pytest.raises(ValueError, match="deletionVectors"):
            read_delta(spark, str(tmp_path))


class TestPartitioned:
    def test_partition_values_recovered_typed(self, spark, tmp_path):
        schema = json.dumps({
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
                {"name": "g", "type": "integer", "nullable": True, "metadata": {}},
            ],
        })
        meta = _meta(["g"])
        meta["metaData"]["schemaString"] = schema
        a = _datafile(spark, tmp_path, "g1.parquet", [(1, "x")])
        b = _datafile(spark, tmp_path, "g2.parquet", [(2, "y")])
        _commit(tmp_path, 0, [
            {"protocol": {"minReaderVersion": 1}}, meta,
            _add(a, {"g": "1"}), _add(b, {"g": "2"}),
        ])
        got = {
            (r.id, r.v, r.g) for r in read_delta(spark, str(tmp_path)).collect()
        }
        assert got == {(1, "x", 1), (2, "y", 2)}
        df = read_delta(spark, str(tmp_path))
        assert dict(df.dtypes)["g"] == "int"  # typed per table schema
        # partition pruning happens on the reattached literal
        assert df.filter(F.col("g") == 2).count() == 1


class TestCheckpoint:
    def test_checkpoint_replay_skips_earlier_commits(self, spark, tmp_path):
        t = TestSnapshotFold()._basic_table(spark, tmp_path)
        # write a v1 checkpoint holding the LIVE file set, then delete
        # the JSON commits it supersedes — replay must come from it
        cp_schema = (
            "add struct<path:string,partitionValues:map<string,string>,"
            "size:long,dataChange:boolean>, "
            "metaData struct<id:string,schemaString:string,"
            "partitionColumns:array<string>>, "
            "protocol struct<minReaderVersion:int,"
            "readerFeatures:array<string>>"
        )
        rows = [
            (("part-a.parquet", {}, 1, True), None, None),
            (("part-c.parquet", {}, 1, True), None, None),
            (None, ("tbl-1", _SCHEMA_JSON, []), None),
            (None, None, (1, None)),
        ]
        cp = spark.createDataFrame(rows, cp_schema)
        cp.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "cpstage")
        )
        import glob
        import shutil

        src = glob.glob(str(tmp_path / "cpstage" / "*.parquet"))[0]
        shutil.move(
            src,
            str(tmp_path / "_delta_log" / "00000000000000000001.checkpoint.parquet"),
        )
        # delete commits 0 and 1: only the checkpoint carries them now
        (tmp_path / "_delta_log" / f"{0:020d}.json").unlink()
        (tmp_path / "_delta_log" / f"{1:020d}.json").unlink()
        _commit(t, 2, [{"remove": {"path": "part-a.parquet",
                                   "dataChange": True}}])
        got = {(r.id, r.v) for r in read_delta(spark, str(t)).collect()}
        assert got == {(4, "w")}
        snap = delta_snapshot(spark, str(t))
        assert snap["version"] == 2


class TestCli:
    def test_delta_cli(self, spark, tmp_path, capsys):
        from harness_aws_etl_pipeline_spark.cli import main

        t = TestSnapshotFold()._basic_table(spark, tmp_path)
        rc = main(["delta", "--path", str(t), "--history"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert [h["version"] for h in rep["history"]] == [0, 1]

        out = tmp_path / "export"
        rc = main([
            "delta", "--path", str(t), "--version", "0",
            "--output", str(out),
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["version"] == 0 and rep["rows"] == 3
        assert spark.read.parquet(str(out)).count() == 3


class TestSnapTableExport:
    def test_snaptable_reads_back_as_delta_with_time_travel(
        self, spark, tmp_path
    ):
        """The inverse interop loop: SnapTable history → _delta_log →
        read_delta must equal snaptable.read at EVERY version."""
        from harness_aws_etl_pipeline_spark.sinks.deltaexport import (
            export_delta_log,
        )
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        t = SnapTable(spark, str(tmp_path / "t"))
        t.write(
            spark.range(10).withColumn("v", F.lit("a")), mode="overwrite"
        )
        t.write(
            spark.range(10, 15).withColumn("v", F.lit("b")), mode="append"
        )
        t.delete_where("id >= 12")
        rep = export_delta_log(spark, t.path)
        assert rep["delta_versions"] == 3 and rep["base_snap_version"] == 0
        for dv, sv in enumerate(t.versions()):
            want = {
                (r.id, r.v) for r in t.read(version=sv).collect()
            }
            got = {
                (r.id, r.v)
                for r in read_delta(spark, t.path, version=dv).collect()
            }
            assert got == want, (dv, sv)
        h = delta_history(spark, t.path)
        assert [x["operation"] for x in h] == ["OVERWRITE", "APPEND", "DELETE"]

    def test_export_idempotent_and_refreshable(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltaexport import (
            export_delta_log,
        )
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        t = SnapTable(spark, str(tmp_path / "t"))
        t.write(spark.range(3), mode="overwrite")
        export_delta_log(spark, t.path)
        n1 = read_delta(spark, t.path).count()
        t.write(spark.range(3, 5), mode="append")
        rep = export_delta_log(spark, t.path)  # refresh after new commit
        assert rep["delta_versions"] == 2
        assert n1 == 3 and read_delta(spark, t.path).count() == 5
        # snaptable's own readers are untouched by the coexisting log
        assert t.read().count() == 5


class TestChanges:
    def test_append_only_changes(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        t = TestSnapshotFold()._basic_table(spark, tmp_path)
        # (0, 1] rewrote part-b away → not representable append-only
        with pytest.raises(ValueError, match="append-only"):
            delta_changes(spark, str(t), since_version=0)
        # add a pure append commit and diff (1, 2]
        d = _datafile(spark, tmp_path, "part-d.parquet", [(9, "q")])
        _commit(tmp_path, 2, [_add(d)])
        got = {
            (r.id, r.v)
            for r in delta_changes(spark, str(t), since_version=1).collect()
        }
        assert got == {(9, "q")}
        # empty window
        assert delta_changes(
            spark, str(t), since_version=2, to_version=2
        ).count() == 0


class TestReadLake:
    def test_detection_and_dispatch(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltaexport import (
            export_delta_log,
        )
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable
        from harness_aws_etl_pipeline_spark.sources.lakeread import (
            detect_lake_format,
            read_lake,
        )

        # snaptable — and after exporting a delta log, STILL snaptable
        # (native metadata wins on ambiguous layouts)
        st = SnapTable(spark, str(tmp_path / "snap"))
        st.write(spark.range(4), mode="overwrite")
        assert detect_lake_format(spark, st.path) == "snaptable"
        export_delta_log(spark, st.path)
        assert detect_lake_format(spark, st.path) == "snaptable"
        assert read_lake(spark, st.path).count() == 4

        # delta (hand-written log from the suite fixture)
        d = TestSnapshotFold()._basic_table(spark, tmp_path / "dl")
        assert detect_lake_format(spark, str(d)) == "delta"
        assert read_lake(spark, str(d), version=0).count() == 3

        # plain parquet and nothing-at-all
        spark.range(2).write.parquet(str(tmp_path / "pq"))
        assert detect_lake_format(spark, str(tmp_path / "pq")) == "parquet"
        assert read_lake(spark, str(tmp_path / "pq")).count() == 2
        import pytest as _pytest

        (tmp_path / "empty").mkdir()
        with _pytest.raises(ValueError, match="recognizable"):
            read_lake(spark, str(tmp_path / "empty"))

    def test_lake_detects_hudi_iceberg_avro(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.lakeread import (
            detect_lake_format,
            read_lake,
        )
        from tests.test_hudiread import TestHudi
        from tests.test_icebergread import TestRead as IceRead
        from tests.test_avroread import RECORDS, SCHEMA
        from harness_aws_etl_pipeline_spark.sources.avroread import (
            write_avro_bytes,
        )

        (tmp_path / "hu").mkdir()
        (tmp_path / "ib").mkdir()
        h = TestHudi()._table(spark, tmp_path / "hu")
        assert detect_lake_format(spark, str(h)) == "hudi"
        assert read_lake(spark, str(h)).count() == 3

        i = IceRead()._table(spark, tmp_path / "ib")
        assert detect_lake_format(spark, str(i)) == "iceberg"
        assert read_lake(spark, str(i), snapshot_id=100).count() == 3

        av = tmp_path / "av"
        av.mkdir()
        (av / "x.avro").write_bytes(write_avro_bytes(SCHEMA, RECORDS))
        assert detect_lake_format(spark, str(av)) == "avro"
        assert read_lake(spark, str(av)).count() == 3
