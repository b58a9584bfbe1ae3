"""Position-delete DELETE on Iceberg tables (sinks/icebergdml.py):
write → delete → read round trips, sequence numbers, repeat-delete
no-op, time travel, bulk bound, commit race."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
    iceberg_delete_where,
)
from harness_aws_etl_pipeline_spark.sinks.icebergwrite import write_iceberg
from harness_aws_etl_pipeline_spark.sources.icebergread import (
    iceberg_snapshot,
    iceberg_snapshots,
    read_iceberg,
)


class TestDeleteWhere:
    def test_delete_and_time_travel(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(20).withColumn("v", F.lit("a")), t)
        first = iceberg_snapshot(spark, t)["snapshot_id"]
        rep = iceberg_delete_where(spark, t, "id % 5 = 0")
        assert rep["rows_deleted"] == 4 and rep["files_touched"] >= 1
        got = {r.id for r in read_iceberg(spark, t).collect()}
        assert got == set(range(20)) - {0, 5, 10, 15}
        # the delete landed as a new snapshot; the old one sees all
        assert read_iceberg(spark, t, snapshot_id=first).count() == 20
        ops = [s["operation"] for s in iceberg_snapshots(spark, t)]
        assert ops == ["append", "delete"]
        # a delete parquet exists; no data parquet was rewritten
        assert glob.glob(str(tmp_path / "t" / "data" / "*-deletes.parquet"))

    def test_repeat_delete_is_noop(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(10).withColumn("v", F.lit("a")), t)
        iceberg_delete_where(spark, t, "id < 3")
        rep = iceberg_delete_where(spark, t, "id < 5")
        assert rep["rows_deleted"] == 2  # 3 and 4 only — 0..2 were gone
        rep = iceberg_delete_where(spark, t, "id < 5")
        assert rep["rows_deleted"] == 0 and rep["files_touched"] == 0
        assert {r.id for r in read_iceberg(spark, t).collect()} == {
            5, 6, 7, 8, 9,
        }

    def test_append_after_delete_composes(self, spark, tmp_path):
        """New data files carry a higher sequence than the delete —
        re-inserted rows must survive the earlier position delete."""
        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(5).withColumn("v", F.lit("a")), t)
        iceberg_delete_where(spark, t, "id = 2")
        write_iceberg(
            spark,
            spark.range(2, 3).withColumn("v", F.lit("back")),
            t,
            mode="append",
        )
        got = {(r.id, r.v) for r in read_iceberg(spark, t).collect()}
        assert got == {(0, "a"), (1, "a"), (3, "a"), (4, "a"), (2, "back")}

    def test_bulk_bound(self, spark, tmp_path):
        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(100).withColumn("v", F.lit("a")), t)
        with pytest.raises(ValueError, match="rewrite-based"):
            iceberg_delete_where(spark, t, "id >= 0", max_deleted_rows=10)

    def test_commit_race_retries(self, spark, tmp_path, monkeypatch):
        import harness_aws_etl_pipeline_spark.sinks.icebergdml as dml

        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(10).withColumn("v", F.lit("a")), t)
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
                    iceberg_delete_where(spark, t, "id = 7")
                return self._inner.rename_if_absent(src, dst)

        monkeypatch.setattr(
            dml, "get_fs", lambda p, s: RacingFs(real_get_fs(p, s))
        )
        rep = iceberg_delete_where(spark, t, "id < 2")
        assert rep["retries"] == 1 and rep["rows_deleted"] == 2
        got = {r.id for r in read_iceberg(spark, t).collect()}
        assert got == {2, 3, 4, 5, 6, 8, 9}  # both deletes landed


class TestCli:
    def test_delete_where_cli(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main

        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(6).withColumn("v", F.lit("a")), t)
        rc = main(["iceberg", "--path", t, "--delete-where", "id < 2"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["action"] == "iceberg_delete" and rep["rows_deleted"] == 2
        assert read_iceberg(spark, t).count() == 4

    def test_delta_delete_where_cli(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main
        from harness_aws_etl_pipeline_spark.sinks.deltawrite import (
            write_delta,
        )
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            read_delta,
        )

        t = str(tmp_path / "d")
        write_delta(spark, spark.range(6).withColumn("v", F.lit("a")), t)
        rc = main(["delta", "--path", t, "--delete-where", "id >= 4"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["action"] == "delta_delete" and rep["rows_deleted"] == 2
        assert read_delta(spark, t).count() == 4


class TestUpsert:
    def test_upsert_replaces_older_keys_atomically(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_upsert,
        )

        t = str(tmp_path / "t")
        write_iceberg(
            spark,
            spark.createDataFrame(
                [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
            ),
            t,
        )
        rep = iceberg_upsert(
            spark,
            t,
            spark.createDataFrame(
                [(2, "b2"), (4, "d")], "id long, v string"
            ),
            keys=["id"],
        )
        assert rep["rows_upserted"] == 2
        got = {(r.id, r.v) for r in read_iceberg(spark, t).collect()}
        assert got == {(1, "a"), (2, "b2"), (3, "c"), (4, "d")}
        # the old snapshot is intact; the upsert is one new snapshot
        ops = [s["operation"] for s in iceberg_snapshots(spark, t)]
        assert ops == ["append", "overwrite"]
        snap = iceberg_snapshot(spark, t)
        assert len(snap["equality_delete_files"]) == 1
        assert snap["equality_delete_files"][0]["columns"] == ["id"]

    def test_repeat_upserts_latest_wins(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_upsert,
        )

        t = str(tmp_path / "t")
        iceberg_upsert(
            spark, t,
            spark.createDataFrame([(1, "v1")], "id long, v string"),
            keys=["id"],
        )  # creates the table
        iceberg_upsert(
            spark, t,
            spark.createDataFrame([(1, "v2")], "id long, v string"),
            keys=["id"],
        )
        iceberg_upsert(
            spark, t,
            spark.createDataFrame([(1, "v3"), (2, "w")], "id long, v string"),
            keys=["id"],
        )
        got = {(r.id, r.v) for r in read_iceberg(spark, t).collect()}
        assert got == {(1, "v3"), (2, "w")}

    def test_composite_keys_and_guards(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_upsert,
        )

        t = str(tmp_path / "t")
        write_iceberg(
            spark,
            spark.createDataFrame(
                [(1, "x", 10.0), (1, "y", 20.0)], "id long, g string, m double"
            ),
            t,
        )
        iceberg_upsert(
            spark, t,
            spark.createDataFrame(
                [(1, "x", 99.0)], "id long, g string, m double"
            ),
            keys=["id", "g"],
        )
        got = {(r.id, r.g, r.m) for r in read_iceberg(spark, t).collect()}
        assert got == {(1, "x", 99.0), (1, "y", 20.0)}
        with pytest.raises(ValueError, match="not in the table schema"):
            iceberg_upsert(
                spark, t,
                spark.createDataFrame(
                    [(1, "x", 1.0)], "id long, g string, m double"
                ),
                keys=["nope"],
            )
        with pytest.raises(ValueError, match="do not match"):
            iceberg_upsert(
                spark, t,
                spark.createDataFrame([(1,)], "id long"),
                keys=["id"],
            )

    def test_upsert_then_delete_where_refused(self, spark, tmp_path):
        """delete_where cannot see through live equality deletes —
        the refusal must hold on tables this writer produces."""
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_upsert,
        )

        t = str(tmp_path / "t")
        write_iceberg(
            spark, spark.range(3).withColumn("v", F.lit("a")), t
        )
        iceberg_upsert(
            spark, t,
            spark.createDataFrame([(1, "b")], "id long, v string"),
            keys=["id"],
        )
        with pytest.raises(ValueError, match="equality"):
            iceberg_delete_where(spark, t, "id = 0")
