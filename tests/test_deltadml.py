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
