"""Lakehouse compaction (sinks/compact.py): Delta OPTIMIZE + DV purge
with dataChange=false streaming semantics, Iceberg major compaction
dropping delete files, Hudi MOR log compaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.compact import (
    delta_optimize,
    hudi_compact,
    iceberg_compact,
)


class TestDeltaOptimize:
    def test_binpack_and_dv_purge(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_delete_where,
        )
        from harness_aws_etl_pipeline_spark.sinks.deltawrite import (
            write_delta,
        )
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_snapshot,
            read_delta,
        )

        t = str(tmp_path / "t")
        write_delta(
            spark,
            spark.range(100).withColumn("v", F.lit("a")).repartition(8),
            t,
        )
        delta_delete_where(spark, t, "id % 10 = 0")
        rep = delta_optimize(spark, t)
        assert rep["files_removed"] >= 8 and rep["dvs_purged"] >= 1
        assert rep["files_added"] < rep["files_removed"]
        got = {r.id for r in read_delta(spark, t).collect()}
        assert got == {i for i in range(100) if i % 10 != 0}
        # post-optimize snapshot carries no deletion vectors
        snap = delta_snapshot(spark, t)
        assert not any(
            (a.get("deletionVector") or {}).get("storageType")
            for a in snap["files"].values()
        )
        # time travel before the optimize still works
        assert read_delta(spark, t, version=1).count() == 90

    def test_changes_and_stream_pass_over_compaction(self, spark, tmp_path):
        """dataChange=false removes/adds are invisible to append-only
        consumers: delta_changes skips the window, the stream source
        emits no duplicate rows."""
        from harness_aws_etl_pipeline_spark.sinks.deltawrite import (
            write_delta,
        )
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )
        from harness_aws_etl_pipeline_spark.sources.deltastream import (
            register_delta_stream,
        )

        t = str(tmp_path / "t")
        write_delta(
            spark, spark.range(20).withColumn("v", F.lit("a")).repartition(4),
            t,
        )
        register_delta_stream(spark)
        df = spark.readStream.format("delta_nojar").option("path", t).load()
        out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
        q = (
            df.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rep = delta_optimize(spark, t)
        assert rep["files_removed"] == 4
        write_delta(
            spark, spark.range(20, 22).withColumn("v", F.lit("b")), t,
            mode="append",
        )
        # change capture over (pre-optimize, head] sees ONLY the append
        got = {(r.id, r.v) for r in delta_changes(spark, t, 0).collect()}
        assert got == {(20, "b"), (21, "b")}
        # the stream resumes across the optimize without duplicates
        q = (
            df.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = [(r.id, r.v) for r in spark.read.parquet(out).collect()]
        assert len(rows) == 22 and len(rows) == len(set(rows))

    def test_noop_when_nothing_small(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.deltawrite import (
            write_delta,
        )

        t = str(tmp_path / "t")
        write_delta(spark, spark.range(10).coalesce(1), t)
        rep = delta_optimize(spark, t, small_file_bytes=1)
        assert rep["version"] is None and rep["files_removed"] == 0


class TestIcebergCompact:
    def test_drops_delete_files(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_delete_where,
            iceberg_upsert,
        )
        from harness_aws_etl_pipeline_spark.sinks.icebergwrite import (
            write_iceberg,
        )
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_snapshot,
            read_iceberg,
        )

        t = str(tmp_path / "t")
        write_iceberg(spark, spark.range(10).withColumn("v", F.lit("a")), t)
        iceberg_delete_where(spark, t, "id = 3")
        iceberg_upsert(
            spark, t,
            spark.createDataFrame([(5, "b")], "id long, v string"),
            keys=["id"],
        )
        before = {(r.id, r.v) for r in read_iceberg(spark, t).collect()}
        rep = iceberg_compact(spark, t)
        assert rep["delete_files_dropped"] == 2
        snap = iceberg_snapshot(spark, t)
        assert snap["delete_files"] == 0
        after = {(r.id, r.v) for r in read_iceberg(spark, t).collect()}
        assert after == before
        # delete_where works again post-compaction (equality deletes gone)
        iceberg_delete_where(spark, t, "id = 5")
        assert (5, "b") not in {
            (r.id, r.v) for r in read_iceberg(spark, t).collect()
        }


class TestHudiCompact:
    def test_merges_logs_into_new_base_slices(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_changes,
            hudi_snapshot,
            read_hudi,
        )

        t = str(tmp_path / "t")
        hudi_upsert(
            spark,
            spark.createDataFrame(
                [(1, "a"), (2, "b")], "id long, v string"
            ),
            t, key_col="id",
        )
        hudi_upsert(
            spark,
            spark.createDataFrame([(2, "b2")], "id long, v string"),
            t, key_col="id",
        )
        before = {
            (r.id, r.v) for r in read_hudi(spark, t, drop_meta=True).collect()
        }
        assert before == {(1, "a"), (2, "b2")}
        rep = hudi_compact(spark, t)
        assert rep["groups_compacted"] == 1
        snap = hudi_snapshot(spark, t)
        assert snap["log_files"] == [] and snap["files"]
        after = {
            (r.id, r.v) for r in read_hudi(spark, t, drop_meta=True).collect()
        }
        assert after == before
        # change capture works again (no live logs)
        assert hudi_changes(spark, t, rep["instant"]).count() == 0

    def test_cow_rejected_and_noop(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert, write_hudi,
        )

        t = str(tmp_path / "t")
        write_hudi(spark, spark.range(3).withColumn("v", F.lit("a")), t)
        with pytest.raises(ValueError, match="MERGE_ON_READ"):
            hudi_compact(spark, t)
        t2 = str(tmp_path / "t2")
        hudi_upsert(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"),
            t2, key_col="id",
        )
        hudi_compact(spark, t2)  # first compaction eats the log
        rep = hudi_compact(spark, t2)  # second is a no-op
        assert rep["groups_compacted"] == 0 and rep["instant"] is None


class TestCli:
    def test_compact_cli_all_three(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            delta_delete_where,
        )
        from harness_aws_etl_pipeline_spark.sinks.deltawrite import (
            write_delta,
        )
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_delete_where,
        )
        from harness_aws_etl_pipeline_spark.sinks.icebergwrite import (
            write_iceberg,
        )

        d = str(tmp_path / "d")
        write_delta(spark, spark.range(50).repartition(4), d)
        delta_delete_where(spark, d, "id = 0")
        rc = main(["delta", "--path", d, "--optimize"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["action"] == "delta_optimize" and rep["dvs_purged"] >= 1

        i = str(tmp_path / "i")
        write_iceberg(spark, spark.range(5).withColumn("v", F.lit("a")), i)
        iceberg_delete_where(spark, i, "id = 0")
        rc = main(["iceberg", "--path", i, "--compact"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["action"] == "iceberg_compact"
        assert rep["delete_files_dropped"] == 1

        h = str(tmp_path / "h")
        hudi_upsert(
            spark, spark.createDataFrame([(1, "a")], "id long, v string"),
            h, key_col="id",
        )
        rc = main(["hudi", "--path", h, "--compact"])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["action"] == "hudi_compact"
        assert rep["groups_compacted"] == 1
