"""Iceberg + Hudi as Structured Streaming sources
(sources/lakestream.py): batch boundaries, checkpoint resume,
append-only guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.hudiwrite import write_hudi
from harness_aws_etl_pipeline_spark.sinks.icebergwrite import write_iceberg
from harness_aws_etl_pipeline_spark.sources.lakestream import (
    register_lake_streams,
)


def _drain(df, out, cp):
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


class TestIcebergStream:
    def test_stream_and_resume(self, spark, tmp_path):
        register_lake_streams(spark)
        t, out, cp = (
            str(tmp_path / "t"), str(tmp_path / "out"), str(tmp_path / "cp")
        )
        write_iceberg(spark, spark.range(4).withColumn("v", F.lit("a")), t)
        df = (
            spark.readStream.format("iceberg_nojar")
            .option("path", t)
            .load()
        )
        _drain(df, out, cp)
        assert sorted(r.id for r in spark.read.parquet(out).collect()) == [
            0, 1, 2, 3,
        ]
        write_iceberg(
            spark, spark.range(4, 6).withColumn("v", F.lit("b")), t,
            mode="append",
        )
        _drain(df, out, cp)
        got = sorted((r.id, r.v) for r in spark.read.parquet(out).collect())
        assert len(got) == 6 and len(got) == len(set(got))
        assert (5, "b") in got

    def test_resume_after_snapshot_expiration(self, spark, tmp_path):
        """r11 ADVICE fix: offsets are snapshot IDS, not list
        positions — iceberg_expire_snapshots rewrites the snapshot
        list, so a positional offset would silently skip (or replay)
        batches on resume."""
        from harness_aws_etl_pipeline_spark.sinks.compact import (
            iceberg_expire_snapshots,
        )

        register_lake_streams(spark)
        t, out, cp = (
            str(tmp_path / "t"), str(tmp_path / "out"), str(tmp_path / "cp")
        )
        write_iceberg(spark, spark.range(2).withColumn("v", F.lit("a")), t)
        write_iceberg(
            spark, spark.range(2, 4).withColumn("v", F.lit("b")), t,
            mode="append",
        )
        df = (
            spark.readStream.format("iceberg_nojar").option("path", t).load()
        )
        _drain(df, out, cp)
        assert spark.read.parquet(out).count() == 4
        # drop the older snapshot from the log, then append — the old
        # positional offset (idx=2) would now equal the new list
        # length and silently skip the appended batch
        iceberg_expire_snapshots(spark, t, keep_last=1)
        write_iceberg(
            spark, spark.range(4, 6).withColumn("v", F.lit("c")), t,
            mode="append",
        )
        _drain(df, out, cp)
        got = sorted((r.id, r.v) for r in spark.read.parquet(out).collect())
        assert len(got) == 6 and len(got) == len(set(got))
        assert (5, "c") in got

    def test_resume_with_expired_offset_raises(self, spark, tmp_path):
        """If the checkpointed offset's snapshot itself was expired,
        the stream must fail loudly rather than guess a position."""
        from harness_aws_etl_pipeline_spark.sinks.compact import (
            iceberg_expire_snapshots,
        )

        register_lake_streams(spark)
        t, out, cp = (
            str(tmp_path / "t"), str(tmp_path / "out"), str(tmp_path / "cp")
        )
        write_iceberg(spark, spark.range(2).withColumn("v", F.lit("a")), t)
        df = (
            spark.readStream.format("iceberg_nojar").option("path", t).load()
        )
        _drain(df, out, cp)  # checkpoint offset = first snapshot's id
        write_iceberg(
            spark, spark.range(2, 4).withColumn("v", F.lit("b")), t,
            mode="append",
        )
        iceberg_expire_snapshots(spark, t, keep_last=1)  # drops snapshot 1
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        with pytest.raises(StreamingQueryException, match="expired"):
            q.awaitTermination(120)

    def test_delete_in_window_rejected(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_delete_where,
        )

        register_lake_streams(spark)
        t, out, cp = (
            str(tmp_path / "t"), str(tmp_path / "out"), str(tmp_path / "cp")
        )
        write_iceberg(spark, spark.range(4).withColumn("v", F.lit("a")), t)
        iceberg_delete_where(spark, t, "id = 1")
        df = (
            spark.readStream.format("iceberg_nojar").option("path", t).load()
        )
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        with pytest.raises(StreamingQueryException, match="delete"):
            q.awaitTermination(120)


class TestHudiStream:
    def test_stream_and_resume(self, spark, tmp_path):
        register_lake_streams(spark)
        t, out, cp = (
            str(tmp_path / "t"), str(tmp_path / "out"), str(tmp_path / "cp")
        )
        write_hudi(spark, spark.range(3).withColumn("v", F.lit("a")), t)
        df = spark.readStream.format("hudi_nojar").option("path", t).load()
        _drain(df, out, cp)
        back = spark.read.parquet(out)
        assert sorted(r.id for r in back.collect()) == [0, 1, 2]
        write_hudi(
            spark, spark.range(3, 5).withColumn("v", F.lit("b")), t,
            mode="append",
        )
        _drain(df, out, cp)
        got = sorted((r.id, r.v) for r in spark.read.parquet(out).collect())
        assert len(got) == 5 and len(got) == len(set(got))

    def test_replacecommit_rejected(self, spark, tmp_path):
        register_lake_streams(spark)
        t, out, cp = (
            str(tmp_path / "t"), str(tmp_path / "out"), str(tmp_path / "cp")
        )
        write_hudi(spark, spark.range(3).withColumn("v", F.lit("a")), t)
        write_hudi(
            spark, spark.range(9, 10).withColumn("v", F.lit("b")), t,
            mode="overwrite",
        )
        df = spark.readStream.format("hudi_nojar").option("path", t).load()
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        from pyspark.errors.exceptions.captured import (
            StreamingQueryException,
        )

        with pytest.raises(StreamingQueryException, match="replacecommit"):
            q.awaitTermination(120)


class TestPartitionedHudiStream:
    def test_stream_over_partitioned_table(self, spark, tmp_path):
        register_lake_streams(spark)
        t, out, cp = (
            str(tmp_path / "t"), str(tmp_path / "out"), str(tmp_path / "cp")
        )
        write_hudi(
            spark,
            spark.createDataFrame(
                [(0, 1, "a"), (1, 2, "b")], "id long, p int, v string"
            ),
            t,
            partition_by=["p"],
        )
        df = spark.readStream.format("hudi_nojar").option("path", t).load()
        _drain(df, out, cp)
        assert spark.read.parquet(out).count() == 2
        write_hudi(
            spark,
            spark.createDataFrame([(2, 1, "c")], "id long, p int, v string"),
            t,
        )
        _drain(df, out, cp)
        got = sorted((r.id, r.p) for r in spark.read.parquet(out).collect())
        assert got == [(0, 1), (1, 2), (2, 1)]
