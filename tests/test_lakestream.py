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
