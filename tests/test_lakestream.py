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


class TestIcebergChangeFeed:
    """Round 13: readChangeFeed=true — change-row consumption of
    equality-delete upserts, position deletes, and appends; within a
    _commit_version, deletes apply before inserts."""

    def test_upsert_yields_keyed_change_rows_exactly_once(
        self, spark, tmp_path
    ):
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_upsert,
        )

        register_lake_streams(spark)
        t, out, cp = (
            str(tmp_path / "t"), str(tmp_path / "out"), str(tmp_path / "cp")
        )
        write_iceberg(
            spark,
            spark.createDataFrame(
                [(i, "a") for i in range(4)], "id long, v string"
            ),
            t,
        )
        df = (
            spark.readStream.format("iceberg_nojar")
            .option("path", t)
            .option("readChangeFeed", "true")
            .load()
        )
        assert "_change_type" in df.columns
        _drain(df, out, cp)
        got = {
            (r.id, r.v, r._change_type, r._commit_version)
            for r in spark.read.parquet(out).collect()
        }
        assert got == {(i, "a", "insert", 1) for i in range(4)}
        # upsert: update id=1, insert id=9 → key-only delete rows for
        # both keys + insert rows, all at the upsert's sequence number
        iceberg_upsert(
            spark,
            t,
            spark.createDataFrame(
                [(1, "up"), (9, "n")], "id long, v string"
            ),
            keys=["id"],
        )
        _drain(df, out, cp)
        rows = spark.read.parquet(out).collect()
        got2 = {
            (r.id, r.v, r._change_type, r._commit_version) for r in rows
        } - got
        assert got2 == {
            (1, None, "delete", 2),
            (9, None, "delete", 2),
            (1, "up", "insert", 2),
            (9, "n", "insert", 2),
        }
        # exactly-once: nothing replays on an idle drain
        _drain(df, out, cp)
        assert len(spark.read.parquet(out).collect()) == len(rows)
        # applying the changelog (deletes before inserts per version)
        # reproduces the table
        state = {i: "a" for i in range(4)}
        for _id, _v, ct, _cv in sorted(
            got2, key=lambda x: (x[3], x[2] != "delete")
        ):
            if ct == "delete":
                state.pop(_id, None)
            else:
                state[_id] = _v
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            read_iceberg,
        )

        assert state == {
            r.id: r.v for r in read_iceberg(spark, t).collect()
        }

    def test_position_delete_replays_preimage_rows(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_delete_where,
        )

        register_lake_streams(spark)
        t, out, cp = (
            str(tmp_path / "t"), str(tmp_path / "out"), str(tmp_path / "cp")
        )
        write_iceberg(
            spark,
            spark.createDataFrame(
                [(i, f"v{i}") for i in range(4)], "id long, v string"
            ),
            t,
        )
        iceberg_delete_where(spark, t, "id IN (1, 2)")
        df = (
            spark.readStream.format("iceberg_nojar")
            .option("path", t)
            .option("readChangeFeed", "true")
            .load()
        )
        _drain(df, out, cp)
        got = {
            (r.id, r.v, r._change_type, r._commit_version)
            for r in spark.read.parquet(out).collect()
        }
        # full preimage VALUES on the delete rows (position deletes
        # resolve the referenced rows)
        assert got == {(i, f"v{i}", "insert", 1) for i in range(4)} | {
            (1, "v1", "delete", 2),
            (2, "v2", "delete", 2),
        }

    def test_compaction_contributes_nothing_then_appends_flow(
        self, spark, tmp_path
    ):
        from harness_aws_etl_pipeline_spark.sinks.compact import (
            iceberg_compact,
        )
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_delete_where,
        )

        register_lake_streams(spark)
        t, out, cp = (
            str(tmp_path / "t"), str(tmp_path / "out"), str(tmp_path / "cp")
        )
        write_iceberg(
            spark,
            spark.createDataFrame(
                [(i, "a") for i in range(4)], "id long, v string"
            ),
            t,
        )
        df = (
            spark.readStream.format("iceberg_nojar")
            .option("path", t)
            .option("readChangeFeed", "true")
            .load()
        )
        _drain(df, out, cp)
        n0 = spark.read.parquet(out).count()
        iceberg_delete_where(spark, t, "id = 0")
        iceberg_compact(spark, t)
        write_iceberg(
            spark,
            spark.createDataFrame([(9, "b")], "id long, v string"),
            t,
            mode="append",
        )
        _drain(df, out, cp)
        fresh = {
            (r.id, r.v, r._change_type)
            for r in spark.read.parquet(out).collect()
        }
        assert len(spark.read.parquet(out).collect()) == n0 + 2
        assert (0, "a", "delete") in fresh and (9, "b", "insert") in fresh

    def test_append_only_guard_names_the_cdf_escape(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.icebergdml import (
            iceberg_delete_where,
        )

        register_lake_streams(spark)
        t, out, cp = (
            str(tmp_path / "t"), str(tmp_path / "out"), str(tmp_path / "cp")
        )
        write_iceberg(spark, spark.range(4).withColumn("v", F.lit("a")), t)
        iceberg_delete_where(spark, t, "id = 0")
        df = (
            spark.readStream.format("iceberg_nojar").option("path", t).load()
        )
        with pytest.raises(Exception, match="readChangeFeed"):
            _drain(df, out, cp)


class TestHudiChangeFeed:
    """Round 13: readChangeFeed=true on hudi_nojar — MOR deltacommit
    log blocks ARE the change data."""

    def test_mor_upserts_and_deletes_stream_as_change_rows(
        self, spark, tmp_path
    ):
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )

        register_lake_streams(spark)
        t, out, cp = (
            str(tmp_path / "t"), str(tmp_path / "out"), str(tmp_path / "cp")
        )
        r1 = hudi_upsert(
            spark,
            spark.createDataFrame(
                [(1, "a"), (2, "b")], "id long, v string"
            ),
            t,
            key_col="id",
        )
        df = (
            spark.readStream.format("hudi_nojar")
            .option("path", t)
            .option("readChangeFeed", "true")
            .load()
        )
        assert "_change_type" in df.columns
        _drain(df, out, cp)
        got = {
            (r.id, r.v, r._change_type, r._commit_version)
            for r in spark.read.parquet(out).collect()
        }
        v1 = int(r1["instant"])
        assert got == {
            (1, "a", "upsert", v1),
            (2, "b", "upsert", v1),
        }
        # second upsert updates an existing key and inserts a new one
        r2 = hudi_upsert(
            spark,
            spark.createDataFrame(
                [(2, "B"), (3, "c")], "id long, v string"
            ),
            t,
            key_col="id",
        )
        _drain(df, out, cp)
        v2 = int(r2["instant"])
        rows = spark.read.parquet(out).collect()
        got2 = {
            (r.id, r.v, r._change_type, r._commit_version) for r in rows
        } - got
        assert got2 == {
            (2, "B", "upsert", v2),
            (3, "c", "upsert", v2),
        }
        # exactly-once across a drain with no new instants
        _drain(df, out, cp)
        assert len(spark.read.parquet(out).collect()) == len(rows)

    def test_mor_delete_block_yields_key_only_delete_rows(
        self, spark, tmp_path
    ):
        import glob as _glob
        import json as _json
        import shutil

        from harness_aws_etl_pipeline_spark.sources.hudilog import (
            encode_avro_block,
            encode_delete_block,
        )

        register_lake_streams(spark)
        out, cp = str(tmp_path / "out"), str(tmp_path / "cp")
        t = tmp_path / "t"
        (t / ".hoodie").mkdir(parents=True)
        (t / ".hoodie" / "hoodie.properties").write_text(
            "hoodie.table.name=t\n"
            "hoodie.table.type=MERGE_ON_READ\n"
        )
        T1, T2 = "20240101000000000", "20240102000000000"
        (t / ".hoodie" / f"{T1}.commit").write_text("{}")
        (t / ".hoodie" / f"{T2}.deltacommit").write_text("{}")
        stage = tmp_path / "stage"
        spark.createDataFrame(
            [("k1", "", 1, "a"), ("k2", "", 2, "b")],
            "_hoodie_record_key string, _hoodie_partition_path string, "
            "id long, v string",
        ).coalesce(1).write.mode("overwrite").parquet(str(stage))
        src = _glob.glob(str(stage / "*.parquet"))[0]
        shutil.move(src, str(t / f"g1_0-1-2_{T1}.parquet"))
        avro = _json.dumps(
            {
                "type": "record",
                "name": "rec",
                "fields": [
                    {
                        "name": "_hoodie_record_key",
                        "type": ["null", "string"],
                    },
                    {
                        "name": "_hoodie_partition_path",
                        "type": ["null", "string"],
                    },
                    {"name": "id", "type": ["null", "long"]},
                    {"name": "v", "type": ["null", "string"]},
                ],
            }
        )
        (t / f".g1_{T1}.log.1_0-1-2").write_bytes(
            encode_delete_block([("k2", "")], T2)
            + encode_avro_block(
                avro,
                [
                    {
                        "_hoodie_record_key": "k1",
                        "_hoodie_partition_path": "",
                        "id": 1,
                        "v": "a2",
                    }
                ],
                T2,
            )
        )
        df = (
            spark.readStream.format("hudi_nojar")
            .option("path", str(t))
            .option("readChangeFeed", "true")
            .load()
        )
        _drain(df, out, cp)
        got = {
            (
                r._hoodie_record_key,
                r.id,
                r.v,
                r._change_type,
                r._commit_version,
            )
            for r in spark.read.parquet(out).collect()
        }
        assert got == {
            ("k1", 1, "a", "insert", int(T1)),
            ("k2", 2, "b", "insert", int(T1)),
            ("k2", None, None, "delete", int(T2)),
            ("k1", 1, "a2", "upsert", int(T2)),
        }

    def test_base_rewrite_rejects_loudly(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks.compact import (
            hudi_compact,
        )
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
            hudi_upsert,
        )

        register_lake_streams(spark)
        t, out, cp = (
            str(tmp_path / "t"), str(tmp_path / "out"), str(tmp_path / "cp")
        )
        hudi_upsert(
            spark,
            spark.createDataFrame([(1, "a")], "id long, v string"),
            t,
            key_col="id",
        )
        df = (
            spark.readStream.format("hudi_nojar")
            .option("path", t)
            .option("readChangeFeed", "true")
            .load()
        )
        _drain(df, out, cp)
        hudi_upsert(
            spark,
            spark.createDataFrame([(1, "a2")], "id long, v string"),
            t,
            key_col="id",
        )
        hudi_compact(spark, t)
        with pytest.raises(Exception, match="fresh checkpoint"):
            _drain(df, out, cp)


class TestIcebergCompactionPassOver:
    def test_append_stream_passes_over_compaction(self, spark, tmp_path):
        """Round 13: operation-'replace' snapshots (iceberg_compact)
        are data-neutral — the append-only stream passes over them
        instead of raising (delta_nojar's dataChange=false rule)."""
        from harness_aws_etl_pipeline_spark.sinks.compact import (
            iceberg_compact,
        )

        register_lake_streams(spark)
        t, out, cp = (
            str(tmp_path / "t"), str(tmp_path / "out"), str(tmp_path / "cp")
        )
        write_iceberg(spark, spark.range(3).withColumn("v", F.lit("a")), t)
        write_iceberg(
            spark, spark.range(3, 5).withColumn("v", F.lit("a")), t,
            mode="append",
        )
        df = (
            spark.readStream.format("iceberg_nojar").option("path", t).load()
        )
        _drain(df, out, cp)
        assert spark.read.parquet(out).count() == 5
        iceberg_compact(spark, t)
        write_iceberg(
            spark, spark.createDataFrame([(9, "b")], "id long, v string"),
            t, mode="append",
        )
        _drain(df, out, cp)
        rows = [(r.id, r.v) for r in spark.read.parquet(out).collect()]
        assert len(rows) == 6 and len(set(rows)) == 6
        assert (9, "b") in set(rows)
