"""Structured Streaming tests: AvailableNow ingest sweep (the
reference's 'scheduled' mode, S7/L7) and watermarked window builders."""

import time

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from harness_aws_etl_pipeline_spark.streaming import (
    run_available_now,
    run_available_now_upsert,
    session_counts,
    sliding_counts,
    stream_ingest,
    tumbling_counts,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("amount", DoubleType()),
    ]
)

CSV1 = "id,name,amount\n1,a,1.0\n2,b,2.0\n"
CSV2 = "id,name,amount\n3,c,3.0\n"


class TestAvailableNowIngest:
    def test_sweep_and_incremental_restart(self, spark, tmp_path):
        land = tmp_path / "landing"
        land.mkdir()
        (land / "f1.csv").write_text(CSV1)

        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        src = stream_ingest(spark, str(land), SCHEMA, fmt="csv")
        assert src.isStreaming
        assert run_available_now(src, out, ckpt, timeout_sec=120)
        assert spark.read.parquet(out).count() == 2

        # second sweep only picks up the NEW file (source log, not
        # re-reading f1) — the exactly-once property the reference's
        # archive+delete was approximating
        (land / "f2.csv").write_text(CSV2)
        src2 = stream_ingest(spark, str(land), SCHEMA, fmt="csv")
        assert run_available_now(src2, out, ckpt, timeout_sec=120)
        back = spark.read.parquet(out)
        assert back.count() == 3
        assert {r["id"] for r in back.collect()} == {1, 2, 3}

    def test_streaming_upsert_merges_by_key(self, spark, tmp_path):
        # CDC shape: second sweep UPDATES key 2 and moves key 1 to a
        # new partition; foreachBatch-upsert must converge to
        # latest-per-key with the stale copy gone
        land = tmp_path / "landing"
        land.mkdir()
        (land / "f1.csv").write_text(
            "id,name,amount\n1,a,1.0\n2,a,2.0\n3,b,3.0\n"
        )
        out = str(tmp_path / "tbl")
        ckpt = str(tmp_path / "ckpt")
        stats = []
        src = stream_ingest(spark, str(land), SCHEMA, fmt="csv")
        assert run_available_now_upsert(
            src, out, ckpt, key_cols=["id"], partition_by=["name"],
            timeout_sec=120, on_batch=lambda bid, s: stats.append(s),
        )
        assert spark.read.parquet(out).count() == 3

        (land / "f2.csv").write_text(
            "id,name,amount\n2,a,99.0\n1,b,11.0\n4,c,4.0\n"
        )
        src2 = stream_ingest(spark, str(land), SCHEMA, fmt="csv")
        assert run_available_now_upsert(
            src2, out, ckpt, key_cols=["id"], partition_by=["name"],
            timeout_sec=120, on_batch=lambda bid, s: stats.append(s),
        )
        got = {
            r["id"]: (r["name"], r["amount"])
            for r in spark.read.parquet(out).collect()
        }
        assert got == {
            1: ("b", 11.0),  # moved partition, old copy dropped
            2: ("a", 99.0),  # updated in place
            3: ("b", 3.0),   # untouched survivor
            4: ("c", 4.0),   # inserted
        }
        assert stats and all("partitions_touched" in s for s in stats)

    def test_on_batch_hook(self, spark, tmp_path):
        import os
        import time as _time

        land = tmp_path / "landing"
        land.mkdir()
        (land / "f1.csv").write_text(CSV1)
        (land / "f2.csv").write_text(CSV2)
        now = _time.time()
        os.utime(land / "f1.csv", (now - 100, now - 100))
        os.utime(land / "f2.csv", (now, now))

        seen = []
        src = stream_ingest(spark, str(land), SCHEMA, fmt="csv", max_files_per_trigger=1)
        assert run_available_now(
            src,
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
            timeout_sec=120,
            on_batch=lambda bid, info: seen.append((bid, info["rows"])),
        )
        assert sorted(r for _b, r in seen) == [1, 2]  # one callback per batch
        assert spark.read.parquet(str(tmp_path / "out")).count() == 3

    def test_transform_applied_per_microbatch(self, spark, tmp_path):
        land = tmp_path / "landing"
        land.mkdir()
        (land / "f1.csv").write_text(CSV1)
        src = stream_ingest(spark, str(land), SCHEMA, fmt="csv")
        run_available_now(
            src,
            str(tmp_path / "out"),
            str(tmp_path / "ckpt"),
            transform=lambda df: df.withColumn("doubled", F.col("amount") * 2),
            timeout_sec=120,
        )
        back = spark.read.parquet(str(tmp_path / "out"))
        assert {r["doubled"] for r in back.collect()} == {2.0, 4.0}


EVENTS = [
    (1, "2024-01-01 00:05:00", 10, "click", 1.0),
    (2, "2024-01-01 00:20:00", 10, "click", 2.0),
    (3, "2024-01-01 01:10:00", 10, "view", 3.0),
    (4, "2024-01-01 03:00:00", 11, "click", 4.0),
]


class TestWindows:
    def _events(self, spark):
        return spark.createDataFrame(
            EVENTS, "event_id long, ts string, user_id long, event_type string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))

    def test_tumbling_batch_semantics(self, spark):
        out = tumbling_counts(self._events(spark), width="1 hour")
        rows = {
            (r["window"]["start"].hour, r["event_type"]): r["event_cnt"]
            for r in out.collect()
        }
        assert rows[(0, "click")] == 2 and rows[(1, "view")] == 1

    def test_sliding_overlap(self, spark):
        out = sliding_counts(self._events(spark), width="1 hour", slide="30 minutes")
        # event at 00:05 belongs to windows starting 23:30 and 00:00
        cnt = out.agg(F.sum("event_cnt")).first()[0]
        assert cnt == 8  # each event in exactly 2 sliding windows

    def test_streaming_tumbling_with_watermark(self, spark, tmp_path):
        # run the SAME builder as a real watermarked stream via rate
        # source substitution: write events to json, stream them back
        src_dir = tmp_path / "events"
        src_dir.mkdir()
        self._events(spark).coalesce(1).write.mode("overwrite").json(str(src_dir / "j"))
        schema = self._events(spark).schema
        stream = spark.readStream.schema(schema).json(str(src_dir / "j"))
        windowed = tumbling_counts(stream, width="1 hour", watermark="2 hours")
        q = (
            windowed.writeStream.format("memory")
            .queryName("tumbling_test")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        got = spark.sql("SELECT sum(event_cnt) FROM tumbling_test").first()[0]
        assert got == 4

    def test_watermark_drops_late_data(self, spark, tmp_path):
        """Append-mode tumbling agg with a 1h watermark: an event
        arriving after the watermark passed its window must be
        discarded, and only watermark-finalized windows are emitted."""
        import os
        import time

        land = tmp_path / "late"
        land.mkdir()
        # Three micro-batches. A late row is only DROPPED once its
        # window was finalized in a STRICTLY earlier batch (a row
        # arriving in the same batch as the finalization still counts)
        # — so batch2 closes window 0, batch3 brings the late row.
        f1 = land / "a_batch1.json"
        f1.write_text(
            '{"event_id": 1, "ts": "2024-01-01 00:10:00", "user_id": 1, "event_type": "e", "value": 1.0}\n'
            '{"event_id": 2, "ts": "2024-01-01 03:00:00", "user_id": 1, "event_type": "e", "value": 1.0}\n'
        )
        f2 = land / "b_batch2.json"
        f2.write_text(
            '{"event_id": 3, "ts": "2024-01-01 04:00:00", "user_id": 1, "event_type": "e", "value": 1.0}\n'
        )
        f3 = land / "c_batch3.json"
        f3.write_text(
            # window 0 closed at end of batch2 (wm 02:00) → this is dropped
            '{"event_id": 4, "ts": "2024-01-01 00:30:00", "user_id": 1, "event_type": "e", "value": 1.0}\n'
            '{"event_id": 5, "ts": "2024-01-01 05:00:00", "user_id": 1, "event_type": "e", "value": 1.0}\n'
        )
        # file source orders batches by modification time
        now = time.time()
        os.utime(f1, (now - 200, now - 200))
        os.utime(f2, (now - 100, now - 100))
        os.utime(f3, (now, now))

        schema = self._events(spark).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(land))
        )
        windowed = tumbling_counts(stream, width="1 hour", watermark="1 hour")
        q = (
            windowed.writeStream.format("memory")
            .queryName("late_test")
            .outputMode("append")  # append = only watermark-closed windows
            .option("checkpointLocation", str(tmp_path / "ckpt_late"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
        rows = spark.sql(
            "SELECT window.start AS s, event_cnt FROM late_test ORDER BY s"
        ).collect()
        emitted = {r["s"].hour: r["event_cnt"] for r in rows}
        # hour-0 closed with ONLY event 1 (late event 4 dropped by the
        # watermark); hour-3/4 closed by later watermark advances;
        # hour-5 never finalized -> absent in append mode
        assert dropped == 1
        assert emitted[0] == 1
        assert 5 not in emitted

    def test_session_window_streaming(self, spark, tmp_path):
        src_dir = tmp_path / "events2"
        src_dir.mkdir()
        self._events(spark).coalesce(1).write.mode("overwrite").json(str(src_dir / "j"))
        schema = self._events(spark).schema
        stream = spark.readStream.schema(schema).json(str(src_dir / "j"))
        sess = session_counts(stream, gap="30 minutes", watermark="10 hours")
        q = (
            sess.writeStream.format("memory")
            .queryName("session_test")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        rows = spark.sql(
            "SELECT user_id, count(*) AS sessions FROM session_test GROUP BY user_id"
        ).collect()
        by_user = {r["user_id"]: r["sessions"] for r in rows}
        # user 10: events at 00:05+00:20 merge (gap<30m), 01:10 separate
        assert by_user == {10: 2, 11: 1}


class TestIntervalJoin:
    """Stream-stream interval join: batch twins pin the semantics,
    a watermarked AvailableNow run pins the streaming path."""

    def _clicks(self, spark):
        rows = [
            (1, "2024-01-01 00:00:00", 10),
            (2, "2024-01-01 00:30:00", 10),
            (3, "2024-01-01 02:00:00", 11),
        ]
        return spark.createDataFrame(
            rows, "click_id long, ts string, user_id long"
        ).withColumn("ts", F.to_timestamp("ts"))

    def _buys(self, spark):
        rows = [
            (100, "2024-01-01 00:04:00", 10),  # 4 min after click 1
            (101, "2024-01-01 00:29:00", 10),  # 29 min after click 1, 1 min before click 2 (outside lower=0)
            (102, "2024-01-01 02:05:00", 11),  # 5 min after click 3
            (103, "2024-01-01 05:00:00", 12),  # no matching click user
        ]
        return spark.createDataFrame(
            rows, "buy_id long, ts string, user_id long"
        ).withColumn("ts", F.to_timestamp("ts"))

    def test_batch_inner_semantics(self, spark):
        from harness_aws_etl_pipeline_spark.streaming import interval_join

        out = interval_join(
            self._clicks(spark),
            self._buys(spark),
            on="user_id",
            lower="0 seconds",
            upper="10 minutes",
        )
        pairs = sorted(
            (r["click_id"], r["buy_id_r"]) for r in out.collect()
        )
        # click1→buy100 (4m), click3→buy102 (5m); buy101 is 29m after
        # click1 (outside upper) and -1m before click2 (outside lower)
        assert pairs == [(1, 100), (3, 102)]
        assert "user_id_r" not in out.columns  # right key dropped

    def test_batch_signed_lower_bound(self, spark):
        from harness_aws_etl_pipeline_spark.streaming import interval_join

        out = interval_join(
            self._clicks(spark),
            self._buys(spark),
            on="user_id",
            lower="-5 minutes",
            upper="10 minutes",
        )
        pairs = sorted((r["click_id"], r["buy_id_r"]) for r in out.collect())
        # widening lower to -5m admits buy101 (1 min BEFORE click 2)
        assert pairs == [(1, 100), (2, 101), (3, 102)]

    def test_batch_left_outer_keeps_unmatched(self, spark):
        from harness_aws_etl_pipeline_spark.streaming import interval_join

        out = interval_join(
            self._clicks(spark),
            self._buys(spark),
            on="user_id",
            upper="10 minutes",
            how="leftOuter",
        )
        got = {r["click_id"]: r["buy_id_r"] for r in out.collect()}
        assert got == {1: 100, 2: None, 3: 102}

    def test_batch_right_outer_keeps_right_key(self, spark):
        # unmatched RIGHT rows must still carry their join key: the
        # key columns collapse via coalesce(left, right), they are
        # not simply the left side's (NULL for outer-unmatched)
        from harness_aws_etl_pipeline_spark.streaming import interval_join

        out = interval_join(
            self._clicks(spark),
            self._buys(spark),
            on="user_id",
            upper="10 minutes",
            how="rightOuter",
        )
        got = {r["buy_id_r"]: (r["click_id"], r["user_id"]) for r in out.collect()}
        assert got[100] == (1, 10)
        assert got[101] == (None, 10)  # unmatched buy, key preserved
        assert got[103] == (None, 12)  # user with no clicks at all

    def test_streaming_requires_watermarks(self, spark, tmp_path):
        import pytest

        from harness_aws_etl_pipeline_spark.streaming import interval_join

        d = tmp_path / "wm"
        d.mkdir()
        self._clicks(spark).coalesce(1).write.mode("overwrite").json(str(d / "c"))
        stream = spark.readStream.schema(self._clicks(spark).schema).json(
            str(d / "c")
        )
        with pytest.raises(ValueError, match="watermarks on BOTH"):
            interval_join(stream, self._buys(spark), on="user_id")

    def test_streaming_inner_join(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.streaming import interval_join

        d = tmp_path / "sj"
        d.mkdir()
        self._clicks(spark).coalesce(1).write.mode("overwrite").json(str(d / "c"))
        self._buys(spark).coalesce(1).write.mode("overwrite").json(str(d / "b"))
        cs = spark.readStream.schema(self._clicks(spark).schema).json(str(d / "c"))
        bs = spark.readStream.schema(self._buys(spark).schema).json(str(d / "b"))
        out = interval_join(
            cs,
            bs,
            on="user_id",
            lower="0 seconds",
            upper="10 minutes",
            left_watermark="1 hour",
            right_watermark="1 hour",
        )
        q = (
            out.writeStream.format("memory")
            .queryName("ij_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        pairs = sorted(
            (r["click_id"], r["buy_id_r"])
            for r in spark.sql("SELECT * FROM ij_test").collect()
        )
        assert pairs == [(1, 100), (3, 102)]

    def test_enrich_stream_static_dim(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.streaming import enrich_stream

        d = tmp_path / "enr"
        d.mkdir()
        self._clicks(spark).coalesce(1).write.mode("overwrite").json(str(d / "c"))
        cs = spark.readStream.schema(self._clicks(spark).schema).json(str(d / "c"))
        dim = spark.createDataFrame(
            [(10, "gold"), (11, "basic")], "user_id long, tier string"
        )
        out = enrich_stream(cs, dim, on="user_id")
        q = (
            out.writeStream.format("memory")
            .queryName("enrich_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        tiers = {
            r["click_id"]: r["tier"]
            for r in spark.sql("SELECT * FROM enrich_test").collect()
        }
        assert tiers == {1: "gold", 2: "gold", 3: "basic"}
