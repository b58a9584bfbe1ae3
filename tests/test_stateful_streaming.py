"""Custom stateful streaming (applyInPandasWithState): state must
carry across micro-batches — forced via maxFilesPerTrigger=1 so each
input file is its own batch."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from harness_aws_etl_pipeline_spark.streaming.stateful import (
    streaming_dedup,
    streaming_running_counts,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("text", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write_batches(tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    # batch 1: two distinct docs
    (land / "b1.json").write_text(
        '{"id": 1, "text": "alpha", "value": 1.5}\n'
        '{"id": 2, "text": "beta", "value": 2.0}\n'
    )
    # batch 2: a repeat of alpha + one new doc
    (land / "b2.json").write_text(
        '{"id": 3, "text": "alpha", "value": 3.0}\n'
        '{"id": 4, "text": "gamma", "value": 4.0}\n'
    )
    return land


class TestStreamingDedup:
    def test_first_occurrence_only_across_batches(self, spark, tmp_path):
        land = _write_batches(tmp_path)
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)  # one file per micro-batch
            .json(str(land))
        )
        deduped = streaming_dedup(stream, "text")
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        rows = spark.sql("SELECT first_payload FROM dedup_out").collect()
        payloads = sorted(r["first_payload"] for r in rows)
        # alpha emitted once (despite appearing in both batches)
        assert payloads == ["alpha", "beta", "gamma"]

    def test_builtin_dedup_within_watermark(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.streaming.stateful import (
            streaming_dedup_within_watermark,
        )

        land = tmp_path / "landing"
        land.mkdir()
        # duplicate 'alpha' rows inside the watermark horizon, split
        # across two micro-batches — built-in state must bridge them
        (land / "b1.json").write_text(
            '{"id": 1, "text": "alpha", "ts": "2024-01-01T10:00:00"}\n'
            '{"id": 2, "text": "beta", "ts": "2024-01-01T10:01:00"}\n'
        )
        (land / "b2.json").write_text(
            '{"id": 3, "text": "alpha", "ts": "2024-01-01T10:02:00"}\n'
            '{"id": 4, "text": "gamma", "ts": "2024-01-01T10:03:00"}\n'
        )
        schema = StructType(
            [
                StructField("id", LongType()),
                StructField("text", StringType()),
                StructField("ts", StringType()),
            ]
        )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(land))
            .withColumn("ts", F.to_timestamp("ts"))
        )
        deduped = streaming_dedup_within_watermark(
            stream, ["text"], ts_col="ts", watermark="10 minutes"
        )
        q = (
            deduped.writeStream.format("memory")
            .queryName("wm_dedup_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        texts = sorted(
            r["text"] for r in spark.sql("SELECT text FROM wm_dedup_out").collect()
        )
        assert texts == ["alpha", "beta", "gamma"]

    def test_running_counts_accumulate(self, spark, tmp_path):
        land = _write_batches(tmp_path)
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(land))
        )
        counts = streaming_running_counts(
            stream.withColumn("k", F.when(F.col("id") <= 2, "a").otherwise("b")),
            "k",
            "value",
        )
        q = (
            counts.writeStream.format("memory")
            .queryName("counts_out")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        # final state per key: the max events_so_far row
        rows = spark.sql(
            "SELECT key, MAX(events_so_far) AS n, MAX(value_sum_so_far) AS s "
            "FROM counts_out GROUP BY key"
        ).collect()
        got = {r["key"]: (r["n"], r["s"]) for r in rows}
        assert got["a"] == (2, 35000)  # 1.5 + 2.0 scaled
        assert got["b"] == (2, 70000)  # 3.0 + 4.0 scaled
