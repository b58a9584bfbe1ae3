"""Token-bounded shard layout (sinks/shards.py): exact sequential
semantics from the two-level prefix sum, partition invariance,
boundary-overflow bound, written layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.shards import (
    assign_shards,
    write_training_shards,
)


@pytest.fixture()
def bins(spark):
    # 20 bins x 10 tokens = 200 tokens
    return spark.createDataFrame(
        [(i, 10) for i in range(20)], "bin_id long, total_tokens long"
    )


class TestAssignShards:
    def test_sequential_semantics(self, spark, bins):
        """tokens_per_shard=50 over 20x10 tokens: shards are exactly
        5 consecutive bins each."""
        got = {
            r.bin_id: r.shard_id
            for r in assign_shards(bins, tokens_per_shard=50).collect()
        }
        assert got == {i: i // 5 for i in range(20)}

    def test_matches_single_partition_cumsum(self, spark):
        """The two-level prefix sum equals the naive global cumsum on
        ragged token counts."""
        rows = [(i, (i * 7) % 13 + 1) for i in range(101)]
        df = spark.createDataFrame(rows, "bin_id long, total_tokens long")
        got = {
            r.bin_id: r.shard_id
            for r in assign_shards(df, tokens_per_shard=40).collect()
        }
        run = 0
        for i, t in rows:
            assert got[i] == run // 40, (i, run)
            run += t

    def test_partition_invariance(self, spark):
        rows = [(i, (i * 3) % 9 + 1) for i in range(200)]
        df = spark.createDataFrame(rows, "bin_id long, total_tokens long")
        a = {
            r.bin_id: r.shard_id
            for r in assign_shards(
                df.repartition(17), 25, num_range_parts=5
            ).collect()
        }
        b = {
            r.bin_id: r.shard_id
            for r in assign_shards(
                df.coalesce(1), 25, num_range_parts=11
            ).collect()
        }
        assert a == b

    def test_shard_token_bound(self, spark):
        """Every shard holds <= tokens_per_shard + (max row tokens - 1):
        the sequential boundary-overflow bound."""
        rows = [(i, (i * 11) % 30 + 1) for i in range(150)]
        df = spark.createDataFrame(rows, "bin_id long, total_tokens long")
        per = (
            assign_shards(df, tokens_per_shard=100)
            .groupBy("shard_id")
            .agg(F.sum("total_tokens").alias("t"))
            .collect()
        )
        assert all(r.t <= 100 + 30 - 1 for r in per)

    def test_validation(self, bins):
        with pytest.raises(ValueError):
            assign_shards(bins, 0)


class TestWriteShards:
    def test_layout_and_counts(self, spark, bins, tmp_path):
        out = str(tmp_path / "shards")
        info = write_training_shards(bins, out, tokens_per_shard=50)
        assert info == {"shards": 4, "rows": 20, "tokens": 200}
        back = spark.read.parquet(out)
        assert back.count() == 20
        assert back.select("shard_id").distinct().count() == 4
        # shard dirs on disk
        dirs = {p.name for p in (tmp_path / "shards").iterdir() if p.is_dir()}
        assert dirs == {f"shard_id={i}" for i in range(4)}
