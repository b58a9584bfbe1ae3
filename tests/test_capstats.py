"""Cap-hit observability (dedup_fuzzy.bucket_cap_stats +
semdedup sub-split counters): a planted-skew corpus must surface the
recall-for-boundedness trade as numbers, a benign corpus must report
zero cap hits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.dedup_api import dedup_cap_stats

BOILER = "the quick brown fox jumps over the lazy dog again and again"


@pytest.fixture(scope="module")
def skewed(spark):
    # 30 identical boilerplate docs: every shingle / band bucket / band
    # key holds all 30 — any cap below 30 fires on every bucket
    return spark.createDataFrame(
        [(i, BOILER) for i in range(30)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def benign(spark):
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(20)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBucketCapStats:
    @pytest.mark.parametrize("method", ["ngram", "minhash", "simhash"])
    def test_planted_skew_fires_counters(self, skewed, method):
        row = dedup_cap_stats(skewed, method=method, max_bucket_size=5).collect()[0]
        assert row.method == method and row.cap == 5
        assert row.buckets_total > 0
        assert row.buckets_capped == row.buckets_total  # every bucket skewed
        assert row.rows_in_capped == 30 * row.buckets_capped
        # 30 docs per capped bucket -> C(30,2) = 435 pairs lost each
        assert row.pairs_lost_ub == 435 * row.buckets_capped
        assert row.max_bucket == 30

    @pytest.mark.parametrize("method", ["ngram", "minhash", "simhash"])
    def test_benign_corpus_reports_zero(self, benign, method):
        row = dedup_cap_stats(
            benign, method=method, max_bucket_size=1000
        ).collect()[0]
        assert row.buckets_capped == 0
        assert row.rows_in_capped == 0 and row.pairs_lost_ub == 0
        assert 0 < row.max_bucket <= 1000

    def test_unknown_method_rejected(self, benign):
        with pytest.raises(ValueError, match="unknown blocking method"):
            dedup_cap_stats(benign, method="bogus").collect()

    def test_empty_input(self, spark):
        empty = spark.createDataFrame([], "doc_id long, text string")
        row = dedup_cap_stats(empty, method="minhash", max_bucket_size=5).collect()[0]
        assert row.buckets_total == 0 and row.buckets_capped == 0
        assert row.pairs_lost_ub == 0 and row.max_bucket == 0


class TestSemDedupSplitCounters:
    def test_oversized_cluster_counters_fire(self, spark):
        from harness_aws_etl_pipeline_spark.operators.semdedup import (
            semantic_dedup_stats,
        )

        # one fixed centroid -> all 10 valid vectors land in one
        # cluster; cap 4 forces a sub-split into ceil(10/4)=3 cells
        cents = spark.createDataFrame(
            [(0, [1.0] + [0.0] * 7)], "centroid_id long, centroid array<double>"
        )
        vecs = [
            (i, [1.0] + [0.01 * i * ((j % 3) - 1) for j in range(7)])
            for i in range(10)
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        row = semantic_dedup_stats(
            df,
            centroids=cents,
            k=1,
            threshold=0.999999,
            dim=8,
            max_cluster_size=4,
            order="min_id",
        ).collect()[0]
        assert row.sem_oversized_clusters == 1
        assert row.sem_split_cells == 2  # ceil(10/4) - 1
        assert row.sem_clusters == 1     # cluster accounting unchanged

    def test_unsplit_cluster_reports_zero(self, spark):
        from harness_aws_etl_pipeline_spark.operators.semdedup import (
            semantic_dedup_stats,
        )

        cents = spark.createDataFrame(
            [(0, [1.0] + [0.0] * 7)], "centroid_id long, centroid array<double>"
        )
        vecs = [(i, [1.0, float(i), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]) for i in range(5)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
        row = semantic_dedup_stats(
            df, centroids=cents, k=1, threshold=0.9999, dim=8, order="min_id"
        ).collect()[0]
        assert row.sem_oversized_clusters == 0 and row.sem_split_cells == 0


class TestJoinSideCapStats:
    def test_per_side_usage_pattern(self, spark, skewed, benign):
        """The documented cross-corpus pattern: run the panel per side.
        The skewed left side fires, the benign right side doesn't."""
        left = dedup_cap_stats(skewed, method="simhash", max_bucket_size=5).collect()[0]
        right = dedup_cap_stats(benign, method="simhash", max_bucket_size=5).collect()[0]
        assert left.buckets_capped > 0
        assert right.buckets_capped == 0
