"""Semantic dedup (operators/semdedup.py).

Hand-built 4-dim vectors: unit-circle angles make every cosine exact
enough to reason about (cos 17° ≈ 0.956 ≥ 0.95, cos 34° ≈ 0.829 < 0.95)
— the A~B, B~C, A≁C chain that separates greedy from dominance.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.semdedup import (
    semantic_dedup,
    semantic_dedup_flags,
    semantic_dedup_stats,
)


def _vec(deg: float) -> list[float]:
    r = math.radians(deg)
    return [math.cos(r), math.sin(r), 0.0, 0.0]


@pytest.fixture(scope="module")
def centroids(spark):
    return spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])],
        "centroid_id long, centroid array<double>",
    )


@pytest.fixture(scope="module")
def chain(spark):
    # ids 1..3 form the chain in cluster 0; id 9 sits alone in cluster 1
    return spark.createDataFrame(
        [
            (1, _vec(0.0)),
            (2, _vec(17.0)),
            (3, _vec(34.0)),
            (9, [0.0, 0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )


class TestPolicies:
    def test_greedy_keeps_chain_ends(self, chain, centroids):
        flags = semantic_dedup_flags(
            chain, centroids=centroids, threshold=0.95, dim=4,
            policy="greedy", order="min_id",
        )
        kept = sorted(r.vec_id for r in flags.collect() if r.keep)
        assert kept == [1, 3, 9]

    def test_dominance_drops_whole_chain_tail(self, chain, centroids):
        flags = semantic_dedup_flags(
            chain, centroids=centroids, threshold=0.95, dim=4,
            policy="dominance", order="min_id",
        )
        kept = sorted(r.vec_id for r in flags.collect() if r.keep)
        # 3 is dominated by the EARLIER 2 even though 2 itself is dropped
        assert kept == [1, 9]

    def test_expr_path_matches_arrow_dominance(self, chain, centroids):
        kw = dict(centroids=centroids, threshold=0.95, dim=4,
                  policy="dominance", order="min_id")
        a = semantic_dedup_flags(chain, arrow=True, **kw)
        b = semantic_dedup_flags(chain, arrow=False, **kw)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_greedy_requires_arrow(self, chain, centroids):
        with pytest.raises(ValueError, match="greedy"):
            semantic_dedup_flags(
                chain, centroids=centroids, dim=4, policy="greedy", arrow=False
            )

    def test_bad_policy_rejected(self, chain, centroids):
        with pytest.raises(ValueError, match="policy"):
            semantic_dedup_flags(chain, centroids=centroids, dim=4, policy="nope")


class TestOrdering:
    def test_centroid_far_keeps_the_outlier(self, spark, centroids):
        # two near-identical vectors; 34° is farther from centroid 0
        # than 30°, so centroid_far keeps 34° (id 8) over min-id 7
        df = spark.createDataFrame(
            [(7, _vec(30.0)), (8, _vec(34.0))],
            "vec_id long, embedding array<float>",
        )
        far = semantic_dedup_flags(
            df, centroids=centroids, threshold=0.95, dim=4,
            policy="greedy", order="centroid_far",
        )
        assert sorted((r.vec_id, r.keep) for r in far.collect()) == [
            (7, False), (8, True)
        ]
        byid = semantic_dedup_flags(
            df, centroids=centroids, threshold=0.95, dim=4,
            policy="greedy", order="min_id",
        )
        assert sorted((r.vec_id, r.keep) for r in byid.collect()) == [
            (7, True), (8, False)
        ]


class TestRobustness:
    def test_invalid_vectors_are_kept_not_judged(self, spark, centroids):
        df = spark.createDataFrame(
            [
                (1, _vec(0.0)),
                (2, None),
                (3, [1.0, 0.0]),              # ragged
                (4, [float("nan"), 0.0, 0.0, 0.0]),
            ],
            "vec_id long, embedding array<float>",
        )
        flags = semantic_dedup_flags(df, centroids=centroids, dim=4)
        got = {r.vec_id: (r.centroid_id, r.keep) for r in flags.collect()}
        assert got[1][1] and got[1][0] == 0
        for bad in (2, 3, 4):
            assert got[bad] == (None, True)

    def test_oversized_cluster_subsplit_runs(self, spark, centroids):
        rows = [(i, _vec(float(i) % 3)) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        flags = semantic_dedup_flags(
            df, centroids=centroids, threshold=0.95, dim=4, max_cluster_size=8
        )
        assert flags.count() == 40
        # duplicates still collapse inside each sub-cell: far fewer kept
        assert flags.filter("keep").count() < 40

    def test_learned_centroids_path(self, spark):
        # no centroids passed -> ivf_centroids trains; planted exact dup
        rows = [(i, _vec(i * 40.0)) for i in range(8)] + [(100, _vec(0.0))]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = semantic_dedup(df, k=2, threshold=0.99, dim=4, order="min_id")
        ids = {r.vec_id for r in out.collect()}
        assert 0 in ids and 100 not in ids  # exact dup of id 0 removed
        assert out.columns == df.columns


class TestStats:
    def test_panel_values(self, chain, centroids):
        row = semantic_dedup_stats(
            chain, centroids=centroids, threshold=0.95, dim=4,
            policy="dominance", order="min_id",
        ).collect()[0]
        assert (row.sem_total, row.sem_valid) == (4, 4)
        assert (row.sem_kept, row.sem_dropped) == (2, 2)
        assert (row.sem_clusters, row.sem_dup_clusters) == (2, 1)


class TestClusterFacade:
    def test_cluster_embeddings(self, spark, centroids):
        from harness_aws_etl_pipeline_spark.operators.semdedup import (
            cluster_embeddings,
        )

        df = spark.createDataFrame(
            [
                (1, _vec(0.0)),
                (2, _vec(10.0)),
                (9, [0.0, 0.0, 1.0, 0.0]),
                (10, None),
            ],
            "vec_id long, embedding array<float>",
        )
        out = cluster_embeddings(df, centroids=centroids, dim=4)
        got = {r.vec_id: r.centroid_id for r in out.collect()}
        assert got[1] == 0 and got[2] == 0 and got[9] == 1
        assert got[10] is None
        assert set(out.columns) == {"vec_id", "embedding", "centroid_id"}

    def test_learned_quantizer_and_expr_parity(self, spark):
        from harness_aws_etl_pipeline_spark.operators.semdedup import (
            cluster_embeddings,
        )

        rows = [(i, _vec(float(i * 37 % 360))) for i in range(60)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        a = cluster_embeddings(df, k=4, dim=4, arrow=True)
        # reuse the SAME learned centroids for the expression path via
        # a fixed quantizer so the comparison is assignment-only
        from harness_aws_etl_pipeline_spark.operators.similarity import (
            ivf_centroids,
        )

        cents = ivf_centroids(df, k=4)
        a = cluster_embeddings(df, centroids=cents, dim=4, arrow=True)
        b = cluster_embeddings(df, centroids=cents, dim=4, arrow=False)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
