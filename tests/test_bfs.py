"""BFS seed-set distances (operators/linkgraph.py:bfs_distances):
minimal-hop semantics on cycles, multi-seed min, directed vs
undirected, truncation, early stop, and cache hygiene."""

from __future__ import annotations

import pytest

from harness_aws_etl_pipeline_spark.operators.linkgraph import bfs_distances


@pytest.fixture()
def graph(spark):
    # 1→2→3→4→1 cycle, 1→6, 5→6 (5 unreachable from 1 when directed)
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 6), (5, 6)],
        "src long, dst long",
    )


def _run(graph, seeds_df, **kw):
    return {
        r["node"]: r["hop"] for r in bfs_distances(graph, seeds_df, **kw).collect()
    }


class TestBfs:
    def test_directed_min_hops_on_cycle(self, spark, graph):
        seeds = spark.createDataFrame([(1,)], "node long")
        assert _run(graph, seeds, max_hops=10) == {1: 0, 2: 1, 6: 1, 3: 2, 4: 3}

    def test_undirected_reaches_through_reverse_edges(self, spark, graph):
        seeds = spark.createDataFrame([(1,)], "node long")
        got = _run(graph, seeds, directed=False)
        assert got[5] == 2  # 1→6 then 6←5 reversed

    def test_multi_seed_takes_minimum(self, spark, graph):
        seeds = spark.createDataFrame([(1,), (3,)], "node long")
        got = _run(graph, seeds, max_hops=10)
        assert got[3] == 0 and got[4] == 1 and got[2] == 1

    def test_max_hops_truncates(self, spark, graph):
        seeds = spark.createDataFrame([(1,)], "node long")
        assert _run(graph, seeds, max_hops=1) == {1: 0, 2: 1, 6: 1}
        assert _run(graph, seeds, max_hops=0) == {1: 0}
        with pytest.raises(ValueError):
            bfs_distances(graph, seeds, max_hops=-1)

    def test_early_stop_and_no_leaked_cache(self, spark, graph):
        from harness_aws_etl_pipeline_spark.operators.memo import (
            clear_all_memos,
        )

        clear_all_memos()
        seeds = spark.createDataFrame([(5,)], "node long")
        # component {5,6} exhausts after 1 hop; loop must stop early
        got = _run(graph, seeds, max_hops=1000)
        assert got == {5: 0, 6: 1}
        jcm = spark._jsparkSession.sharedState().cacheManager()
        assert jcm.isEmpty(), "bfs_distances leaked a persisted frame"

    def test_seed_not_in_graph(self, spark, graph):
        seeds = spark.createDataFrame([(99,)], "node long")
        assert _run(graph, seeds) == {99: 0}
