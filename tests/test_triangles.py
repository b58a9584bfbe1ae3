"""Triangle counting / clustering coefficient (operators/linkgraph.py):
per-node counts must equal brute-force enumeration on arbitrary messy
inputs (parallel edges, both directions, self-loops), hubs must not
inflate wedge work, and degenerate graphs behave."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.linkgraph import (
    clustering_coefficient,
    triangles,
)


def _brute(edge_list):
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = dict.fromkeys(adj, 0)
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return adj, tri


def _check(spark, edge_list, schema="src long, dst long"):
    df = spark.createDataFrame(edge_list, schema)
    got = {
        r["node"]: (r["deg"], r["tri_cnt"])
        for r in triangles(df).collect()
    }
    adj, tri = _brute(edge_list)
    assert set(got) == set(adj)
    for n in adj:
        assert got[n] == (len(adj[n]), tri[n]), f"node {n}"
    return got


class TestTriangles:
    def test_known_graph(self, spark):
        # two triangles sharing an edge + a pendant + an isolated edge
        edges = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4), (4, 5), (8, 9)]
        got = _check(spark, edges)
        assert got[2] == (3, 2) and got[5] == (1, 0)

    def test_messy_input_collapses(self, spark):
        # parallel edges, reversed duplicates, self-loops: simple-graph
        # semantics must hold
        edges = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (3, 3)]
        got = _check(spark, edges)
        assert got[1] == (2, 1)

    def test_hub_star_counts_zero(self, spark):
        # a pure star has no triangles at any hub degree
        edges = [(0, i) for i in range(1, 60)]
        got = _check(spark, edges)
        assert got[0] == (59, 0)

    def test_string_nodes(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
        got = _check(spark, edges, "src string, dst string")
        assert got["a"] == (2, 1)

    def test_random_graph_matches_brute_force(self, spark):
        # deterministic pseudo-random graph via a multiplicative hash
        n = 40
        edges = [
            (i, j)
            for i in range(n)
            for j in range(i + 1, n)
            if (i * 2654435761 + j * 40503) % 7 == 0
        ]
        _check(spark, edges)

    def test_empty_and_single_edge(self, spark):
        df = spark.createDataFrame([], "src long, dst long")
        assert triangles(df).count() == 0
        got = _check(spark, [(1, 2)])
        assert got[1] == (1, 0)


class TestClustering:
    def test_lcc_values(self, spark):
        edges = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4), (4, 5)]
        got = {
            r["node"]: r["lcc"]
            for r in clustering_coefficient(
                spark.createDataFrame(edges, "src long, dst long")
            ).collect()
        }
        # node 2: deg 3, triangles {1,2,3},{2,3,4} → 2·2/(3·2)
        assert got[2] == pytest.approx(2 / 3)
        assert got[1] == pytest.approx(1.0)
        assert got[5] is None  # deg 1: undefined

    def test_triangle_total_is_thrice_sum(self, spark):
        edges = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)]
        t = triangles(spark.createDataFrame(edges, "src long, dst long"))
        total = t.agg(F.sum("tri_cnt")).first()[0]
        assert total % 3 == 0 and total // 3 == 2
