"""linkgraph: host-graph construction + fixed-point PageRank.

The operator's claim is exact reproducibility: integer arithmetic
makes the rank vector bit-identical across partitionings and engines
(the catalog oracle re-derives it in DuckDB). These tests pin the
numeric semantics against an independent float implementation and the
structural properties (mass conservation, ring uniformity, dangling
redistribution, multiplicity-as-weight)."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.linkgraph import host_graph, pagerank

from tests.tiers import deep

EDGES = [
    ("A", "B"), ("A", "C"), ("B", "C"), ("B", "E"),
    ("C", "A"), ("D", "C"), ("F", "A"), ("F", "E"),
]
SCALE = 10**12


def _float_ref(edges: list[tuple[str, str]], iterations: int, d: float = 0.85):
    nodes = sorted({x for e in edges for x in e})
    out = collections.Counter(s for s, _ in edges)
    n = len(nodes)
    rk = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dang = sum(rk[v] for v in nodes if out[v] == 0)
        new = {v: (1 - d) / n + d * dang / n for v in nodes}
        for s, t in edges:
            new[t] += d * rk[s] / out[s]
        rk = new
    return rk


def _run(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src string, dst string")
    return {
        r["node"]: (r["rank_scaled"], r["rank"])
        for r in pagerank(e, **kw).collect()
    }


class TestPageRank:
    def test_matches_float_reference_and_conserves_mass(self, spark):
        # checkpoint_every=2 exercises the mid-run lineage cut on the
        # same run that pins values and mass (one Spark run, three pins)
        got = _run(spark, EDGES, iterations=3, checkpoint_every=2)
        ref = _float_ref(EDGES, 3)
        assert set(got) == set(ref)
        for v, (_, rank) in got.items():
            # fixed-point floor loss is bounded well under 1e-6 here
            assert rank == pytest.approx(ref[v], abs=1e-6)
        mass = sum(s for s, _ in got.values())
        # each of the 3 iterations loses < #nodes + #edges units to floors
        assert SCALE - 3 * (6 + 8) * 10 <= mass <= SCALE

    def test_ring_is_exactly_uniform(self, spark):
        ring = [(str(i), str((i + 1) % 5)) for i in range(5)]
        got = _run(spark, ring, iterations=4)
        assert len({s for s, _ in got.values()}) == 1

    def test_parallel_edges_act_as_weight(self, spark):
        # two A->B edges vs one A->C: B gathers twice C's share from A
        got = _run(spark, [("A", "B"), ("A", "B"), ("A", "C"), ("B", "A"), ("C", "A")],
                   iterations=1)
        a_share = (SCALE // 3) // 3  # A's rank split over its 3 out-edges
        assert got["B"][0] - got["C"][0] == a_share * 85 // 100

    def test_deterministic_across_partitionings(self, spark):
        e = spark.createDataFrame(EDGES, "src string, dst string")
        a = {r["node"]: r["rank_scaled"]
             for r in pagerank(e.repartition(16), iterations=3).collect()}
        b = {r["node"]: r["rank_scaled"]
             for r in pagerank(e.coalesce(1), iterations=3).collect()}
        assert a == b

    def test_empty_edges(self, spark):
        e = spark.createDataFrame([], "src string, dst string")
        assert pagerank(e, iterations=2).count() == 0

    def test_guards(self, spark):
        e = spark.createDataFrame(EDGES, "src string, dst string")
        with pytest.raises(ValueError, match="damping_pct"):
            pagerank(e, damping_pct=100)
        with pytest.raises(ValueError, match="iterations"):
            pagerank(e, iterations=0)
        with pytest.raises(ValueError, match="scale"):
            pagerank(e, scale=1000)

    def test_cache_hygiene(self, spark):
        # the operator persists edges/nodes/outdeg internally and must
        # release them (suite-wide invariant: empty CacheManager).
        # Earlier suites legitimately leave bounded PlanMemo entries
        # cached — drain them first so this asserts OUR hygiene only.
        from harness_aws_etl_pipeline_spark.operators.memo import clear_all_memos

        clear_all_memos()
        e = spark.createDataFrame(EDGES, "src string, dst string")
        pagerank(e, iterations=2).collect()
        jvm_cm = spark._jsparkSession.sharedState().cacheManager()
        assert jvm_cm.isEmpty()


class TestHostGraph:
    def test_rollup_and_self_loop_drop(self, spark):
        docs = spark.createDataFrame(
            [
                ("https://a.com/p1",
                 ["https://b.com/x", "https://b.com/y", "https://a.com/self", "/rel"]),
                ("https://a.com/p2", ["https://b.com/z", "https://c.com/"]),
                ("https://b.com/p", ["https://a.com/"]),
            ],
            "url string, links array<string>",
        )
        got = {(r["src"], r["dst"]): r["weight"]
               for r in host_graph(docs).collect()}
        assert got == {("a.com", "b.com"): 3, ("a.com", "c.com"): 1,
                       ("b.com", "a.com"): 1}

    def test_lazy_matches_eager(self, spark):
        e = spark.createDataFrame(EDGES, "src string, dst string")
        eager = {r["node"]: r["rank_scaled"]
                 for r in pagerank(e, iterations=3).collect()}
        lazy = {r["node"]: r["rank_scaled"]
                for r in pagerank(e, iterations=3, lazy=True).collect()}
        assert eager == lazy
        # lazy path must leave nothing persisted behind (memo entries
        # from earlier suites are bounded by design — drain first)
        from harness_aws_etl_pipeline_spark.operators.memo import clear_all_memos

        clear_all_memos()
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty()

    def test_tol_early_stop_on_symmetric_graph(self, spark):
        # a ring is uniform from the start — the first measured delta
        # is 0, so the loop must stop at iteration 2 of the 10-cap
        ring = [(str(i), str((i + 1) % 6)) for i in range(6)]
        e = spark.createDataFrame(ring, "src string, dst string")
        r = pagerank(e, iterations=10, tol=1e-9)
        assert r._pr_iterations == 2
        assert len({x["rank_scaled"] for x in r.collect()}) == 1

    @deep

    def test_tol_converges_to_fixed_point(self, spark):
        # d=0.5 halves the delta per iteration, so tol=1e-3 is reached
        # in ~8 iterations — the reference fixed point comes from the
        # float implementation (free), not a second deep Spark run
        e = spark.createDataFrame(EDGES, "src string, dst string")
        converged = pagerank(e, iterations=20, damping_pct=50, tol=1e-3)
        assert converged._pr_iterations < 20
        got = {r["node"]: r["rank_scaled"] for r in converged.collect()}
        ref = _float_ref(EDGES, 200, d=0.5)
        # stopping at L1 delta < tol*scale bounds the distance to the
        # fixed point by delta * d/(1-d) = delta at d=0.5; 2x slack
        bound = int(1e-3 * SCALE * 2)
        assert all(abs(got[k] - ref[k] * SCALE) <= bound for k in ref)

    def test_tol_rejects_lazy(self, spark):
        e = spark.createDataFrame(EDGES, "src string, dst string")
        with pytest.raises(ValueError, match="tol"):
            pagerank(e, tol=1e-6, lazy=True)

    @deep

    def test_weighted_equals_multiset_expansion(self, spark):
        # rolled-up weighted edges must be BIT-identical to the same
        # graph written as parallel unit rows
        weighted = spark.createDataFrame(
            [("A", "B", 3), ("A", "C", 1), ("B", "A", 2), ("C", "A", 5)],
            "src string, dst string, weight long",
        )
        expanded = spark.createDataFrame(
            [("A", "B")] * 3 + [("A", "C")] + [("B", "A")] * 2 + [("C", "A")] * 5,
            "src string, dst string",
        )
        w = {r["node"]: r["rank_scaled"]
             for r in pagerank(weighted, weight="weight", iterations=2).collect()}
        m = {r["node"]: r["rank_scaled"]
             for r in pagerank(expanded, iterations=2).collect()}
        assert w == m

    def test_weighted_host_graph_chain(self, spark):
        docs = spark.createDataFrame(
            [("https://x.com/p", ["https://hub.com/a", "https://hub.com/b"]),
             ("https://y.com/p", ["https://hub.com/c"]),
             ("https://hub.com/p", ["https://x.com/", "https://y.com/"])],
            "url string, links array<string>",
        )
        ranks = {r["node"]: r["rank_scaled"]
                 for r in pagerank(host_graph(docs), weight="weight",
                                   iterations=6).collect()}
        assert max(ranks, key=ranks.get) == "hub.com"

    def test_nonpositive_weights_dropped(self, spark):
        e = spark.createDataFrame(
            [("A", "B", 2), ("A", "C", 0), ("B", "A", 1)],
            "src string, dst string, weight long",
        )
        ranks = {r["node"]: r["rank_scaled"]
                 for r in pagerank(e, weight="weight", iterations=2).collect()}
        # weight 0 = zero parallel edges = the edge does not exist, so
        # C (reachable only through it) is not in the graph at all
        assert set(ranks) == {"A", "B"}

    def test_seeded_all_nodes_equals_unseeded(self, spark):
        e = spark.createDataFrame(EDGES, "src string, dst string")
        all_nodes = sorted({x for ed in EDGES for x in ed})
        seeded = {r["node"]: r["rank_scaled"]
                  for r in pagerank(e, iterations=2, seeds=all_nodes).collect()}
        plain = {r["node"]: r["rank_scaled"]
                 for r in pagerank(e, iterations=2).collect()}
        assert seeded == plain

    def test_seeded_unreachable_node_is_exactly_zero(self, spark):
        # component {A,B} seeded; component {X,Y} unreachable from it —
        # with teleport restricted to seeds, X and Y hold rank 0 exactly
        e = spark.createDataFrame(
            [("A", "B"), ("B", "A"), ("X", "Y"), ("Y", "X")],
            "src string, dst string",
        )
        ranks = {r["node"]: r["rank_scaled"]
                 for r in pagerank(e, iterations=4, seeds=["A"]).collect()}
        assert ranks["X"] == 0 and ranks["Y"] == 0
        assert ranks["A"] > 0 and ranks["B"] > 0

    def test_seeds_dataframe_input_and_bad_seeds(self, spark):
        e = spark.createDataFrame(EDGES, "src string, dst string")
        seed_df = spark.createDataFrame([("A",), ("C",)], "host string")
        ranks = {r["node"]: r["rank_scaled"]
                 for r in pagerank(e, iterations=3, seeds=seed_df).collect()}
        assert len(ranks) == 6 and ranks["A"] > ranks["D"]
        with pytest.raises(ValueError, match="seeds match no node"):
            pagerank(e, iterations=2, seeds=["ZZZ"])

    def test_host_graph_domain_granularity(self, spark):
        # www.a.com and blog.a.com roll up to one eTLD+1 node
        docs = spark.createDataFrame(
            [("https://www.a.com/p", ["https://b.co.uk/x"]),
             ("https://blog.a.com/q", ["https://b.co.uk/y", "https://c.com/"]),
             ("https://b.co.uk/p", ["https://www.a.com/"])],
            "url string, links array<string>",
        )
        got = {(r["src"], r["dst"]): r["weight"]
               for r in host_graph(docs, by="domain").collect()}
        assert got == {("a.com", "b.co.uk"): 2, ("a.com", "c.com"): 1,
                       ("b.co.uk", "a.com"): 1}
        with pytest.raises(ValueError, match="by must be"):
            host_graph(docs, by="etld")

    def test_rank_weights_bridge(self, spark):
        from harness_aws_etl_pipeline_spark.operators.linkgraph import rank_weights

        e = spark.createDataFrame(EDGES, "src string, dst string")
        ranks = pagerank(e, iterations=3)
        w = rank_weights(ranks, top_n=3, weight_scale=1000)
        assert len(w) == 3
        assert max(w.values()) == 1000          # best node pinned to scale
        assert all(v >= 1 for v in w.values())  # never rounds to excluded
        # top node by rank is the top-weighted node
        top = max(w, key=w.get)
        best = ranks.orderBy(F.desc("rank_scaled")).first()["node"]
        assert top == best
        assert rank_weights(pagerank(
            spark.createDataFrame([], "src string, dst string"), iterations=1
        )) == {}


def _hits_float_ref(edges: list[tuple[str, str]], iterations: int):
    """Independent double-precision HITS with L1 renormalization —
    the floor-loss-free twin of the fixed-point operator."""
    nodes = sorted({x for e in edges for x in e})
    hub = {v: 1.0 / len(nodes) for v in nodes}
    auth = {v: 0.0 for v in nodes}
    for _ in range(iterations):
        auth = {v: 0.0 for v in nodes}
        for s, t in edges:
            auth[t] += hub[s]
        tot = sum(auth.values())
        if tot:
            auth = {v: a / tot for v, a in auth.items()}
        hub = {v: 0.0 for v in nodes}
        for s, t in edges:
            hub[s] += auth[t]
        tot = sum(hub.values())
        if tot:
            hub = {v: h / tot for v, h in hub.items()}
    return hub, auth


class TestHits:
    @deep
    def test_matches_float_reference(self, spark):
        from harness_aws_etl_pipeline_spark.operators.linkgraph import hits

        e = spark.createDataFrame(EDGES, "src string, dst string")
        # checkpoint_every=2 exercises the mid-run lineage cut on the
        # value-pinning run (one Spark run, two pins)
        got = {r["node"]: (r["hub"], r["auth"])
               for r in hits(e, iterations=3, checkpoint_every=2).collect()}
        hub_ref, auth_ref = _hits_float_ref(EDGES, 3)
        assert set(got) == set(hub_ref)
        for v, (h, a) in got.items():
            assert h == pytest.approx(hub_ref[v], abs=1e-6)
            assert a == pytest.approx(auth_ref[v], abs=1e-6)

    def test_star_exact_values(self, spark):
        from harness_aws_etl_pipeline_spark.operators.linkgraph import hits

        # A -> {B, C, D}: A is the sole hub (exactly scale after one
        # normalization), leaves are equal authorities at scale // 3
        e = spark.createDataFrame(
            [("A", "B"), ("A", "C"), ("A", "D")], "src string, dst string"
        )
        scale = 10**9
        got = {r["node"]: (r["hub_scaled"], r["auth_scaled"])
               for r in hits(e, iterations=2, scale=scale).collect()}
        assert got["A"] == (scale, 0)
        for leaf in "BCD":
            assert got[leaf] == (0, scale // 3)

    @deep

    def test_deterministic_across_partitionings_and_lazy(self, spark):
        from harness_aws_etl_pipeline_spark.operators.linkgraph import hits

        e = spark.createDataFrame(EDGES, "src string, dst string")
        a = {r["node"]: (r["hub_scaled"], r["auth_scaled"])
             for r in hits(e.repartition(16), iterations=2).collect()}
        b = {r["node"]: (r["hub_scaled"], r["auth_scaled"])
             for r in hits(e.coalesce(1), iterations=2, lazy=True).collect()}
        assert a == b

    @deep
    def test_weighted_equals_multiset_expansion(self, spark):
        from harness_aws_etl_pipeline_spark.operators.linkgraph import hits

        w = spark.createDataFrame(
            [("A", "B", 2), ("A", "C", 1), ("B", "A", 3)],
            "src string, dst string, w int",
        )
        flat = spark.createDataFrame(
            [("A", "B")] * 2 + [("A", "C")] + [("B", "A")] * 3,
            "src string, dst string",
        )
        got_w = {r["node"]: (r["hub_scaled"], r["auth_scaled"])
                 for r in hits(w, weight="w", iterations=2).collect()}
        got_f = {r["node"]: (r["hub_scaled"], r["auth_scaled"])
                 for r in hits(flat, iterations=2).collect()}
        assert got_w == got_f

    def test_empty_and_guards(self, spark):
        from harness_aws_etl_pipeline_spark.operators.linkgraph import hits

        empty = spark.createDataFrame([], "src string, dst string")
        assert hits(empty, iterations=2).count() == 0
        e = spark.createDataFrame(EDGES, "src string, dst string")
        with pytest.raises(ValueError, match="iterations"):
            hits(e, iterations=0)
        with pytest.raises(ValueError, match="too small"):
            hits(e, scale=1000)
        with pytest.raises(ValueError, match="overflows int64"):
            hits(e, scale=10**10)  # max safe scale for total weight 8 is ~1.06e9

    def test_cache_hygiene(self, spark):
        from harness_aws_etl_pipeline_spark.operators.linkgraph import hits
        from harness_aws_etl_pipeline_spark.operators.memo import clear_all_memos

        clear_all_memos()
        e = spark.createDataFrame(EDGES, "src string, dst string")
        hits(e, iterations=1).collect()
        jvm_cm = spark._jsparkSession.sharedState().cacheManager()
        assert jvm_cm.isEmpty()
