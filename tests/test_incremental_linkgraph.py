"""IncrementalLinkGraph (operators/incremental.py): edge-fold
identity vs one-shot pagerank/hits on the concatenated batches,
warm-start convergence savings, replay short-circuit, and the
maintain() fold rewrite. Also pins the deep-iteration lineage cut:
tol runs used to OOM the driver past ~26 iterations from 4x/iteration
plan-string growth."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.tiers import deep

from harness_aws_etl_pipeline_spark.operators.incremental import (
    IncrementalLinkGraph,
)
from harness_aws_etl_pipeline_spark.operators.linkgraph import (
    hits,
    pagerank,
)

SCHEMA = "src string, dst string"

# a dense-ish 6-node graph split into three batches; (a,b) repeats
# across batches so the fold must SUM weights, and batch 3 introduces
# node f so the warm start must renormalize over a grown node set
B1 = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
B2 = [("a", "b"), ("c", "d"), ("b", "d"), ("d", "b"), ("e", "a")]
B3 = [("a", "b"), ("b", "e"), ("e", "c"), ("f", "a"), ("c", "f")]


def _graph(spark, tmp_path):
    return IncrementalLinkGraph(spark, str(tmp_path / "lg_state"))


def _concat(spark, *batches):
    return spark.createDataFrame(
        [e for b in batches for e in b], SCHEMA
    )


class TestEdgeFold:
    def test_fold_matches_concatenation(self, spark, tmp_path):
        g = _graph(spark, tmp_path)
        for i, b in enumerate((B1, B2, B3)):
            rep = g.add_edges(spark.createDataFrame(b, SCHEMA), txn=("t", i))
            assert rep["skipped"] is False
        got = {(r.src, r.dst): r.w for r in g.edges().collect()}
        want = {
            (r.src, r.dst): r.w
            for r in _concat(spark, B1, B2, B3)
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).cast("long").alias("w"))
            .collect()
        }
        assert got == want
        assert got[("a", "b")] == 3  # repeated across all batches

    def test_replay_short_circuits(self, spark, tmp_path):
        g = _graph(spark, tmp_path)
        g.add_edges(spark.createDataFrame(B1, SCHEMA), txn=("t", 0))
        rep = g.add_edges(spark.createDataFrame(B2, SCHEMA), txn=("t", 0))
        assert rep["skipped"] is True
        assert g.edges().count() == len({(s, d) for s, d in B1})

    def test_cold_rank_on_fold_equals_concatenated_unit_edges(
        self, spark, tmp_path
    ):
        """The weighted-edge identity, end to end: pagerank on the
        FOLDED state is bit-identical to pagerank on the raw
        concatenated multiset."""
        g = _graph(spark, tmp_path)
        for i, b in enumerate((B1, B2, B3)):
            g.add_edges(spark.createDataFrame(b, SCHEMA), txn=("t", i))
        folded = {
            r.node: r.rank_scaled
            for r in g.pagerank(
                iterations=6, tol=None, warm_start=False
            ).collect()
        }
        oneshot = {
            r.node: r.rank_scaled
            for r in pagerank(
                _concat(spark, B1, B2, B3), iterations=6
            ).collect()
        }
        assert folded == oneshot


class TestWarmStart:
    @deep
    def test_pagerank_warm_start_converges_in_fewer_iterations(
        self, spark, tmp_path
    ):
        g = _graph(spark, tmp_path)
        g.add_edges(spark.createDataFrame(B1 + B2, SCHEMA), txn=("t", 0))
        cold = g.pagerank(iterations=40, tol=1e-5)  # stores the vector
        cold_iters = cold._pr_iterations
        # a SMALL incremental delta (one new edge between existing
        # nodes — the daily-crawl steady state); a large perturbation
        # would erase the warm start's head start by construction
        g.add_edges(
            spark.createDataFrame([("d", "c")], SCHEMA), txn=("t", 1)
        )
        warm = g.pagerank(iterations=40, tol=1e-5, warm_start=True)
        ref = pagerank(
            _concat(spark, B1, B2, [("d", "c")]), iterations=40, tol=1e-5
        )
        assert warm._pr_iterations < ref._pr_iterations
        assert cold_iters > 1  # the fixture isn't trivially converged
        w = {r.node: r.rank_scaled for r in warm.collect()}
        c = {r.node: r.rank_scaled for r in ref.collect()}
        scale = 10**12
        # both stopped at delta < tol*scale of the SAME fixed point
        assert sum(abs(w[k] - c[k]) for k in c) < 3 * 1e-5 * scale

    @deep
    def test_hits_warm_start(self, spark, tmp_path):
        g = _graph(spark, tmp_path)
        g.add_edges(spark.createDataFrame(B1 + B2, SCHEMA), txn=("t", 0))
        g.hits(iterations=30, tol=1e-5)
        g.add_edges(spark.createDataFrame(B3, SCHEMA), txn=("t", 1))
        warm = g.hits(iterations=30, tol=1e-5, warm_start=True)
        ref = hits(_concat(spark, B1, B2, B3), iterations=30, tol=1e-5)
        assert warm._hits_iterations <= ref._hits_iterations
        w = {r.node: (r.hub_scaled, r.auth_scaled) for r in warm.collect()}
        c = {r.node: (r.hub_scaled, r.auth_scaled) for r in ref.collect()}
        assert set(w) == set(c)
        scale = ref.select(
            (F.sum("hub_scaled")).alias("s")
        ).first()["s"]  # ~scale by L1 normalization
        l1 = sum(
            abs(w[k][0] - c[k][0]) + abs(w[k][1] - c[k][1]) for k in c
        )
        assert l1 < 3 * 1e-5 * max(scale, 1) + 10

    def test_warm_start_handles_new_nodes(self, spark, tmp_path):
        g = _graph(spark, tmp_path)
        g.add_edges(spark.createDataFrame(B1, SCHEMA), txn=("t", 0))
        g.pagerank(iterations=4, tol=None)
        # B3 introduces node f unseen by the stored vector
        g.add_edges(spark.createDataFrame(B3, SCHEMA), txn=("t", 1))
        warm = g.pagerank(iterations=6, tol=None)
        nodes = {r.node for r in warm.collect()}
        assert "f" in nodes
        assert warm.where(F.col("rank_scaled") <= 0).count() == 0


class TestMaintain:
    def test_maintain_rewrites_fold_without_changing_results(
        self, spark, tmp_path
    ):
        g = _graph(spark, tmp_path)
        for i, b in enumerate((B1, B2, B3)):
            g.add_edges(spark.createDataFrame(b, SCHEMA), txn=("t", i))
        before = {(r.src, r.dst): r.w for r in g.edges().collect()}
        rep = g.maintain()
        assert rep["edges_folded"] == len(before)
        after = {(r.src, r.dst): r.w for r in g.edges().collect()}
        assert after == before
        # the physical table is now ONE fold, not three deltas
        assert g.edges_table.count_rows() == len(before)


class TestDeepIterationLineageCut:
    @deep
    def test_tol_run_survives_many_iterations(self, spark):
        """Pre-fix, tol runs OOM'd the driver past ~26 iterations
        (plan strings grew 4x per un-cut generation and Spark's SQL
        listener retains one per job). The per-iteration lineage cut
        keeps this bounded — 35 capped iterations must just work."""
        edges = spark.createDataFrame(
            [
                ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
                ("d", "a"), ("c", "d"), ("b", "d"),
            ],
            SCHEMA,
        )
        r = pagerank(edges, iterations=35, tol=1e-12)
        assert r._pr_iterations == 35  # tol unreachable: ran the cap
        assert r.count() == 4


class TestLinkGraphStreaming:
    def test_foreach_batch_fold_end_to_end(self, spark, tmp_path):
        """readStream → foreachBatch(add_edges) with AvailableNow: the
        graph folds a real micro-batch stream exactly-once — re-running
        the same stream over a FRESH checkpoint (same batch ids) hits
        the txn-ledger short-circuit instead of double-counting
        weights, so pagerank on the state is unchanged."""
        g = _graph(spark, tmp_path)
        src = tmp_path / "src"
        src.mkdir()
        spark.createDataFrame(B1, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / "b0"))

        def fold(batch_df, batch_id):
            g.add_edges(batch_df, txn=("stream-lg", batch_id))

        def run(ckpt):
            q = (
                spark.readStream.schema(SCHEMA)
                .parquet(str(src / "b0"))
                .writeStream.foreachBatch(fold)
                .option("checkpointLocation", str(tmp_path / ckpt))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run("ckpt1")
        before = {(r.src, r.dst): r.w for r in g.edges().collect()}
        v = g.edges_table.current_version()
        run("ckpt2")  # same data, fresh checkpoint → same batch id 0
        after = {(r.src, r.dst): r.w for r in g.edges().collect()}
        assert after == before
        assert g.edges_table.current_version() == v
        ranks = g.pagerank(iterations=4, tol=None)
        assert ranks.count() == len({n for e in B1 for n in e})
