"""Distributed PCA (operators/pca.py): planted low-rank structure,
numpy parity, whitening, invariances, invalid-vector tolerance."""

from __future__ import annotations

import numpy as np
import pytest

from harness_aws_etl_pipeline_spark.operators.pca import (
    explained_variance_ratio,
    pca_fit,
    pca_project,
)

DIM = 8


def _planted(n=400, seed=0):
    """Data living (mostly) in a known 2-plane of 8-dim space."""
    rng = np.random.RandomState(seed)
    u = np.array([0.6, 0.8, 0, 0, 0, 0, 0, 0])
    v = np.array([0.8, -0.6, 0, 0, 0, 0, 0, 0])
    a = rng.standard_normal(n) * 5.0
    b = rng.standard_normal(n) * 2.0
    noise = rng.standard_normal((n, DIM)) * 0.05
    pts = np.outer(a, u) + np.outer(b, v) + noise + 1.5  # offset mean
    return pts


@pytest.fixture(scope="module")
def planted_df(spark):
    pts = _planted()
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(pts)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestFit:
    def test_matches_numpy_pca(self, planted_df):
        model = pca_fit(planted_df, k=2, dim=DIM)
        pts = _planted()
        cov = np.cov(pts.T, bias=True)
        evals, evecs = np.linalg.eigh(cov)
        top = evecs[:, np.argsort(evals)[::-1][:2]].T
        got = np.asarray(model["components"])
        for i in range(2):
            ref = top[i]
            j = int(np.argmax(np.abs(ref)))
            if ref[j] < 0:
                ref = -ref
            assert np.allclose(got[i], ref, atol=1e-6)
        assert np.allclose(model["mean"], pts.mean(axis=0), atol=1e-9)

    def test_variance_concentrated_in_plane(self, planted_df):
        model = pca_fit(planted_df, k=4, dim=DIM)
        r = explained_variance_ratio(model)
        assert r[0] > r[1] > r[2]
        assert r[0] + r[1] > 0.99           # the planted 2-plane
        assert model["explained_variance"][2] < 0.01

    def test_components_orthonormal(self, planted_df):
        c = np.asarray(pca_fit(planted_df, k=4, dim=DIM)["components"])
        assert np.allclose(c @ c.T, np.eye(4), atol=1e-8)

    def test_partitioning_invariance_to_tolerance(self, planted_df):
        a = pca_fit(planted_df, k=2, dim=DIM)
        b = pca_fit(planted_df.repartition(13), k=2, dim=DIM)
        assert np.allclose(a["components"], b["components"], atol=1e-8)

    def test_k_validation_and_empty(self, spark, planted_df):
        with pytest.raises(ValueError, match="k must be"):
            pca_fit(planted_df, k=9, dim=DIM)
        empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
        with pytest.raises(ValueError, match="no valid vectors"):
            pca_fit(empty, k=2, dim=DIM)


class TestProject:
    def test_projection_matches_numpy(self, planted_df):
        model = pca_fit(planted_df, k=2, dim=DIM)
        out = {r.vec_id: r.pca for r in pca_project(planted_df, model).collect()}
        pts = _planted()
        ref = (pts - np.asarray(model["mean"])) @ np.asarray(model["components"]).T
        for i in range(len(pts)):
            assert np.allclose(out[i], ref[i], atol=1e-4)

    def test_whiten_unit_variance(self, planted_df):
        model = pca_fit(planted_df, k=2, dim=DIM)
        rows = pca_project(planted_df, model, whiten=True).collect()
        proj = np.array([r.pca for r in rows])
        assert np.allclose(proj.var(axis=0), 1.0, atol=0.05)

    def test_invalid_vectors_project_null(self, spark, planted_df):
        model = pca_fit(planted_df, k=2, dim=DIM)
        bad = spark.createDataFrame(
            [(1, None), (2, [1.0, 2.0]), (3, [float("nan")] * DIM),
             (4, [0.5] * DIM)],
            "vec_id long, embedding array<float>",
        )
        got = {r.vec_id: r.pca for r in pca_project(bad, model).collect()}
        assert got[1] is None and got[2] is None and got[3] is None
        assert got[4] is not None and len(got[4]) == 2

    def test_distances_preserved_in_plane(self, planted_df):
        # data is ~entirely in the 2-plane: pairwise distances survive
        model = pca_fit(planted_df, k=2, dim=DIM)
        rows = sorted(
            pca_project(planted_df, model).collect(), key=lambda r: r.vec_id
        )[:50]
        pts = _planted()[:50]
        proj = np.array([r.pca for r in rows])
        for i in range(0, 50, 7):
            for j in range(i + 1, 50, 11):
                d_full = np.linalg.norm(pts[i] - pts[j])
                d_proj = np.linalg.norm(proj[i] - proj[j])
                assert abs(d_full - d_proj) < 0.5


class TestModelPersistence:
    def test_save_load_roundtrip(self, planted_df, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.pca import (
            load_pca,
            save_pca,
        )

        model = pca_fit(planted_df, k=2, dim=DIM)
        p = str(tmp_path / "pca.json")
        save_pca(model, p)
        loaded = load_pca(p)
        assert loaded["components"] == model["components"]
        a = pca_project(planted_df, model).select("vec_id", "pca")
        b = pca_project(planted_df, loaded).select("vec_id", "pca")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_load_rejects_foreign(self, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.pca import load_pca

        p = tmp_path / "x.json"
        p.write_text('{"mean": []}')
        with pytest.raises(ValueError, match="pca model"):
            load_pca(str(p))


class TestAnnInPcaSpace:
    def test_similarity_values_survive_projection(self, spark, planted_df):
        """The stated use-case: cosine similarities computed in 2-dim
        PCA space match the CENTERED 8-dim cosines.  (Centering
        matters: cosine is not translation-invariant and PCA subtracts
        the mean.)  Exact top-k SET recall is deliberately not
        asserted: 2-planar data has hundreds of angular near-ties, so
        tie reordering under 1e-3-scale noise flips set membership
        without any similarity error — the VALUE parity below is the
        well-conditioned form of the claim."""
        import numpy as _np
        from pyspark.sql import functions as F

        from harness_aws_etl_pipeline_spark.operators.similarity import (
            brute_force_topk,
        )

        model = pca_fit(planted_df, k=2, dim=DIM)
        proj = pca_project(planted_df, model, out_col="p").select(
            "vec_id", F.col("p").alias("embedding")
        )
        queries_p = proj.limit(8)
        proj_top = brute_force_topk(proj, queries_p, k=5).collect()
        assert len(proj_top) == 40

        pts = _planted()
        centered = pts - pts.mean(axis=0)
        unit = centered / _np.linalg.norm(centered, axis=1)[:, None]
        for r in proj_top:
            raw_cos = float(unit[r.query_id] @ unit[r.neighbor_id])
            # the residual IS PCA's approximation error: the dropped
            # out-of-plane noise deflates raw cosines by up to ~1e-2
            # for small in-plane vectors
            assert abs(r.cosine - raw_cos) < 0.02, (
                r.query_id, r.neighbor_id, r.cosine, raw_cos,
            )
            assert r.cosine > 0.99  # planar data: dense angular ties

    def test_topk_set_recall_on_separated_clusters(self, spark):
        """Top-k SET recall pinned on a fixture where it is
        well-conditioned: 4 clusters of 6 points around well-separated
        directions in a 3-plane of 8-dim space.  Intra-cluster cosines
        are ~0.999, inter-cluster at most ~0.6, so each query's top-5
        (its 5 cluster-mates; the operator excludes self) is
        unambiguous — PCA(k=3) projection must reproduce every top-5
        set exactly (recall 1.0), with no tie caveats."""
        import numpy as _np
        from pyspark.sql import functions as F

        from harness_aws_etl_pipeline_spark.operators.similarity import (
            brute_force_topk,
        )

        rng = _np.random.RandomState(7)
        basis = _np.zeros((3, DIM))
        basis[0, 0] = basis[1, 1] = basis[2, 2] = 1.0
        dirs3 = _np.array(
            [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [1.0, 1.0, 1.0] / _np.sqrt(3)]
        )
        pts = []
        for c in range(4):
            for _ in range(6):
                p3 = dirs3[c] * rng.uniform(4.0, 6.0) + rng.standard_normal(3) * 0.05
                pts.append(p3 @ basis + rng.standard_normal(DIM) * 0.01 + 2.0)
        pts = _np.asarray(pts)

        df = spark.createDataFrame(
            [(i, [float(x) for x in r]) for i, r in enumerate(pts)],
            "vec_id long, embedding array<float>",
        )
        model = pca_fit(df, k=3, dim=DIM)
        assert sum(explained_variance_ratio(model)[:3]) > 0.999
        proj = pca_project(df, model, out_col="p").select(
            "vec_id", F.col("p").alias("embedding")
        )
        got = brute_force_topk(proj, proj, k=5).collect()
        got_sets: dict[int, set[int]] = {}
        for r in got:
            got_sets.setdefault(r.query_id, set()).add(r.neighbor_id)

        centered = pts - pts.mean(axis=0)
        unit = centered / _np.linalg.norm(centered, axis=1)[:, None]
        sims = unit @ unit.T
        _np.fill_diagonal(sims, -2.0)  # operator excludes self
        hits = total = 0
        for q in range(len(pts)):
            ref = set(_np.argsort(-sims[q])[:5].tolist())
            assert ref == {q // 6 * 6 + j for j in range(6)} - {q}  # sanity
            hits += len(got_sets[q] & ref)
            total += 5
        assert hits == total  # exact set recall 1.0, no ties involved
