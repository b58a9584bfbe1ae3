"""IncrementalAnnIndex (operators/incremental.py): frozen-quantizer
batch ingestion must be bit-identical to build-time encoding, replay
must short-circuit, recalibrate must persist the probe default, and
search must find incrementally-added vectors."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.incremental import (
    IncrementalAnnIndex,
)

DIM = 16


def _clustered(n_clusters=4, per=12, seed=7):
    rng = np.random.RandomState(seed)
    pts = []
    for c in range(n_clusters):
        center = np.zeros(DIM)
        center[c * 2] = 5.0
        center[c * 2 + 1] = 3.0
        for _ in range(per):
            pts.append(center + rng.standard_normal(DIM) * 0.05)
    return np.asarray(pts)


@pytest.fixture(scope="module")
def pts():
    return _clustered()


def _frame(spark, pts, ids):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in ids],
        "vec_id long, embedding array<float>",
    )


class TestIncrementalAnnIndex:
    def test_add_batch_matches_build_time_encoding(
        self, spark, tmp_path, pts
    ):
        """Encoding is a pure projection given the frozen model: an
        index built on the seed then grown by a batch must equal, row
        for row, an index where the SAME frozen model encoded
        everything at once."""
        seed_ids = [i for i in range(len(pts)) if i % 3 != 0]
        batch_ids = [i for i in range(len(pts)) if i % 3 == 0]
        ann = IncrementalAnnIndex(spark, str(tmp_path / "ann"))
        rep = ann.build(
            _frame(spark, pts, seed_ids), nlist=4, m=4, k=8, dim=DIM,
            txn=("t", 0),
        )
        assert rep["skipped"] is False and rep["indexed"] == len(seed_ids)
        rep = ann.add_batch(_frame(spark, pts, batch_ids), txn=("t", 1))
        assert rep["indexed"] == len(batch_ids) and rep["rejected"] == 0

        # one-shot twin: same frozen quantizers, everything encoded
        # through a second index's add_batch on the full set
        twin = IncrementalAnnIndex(spark, str(tmp_path / "twin"))
        twin.build(
            _frame(spark, pts, seed_ids), nlist=4, m=4, k=8, dim=DIM
        )
        # same seed -> same deterministic training -> same model
        assert twin.model() == ann.model()
        twin.add_batch(_frame(spark, pts, range(len(pts))).where(
            F.col("vec_id").isin([int(i) for i in batch_ids])
        ))
        got = {
            r.vec_id: (r.centroid_id, tuple(r.pq_code))
            for r in ann.index().collect()
        }
        want = {
            r.vec_id: (r.centroid_id, tuple(r.pq_code))
            for r in twin.index().collect()
        }
        assert got == want

    def test_replay_short_circuits(self, spark, tmp_path, pts):
        ann = IncrementalAnnIndex(spark, str(tmp_path / "ann"))
        ann.build(
            _frame(spark, pts, range(24)), nlist=4, m=4, k=8, dim=DIM,
            txn=("t", 0),
        )
        ann.add_batch(_frame(spark, pts, range(24, 36)), txn=("t", 1))
        rep = ann.add_batch(_frame(spark, pts, range(36, 48)), txn=("t", 1))
        assert rep["skipped"] is True
        assert ann.stats()["vectors"] == 36

    def test_search_finds_incremental_vectors_and_recalibrate(
        self, spark, tmp_path, pts
    ):
        seed_ids = list(range(36))
        batch_ids = list(range(36, 48))  # the whole 4th cluster
        ann = IncrementalAnnIndex(spark, str(tmp_path / "ann"))
        ann.build(
            _frame(spark, pts, seed_ids), nlist=4, m=4, k=8, dim=DIM
        )
        ann.add_batch(_frame(spark, pts, batch_ids))
        corpus = _frame(spark, pts, range(len(pts)))
        cal = ann.recalibrate(
            _frame(spark, pts, [0, 12, 24, 36]), corpus,
            target_recall=0.9, topk=8,
        )
        assert 1 <= cal["nprobe"] <= 4
        assert ann.settings()["nprobe"] == cal["nprobe"]
        # default search picks up the calibrated probe and must find
        # the incrementally-added cluster for one of its own members
        got = ann.search(
            _frame(spark, pts, [36]), topk=8, rerank_with=corpus,
            shortlist=24,
        )
        nbrs = {r.neighbor_id for r in got.collect()}
        assert nbrs <= set(batch_ids)
        assert len(nbrs) == 8

    def test_stats_shape(self, spark, tmp_path, pts):
        ann = IncrementalAnnIndex(spark, str(tmp_path / "ann"))
        ann.build(_frame(spark, pts, range(48)), nlist=4, m=4, k=8, dim=DIM)
        st = ann.stats()
        assert st["vectors"] == 48
        assert st["lists"] <= 4
        assert st["max_list"] >= 12
        assert st["imbalance"] >= 1.0
