"""Quality classifier (operators/classifier.py): separable corpus
convergence, loss descent, scoring contract, gate-label integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.classifier import (
    score_quality,
    train_quality_classifier,
)

from tests.tiers import deep


def _doc(kind: str, i: int) -> str:
    if kind == "good":
        core = "informative prose with varied vocabulary and careful structure"
    else:
        core = "spam click buy cheap deal offer now win free prize"
    return f"{core} filler{i % 13} extra{i % 7} token{i % 5}"


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(i, _doc("good", i), 1) for i in range(120)] + [
        (1000 + i, _doc("spam", i), 0) for i in range(120)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


@pytest.fixture(scope="module")
def model(labeled):
    return train_quality_classifier(labeled, "label", dim=512, iters=30)


class TestTraining:
    def test_loss_descends(self, model):
        assert model["losses"][0] > model["losses"][-1]
        assert model["n"] == 240

    def test_separable_corpus_classified(self, labeled, model):
        scored = score_quality(labeled, model)
        agg = scored.groupBy("label").agg(F.avg("quality_prob").alias("p")).collect()
        means = {r.label: r.p for r in agg}
        assert means[1] > 0.8 and means[0] < 0.2
        # hard accuracy at the 0.5 cut
        acc = scored.filter(
            ((F.col("quality_prob") >= 0.5) & (F.col("label") == 1))
            | ((F.col("quality_prob") < 0.5) & (F.col("label") == 0))
        ).count()
        assert acc >= 230

    @deep

    def test_partitioning_tolerance(self, labeled, model):
        b = train_quality_classifier(
            labeled.repartition(11), "label", dim=512, iters=30
        )
        import numpy as np

        assert np.allclose(model["weights"], b["weights"], atol=1e-6)

    def test_max_rows_sampling(self, labeled):
        m = train_quality_classifier(
            labeled, "label", dim=256, iters=5, max_rows=50
        )
        assert m["n"] == 50

    def test_empty_raises(self, spark):
        empty = spark.createDataFrame([], "doc_id long, text string, label int")
        with pytest.raises(ValueError, match="no training rows"):
            train_quality_classifier(empty, "label", dim=64, iters=1)


class TestScoring:
    def test_probability_bounds_and_null(self, spark, model):
        df = spark.createDataFrame(
            [(1, _doc("good", 0)), (2, _doc("spam", 0)), (3, None)],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.quality_prob for r in score_quality(df, model).collect()}
        assert 0.0 <= got[1] <= 1.0 and 0.0 <= got[2] <= 1.0
        assert got[3] is None
        assert got[1] > got[2]

    @deep

    def test_gate_label_bootstrap(self, spark):
        # the self-supervised loop: gopher gate labels seed the model,
        # which then scores unseen docs in the same order as the gate
        from harness_aws_etl_pipeline_spark.operators.filters import (
            apply_quality_filters,
        )

        good = (
            "the quick brown fox jumps over that lazy dog and keeps running "
            "with steady pace across the field of green grass to reach home "
            "before dark while birds have sung overhead and the evening light "
            "settles on the hills in amber bands that stretch to the west"
        )
        rows = [(i, good + f" tail{i % 9}") for i in range(40)] + [
            (100 + i, "buy now " * 15 + f"x{i}") for i in range(40)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        labeled = apply_quality_filters(df, "gopher").withColumn(
            "label", F.col("_qf_pass").cast("int")
        )
        model = train_quality_classifier(labeled, "label", dim=512, iters=25)
        scored = score_quality(df, model)
        means = {
            r.g: r.p
            for r in scored.withColumn("g", F.col("doc_id") < 100)
            .groupBy("g")
            .agg(F.avg("quality_prob").alias("p"))
            .collect()
        }
        assert means[True] > means[False]


class TestModelPersistence:
    def test_save_load_roundtrip_and_scores_agree(self, labeled, model, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.classifier import (
            load_model,
            save_model,
        )

        p = str(tmp_path / "m" / "quality.json")
        save_model(model, p)
        loaded = load_model(p)
        assert loaded["weights"] == model["weights"]
        assert loaded["bias"] == model["bias"]
        a = score_quality(labeled, model).select("doc_id", "quality_prob")
        b = score_quality(labeled, loaded).select("doc_id", "quality_prob")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_load_rejects_foreign(self, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.classifier import load_model

        p = tmp_path / "x.json"
        p.write_text('{"weights": []}')
        import pytest as _pytest

        with _pytest.raises(ValueError, match="quality-logreg"):
            load_model(str(p))
