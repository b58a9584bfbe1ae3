"""KMV distinct sketches (operators/kmv.py): canonical-set parity
with hashlib, exactness below k, estimator accuracy, the
merge-equals-sketch-of-union property, order independence, edges."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.kmv import (
    kmv_distinct_estimate,
    kmv_jaccard,
    kmv_merge,
    kmv_sketch,
)


def _md5s(values):
    return sorted(hashlib.md5(str(v).encode()).hexdigest() for v in set(values))


class TestSketch:
    def test_k_smallest_distinct_matches_hashlib(self, spark):
        vals = [i % 40 for i in range(400)]
        df = spark.createDataFrame([(v,) for v in vals], "v int").repartition(8)
        got = [r["h"] for r in kmv_sketch(df, "v", k=16).collect()]
        assert got == _md5s(vals)[:16]

    def test_below_k_is_full_distinct_set(self, spark):
        df = spark.createDataFrame([("a",), ("b",), ("a",), (None,)], "v string")
        got = [r["h"] for r in kmv_sketch(df, "v", k=64).collect()]
        assert got == _md5s(["a", "b"])

    def test_order_and_partitioning_independent(self, spark):
        vals = [(f"doc{i}",) for i in range(500)]
        df = spark.createDataFrame(vals, "v string")
        a = [r["h"] for r in kmv_sketch(df.repartition(16), "v", k=32).collect()]
        b = [r["h"] for r in
             kmv_sketch(df.orderBy(F.desc("v")).coalesce(1), "v", k=32).collect()]
        assert a == b

    def test_guard(self, spark):
        df = spark.createDataFrame([("a",)], "v string")
        with pytest.raises(ValueError, match="k must be"):
            kmv_sketch(df, "v", k=1)


class TestEstimates:
    def test_exact_below_k(self, spark):
        df = spark.createDataFrame([(i % 37,) for i in range(200)], "v int")
        row = kmv_distinct_estimate(kmv_sketch(df, "v", k=100), k=100).first()
        assert row["exact"] is True
        assert row["sketch_rows"] == 37 and row["distinct_est"] == 37.0

    def test_accuracy_at_scale(self, spark):
        n = 50_000
        df = spark.createDataFrame([(i,) for i in range(n)], "v long").repartition(8)
        row = kmv_distinct_estimate(kmv_sketch(df, "v", k=512), k=512).first()
        assert row["exact"] is False
        assert abs(row["distinct_est"] - n) / n < 0.15

    def test_jaccard_known_overlap(self, spark):
        # |A|=8000, |B|=8000, overlap 4000 -> J = 4000/12000 = 1/3
        a = spark.createDataFrame([(i,) for i in range(8000)], "v long")
        b = spark.createDataFrame([(i,) for i in range(4000, 12000)], "v long")
        row = kmv_jaccard(
            kmv_sketch(a, "v", k=512), kmv_sketch(b, "v", k=512), k=512
        ).first()
        assert row["union_basis"] == 512
        assert abs(row["jaccard_est"] - 1 / 3) < 0.08

    def test_jaccard_exact_when_small(self, spark):
        a = spark.createDataFrame([("x",), ("y",), ("z",)], "v string")
        b = spark.createDataFrame([("y",), ("z",), ("w",)], "v string")
        row = kmv_jaccard(
            kmv_sketch(a, "v", k=64), kmv_sketch(b, "v", k=64), k=64
        ).first()
        assert row["union_basis"] == 4 and row["inter_cnt"] == 2
        assert row["jaccard_est"] == 0.5


class TestMerge:
    def test_merge_equals_sketch_of_union(self, spark):
        a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "v string")
        b = spark.createDataFrame(
            [(f"a{i}",) for i in range(150, 300)] + [(f"b{i}",) for i in range(200)],
            "v string",
        )
        merged = [
            r["h"]
            for r in kmv_merge(
                kmv_sketch(a, "v", k=32), kmv_sketch(b, "v", k=32), k=32
            ).collect()
        ]
        direct = [r["h"] for r in kmv_sketch(a.union(b), "v", k=32).collect()]
        assert merged == direct

    def test_empty_inputs(self, spark):
        e = spark.createDataFrame([], "v string")
        assert kmv_sketch(e, "v", k=8).count() == 0
        row = kmv_distinct_estimate(kmv_sketch(e, "v", k=8), k=8).first()
        assert row["sketch_rows"] == 0 and row["distinct_est"] == 0.0
        d = spark.createDataFrame([("q",)], "v string")
        row = kmv_jaccard(kmv_sketch(e, "v", k=8), kmv_sketch(d, "v", k=8), k=8).first()
        assert row["union_basis"] == 1 and row["inter_cnt"] == 0


class TestOverlapCli:
    def test_overlap_command(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main

        pa = str(tmp_path / "a")
        pb = str(tmp_path / "b")
        spark.createDataFrame([(i,) for i in range(100)], "id long").write.parquet(pa)
        spark.createDataFrame(
            [(i,) for i in range(50, 150)], "key long"
        ).write.parquet(pb)
        rc = main(["overlap", "--a", pa, "--b", pb,
                   "--col", "id", "--col-b", "key", "--k", "512"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["status"] == "success"
        # both sides below k -> everything exact: J = 50/150
        assert res["union_basis"] == 150 and res["inter_cnt"] == 50
        assert res["jaccard_est"] == round(50 / 150, 4)
        assert res["distinct_a"] == {"est": 100.0, "exact": True}
        assert res["distinct_b"] == {"est": 100.0, "exact": True}
