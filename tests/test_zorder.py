"""Z-order clustering (operators/zorder.py): known-value interleave,
scaling edge cases, cross-partitioning determinism of codes, and the
actual claim — z-ordered layout bounds BOTH dimensions' per-partition
ranges where a single-column sort leaves one dimension unpruned."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.zorder import (
    layout_stats,
    morton_code,
    morton_interleave,
    zorder_by,
)


class TestInterleave:
    def test_known_values(self, spark):
        # x=5 (101), y=3 (011), bits=3: positions b*2+d ->
        # code = y2 x2 y1 x1 y0 x0 = 0 1 1 0 1 1 = 27
        df = spark.createDataFrame([(5, 3)], "x long, y long")
        got = df.select(
            morton_interleave([F.col("x"), F.col("y")], 3).alias("mz")
        ).first()["mz"]
        assert got == 27
        # identity for one dimension
        got1 = df.select(
            morton_interleave([F.col("x")], 3).alias("mz")
        ).first()["mz"]
        assert got1 == 5

    def test_locality_order(self, spark):
        # the curve visits the 2x2 sub-squares of a 4x4 grid in
        # quadrant blocks: all codes of the low-left quadrant are
        # below all codes of the top-right quadrant
        rows = [(x, y) for x in range(4) for y in range(4)]
        df = spark.createDataFrame(rows, "x long, y long")
        codes = {
            (r["x"], r["y"]): r["mz"]
            for r in df.select(
                "x", "y", morton_interleave([F.col("x"), F.col("y")], 2).alias("mz")
            ).collect()
        }
        low_left = max(codes[(x, y)] for x in (0, 1) for y in (0, 1))
        top_right = min(codes[(x, y)] for x in (2, 3) for y in (2, 3))
        assert low_left < top_right
        assert sorted(codes.values()) == list(range(16))  # bijective on the grid

    def test_guards(self, spark):
        with pytest.raises(ValueError, match="code bits"):
            morton_interleave([F.col("x")] * 4, 16)
        with pytest.raises(ValueError, match="at least one"):
            morton_interleave([], 4)


class TestMortonCode:
    def test_scaling_hits_full_grid_and_is_deterministic(self, spark):
        rows = [(i, 1000 - i) for i in range(0, 1001, 10)]
        df = spark.createDataFrame(rows, "a long, b long")
        coded = morton_code(df, ["a", "b"], bits=4)
        by_a = {r["a"]: r["_morton"] for r in coded.collect()}
        assert by_a[0] == sum(1 << (2 * b + 1) for b in range(4))  # a=min,b=max
        assert by_a[1000] == sum(1 << (2 * b) for b in range(4))   # a=max,b=min
        again = {
            r["a"]: r["_morton"]
            for r in morton_code(df.repartition(8), ["a", "b"], bits=4).collect()
        }
        assert by_a == again

    def test_null_and_constant_columns(self, spark):
        df = spark.createDataFrame(
            [(None, 7), (5, 7), (9, 7)], "a long, c long"
        )
        got = {r["a"]: r["_morton"] for r in morton_code(df, ["a", "c"], 3).collect()}
        # constant column contributes cell 0 everywhere; NULL takes cell 0
        assert got[None] == 0
        assert got[5] == 0
        assert got[9] == sum(1 << (2 * b) for b in range(3))

    def test_empty(self, spark):
        df = spark.createDataFrame([], "a long, b long")
        assert morton_code(df, ["a", "b"]).count() == 0


class TestZorderLayout:
    def test_beats_single_column_sort_on_neglected_dim(self, spark):
        # 48x48 uniform grid into 16 partitions: a plain sort by x
        # leaves every partition spanning the FULL y range; the
        # z-order layout bounds both
        rows = [(x, y) for x in range(48) for y in range(48)]
        df = spark.createDataFrame(rows, "x long, y long")
        z = zorder_by(df, ["x", "y"], bits=6, partitions=16)
        assert z.count() == 48 * 48 and z.columns == ["x", "y"]
        zstats = layout_stats(z, ["x", "y"]).collect()
        zspan_y = sum(r["y_max"] - r["y_min"] for r in zstats) / len(zstats)
        zspan_x = sum(r["x_max"] - r["x_min"] for r in zstats) / len(zstats)
        linear = df.repartitionByRange(16, "x").sortWithinPartitions("x")
        lstats = layout_stats(linear, ["x", "y"]).collect()
        lspan_y = sum(r["y_max"] - r["y_min"] for r in lstats) / len(lstats)
        assert lspan_y == 47  # the neglected dimension: zero pruning power
        assert zspan_y <= 24 and zspan_x <= 24  # bounded boxes in BOTH dims

    def test_rows_unchanged(self, spark):
        rows = [(i % 13, (i * 7) % 11, f"v{i}") for i in range(200)]
        df = spark.createDataFrame(rows, "a long, b long, s string")
        z = zorder_by(df, ["a", "b"], bits=4, partitions=4)
        assert sorted(map(tuple, z.collect())) == sorted(rows)


class TestLayoutCli:
    def test_layout_command(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main

        src = str(tmp_path / "grid")
        spark.createDataFrame(
            [(x, y) for x in range(32) for y in range(32)], "x long, y long"
        ).write.parquet(src)
        out = str(tmp_path / "zout")
        rc = main(["layout", "--input", src, "--output", out,
                   "--by", "x,y", "--bits", "5", "--partitions", "8"])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["status"] == "success" and res["rows"] == 1024
        assert res["avg_partition_span"]["x"] < 31
        assert res["avg_partition_span"]["y"] < 31
        assert spark.read.parquet(out).count() == 1024
