"""Schema-evolution reads (sources/evolve.py): the widening lattice,
incompatibility surfacing, distributed footer scan, and the actual
claim — a directory mixing int/long and added/dropped columns reads
back complete and correctly typed where both mergeSchema and a plain
multi-path read fail or lie."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from harness_aws_etl_pipeline_spark.sources.evolve import (
    evolved_schema,
    read_parquet_evolved,
    scan_parquet_schemas,
    widen_type,
)


class TestWiden:
    def test_integral_ladder(self):
        assert widen_type(T.IntegerType(), T.LongType()) == T.LongType()
        assert widen_type(T.ByteType(), T.ShortType()) == T.ShortType()
        assert widen_type(T.LongType(), T.IntegerType()) == T.LongType()

    def test_fractional_and_cross_family(self):
        assert widen_type(T.FloatType(), T.DoubleType()) == T.DoubleType()
        assert widen_type(T.LongType(), T.FloatType()) == T.DoubleType()
        assert widen_type(T.IntegerType(), T.DoubleType()) == T.DoubleType()

    def test_decimal_covers_both_ranges(self):
        a, b = T.DecimalType(10, 2), T.DecimalType(8, 4)
        assert widen_type(a, b) == T.DecimalType(12, 4)
        assert widen_type(T.DecimalType(10, 2), T.IntegerType()) == T.DecimalType(
            22, 2
        )

    def test_containers_recurse(self):
        assert widen_type(
            T.ArrayType(T.IntegerType()), T.ArrayType(T.LongType())
        ) == T.ArrayType(T.LongType(), True)

    def test_incompatible_raises(self):
        with pytest.raises(ValueError, match="incompatible"):
            widen_type(T.StringType(), T.LongType())

    def test_evolved_schema_order_and_names(self):
        s1 = T.StructType(
            [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
        )
        s2 = T.StructType(
            [T.StructField("b", T.StringType()), T.StructField("c", T.DoubleType()),
             T.StructField("a", T.LongType())]
        )
        got = evolved_schema([s1, s2])
        assert [f.name for f in got.fields] == ["a", "b", "c"]
        assert got["a"].dataType == T.LongType()
        # fold order is deterministic regardless of input order (the
        # footer-scan collect order is scheduling-dependent)
        assert evolved_schema([s2, s1]) == got
        with pytest.raises(ValueError, match="column 'b'"):
            evolved_schema(
                [s1, T.StructType([T.StructField("b", T.LongType())])]
            )


@pytest.fixture()
def evolved_dir(spark, tmp_path):
    """Three schema generations of one table: v1 (id int, v float),
    v2 (id long, v double, tag string), v3 drops v, adds n long."""
    root = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, 1.5), (2, 2.5)], "id int, v float"
    ).coalesce(1).write.mode("append").parquet(root)
    spark.createDataFrame(
        [(3, 3.5, "x")], "id long, v double, tag string"
    ).coalesce(1).write.mode("append").parquet(root)
    spark.createDataFrame(
        [(4, "y", 40)], "id int, tag string, n long"
    ).coalesce(1).write.mode("append").parquet(root)
    return root


class TestRead:
    def test_mergeschema_cannot_read_this(self, spark, evolved_dir):
        with pytest.raises(Exception, match="(?i)merge|convert|schema"):
            spark.read.option("mergeSchema", "true").parquet(
                evolved_dir
            ).collect()

    def test_reads_all_rows_with_widened_types(self, spark, evolved_dir):
        df = read_parquet_evolved(spark, evolved_dir)
        assert dict(df.dtypes) == {
            "id": "bigint",
            "v": "double",
            "tag": "string",
            "n": "bigint",
        }
        rows = {r["id"]: r for r in df.collect()}
        assert set(rows) == {1, 2, 3, 4}
        assert rows[1]["v"] == 1.5 and rows[1]["tag"] is None
        assert rows[3]["tag"] == "x" and rows[3]["n"] is None
        assert rows[4]["n"] == 40 and rows[4]["v"] is None

    def test_explicit_file_list(self, spark, evolved_dir):
        import glob

        files = sorted(glob.glob(f"{evolved_dir}/*.parquet"))
        assert read_parquet_evolved(spark, files).count() == 4

    def test_footer_scan_distributed(self, spark, evolved_dir):
        import glob

        files = sorted(glob.glob(f"{evolved_dir}/*.parquet"))
        got = scan_parquet_schemas(spark, files)
        assert len(got) == len(files) >= 3
        names = {tuple(f.name for f in sch.fields) for _p, sch in got}
        assert ("id", "v") in names

    def test_single_schema_passthrough(self, spark, tmp_path):
        root = str(tmp_path / "flat")
        spark.range(10).write.parquet(root)
        df = read_parquet_evolved(spark, root)
        assert df.count() == 10 and df.columns == ["id"]

    def test_empty_dir_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            read_parquet_evolved(spark, str(tmp_path / "nope"))


class TestCli:
    def test_evolve_cli_report_and_write(self, spark, evolved_dir, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main

        out = str(tmp_path / "normalized")
        rc = main(["evolve", "--input", evolved_dir, "--output", out])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["schema_versions"] == 3 and res["rows"] == 4
        assert res["evolved_schema"]["id"] == "bigint"
        back = spark.read.parquet(out)  # normalized: plain read works now
        assert back.count() == 4 and dict(back.dtypes)["v"] == "double"

    def test_evolve_cli_incompatible_fails_loudly(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main

        root = str(tmp_path / "bad")
        spark.createDataFrame([(1,)], "a int").coalesce(1).write.mode(
            "append"
        ).parquet(root)
        spark.createDataFrame([("x",)], "a string").coalesce(1).write.mode(
            "append"
        ).parquet(root)
        rc = main(["evolve", "--input", root])
        assert rc == 1
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "incompatible" in res["error"] and res["schema_versions"] == 2


class TestPartitionRecovery:
    """Round 8: directory-encoded partition columns are reconstructed
    when reading through the evolution path — the engine's own L4
    layout round-trips."""

    def test_l4_roundtrip_with_schema_evolution(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sinks import write_table

        root = str(tmp_path / "lake")
        gen1 = spark.createDataFrame(
            [(1, 1.5, 2024, 1), (2, 2.5, 2024, 2)],
            "id int, v float, year int, month int",
        )
        gen2 = spark.createDataFrame(
            [(3, 3.5, "x", 2025, 1)],
            "id long, v double, tag string, year int, month int",
        )
        for gen in (gen1, gen2):
            write_table(gen, root, partition_by=["year", "month"])
        df = read_parquet_evolved(spark, root)
        assert dict(df.dtypes)["year"] == "bigint"
        assert dict(df.dtypes)["month"] == "bigint"
        assert dict(df.dtypes)["id"] == "bigint"
        rows = {r["id"]: r for r in df.collect()}
        assert set(rows) == {1, 2, 3}
        assert rows[1]["year"] == 2024 and rows[1]["month"] == 1
        assert rows[3]["year"] == 2025 and rows[3]["tag"] == "x"
        assert rows[1]["tag"] is None

    def test_partition_types_inferred_globally(self, spark, tmp_path):
        # one partition's values are digits, another's are not — the
        # shared type must be string for BOTH groups (per-group
        # inference would disagree and break the union)
        root = tmp_path / "mixed"
        a = spark.createDataFrame([(1,)], "id int")
        b = spark.createDataFrame([(2,)], "id long")
        a.write.parquet(str(root / "tag=123"))
        b.write.parquet(str(root / "tag=abc"))
        df = read_parquet_evolved(spark, str(root))
        assert dict(df.dtypes) == {"id": "bigint", "tag": "string"}
        got = {(r["id"], r["tag"]) for r in df.collect()}
        assert got == {(1, "123"), (2, "abc")}

    def test_date_partitions_and_file_list_unchanged(self, spark, tmp_path):
        import glob

        root = tmp_path / "dated"
        spark.createDataFrame([(1,)], "id int").write.parquet(
            str(root / "ds=2024-01-05")
        )
        spark.createDataFrame([(2,)], "id int").write.parquet(
            str(root / "ds=2024-02-06")
        )
        df = read_parquet_evolved(spark, str(root))
        assert dict(df.dtypes)["ds"] == "date"
        assert df.where(F.col("ds") == "2024-02-06").first()["id"] == 2
        # explicit file list: no root, no partition recovery
        files = sorted(glob.glob(f"{root}/**/*.parquet", recursive=True))
        assert read_parquet_evolved(spark, files).columns == ["id"]

    def test_shadowed_partition_column_raises(self, spark, tmp_path):
        root = tmp_path / "shadow"
        spark.createDataFrame([(1, 7)], "id int, year int").write.parquet(
            str(root / "year=2024")
        )
        with pytest.raises(ValueError, match="shadow|ambiguous"):
            read_parquet_evolved(spark, str(root))

    def test_inconsistent_layout_raises(self, spark, tmp_path):
        root = tmp_path / "bad"
        spark.createDataFrame([(1,)], "id int").write.parquet(
            str(root / "year=2024")
        )
        spark.createDataFrame([(2,)], "id int").write.parquet(
            str(root / "month=5")
        )
        with pytest.raises(ValueError, match="partition"):
            read_parquet_evolved(spark, str(root))
