"""§2.12 TransformationRule surface + L10 observe-based metrics."""

from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.meta.metrics import JobMetrics
from harness_aws_etl_pipeline_spark.operators.rules import (
    RuleSet,
    column_rule,
    filter_rule,
    pandas_rule,
)
from harness_aws_etl_pipeline_spark.pipeline import run_job


class TestRules:
    def test_column_rule(self, spark):
        df = spark.createDataFrame([(1, 10.0), (2, 200.0)], "id long, amount double")
        rule = column_rule("cap", F.col("amount") > 100, "amount", F.lit(100.0))
        out = rule.apply(df)
        assert {r["id"]: r["amount"] for r in out.collect()} == {1: 10.0, 2: 100.0}

    def test_column_rule_creates_missing_column(self, spark):
        df = spark.createDataFrame([(1,), (2,)], "id long")
        out = column_rule("flag_big", F.col("id") > 1, "is_big", True).apply(df)
        assert {r["id"]: r["is_big"] for r in out.collect()} == {1: None, 2: True}

    def test_filter_rule(self, spark):
        df = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        assert filter_rule("keep_big", F.col("id") >= 2).apply(df).count() == 2

    def test_pandas_rule(self, spark):
        df = spark.createDataFrame([(1,), (2,)], "id long")

        def double_ids(batches):
            for pdf in batches:
                pdf["id"] = pdf["id"] * 2
                yield pdf

        out = pandas_rule("double", double_ids, "id long").apply(df)
        assert {r["id"] for r in out.collect()} == {2, 4}

    def test_ruleset_order_and_audit(self, spark):
        df = spark.createDataFrame([(1, 10.0), (2, 200.0)], "id long, amount double")
        rs = RuleSet(
            [
                column_rule("cap", F.col("amount") > 100, "amount", F.lit(100.0)),
                filter_rule("nonzero", F.col("amount") >= 50),
            ]
        )
        out, applied = rs.apply(df)
        assert applied == ["cap", "nonzero"]
        assert out.count() == 1  # cap first (200→100), then filter keeps it


class TestPandasUdafSurfaces:
    def test_group_medians(self, spark):
        from harness_aws_etl_pipeline_spark.operators.udaf import group_medians

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), ("a", 10.0), ("b", 5.0), ("b", 7.0)],
            "k string, v double",
        )
        out = {r["k"]: r["median_value"] for r in group_medians(df, "k", "v").collect()}
        assert out == {"a": 3.0, "b": 6.0}  # interpolated even count

    def test_zscore_per_group(self, spark):
        from harness_aws_etl_pipeline_spark.operators.udaf import zscore_per_group

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)], "k string, v double"
        )
        rows = zscore_per_group(df, "k", "v").collect()
        by_kv = {(r["k"], r["v"]): r["zscore"] for r in rows}
        assert by_kv[("a", 1.0)] == -1.0 and by_kv[("a", 3.0)] == 1.0
        assert by_kv[("b", 5.0)] == 0.0  # zero-variance group


class TestJobMetrics:
    def test_observe_single_pass(self, spark, tmp_path):
        jm = JobMetrics()
        df = spark.createDataFrame([(i,) for i in range(10)], "id long")
        df = jm.observe_input(df)
        out = jm.observe_output(df.filter(F.col("id") < 3))
        out.write.mode("overwrite").parquet(str(tmp_path / "o"))
        m = jm.collect()
        assert m["input"]["row_count"] == 10
        assert m["output"]["row_count"] == 3

    def test_run_job_metrics_and_hook(self, spark, tmp_path):
        src = tmp_path / "in.csv"
        src.write_text("id,name\n1,a\n2,b\n2,b\n")
        seen = []
        result = run_job(
            spark,
            {"type": "direct", "path": str(src)},
            str(tmp_path / "out"),
            metrics_hook=seen.append,
        )
        assert result["transform"]["rows_in"] == 3
        assert result["transform"]["rows_out"] == 2  # dedup removed one
        assert result["transform"]["rows_removed"] == 1
        assert seen and seen[0]["input"]["row_count"] == 3

    def test_run_job_with_rules(self, spark, tmp_path):
        src = tmp_path / "in.csv"
        src.write_text("id,name\n1,a\n2,b\n")
        rules = RuleSet([filter_rule("only_first", F.col("id") == "1")])
        result = run_job(
            spark,
            {"type": "direct", "path": str(src)},
            str(tmp_path / "out"),
            rules=rules,
        )
        assert result["transform"]["rows_out"] == 1
        assert result["transform"]["rules_applied"] == ["only_first"]

    def test_run_job_empty_after_transform_skips(self, spark, tmp_path):
        src = tmp_path / "in.csv"
        src.write_text("id,name\n1,a\n")
        rules = RuleSet([filter_rule("none", F.lit(False))])
        result = run_job(
            spark,
            {"type": "direct", "path": str(src)},
            str(tmp_path / "out"),
            rules=rules,
        )
        assert result["load"]["status"] == "skipped"
