"""E2E pipeline + job-run lifecycle tests (mirrors reference
tests/integration/test_etl_pipeline.py:173-221 full E→T→L with
row-count and column assertions, on local FS instead of LocalStack)."""

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.config import EngineConfig

from tests.tiers import deep
from harness_aws_etl_pipeline_spark.meta import JobRuns
from harness_aws_etl_pipeline_spark.pipeline import run_job, transform

CSV = (
    "Order ID,Product Name,Quantity,Unit Price,Order Date\n"
    "1,widget,2,9.99,2024-01-15\n"
    "2,gadget,1,19.99,2024-02-20\n"
    "2,gadget,1,19.99,2024-02-20\n"
    "3,,1,5.00,2024-03-25\n"
)


class TestTransform:
    def test_full_pipeline(self, spark, tmp_path):
        p = tmp_path / "sales.csv"
        p.write_text(CSV)
        df = spark.read.option("header", True).csv(str(p))
        out, stats = transform(df)
        # normalized names
        assert "order_id" in out.columns and "unit_price" in out.columns
        # null row dropped (default strategy) + dup removed
        assert stats["rows_in"] == 4 and stats["rows_out"] == 2
        # derived metadata
        for c in ("_processed_at", "_row_hash", "_year", "_month", "_day"):
            assert c in out.columns
        # date heuristic cast applied to order_date
        assert dict(out.dtypes)["order_date"].startswith("timestamp")

    def test_fill_strategy_via_config(self, spark, tmp_path):
        p = tmp_path / "sales.csv"
        p.write_text(CSV)
        df = spark.read.option("header", True).csv(str(p))
        cfg = EngineConfig({"etl": {"transform": {"null_handling": "fill"}}})
        out, stats = transform(df, cfg)
        assert stats["rows_out"] == 3  # dup removed, null row kept (filled)

    def test_lazy_mode_no_stats(self, spark, sample_df):
        out, stats = transform(sample_df, collect_stats=False)
        assert stats == {} and out.columns  # plan built, nothing executed


class TestRunJob:
    def test_success_lifecycle(self, spark, tmp_path):
        src = tmp_path / "in.csv"
        src.write_text(CSV)
        runs = JobRuns(spark, str(tmp_path / "job_runs"))
        result = run_job(
            spark,
            {"type": "direct", "path": str(src)},
            str(tmp_path / "out"),
            job_runs=runs,
            job_id="job-1",
        )
        assert result["status"] == "success"
        assert result["load"]["status"] == "success"
        latest = {r["job_id"]: r["status"] for r in runs.latest().collect()}
        assert latest == {"job-1": "SUCCESS"}
        # full history keeps RUNNING + SUCCESS rows (append-only log)
        assert runs.by_job("job-1").count() == 2

    @deep

    def test_ledger_compaction(self, spark, tmp_path):
        # N transitions → one file with the latest-wins rows; latest()
        # view unchanged
        runs = JobRuns(spark, str(tmp_path / "job_runs"))
        for i in range(4):
            runs.start(f"job-{i}")
            runs.complete(f"job-{i}", {"duration_seconds": 0.5 + i})
        runs.start("job-9")  # still RUNNING — must survive as RUNNING
        before = sorted(
            (r["job_id"], r["status"]) for r in runs.latest().collect()
        )
        stats = runs.compact()
        assert stats["files_before"] == 9 and stats["files_after"] == 1
        assert stats["rows"] == 5
        after = sorted(
            (r["job_id"], r["status"]) for r in runs.latest().collect()
        )
        assert after == before
        assert runs.by_status("RUNNING").count() == 1

    def test_ledger_compaction_retention(self, spark, tmp_path):
        # compact(retention_days=N) is the DynamoDB-TTL twin: a job
        # whose LATEST transition is older than the budget drops out
        # entirely; fresh jobs keep exactly their latest-wins row
        from datetime import datetime, timedelta, timezone
        from decimal import Decimal

        from harness_aws_etl_pipeline_spark.meta.jobruns import JOB_RUNS_SCHEMA

        runs = JobRuns(spark, str(tmp_path / "job_runs"))
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        ancient = now - timedelta(days=40)
        rows = [
            ("old-job", ancient, "SUCCESS", Decimal("1.0"), None, None, None),
            ("new-job", now, "SUCCESS", Decimal("2.0"), None, None, None),
        ]
        spark.createDataFrame(rows, JOB_RUNS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(runs.path)

        import pytest

        with pytest.raises(ValueError, match="positive"):
            runs.compact(retention_days=0)
        stats = runs.compact(retention_days=30)
        assert stats["rows"] == 1
        assert [r["job_id"] for r in runs.latest().collect()] == ["new-job"]

    def test_alert_monitor(self, spark, tmp_path):
        # the engine-side CloudWatch-alarm equivalent: error-rate and
        # latency rules over the latest-per-job run states
        from harness_aws_etl_pipeline_spark.config import EngineConfig
        from harness_aws_etl_pipeline_spark.meta import alerts

        runs = JobRuns(spark, str(tmp_path / "job_runs"))
        runs.start("ok-1")
        runs.complete("ok-1", {"duration_seconds": 0.2})
        assert alerts.check(runs) == []  # healthy

        for i in range(3):
            runs.start(f"bad-{i}")
            runs.fail(f"bad-{i}", {"duration_seconds": 0.1, "error": "boom"})
        runs.start("slow-1")
        runs.complete("slow-1", {"duration_seconds": 45.0})  # > 30s

        fired = []
        got = alerts.check(runs, on_alert=fired.append)
        kinds = {a["alert"] for a in got}
        assert kinds == {"error_rate", "latency"}
        err = next(a for a in got if a["alert"] == "error_rate")
        assert err["failed"] == 3 and set(err["job_ids"]) == {
            "bad-0", "bad-1", "bad-2",
        }
        lat = next(a for a in got if a["alert"] == "latency")
        assert lat["job_ids"] == ["slow-1"]
        assert fired == got
        # raising the threshold silences the error alert
        quiet = alerts.check(
            runs,
            EngineConfig({"monitoring": {"alerts": {"error_threshold": 5}}}),
        )
        assert {a["alert"] for a in quiet} == {"latency"}

    def test_failure_lifecycle(self, spark, tmp_path):
        runs = JobRuns(spark, str(tmp_path / "job_runs"))
        notifications = []
        with pytest.raises(Exception):
            run_job(
                spark,
                {"type": "direct", "path": str(tmp_path / "missing.csv")},
                str(tmp_path / "out"),
                job_runs=runs,
                job_id="job-2",
                on_complete=notifications.append,
            )
        latest = {r["job_id"]: r["status"] for r in runs.latest().collect()}
        assert latest == {"job-2": "FAILED"}
        assert notifications and notifications[0]["status"] == "failed"

    def test_skip_on_empty_prefix(self, spark, tmp_path):
        (tmp_path / "empty").mkdir()
        result = run_job(
            spark,
            {"type": "batch", "prefix": str(tmp_path / "empty")},
            str(tmp_path / "out"),
        )
        assert result["status"] == "skipped"

    def test_overwrite_empty_preserves_prior_output(self, spark, tmp_path):
        # L5 'no object left behind' for the destructive configuration:
        # overwrite mode + preexisting output + empty transform result
        # must NOT wipe the prior data (emptiness is probed on an
        # unobserved twin BEFORE the write)
        src = tmp_path / "in.csv"
        src.write_text(CSV)
        out = tmp_path / "out"
        run_job(spark, {"type": "direct", "path": str(src)}, str(out))
        assert spark.read.parquet(str(out)).count() == 2

        # every row null-ish → default drop strategy empties the output
        empty_src = tmp_path / "empty.csv"
        empty_src.write_text(
            "Order ID,Product Name,Quantity,Unit Price,Order Date\n"
            "4,,1,5.00,2024-03-25\n"
        )
        cfg = EngineConfig({"etl": {"load": {"mode": "overwrite"}}})
        result = run_job(
            spark, {"type": "direct", "path": str(empty_src)}, str(out), config=cfg
        )
        assert result["status"] == "success"
        assert result["load"]["status"] == "skipped"
        assert result["transform"]["rows_out"] == 0  # metrics still populated
        assert spark.read.parquet(str(out)).count() == 2  # prior data intact

    def test_output_readable_and_partitioned(self, spark, tmp_path):
        src = tmp_path / "in.csv"
        src.write_text(CSV)
        run_job(spark, {"type": "direct", "path": str(src)}, str(tmp_path / "out"))
        back = spark.read.parquet(str(tmp_path / "out"))
        assert back.count() == 2
        assert {"_year", "_month", "_day"} <= set(back.columns)


class TestConfig:
    def test_from_yaml(self):
        cfg = EngineConfig.from_yaml("/root/repo/config/engine.yaml")
        assert cfg.get("etl.transform.null_handling") == "drop"
        assert cfg.get("etl.load.partition_by") == ["_year", "_month", "_day"]
        assert cfg.get("monitoring.alerts.error_threshold") == 3

    def test_dot_path_and_default(self):
        cfg = EngineConfig()
        assert cfg.get("etl.transform.null_handling") == "drop"
        assert cfg.get("no.such.key", 42) == 42

    def test_env_override(self, monkeypatch):
        cfg = EngineConfig()
        monkeypatch.setenv("ETL_TRANSFORM_NULL_HANDLING", "flag")
        assert cfg.get("etl.transform.null_handling") == "flag"
        monkeypatch.setenv("ETL_TRANSFORM_DEDUPLICATE", "false")
        assert cfg.get("etl.transform.deduplicate") is False
