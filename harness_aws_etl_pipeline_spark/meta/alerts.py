"""Alerting over the job_runs ledger — the engine-side realization of
the reference's CloudWatch alarms (infrastructure/terraform/main.tf:440
defines an error-count alarm with ``threshold = var.error_threshold``;
config.yaml:99-101 carries ``error_threshold: 3`` and
``latency_threshold_ms: 30000``).

The reference's alarms watch Lambda metrics; this engine's equivalent
signal source is the L8 job_runs table, so the monitor is one
column-pruned scan over it:

- **error alert** — at least ``error_threshold`` FAILED jobs among the
  most recent ``window`` completed runs (latest state per job).
- **latency alert** — any of those runs exceeding
  ``latency_threshold_ms``.

``check`` returns the alert list; pass ``on_alert`` to wire a
notification callback (the L9 path — SNS in the reference, a driver
callback here).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.config import EngineConfig
from harness_aws_etl_pipeline_spark.meta.jobruns import JobRuns


def check(
    job_runs: JobRuns,
    config: EngineConfig | None = None,
    window: int = 50,
    on_alert: Callable[[dict[str, Any]], None] | None = None,
) -> list[dict[str, Any]]:
    """Evaluate alert rules against the latest-per-job run states.

    Returns a list of alert dicts (empty = healthy); each is also
    passed to ``on_alert`` as it fires.
    """
    cfg = config or EngineConfig()
    error_threshold = int(cfg.get("monitoring.alerts.error_threshold", 3))
    latency_ms = int(cfg.get("monitoring.alerts.latency_threshold_ms", 30000))

    recent = (
        job_runs.latest()
        .select("job_id", "status", "ts", "duration_seconds")
        .orderBy(F.col("ts").desc())
        .limit(window)
        .collect()
    )
    alerts: list[dict[str, Any]] = []

    failed = [r for r in recent if r["status"] == "FAILED"]
    if len(failed) >= error_threshold:
        alerts.append(
            {
                "alert": "error_rate",
                "failed": len(failed),
                "threshold": error_threshold,
                "window": len(recent),
                "job_ids": [r["job_id"] for r in failed],
            }
        )

    slow = [
        r
        for r in recent
        if r["duration_seconds"] is not None
        and float(r["duration_seconds"]) * 1000.0 > latency_ms
    ]
    if slow:
        alerts.append(
            {
                "alert": "latency",
                "slow": len(slow),
                "threshold_ms": latency_ms,
                "job_ids": [r["job_id"] for r in slow],
            }
        )

    if on_alert is not None:
        for a in alerts:
            on_alert(a)
    return alerts
