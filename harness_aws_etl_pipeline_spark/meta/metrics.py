"""L10 — metric collection without extra passes: ``df.observe``.

The reference emits CloudWatch metrics around each job
(aws_clients.py:166-201) and collects row counts with eager ``len(df)``
calls between steps (transformer.py:53-89) — each of which, translated
naively, is a full Spark job. ``Observation`` attaches aggregate
metrics to the *existing* action: when the sink write runs, the
metrics materialize for free.

Usage::

    jm = JobMetrics()
    df = jm.observe_input(df)           # counts rows entering
    out = transform(df)
    out = jm.observe_output(out)        # counts rows leaving
    write(out)                          # ONE job; both metrics filled
    jm.collect()                        # {'rows_in': N, 'rows_out': M}

``metrics_hook`` on run_job receives the collected dict — the
pluggable stand-in for the CloudWatch publisher (driver-side, out of
the data plane, exactly like the SNS hook L9).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class JobMetrics:
    def __init__(self) -> None:
        self._obs: dict[str, Observation] = {}

    def observe(self, df: DataFrame, name: str, *exprs) -> DataFrame:
        """Attach named aggregate metrics to the plan (no extra job)."""
        obs = Observation(name)
        self._obs[name] = obs
        if not exprs:
            exprs = (F.count(F.lit(1)).alias("row_count"),)
        return df.observe(obs, *exprs)

    def observe_input(self, df: DataFrame) -> DataFrame:
        return self.observe(
            df,
            "input",
            F.count(F.lit(1)).alias("row_count"),
        )

    def observe_output(self, df: DataFrame) -> DataFrame:
        return self.observe(
            df,
            "output",
            F.count(F.lit(1)).alias("row_count"),
        )

    def collect(self) -> dict[str, dict[str, Any]]:
        """Metric values per observation point (empty for observations
        whose plan never executed)."""
        out: dict[str, dict[str, Any]] = {}
        for name, obs in self._obs.items():
            try:
                out[name] = dict(obs.get)
            except Exception:
                out[name] = {}
        return out
