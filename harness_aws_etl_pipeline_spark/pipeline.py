"""The E→T→L job: the reference's fixed transform pipeline + lifecycle.

Reference flow (etl/lambda_handler.py:41-152, transformer.py:39-93):
parse trigger → start job (metadata RUNNING) → extract → transform
(T1 normalize → T2 nulls → T3 dedup → T4/T5 casts → T6/T7/T8 derive →
validate) → load → complete/fail job (+ notification hook).

Spark-first shape: the transform steps compose into ONE logical plan —
Catalyst fuses the narrow steps (normalize/casts/derive) into a single
codegen stage over the scan; only dedup introduces a shuffle. Stats
that the reference collected with eager ``len(df)`` calls between steps
are collected here with ``observe()`` metrics and single-pass
aggregates, so the pipeline does not multiply scans.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from harness_aws_etl_pipeline_spark.config import EngineConfig
from harness_aws_etl_pipeline_spark.operators import (
    add_date_partitions,
    cast_date_like_columns,
    deduplicate_exact,
    handle_nulls,
    infer_numeric_columns,
    normalize_column_names,
    validate,
)
from harness_aws_etl_pipeline_spark.operators.derive import add_processing_metadata
from harness_aws_etl_pipeline_spark.sinks import load as sink_load
from harness_aws_etl_pipeline_spark.sources import extract as source_extract
from harness_aws_etl_pipeline_spark.meta.jobruns import JobRuns
from harness_aws_etl_pipeline_spark.meta.metrics import JobMetrics
from harness_aws_etl_pipeline_spark.operators.rules import RuleSet


def transform(
    df: DataFrame,
    config: EngineConfig | None = None,
    collect_stats: bool = True,
    rules: "RuleSet | None" = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """T1→T8 in reference order (transformer.py:61-84), returning
    ``(df, stats)``.

    ``collect_stats=False`` skips the eager count passes entirely and
    returns a lazy plan — the mode to use when the pipeline feeds
    another computation rather than a report; at 100 TB every eager
    count is a full job (run_job uses this mode and collects counts via
    ``observe`` on the write action instead).

    ``rules`` — a §2.12 RuleSet applied after the built-in steps.

    Streaming inputs: T5 numeric inference is skipped (data-dependent
    schema requires a profiling pass, which is undefined over an
    unbounded stream — pin schemas explicitly at the streaming source
    instead), and the 'flag' null strategy flags every column rather
    than profiling which ones contain nulls.
    """
    cfg = config or EngineConfig()
    stats: dict[str, Any] = {}
    streaming = df.isStreaming

    if collect_stats and not streaming:
        stats["rows_in"] = df.count()
        stats["columns_in"] = len(df.columns)

    out = normalize_column_names(df)
    null_strategy = cfg.get("etl.transform.null_handling", "drop")
    if streaming and null_strategy == "flag":
        from harness_aws_etl_pipeline_spark.operators import flag_nulls

        out = flag_nulls(out, columns_with_nulls=list(out.columns))
    else:
        out = handle_nulls(out, null_strategy)

    if cfg.get("etl.transform.deduplicate", True):
        out = deduplicate_exact(out)

    if cfg.get("etl.transform.infer_dates", True):
        out = cast_date_like_columns(out)
    if cfg.get("etl.transform.infer_numeric", True) and not streaming:
        out = infer_numeric_columns(
            out, threshold=cfg.get("etl.transform.numeric_parse_threshold", 0.8)
        )

    if cfg.get("etl.transform.add_processing_metadata", True):
        out = add_processing_metadata(out)

    if rules is not None:
        out, applied = rules.apply(out)
        stats["rules_applied"] = applied

    if collect_stats and not streaming:
        stats["rows_out"] = out.count()
        stats["columns_out"] = len(out.columns)
        stats["rows_removed"] = stats["rows_in"] - stats["rows_out"]
        stats["validation"] = validate(out)
    return out, stats


def run_job(
    spark: SparkSession,
    source_info: dict,
    output_path: str,
    config: EngineConfig | None = None,
    job_runs: JobRuns | None = None,
    job_id: str | None = None,
    on_complete: Callable[[dict], None] | None = None,
    metrics_hook: Callable[[dict], None] | None = None,
    rules: "RuleSet | None" = None,
) -> dict[str, Any]:
    """Full E→T→L with RUNNING→SUCCESS/FAILED lifecycle (reference
    lambda_handler.py:41-152).

    ``on_complete`` is the notification hook (reference L9, SNS publish
    at lambda_handler.py:121-124,140-143); ``metrics_hook`` the metric
    publisher (L10, CloudWatch at aws_clients.py:166-201) — both
    driver-side callbacks, out of the data plane.

    Row counts come from ``observe`` metrics attached to the write
    action — the whole job is ONE pass over the data (the reference's
    eager per-step ``len(df)`` counting would be N full scans here).
    """
    cfg = config or EngineConfig()
    job_id = job_id or f"etl-{uuid.uuid4().hex[:12]}"
    started = time.time()
    if job_runs is not None:
        job_runs.start(job_id, trigger=source_info)

    result: dict[str, Any] = {"job_id": job_id, "source": source_info}
    try:
        df, extract_stats = source_extract(
            spark,
            source_info,
            infer_schema=cfg.get("etl.extract.infer_schema", True),
            isolate_errors=cfg.get("etl.extract.per_file_error_isolation", True),
            max_file_size_mb=cfg.get("etl.extract.max_file_size_mb", 0),
        )
        result["extract"] = extract_stats
        if df is None:
            result.update(status="skipped", reason="no input files")
        else:
            # ONE pass: transform is built once (its data-dependent
            # profiling — T5 parse ratios — runs once), observations
            # attach to input and output, and the write is the only
            # full action. Empty-skip is decided AFTER the write from
            # the observed output count (no isEmpty probe — a partial
            # action on an observed plan freezes the metrics at bogus
            # values), cleaning up the output dir if this job created
            # it.
            from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

            _fs = get_fs(output_path, spark)
            jm = JobMetrics()
            raw_df = df
            df = jm.observe_input(df)
            transformed, tstats = transform(df, cfg, collect_stats=False, rules=rules)
            transformed = jm.observe_output(transformed)
            result["transform"] = tstats
            out_preexisted = _fs.exists(output_path)
            load_mode = cfg.get("etl.load.mode", "append")
            # L5 guard for the one DESTRUCTIVE configuration: overwrite
            # onto a preexisting output. Writing first would wipe the
            # prior data before the rows_out==0 check, then report
            # "skipped" with an empty dir left behind. Probe emptiness
            # on an UNOBSERVED twin (a partial action like isEmpty on
            # the observed plan would freeze its metrics at bogus
            # values); costs one extra transform build + short-circuit
            # scan, paid only in this configuration.
            skip_write = False
            if load_mode == "overwrite" and out_preexisted:
                twin, _ = transform(
                    raw_df, cfg, collect_stats=False, rules=rules
                )
                skip_write = twin.isEmpty()
            if skip_write:
                # full count (not a limit-probe) so the observed
                # input/output metrics still populate correctly
                transformed.count()
                result["load"] = {"status": "skipped", "reason": "empty input"}
            else:
                result["load"] = sink_load(
                    transformed,
                    output_path,
                    fmt=cfg.get("etl.load.format", "parquet"),
                    mode=load_mode,
                    partition_by=cfg.get("etl.load.partition_by"),
                    compression=cfg.get("etl.load.compression", "snappy"),
                    assume_nonempty=True,
                )
            metrics = jm.collect()
            rows_in = metrics.get("input", {}).get("row_count")
            rows_out = metrics.get("output", {}).get("row_count")
            result["transform"].update(
                rows_in=rows_in,
                rows_out=rows_out,
                rows_removed=(rows_in - rows_out)
                if rows_in is not None and rows_out is not None
                else None,
                columns_out=len(transformed.columns),
            )
            result["metrics"] = metrics
            if metrics_hook is not None:
                metrics_hook(metrics)
            if rows_out == 0:
                # reference L5 semantics: empty output → skipped, no
                # object left behind (only removable when this job
                # created the directory — append jobs keep prior data)
                if not out_preexisted and _fs.exists(output_path):
                    _fs.delete(output_path, recursive=True)
                result["load"] = {"status": "skipped", "reason": "empty input"}
            result["status"] = "success"
        result["duration_seconds"] = round(time.time() - started, 6)
        if job_runs is not None:
            job_runs.complete(job_id, result)
    except Exception as exc:
        result["status"] = "failed"
        # truncate like the reference's [:10000] traceback cap
        # (metadata.py:165)
        result["error"] = str(exc)[:10000]
        result["duration_seconds"] = round(time.time() - started, 6)
        if job_runs is not None:
            job_runs.fail(job_id, result)
        if on_complete is not None:
            on_complete(result)
        raise
    if on_complete is not None:
        on_complete(result)
    return result
