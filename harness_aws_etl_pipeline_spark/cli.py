"""Command-line entry point — the engine's equivalent of the
reference's local harness (scripts/run_local.py:127-246: parse args,
invoke the handler in-process, print the result).

    python -m harness_aws_etl_pipeline_spark.cli run \
        --source data/sales.csv --output out/silver [--format parquet]
    python -m harness_aws_etl_pipeline_spark.cli sweep \
        --prefix landing/ --output out/silver --job-runs out/job_runs
    python -m harness_aws_etl_pipeline_spark.cli sql \
        --sf-dir /root/testdata/sf0.001 --query "SELECT COUNT(*) FROM lineitem"
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="harness_aws_etl_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="E→T→L one source file")
    run.add_argument("--source", required=True)
    run.add_argument("--output", required=True)
    run.add_argument("--format", default="parquet", choices=["parquet", "csv", "json"])
    run.add_argument("--null-handling", default=None, choices=["drop", "fill", "flag"])
    run.add_argument("--job-runs", default=None, help="job_runs table path")

    sweep = sub.add_parser("sweep", help="E→T→L every pending file under a prefix")
    sweep.add_argument("--prefix", required=True)
    sweep.add_argument("--output", required=True)
    sweep.add_argument("--format", default="parquet", choices=["parquet", "csv", "json"])
    sweep.add_argument("--null-handling", default=None, choices=["drop", "fill", "flag"])
    sweep.add_argument("--job-runs", default=None)

    sql = sub.add_parser("sql", help="ad-hoc SQL over the test tables")
    sql.add_argument("--sf-dir", required=True)
    sql.add_argument("--query", required=True)
    sql.add_argument("--limit", type=int, default=20)

    args = p.parse_args(argv)

    from harness_aws_etl_pipeline_spark.config import EngineConfig
    from harness_aws_etl_pipeline_spark.session import get_spark

    spark = get_spark("etl-cli")

    if args.cmd == "sql":
        from harness_aws_etl_pipeline_spark.plans.sqlapi import sql as run_sql

        df = run_sql(spark, args.sf_dir, args.query)
        for row in df.limit(args.limit).collect():
            print(json.dumps(row.asDict(), default=str))
        return 0

    from harness_aws_etl_pipeline_spark.meta import JobRuns
    from harness_aws_etl_pipeline_spark.pipeline import run_job

    overrides: dict = {"etl": {"load": {"format": args.format}}}
    if args.null_handling:
        overrides["etl"]["transform"] = {"null_handling": args.null_handling}
    cfg = EngineConfig(overrides)
    job_runs = JobRuns(spark, args.job_runs) if args.job_runs else None

    source_info = (
        {"type": "direct", "path": args.source}
        if args.cmd == "run"
        else {"type": "batch", "prefix": args.prefix}
    )
    try:
        result = run_job(spark, source_info, args.output, cfg, job_runs=job_runs)
    except Exception as exc:  # noqa: BLE001 - CLI boundary
        print(json.dumps({"status": "failed", "error": str(exc)[:2000]}))
        return 1
    print(json.dumps(result, default=str))
    return 0 if result.get("status") in ("success", "skipped") else 1


if __name__ == "__main__":
    sys.exit(main())
