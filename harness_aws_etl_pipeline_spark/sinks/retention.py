"""Age-based retention sweep — the engine-side enforcement of the
reference's storage lifecycle (reference: config/config.yaml:35-37
declares raw 30 d / processed 90 d / archive 365 d; terraform
main.tf:101-141 enforces them with S3 bucket lifecycle ``expiration``
rules, per-object, mtime-based).

The engine mirrors that semantics over any Hadoop-FS scheme: list
every file under a root (one recursive LIST), delete those whose
modification time is older than the day budget, prune emptied
partition directories. Per-FILE expiry, exactly like S3 lifecycle —
never per-partition-value: a partition directory is only removed once
every file in it has individually aged out, so late-arriving writes
into an old partition keep the partition alive.

Driver-side metadata work by design — the file listing is namespace
metadata (the same order of work Spark's own file index does per
query), not a data scan; no Spark job is launched. On a real object
store the native lifecycle rules remain the cheaper enforcement point;
run the sweep where no such service exists (HDFS, local, bare NFS) or
to apply retention more often than the store's daily lifecycle pass.
"""

from __future__ import annotations

import time

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs, join_path

__all__ = ["sweep_expired", "sweep_lifecycle"]

_DAY_SECONDS = 86400.0


def sweep_expired(
    path: str,
    days: int,
    *,
    now: float | None = None,
    spark=None,
    dry_run: bool = False,
) -> dict:
    """Delete files under ``path`` older than ``days`` days (mtime).

    Returns ``{"path", "days", "files_expired", "files_kept",
    "bytes_before", "dirs_pruned", "dry_run", "expired": [...]}``;
    with ``dry_run=True`` nothing is deleted and ``expired`` lists
    the relative paths that WOULD go.

    ``now`` (epoch seconds) exists for deterministic tests and
    replaying a sweep as-of a point in time; defaults to wall clock.
    """
    if days <= 0:
        raise ValueError(f"retention days must be positive, got {days}")
    fs = get_fs(path, spark)
    report: dict = {
        "path": path,
        "days": days,
        "files_expired": 0,
        "files_kept": 0,
        "bytes_before": 0,
        "dirs_pruned": 0,
        "dry_run": dry_run,
        "expired": [],
    }
    cutoff = (now if now is not None else time.time()) - days * _DAY_SECONDS
    # ONE recursive LIST answers existence, ages, and byte accounting
    # (an absent root lists as empty) — on an object store the LIST
    # requests are the sweep's dominant cost, so no second traversal
    for rel, mtime, size in fs.list_files(path):
        report["bytes_before"] += size
        if mtime < cutoff:
            report["files_expired"] += 1
            report["expired"].append(rel)
            if not dry_run:
                fs.delete(join_path(path, rel), recursive=False)
        else:
            report["files_kept"] += 1
    if not dry_run and report["files_expired"]:
        report["dirs_pruned"] = fs.prune_empty_dirs(path)
    return report


def sweep_lifecycle(
    roots: dict[str, str],
    config=None,
    *,
    now: float | None = None,
    spark=None,
    dry_run: bool = False,
) -> dict:
    """Run :func:`sweep_expired` over the raw/processed/archive tier
    roots with each tier's configured day budget.

    ``roots`` maps tier name → path for any subset of ``raw``,
    ``processed``, ``archive``; day counts come from
    ``storage.retention.<tier>_days`` (config.py DEFAULTS mirror the
    reference's 30/90/365; env vars ``STORAGE_RETENTION_RAW_DAYS``
    etc. override). Returns {tier: sweep report}.
    """
    from harness_aws_etl_pipeline_spark.config import EngineConfig

    cfg = config or EngineConfig()
    known = ("raw", "processed", "archive")
    unknown = set(roots) - set(known)
    if unknown:
        raise ValueError(
            f"unknown retention tiers {sorted(unknown)}; expected {known}"
        )
    out: dict = {}
    for tier in known:
        if tier not in roots:
            continue
        days = int(cfg.get(f"storage.retention.{tier}_days"))
        out[tier] = sweep_expired(
            roots[tier], days, now=now, spark=spark, dry_run=dry_run
        )
    return out
