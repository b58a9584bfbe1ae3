"""Write Delta Lake tables WITHOUT the Delta jar — the writer half of
the interop tier (``sources/deltaread`` is the reader;
``sinks/deltaexport`` projects a SnapTable's history). This writes a
PLAIN DataFrame as a Delta commit, so any Delta client — and our own
reader — can consume engine output directly.

Protocol shape (github.com/delta-io/delta PROTOCOL.md):

- data lands as ordinary parquet (hive-style partition directories
  when ``partition_by`` is set — partition values recorded as strings
  in ``add.partitionValues`` per the spec, and the columns are NOT
  stored in the files, matching Delta's physical layout);
- the commit is ``_delta_log/NNN.json`` claimed via PUT-IF-ABSENT —
  exactly Delta's filesystem commit protocol. A losing writer re-reads
  the latest version and retries with the next number, so two racing
  appenders both land (the snaptable CAS machinery,
  ``fs.rename_if_absent``);
- ``overwrite`` emits remove actions for every previously-live file
  in the same commit (atomic replace);
- ``metaData``/``protocol`` are written on the first commit and
  whenever the schema string changes (Spark's schema JSON IS Delta's
  ``schemaString`` dialect).

Honesty: appends and overwrites only — no DML (use SnapTable for
merge/delete/update and export its history), no checkpoint authoring
here (``deltaexport._write_checkpoint`` covers that for exported
histories), writer protocol (1, 2) with no writer features claimed.
"""

from __future__ import annotations

import json
import posixpath
import time
import uuid
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame, SparkSession

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs
from harness_aws_etl_pipeline_spark.sources.deltaread import (
    _commit_files,
    delta_snapshot,
)

__all__ = ["write_delta"]

_LOG = "_delta_log"


def write_delta(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    max_commit_retries: int = 20,
) -> dict:
    """Write ``df`` as one Delta commit at ``path``. Returns
    ``{"version", "files_added", "files_removed", "retries"}``."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append or overwrite: {mode!r}")
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    log_dir = posixpath.join(base, _LOG)
    fs.mkdirs(log_dir)
    pcols = list(partition_by or [])
    missing = [c for c in pcols if c not in df.columns]
    if missing:
        raise ValueError(f"partition_by columns not in DataFrame: {missing}")

    commits = _commit_files(fs, log_dir)
    if commits:
        prev = delta_snapshot(spark, base)
        if sorted(prev["partition_columns"]) != sorted(pcols):
            raise ValueError(
                f"table is partitioned by {prev['partition_columns']}, "
                f"got partition_by={pcols}"
            )

    # ---- data: stage into a unique temp dir, then move files into
    # the table layout. Listing-diff against the live dir would race a
    # concurrent writer (its files could appear inside our window and
    # get claimed); the staged move gives EXACT ownership of this
    # write's files. Spark part-file names embed a fresh UUID per
    # write, so the moves cannot collide either.
    stage = posixpath.join(base, f".stage-{uuid.uuid4().hex}")
    try:
        writer = df.write.mode("overwrite")
        if pcols:
            writer = writer.partitionBy(*pcols)
        writer.parquet(stage)
        new_files: dict[str, int] = {}
        for rel, _mt, size in fs.list_files(stage):
            if not rel.endswith(".parquet"):
                continue
            dest_rel = rel  # hive dirs carry over unchanged
            parent = posixpath.dirname(dest_rel)
            if parent:
                fs.mkdirs(posixpath.join(base, parent))
            if not fs.rename(
                posixpath.join(stage, rel), posixpath.join(base, dest_rel)
            ):
                raise RuntimeError(
                    f"could not move staged data file {rel!r} into {base!r}"
                )
            new_files[dest_rel] = size
    finally:
        fs.delete(stage, recursive=True)
    ts_ms = int(time.time() * 1000)

    def _partition_values(rel: str) -> dict[str, str]:
        vals: dict[str, str] = {}
        for seg in rel.split("/")[:-1]:
            if "=" in seg:
                k, _, v = seg.partition("=")
                if k in pcols:
                    vals[k] = (
                        None
                        if v == "__HIVE_DEFAULT_PARTITION__"
                        else unquote(v)
                    )
        return vals

    adds = [
        {
            "add": {
                "path": quote(p, safe="/="),
                "partitionValues": _partition_values(p),
                "size": sz,
                "modificationTime": ts_ms,
                "dataChange": True,
            }
        }
        for p, sz in sorted(new_files.items())
    ]

    schema_str = df.schema.json()
    meta_action = {
        "metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_str,
            "partitionColumns": pcols,
            "configuration": {},
            "createdTime": ts_ms,
        }
    }

    # ---- commit loop: claim NNN.json via put-if-absent; on loss,
    # re-read the latest state and retry with the next version
    retries = 0
    while True:
        commits = _commit_files(fs, log_dir)
        version = (max(commits) + 1) if commits else 0
        actions: list[dict] = []
        removes: list[dict] = []
        if version == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
            actions.append(meta_action)
        else:
            prev = delta_snapshot(spark, base, version - 1)

            def _shape(sch):
                return [(f.name, f.dataType.simpleString()) for f in sch.fields]

            if prev["schema"] is not None and _shape(prev["schema"]) != _shape(
                df.schema
            ):
                if mode != "overwrite":
                    raise ValueError(
                        "append schema differs from the table schema; "
                        "overwrite to change it"
                    )
                actions.append(meta_action)
            if mode == "overwrite":
                removes = [
                    {
                        "remove": {
                            "path": p,
                            "deletionTimestamp": ts_ms,
                            "dataChange": True,
                        }
                    }
                    for p in sorted(prev["files"])
                ]
        actions.extend(removes)
        actions.extend(adds)
        actions.append(
            {
                "commitInfo": {
                    "timestamp": ts_ms,
                    "operation": "WRITE",
                    "operationParameters": {"mode": mode.upper()},
                    "engineInfo": "harness-aws-etl-pipeline-spark deltawrite",
                }
            }
        )
        payload = (
            "\n".join(json.dumps(a) for a in actions) + "\n"
        ).encode("utf-8")
        tmp = posixpath.join(
            log_dir, f".tmp-{uuid.uuid4().hex}-{version:020d}.json"
        )
        fs.write_bytes(tmp, payload)
        dest = posixpath.join(log_dir, f"{version:020d}.json")
        if fs.rename_if_absent(tmp, dest):
            return {
                "version": version,
                "files_added": len(adds),
                "files_removed": len(removes),
                "retries": retries,
            }
        fs.delete(tmp, recursive=False)
        retries += 1
        if retries > max_commit_retries:
            # the data files this writer staged are uncommitted debris;
            # leave them (Delta semantics: unreferenced files are
            # VACUUM's concern) but fail loudly
            raise RuntimeError(
                f"lost the Delta commit race {retries} times at {base!r}"
            )
