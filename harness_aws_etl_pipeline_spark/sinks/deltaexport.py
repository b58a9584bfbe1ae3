"""Export a SnapTable's history as a Delta Lake ``_delta_log`` — the
INVERSE of ``sources/deltaread``: after one metadata-only export, any
Delta client (Spark+delta, Trino, DuckDB delta, polars … and our own
``read_delta``) can read the snapshot table, time travel included.

Why this works with zero data movement: a SnapTable is already
"parquet files + a manifest log" (``_snaplog/``), which is exactly
Delta's physical model. The export walks every retained snapshot
manifest, diffs consecutive file lists into Delta ``add`` / ``remove``
actions, and writes ``_delta_log/NNN.json`` commits next to the
existing data — relative, URL-encoded paths per the protocol, sizes
and row-count stats carried over, the table schema emitted as
``metaData`` (Spark's schema JSON IS Delta's ``schemaString``
dialect). The two logs coexist: SnapTable readers only look at
``_snaplog/``, Delta readers only at ``_delta_log/``.

Honesty: the export is a SNAPSHOT of history, not a live dual-commit
protocol — re-run it after new SnapTable commits (idempotent:
existing commit files are rewritten). Delta version numbers equal
SnapTable version numbers 1:1, so expired SnapTable snapshots export
a REMAPPED contiguous history starting at 0 with the oldest retained
manifest as its base commit.
"""

from __future__ import annotations

import json
import time
from urllib.parse import quote

from pyspark.sql import SparkSession

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs
from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

__all__ = ["export_delta_log"]


def export_delta_log(
    spark: SparkSession,
    table_path: str,
    table_id: str = "snaptable-export",
    checkpoint: bool = False,
) -> dict:
    """Write/refresh ``_delta_log`` beside the SnapTable's data.
    Returns ``{"delta_versions", "base_snap_version", "files_live"}``.

    ``checkpoint=True`` additionally writes a classic parquet
    checkpoint at the final version plus ``_LAST_CHECKPOINT`` — Delta
    clients then fold ONE parquet file instead of every JSON commit
    (the bench ``lake`` leg measures exactly this driver-side cost).
    """
    t = SnapTable(spark, table_path)
    versions = t.versions()
    if not versions:
        raise ValueError(f"snaptable at {table_path!r} has no snapshots")
    fs = get_fs(t.path, spark)
    log_dir = f"{t.path}/_delta_log"
    fs.mkdirs(log_dir)

    # a refresh after expire_snapshots REMAPS history to start at delta
    # version 0; commit files beyond this export's length are stale
    # leftovers of a previous (longer) export, and a Delta reader
    # would fold the remapped base commits PLUS that old-mapping tail
    # into a corrupted snapshot — delete them first (round-10 fix).
    # Checkpoints are derived artifacts of the PREVIOUS mapping, so a
    # stale one at ANY version could replay old content — delete all;
    # this export rewrites its own if asked.
    import posixpath as _pp

    for rel, _mt, _sz in fs.list_files(log_dir):
        name = _pp.basename(rel)
        stale_json = (
            name.endswith(".json")
            and name[:-5].isdigit()
            and int(name[:-5]) >= len(versions)
        )
        if stale_json or ".checkpoint" in name or name == "_last_checkpoint":
            fs.delete(_pp.join(log_dir, name), recursive=False)

    # CDF surfaces in the export when the table emitted change data
    # (SnapTable DML under delta.enableChangeDataFeed) or carries the
    # property — the exported metaData advertises it so Delta CDF
    # readers trust the cdc actions
    cdf_on = any(
        t.manifest(v).get("cdc") for v in versions
    ) or str(
        (t.manifest(versions[-1]).get("properties") or {}).get(
            "delta.enableChangeDataFeed", ""
        )
    ).lower() == "true"
    table_conf = (
        {"delta.enableChangeDataFeed": "true"} if cdf_on else {}
    )
    prev_files: dict[str, dict] = {}
    prev_schema: str | None = None
    n_written = 0
    for delta_v, snap_v in enumerate(versions):
        m = t.manifest(snap_v)
        cur = {f["path"]: f for f in m["files"]}
        actions: list[dict] = []
        if delta_v == 0:
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 2,
                    }
                }
            )
        if m["schema"] != prev_schema:
            actions.append(
                {
                    "metaData": {
                        "id": table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": m["schema"],
                        "partitionColumns": [],
                        "configuration": table_conf,
                        "createdTime": int(m.get("ts", 0) * 1000),
                    }
                }
            )
            prev_schema = m["schema"]
        ts_ms = int(m.get("ts", time.time()) * 1000)
        for c in m.get("cdc") or []:
            actions.append(
                {
                    "cdc": {
                        "path": quote(c["path"]),
                        "partitionValues": {},
                        "size": int(c.get("bytes", 0)),
                        "dataChange": False,
                    }
                }
            )
        for path in sorted(set(prev_files) - set(cur)):
            actions.append(
                {
                    "remove": {
                        "path": quote(path),
                        "deletionTimestamp": ts_ms,
                        "dataChange": True,
                    }
                }
            )
        for path in sorted(set(cur) - set(prev_files)):
            f = cur[path]
            actions.append(
                {
                    "add": {
                        "path": quote(path),
                        "partitionValues": {},
                        "size": int(f.get("bytes", 0)),
                        "modificationTime": ts_ms,
                        "dataChange": True,
                        "stats": json.dumps(
                            {"numRecords": int(f.get("rows", 0))}
                        ),
                    }
                }
            )
        actions.append(
            {
                "commitInfo": {
                    "timestamp": ts_ms,
                    "operation": str(m.get("operation", "write")).upper(),
                    "operationParameters": {},
                    "engineInfo": "harness-aws-etl-pipeline-spark snaptable export",
                }
            }
        )
        fs.write_bytes(
            f"{log_dir}/{delta_v:020d}.json",
            ("\n".join(json.dumps(a) for a in actions) + "\n").encode("utf-8"),
        )
        n_written += 1
        prev_files = cur
        prev_manifest = m
    if checkpoint:
        _write_checkpoint(
            spark,
            fs,
            log_dir,
            len(versions) - 1,
            prev_files,
            prev_manifest["schema"],
            table_id,
            int(prev_manifest.get("ts", time.time()) * 1000),
        )
    return {
        "delta_versions": n_written,
        "base_snap_version": versions[0],
        "files_live": len(prev_files),
        "checkpoint_version": len(versions) - 1 if checkpoint else None,
    }


_CP_SCHEMA = (
    "add struct<path:string,partitionValues:map<string,string>,size:long,"
    "modificationTime:long,dataChange:boolean,stats:string>, "
    "metaData struct<id:string,format:struct<provider:string,"
    "options:map<string,string>>,schemaString:string,"
    "partitionColumns:array<string>,configuration:map<string,string>,"
    "createdTime:long>, "
    "protocol struct<minReaderVersion:int,minWriterVersion:int>"
)


def _write_checkpoint(
    spark, fs, log_dir: str, version: int, files: dict, schema_str: str,
    table_id: str, ts_ms: int,
) -> None:
    """Classic single-part checkpoint (PROTOCOL.md): one parquet of
    the LIVE add set + metaData + protocol at ``version``, plus the
    ``_last_checkpoint`` pointer. Shaped to what readers fold — remove
    tombstones (VACUUM bookkeeping) are not carried because the export
    has no uncommitted deletes to retain."""
    import posixpath as _pp

    rows = [
        (
            (
                quote(p),
                {},
                int(f.get("bytes", 0)),
                ts_ms,
                True,
                json.dumps({"numRecords": int(f.get("rows", 0))}),
            ),
            None,
            None,
        )
        for p, f in sorted(files.items())
    ]
    rows.append(
        (
            None,
            (
                table_id,
                ("parquet", {}),
                schema_str,
                [],
                {},
                ts_ms,
            ),
            None,
        )
    )
    rows.append((None, None, (1, 2)))
    stage = _pp.join(log_dir, ".cp_stage")
    spark.createDataFrame(rows, _CP_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    part = next(
        rel
        for rel, _mt, _sz in fs.list_files(stage)
        if rel.endswith(".parquet")
    )
    dest = _pp.join(log_dir, f"{version:020d}.checkpoint.parquet")
    fs.delete(dest, recursive=False)
    fs.rename(_pp.join(stage, part), dest)
    fs.delete(stage, recursive=True)
    fs.write_bytes(
        _pp.join(log_dir, "_last_checkpoint"),
        json.dumps({"version": version, "size": len(rows)}).encode("utf-8"),
    )
