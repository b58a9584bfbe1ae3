"""Write Apache Iceberg tables WITHOUT the jar — the writer mirror of
``sources/icebergread`` (as ``sinks/deltawrite`` mirrors
``sources/deltaread``). Targets the HadoopTables / filesystem-catalog
layout of the open spec (iceberg.apache.org/spec):

- data files are plain parquet (written staged, moved with exact
  ownership — same concurrency reasoning as deltawrite);
- each commit writes a MANIFEST (Avro, ``manifest_entry`` records) via
  the in-repo open-spec Avro encoder, a MANIFEST LIST (Avro,
  ``manifest_file`` records), and a new ``metadata/vN.metadata.json``;
- the commit point is the metadata json claimed via PUT-IF-ABSENT
  (``fs.rename_if_absent`` CAS) — exactly the HadoopCatalog's atomic
  version rename; a losing writer re-reads and retries at the next
  version. ``version-hint.text`` is refreshed after the claim (it is a
  hint, not the commit point, per the layout's own semantics);
- appends carry the previous snapshot's manifests forward in the new
  manifest list; overwrite lists only the new manifest (a snapshot IS
  the files its manifest list reaches).

Scope (honest): format v2, unpartitioned tables, append/overwrite
only — no partition specs (identity or hidden), no delete files, no
schema evolution on append (overwrite may change the schema; a new
schema-id is registered). Field ids are assigned sequentially from
the Spark schema on table creation and REUSED by name afterwards.
Per-file ``record_count`` (required by the spec) comes from one
grouped count over this write's files only.
"""

from __future__ import annotations

import json
import posixpath
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs
from harness_aws_etl_pipeline_spark.sources.avroread import write_avro_bytes

__all__ = ["write_iceberg"]

_ENTRY_SCHEMA = json.dumps({
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record", "name": "r2",
            "fields": [
                {"name": "content", "type": "int", "field-id": 134},
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                # spec-required even for unpartitioned tables: an
                # empty struct matching the (empty) partition spec
                {"name": "partition", "field-id": 102, "type": {
                    "type": "record", "name": "r102", "fields": [],
                }},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long",
                 "field-id": 104},
                # null for data/position entries; the equality-delete
                # writer (icebergdml.iceberg_upsert) sets the field ids
                {"name": "equality_ids", "field-id": 135,
                 "type": ["null", {"type": "array", "items": "int"}]},
            ],
        }},
    ],
})

_MLIST_SCHEMA = json.dumps({
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
})


def _spark_to_iceberg(dt, next_id) -> object:
    """Spark type → Iceberg schema type node (primitives + the
    containers the engine's tables use)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        return {
            "type": "struct",
            "fields": [
                {
                    "id": next_id(),
                    "name": f.name,
                    "required": False,
                    "type": _spark_to_iceberg(f.dataType, next_id),
                }
                for f in dt.fields
            ],
        }
    if isinstance(dt, T.ArrayType):
        return {
            "type": "list",
            "element-id": next_id(),
            "element": _spark_to_iceberg(dt.elementType, next_id),
            "element-required": False,
        }
    if isinstance(dt, T.MapType):
        return {
            "type": "map",
            "key-id": next_id(),
            "value-id": next_id(),
            "key": _spark_to_iceberg(dt.keyType, next_id),
            "value": _spark_to_iceberg(dt.valueType, next_id),
            "value-required": False,
        }
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    m = {
        "boolean": "boolean",
        "integer": "int",
        "short": "int",
        "byte": "int",
        "long": "long",
        "float": "float",
        "double": "double",
        "date": "date",
        "timestamp": "timestamptz",
        "timestamp_ntz": "timestamp",
        "string": "string",
        "binary": "binary",
    }.get(dt.typeName())
    if m is None:
        raise ValueError(f"unsupported Spark type for Iceberg: {dt}")
    return m


def _schema_node(df: DataFrame, schema_id: int) -> tuple[dict, int]:
    counter = {"n": 0}

    def next_id() -> int:
        counter["n"] += 1
        return counter["n"]

    node = _spark_to_iceberg(df.schema, next_id)
    node["schema-id"] = schema_id
    return node, counter["n"]


def write_iceberg(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "append",
    max_commit_retries: int = 20,
) -> dict:
    """Write ``df`` as one Iceberg snapshot at ``path``. Returns
    ``{"snapshot_id", "metadata_version", "files_added", "retries"}``.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append or overwrite: {mode!r}")
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    mdir = posixpath.join(base, "metadata")
    ddir = posixpath.join(base, "data")
    fs.mkdirs(mdir)
    fs.mkdirs(ddir)

    # ---- data: staged write + exact-ownership move (deltawrite's
    # concurrency reasoning)
    stage = posixpath.join(base, f".stage-{uuid.uuid4().hex}")
    new_files: dict[str, int] = {}
    try:
        df.write.mode("overwrite").parquet(stage)
        for rel, _mt, size in fs.list_files(stage):
            if not rel.endswith(".parquet"):
                continue
            dest_rel = f"data/{uuid.uuid4().hex}-{posixpath.basename(rel)}"
            if not fs.rename(
                posixpath.join(stage, rel), posixpath.join(base, dest_rel)
            ):
                raise RuntimeError(f"could not move staged file {rel!r}")
            new_files[dest_rel] = size
    finally:
        fs.delete(stage, recursive=True)

    # per-file record counts in ONE job over this write's files only
    counts: dict[str, int] = {}
    if new_files:
        paths = {posixpath.join(base, p): p for p in new_files}
        rows = (
            spark.read.parquet(*paths)
            .select(
                F.regexp_replace(
                    F.col("_metadata.file_path"), "^[a-zA-Z0-9+.-]+:/+", "/"
                ).alias("fp")
            )
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        # scheme-strip both sides so file:/s3a:/hdfs: URIs match the
        # paths we constructed (same normalization as deltaread)
        stripped = {
            "/" + ap.lstrip("/") if "://" not in ap
            else "/" + ap.split("://", 1)[1].lstrip("/"): rel
            for ap, rel in paths.items()
        }
        for r in rows:
            rel = stripped.get(r.fp)
            if rel is not None:
                counts[rel] = int(r.n)

    ts_ms = int(time.time() * 1000)
    retries = 0
    while True:
        # ---- latest metadata (if any)
        cur_version = 0
        md = None
        best = -1
        if fs.exists(mdir):
            import re as _re

            for rel, _mt, _sz in fs.list_files(mdir):
                m = _re.match(r"v(\d+)\.metadata\.json$", posixpath.basename(rel))
                if m and int(m.group(1)) > best:
                    best = int(m.group(1))
            if best >= 0:
                md = json.loads(
                    fs.read_bytes(
                        posixpath.join(mdir, f"v{best}.metadata.json")
                    ).decode("utf-8")
                )
                cur_version = best

        snapshot_id = int(uuid.uuid4().int % (1 << 62)) + 1
        seq = int(md.get("last-sequence-number", 0)) + 1 if md else 1

        # ---- manifest for this write
        entries = [
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "sequence_number": seq,
                "data_file": {
                    "content": 0,
                    # full location-based path, like real clients
                    # (the reader maps it back via the location prefix)
                    "file_path": posixpath.join(base, p),
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": counts.get(p, 0),
                    "file_size_in_bytes": sz,
                    "equality_ids": None,
                },
            }
            for p, sz in sorted(new_files.items())
        ]
        man_rel = f"metadata/{uuid.uuid4().hex}-m0.avro"
        man_bytes = write_avro_bytes(_ENTRY_SCHEMA, entries)
        fs.write_bytes(posixpath.join(base, man_rel), man_bytes)
        rows_added = sum(counts.values())
        new_manifest = {
            "manifest_path": posixpath.join(base, man_rel),
            "manifest_length": len(man_bytes),
            "partition_spec_id": 0,
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(entries),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": rows_added,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }

        # carry previous manifests forward on append
        prev_manifests: list[dict] = []
        if mode == "append" and md and md.get("current-snapshot-id"):
            cur_snap = next(
                (
                    s
                    for s in md.get("snapshots") or []
                    if s.get("snapshot-id") == md["current-snapshot-id"]
                ),
                None,
            )
            if cur_snap is not None:
                from harness_aws_etl_pipeline_spark.sources.avroread import (
                    _iter_container,
                )

                mlist_rel = cur_snap["manifest-list"]
                mlist_path = (
                    mlist_rel
                    if mlist_rel.startswith("/")
                    else posixpath.join(base, mlist_rel)
                )
                _s, _n, recs = _iter_container(fs.read_bytes(mlist_path))
                prev_manifests = list(recs)

        mlist_rel = f"metadata/snap-{snapshot_id}.avro"
        fs.write_bytes(
            posixpath.join(base, mlist_rel),
            write_avro_bytes(
                _MLIST_SCHEMA, prev_manifests + [new_manifest]
            ),
        )

        # ---- new metadata json
        schema_id = 0
        schemas = []
        if md:
            schemas = list(md.get("schemas") or [])
            if not schemas and md.get("schema"):
                schemas = [dict(md["schema"], **{"schema-id": 0})]
        node, last_col = _schema_node(df, 0)
        same = None
        for s in schemas:
            if s.get("fields") == node["fields"]:
                same = s["schema-id"]
                break
        if same is not None:
            schema_id = same
        else:
            schema_id = max((s["schema-id"] for s in schemas), default=-1) + 1
            node["schema-id"] = schema_id
            schemas = schemas + [node]
            if md and mode == "append" and md.get("current-schema-id") is not None:
                raise ValueError(
                    "append schema differs from the table schema; "
                    "overwrite to change it"
                )
        snapshot = {
            "snapshot-id": snapshot_id,
            "timestamp-ms": ts_ms,
            "sequence-number": seq,
            "summary": {"operation": mode},
            "manifest-list": posixpath.join(base, mlist_rel),
            "schema-id": schema_id,
        }
        new_md = {
            "format-version": 2,
            "table-uuid": (md or {}).get("table-uuid") or str(uuid.uuid4()),
            "location": base,
            "last-sequence-number": seq,
            "last-updated-ms": ts_ms,
            "last-column-id": max(
                int((md or {}).get("last-column-id", 0)), last_col
            ),
            "schemas": schemas,
            "current-schema-id": schema_id,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "last-partition-id": 999,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
            "snapshots": ((md or {}).get("snapshots") or []) + [snapshot],
            "current-snapshot-id": snapshot_id,
            "snapshot-log": ((md or {}).get("snapshot-log") or [])
            + [{"snapshot-id": snapshot_id, "timestamp-ms": ts_ms}],
            "metadata-log": [],
        }
        target = posixpath.join(mdir, f"v{cur_version + 1}.metadata.json")
        # temp OUTSIDE metadata/ — concurrent writers list that dir
        # and Hadoop's listing stats each entry (vanishing-file race)
        tmp_dir = posixpath.join(base, ".icw_tmp")
        fs.mkdirs(tmp_dir)
        tmp = posixpath.join(tmp_dir, f"{uuid.uuid4().hex}.json")
        fs.write_bytes(tmp, json.dumps(new_md).encode("utf-8"))
        if fs.rename_if_absent(tmp, target):
            fs.write_bytes(
                posixpath.join(mdir, "version-hint.text"),
                str(cur_version + 1).encode("utf-8"),
            )
            return {
                "snapshot_id": snapshot_id,
                "metadata_version": cur_version + 1,
                "files_added": len(new_files),
                "retries": retries,
            }
        fs.delete(tmp, recursive=False)
        fs.delete(posixpath.join(base, man_rel), recursive=False)
        fs.delete(posixpath.join(base, mlist_rel), recursive=False)
        retries += 1
        if retries > max_commit_retries:
            raise RuntimeError(
                f"lost the Iceberg commit race {retries} times at {base!r}"
            )
