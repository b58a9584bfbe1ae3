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

__all__ = ["stream_to_delta", "write_delta"]

_LOG = "_delta_log"


def write_delta(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    zorder: list[str] | None = None,
    zorder_files: int | None = None,
    stats: bool = True,
    txn: tuple[str, int] | None = None,
    checkpoint_interval: int | None = 10,
    max_commit_retries: int = 20,
    merge_schema: bool = False,
) -> dict:
    """Write ``df`` as one Delta commit at ``path``. Returns
    ``{"version", "files_added", "files_removed", "retries"}``.

    ``zorder`` re-lays rows along the Morton curve of the named
    columns before writing (``operators/zorder.py``; ``zorder_files``
    pins the output file count) — tight per-file bounding boxes that
    the per-file ``stats`` then expose.
    ``stats=True`` (default) records per-file
    numRecords/minValues/maxValues/nullCount for the flat
    atomic-typed columns in one grouped pass over THIS write's files,
    so any Delta client data-skips on the output.

    ``txn=(app_id, version)`` makes the commit IDEMPOTENT via the
    protocol's ``txn`` action (exactly how Delta's own streaming sink
    achieves exactly-once): if the log already records that app at or
    past that version, the write is SKIPPED (``{"skipped": True}``) —
    replays after a crash between data write and commit are safe
    because the data files of an uncommitted attempt are never
    referenced. The check re-runs inside the commit-retry loop, so a
    racing duplicate of the same (app, version) cannot double-commit.
    Pair with ``foreachBatch`` passing ``version=batch_id``
    (:func:`stream_to_delta`).

    ``merge_schema=True`` (appends only) evolves the table schema at
    append time — the Iceberg writer's sibling (and Delta's own
    ``mergeSchema`` option): new top-level columns append to the
    table schema as nullable fields, table columns the batch lacks
    fill with typed nulls, and batch columns whose type upcasts
    losslessly (int→long, float→double) cast to the table's type.
    Type conflicts, nested struct changes, and column-mapped tables
    reject loudly.

    Column-mapped tables (name or id mode) append correctly WITHOUT
    flags: staged files follow the physical layout (renamed columns /
    parquet field ids via the DML writer's machinery), partition
    directories and ``partitionValues`` keys stay physical, and
    per-file stats key physical names — any mapped reader resolves
    the new files. Schema-changing writes on mapped tables reject
    loudly (evolving a mapping needs fresh column ids)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append or overwrite: {mode!r}")
    if txn is not None:
        app_id, app_version = str(txn[0]), int(txn[1])
    if zorder:
        from harness_aws_etl_pipeline_spark.operators.zorder import zorder_by

        # explicit partitions pin the output file count: AQE coalesces
        # small range-shuffles to one partition, which would undo the
        # per-file bounding boxes the layout exists to create
        df = zorder_by(df, zorder, partitions=zorder_files)
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    log_dir = posixpath.join(base, _LOG)
    fs.mkdirs(log_dir)
    pcols = list(partition_by or [])
    missing = [c for c in pcols if c not in df.columns]
    if missing:
        raise ValueError(f"partition_by columns not in DataFrame: {missing}")

    commits = _commit_files(fs, log_dir)
    table_id = str(uuid.uuid4())
    cm_mode = "none"
    df_store, store_pcols = df, pcols
    if commits:
        prev = delta_snapshot(spark, base)
        # the table id is stable for the table's whole life (spec);
        # only a brand-new table mints one
        table_id = prev.get("metadata_id") or table_id
        if sorted(prev["partition_columns"]) != sorted(pcols):
            raise ValueError(
                f"table is partitioned by {prev['partition_columns']}, "
                f"got partition_by={pcols}"
            )
        if txn is not None and prev["txns"].get(app_id, -1) >= app_version:
            return {
                "version": prev["version"],
                "files_added": 0,
                "files_removed": 0,
                "retries": 0,
                "skipped": True,
            }
        cm = prev.get("column_mapping") or {}
        cm_mode = cm.get("mode") or "none"
        if merge_schema and mode == "append" and prev["schema"] is not None:
            if cm_mode != "none":
                raise ValueError(
                    "merge_schema on a column-mapped table is not "
                    "supported — evolving a mapping needs fresh "
                    "column ids"
                )
            df = _merge_append_schema(df, prev["schema"])
            df_store = df
        if cm.get("physical"):
            from harness_aws_etl_pipeline_spark.sinks.deltadml import (
                _physicalize_for_write,
            )

            if prev["schema"] is not None and _schema_shape(
                prev["schema"]
            ) != _schema_shape(df.schema):
                raise ValueError(
                    "schema-changing writes on a column-mapped table "
                    "are not supported — evolving a mapping needs "
                    "fresh column ids"
                )
            df_store = _physicalize_for_write(spark, prev, df)
            store_pcols = [cm["physical"].get(c, c) for c in pcols]

    # ---- data: stage into a unique temp dir, then move files into
    # the table layout. Listing-diff against the live dir would race a
    # concurrent writer (its files could appear inside our window and
    # get claimed); the staged move gives EXACT ownership of this
    # write's files. Spark part-file names embed a fresh UUID per
    # write, so the moves cannot collide either.
    stage = posixpath.join(base, f".stage-{uuid.uuid4().hex}")
    try:
        writer = df_store.write.mode("overwrite")
        if store_pcols:
            writer = writer.partitionBy(*store_pcols)
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

    file_stats: dict[str, str] = (
        _collect_stats(spark, base, sorted(new_files), df_store, store_pcols)
        if stats and new_files
        else {}
    )

    def _partition_values(rel: str) -> dict[str, str]:
        vals: dict[str, str] = {}
        for seg in rel.split("/")[:-1]:
            if "=" in seg:
                k, _, v = seg.partition("=")
                if k in store_pcols:
                    vals[k] = (
                        None
                        if v == "__HIVE_DEFAULT_PARTITION__"
                        else unquote(v)
                    )
        return vals

    adds = []
    for p, sz in sorted(new_files.items()):
        add = {
            "path": quote(p, safe="/="),
            "partitionValues": _partition_values(p),
            "size": sz,
            "modificationTime": ts_ms,
            "dataChange": True,
        }
        if p in file_stats:
            add["stats"] = file_stats[p]
        adds.append({"add": add})

    schema_str = df.schema.json()
    meta_action = {
        "metaData": {
            "id": table_id,
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

            if prev["schema"] is not None and _schema_shape(
                prev["schema"]
            ) != _schema_shape(df.schema):
                if mode == "overwrite":
                    if cm_mode != "none":
                        raise ValueError(
                            "schema-changing writes on a column-mapped "
                            "table are not supported — evolving a "
                            "mapping needs fresh column ids"
                        )
                    actions.append(meta_action)
                elif merge_schema:
                    # a racing evolver may have widened the table since
                    # staging: the metaData this commit claims is the
                    # union of the CURRENT table schema and the staged
                    # columns (racer-added columns read as nulls from
                    # this write's files)
                    from pyspark.sql.types import StructType

                    have = {f.name for f in prev["schema"].fields}
                    prev_types = {
                        f.name: f.dataType.simpleString()
                        for f in prev["schema"].fields
                    }
                    conflicts = [
                        f.name
                        for f in df.schema.fields
                        if f.name in have
                        and f.dataType.simpleString() != prev_types[f.name]
                    ]
                    if conflicts:
                        raise ValueError(
                            "merge_schema lost a race to a conflicting "
                            f"schema change on column(s) {conflicts}"
                        )
                    union = StructType(
                        list(prev["schema"].fields)
                        + [
                            f
                            for f in df.schema.fields
                            if f.name not in have
                        ]
                    )
                    evolved_meta = {
                        "metaData": {
                            **meta_action["metaData"],
                            "schemaString": union.json(),
                        }
                    }
                    actions.append(evolved_meta)
                else:
                    raise ValueError(
                        "append schema differs from the table schema; "
                        "overwrite to change it or pass "
                        "merge_schema=True to evolve it"
                    )
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
        if txn is not None and version > 0:
            # the race re-check: a concurrent duplicate of the same
            # (app, version) may have landed since the pre-check
            if prev["txns"].get(app_id, -1) >= app_version:
                return {
                    "version": version - 1,
                    "files_added": 0,
                    "files_removed": 0,
                    "retries": retries,
                    "skipped": True,
                }
        if txn is not None:
            actions.append(
                {"txn": {"appId": app_id, "version": app_version,
                          "lastUpdated": ts_ms}}
            )
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
        # the temp file lives OUTSIDE _delta_log: a concurrent writer
        # listing the log while this one deletes a lost-race temp hits
        # Hadoop's stat-each-entry listing race (observed as "ls:
        # cannot access .tmp-..." flakes in the two-writer test)
        tmp_dir = posixpath.join(base, ".dlw_tmp")
        fs.mkdirs(tmp_dir)
        tmp = posixpath.join(
            tmp_dir, f"{uuid.uuid4().hex}-{version:020d}.json"
        )
        fs.write_bytes(tmp, payload)
        dest = posixpath.join(log_dir, f"{version:020d}.json")
        if fs.rename_if_absent(tmp, dest):
            if (
                checkpoint_interval
                and version > 0
                and (version + 1) % checkpoint_interval == 0
            ):
                try:
                    _write_classic_checkpoint(spark, fs, base, version)
                except Exception:  # noqa: BLE001 - checkpoint is an optimization
                    pass  # the JSON log remains the source of truth
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


def _schema_shape(sch) -> list[tuple[str, str]]:
    return [(f.name, f.dataType.simpleString()) for f in sch.fields]


# lossless upcasts merge_schema applies silently (batch type → table
# type); anything else is a conflict
_UPCASTS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("float", "double"),
}


def _merge_append_schema(df: DataFrame, table_schema) -> DataFrame:
    """``df`` conformed to the union of the table schema and its own:
    table columns first (cast to the table's type — lossless upcasts
    only — or typed nulls when the batch lacks them), then the
    batch's NEW columns in batch order (forced nullable). Type
    conflicts and nested struct changes raise."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    batch = {f.name: f for f in df.schema.fields}
    sel = []
    for f in table_schema.fields:
        b = batch.get(f.name)
        if b is None:
            sel.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        bt, tt = b.dataType.simpleString(), f.dataType.simpleString()
        if bt == tt:
            sel.append(F.col(f.name))
        elif bt == "void" or (bt, tt) in _UPCASTS:
            sel.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(
                f"merge_schema type conflict on column {f.name!r}: "
                f"table has {tt}, batch has {bt} (only lossless "
                "upcasts are applied)"
            )
    have = {f.name for f in table_schema.fields}
    new = [f for f in df.schema.fields if f.name not in have]
    for f in new:
        sel.append(F.col(f.name))
    out = df.select(*sel)
    if not new:
        return out
    # new columns must be nullable in the evolved table schema —
    # re-assert via the plan schema so the metaData records them so
    forced = StructType(
        [
            StructField(f.name, f.dataType, True, f.metadata)
            if f.name in {n.name for n in new}
            else f
            for f in out.schema.fields
        ]
    )
    return out.to(forced)


_STATS_TYPES = (
    "boolean", "byte", "short", "integer", "long", "float", "double",
    "string", "date", "timestamp", "timestamp_ntz", "decimal",
)


def _collect_stats(
    spark: SparkSession,
    base: str,
    rel_paths: list[str],
    df: DataFrame,
    pcols: list[str],
) -> dict[str, str]:
    """Per-file Delta stats JSON (numRecords / minValues / maxValues /
    nullCount) for flat atomic-typed non-partition columns — ONE
    grouped aggregation over this write's files keyed by
    scheme-stripped ``_metadata.file_path``."""
    from pyspark.sql import functions as F

    cols = [
        f.name
        for f in df.schema.fields
        if f.name not in pcols
        and f.dataType.typeName().split("(")[0] in _STATS_TYPES
    ]
    abs_to_rel = {}
    for rel in rel_paths:
        ap = f"{base}/{rel}"
        key = (
            "/" + ap.split("://", 1)[1].lstrip("/")
            if "://" in ap
            else "/" + ap.lstrip("/")
        )
        abs_to_rel[key] = rel
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.min(c).alias(f"__mn_{c}"))
        aggs.append(F.max(c).alias(f"__mx_{c}"))
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nc_{c}"))
    plan = (
        spark.read.parquet(*[f"{base}/{r}" for r in rel_paths])
        .select(
            F.regexp_replace(
                F.col("_metadata.file_path"), "^[a-zA-Z0-9+.-]+:/+", "/"
            ).alias("__fp"),
            *[F.col(c) for c in cols],
        )
        .groupBy("__fp")
        .agg(*aggs)
    )
    # collect under UTC — PySpark renders timestamps in the SESSION
    # zone, and Delta stats are UTC-normalized ("...Z"); a non-UTC
    # session would shift min/max and mislead external data-skippers
    tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        rows = plan.collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)

    import datetime as _dt
    import decimal as _dec
    import re as _re

    _DEC_OPEN, _DEC_CLOSE = "\x00dec:", "\x00"

    def _j(v):
        if isinstance(v, _dt.datetime):
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            return (
                v.strftime("%Y-%m-%dT%H:%M:%S.")
                + f"{v.microsecond // 1000:03d}Z"
            )
        if isinstance(v, _dt.date):
            return v.isoformat()
        if isinstance(v, _dec.Decimal):
            # exact: marked here, spliced into the JSON as a raw
            # number below (str(Decimal) is valid JSON number syntax)
            return _DEC_OPEN + str(v) + _DEC_CLOSE
        return v

    def _splice_decimals(s: str) -> str:
        return _re.sub(
            r'"\\u0000dec:(-?[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)'
            r'\\u0000"',
            r"\1",
            s,
        )

    out: dict[str, str] = {}
    for r in rows:
        rel = abs_to_rel.get(r["__fp"])
        if rel is None:
            continue
        out[rel] = _splice_decimals(
            json.dumps(
                {
                    "numRecords": int(r["__n"]),
                    "minValues": {c: _j(r[f"__mn_{c}"]) for c in cols},
                    "maxValues": {c: _j(r[f"__mx_{c}"]) for c in cols},
                    "nullCount": {c: int(r[f"__nc_{c}"]) for c in cols},
                }
            )
        )
    return out


def stream_to_delta(
    stream_df: DataFrame,
    path: str,
    app_id: str,
    checkpoint_location: str,
    mode: str = "append",
    available_now: bool = True,
    **write_kwargs,
):
    """Exactly-once streaming sink into a Delta table: every
    micro-batch commits through :func:`write_delta` with
    ``txn=(app_id, batch_id)``, so a batch replayed after a crash
    between the data write and the commit (or after a checkpoint
    rollback) is recognized in the log and skipped — the same
    ``txn``-action mechanism Delta's own streaming sink uses.

    Returns the configured ``DataStreamWriter`` — call ``.start()``
    (``available_now=True`` drains the source and stops, the batch
    ingestion trigger used across the engine's streaming tier)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        write_delta(
            batch_df.sparkSession,
            batch_df,
            path,
            mode=mode,
            txn=(app_id, int(batch_id)),
            **write_kwargs,
        )

    writer = stream_df.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_location
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


_CP_SCHEMA = (
    "add struct<path:string,partitionValues:map<string,string>,size:long,"
    "modificationTime:long,dataChange:boolean,stats:string,"
    "deletionVector:struct<storageType:string,pathOrInlineDv:string,"
    "offset:int,sizeInBytes:int,cardinality:long>>, "
    "metaData struct<id:string,format:struct<provider:string,"
    "options:map<string,string>>,schemaString:string,"
    "partitionColumns:array<string>,configuration:map<string,string>,"
    "createdTime:long>, "
    "protocol struct<minReaderVersion:int,minWriterVersion:int,"
    "readerFeatures:array<string>>, "
    "txn struct<appId:string,version:long,lastUpdated:long>"
)


def _write_classic_checkpoint(
    spark: SparkSession, fs, base: str, version: int
) -> None:
    """Classic single-part checkpoint at ``version``: the live add
    set, metaData, protocol AND the txn ledger (without the txn rows a
    checkpoint would amnesia the idempotence state once the JSON
    commits it supersedes are cleaned). Plus ``_last_checkpoint``."""
    snap = delta_snapshot(spark, base, version)
    rows = []
    for p, add in sorted(snap["files"].items()):
        dv = add.get("deletionVector")
        dv_t = (
            (
                dv.get("storageType"),
                dv.get("pathOrInlineDv"),
                dv.get("offset"),
                dv.get("sizeInBytes"),
                dv.get("cardinality"),
            )
            if dv and dv.get("storageType")
            else None
        )
        rows.append((
            (
                p,
                add.get("partitionValues") or {},
                int(add.get("size") or 0),
                int(add.get("modificationTime") or 0),
                bool(add.get("dataChange", True)),
                add.get("stats"),
                dv_t,
            ),
            None, None, None,
        ))
    schema_str = snap["schema"].json() if snap["schema"] is not None else None
    rows.append((
        None,
        ("deltawrite", ("parquet", {}), schema_str,
         snap["partition_columns"], {}, 0),
        None, None,
    ))
    proto = snap["protocol"]
    rows.append((
        None, None,
        (int(proto.get("minReaderVersion", 1)),
         int(proto.get("minWriterVersion", 2)),
         proto.get("readerFeatures")),
        None,
    ))
    for app, ver in sorted(snap["txns"].items()):
        rows.append((None, None, None, (app, int(ver), 0)))
    log_dir = posixpath.join(base, _LOG)
    stage = posixpath.join(base, ".dlw_tmp", f"cp-{uuid.uuid4().hex}")
    spark.createDataFrame(rows, _CP_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    part = next(
        rel
        for rel, _mt, _sz in fs.list_files(stage)
        if rel.endswith(".parquet")
    )
    dest = posixpath.join(log_dir, f"{version:020d}.checkpoint.parquet")
    fs.rename_if_absent(posixpath.join(stage, part), dest)
    fs.delete(stage, recursive=True)
    fs.write_bytes(
        posixpath.join(log_dir, "_last_checkpoint"),
        json.dumps({"version": version, "size": len(rows)}).encode("utf-8"),
    )
