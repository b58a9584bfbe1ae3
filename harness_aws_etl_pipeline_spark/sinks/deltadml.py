"""DELETE / UPDATE / MERGE on Delta tables via DELETION VECTORS — no
jar, no rewrite of untouched rows.

Round 12 completes the DML triad across the three lake formats:
``delta_update_where`` (predicate + SET expressions) and
``delta_merge`` (keyed upsert — the Delta sibling of
``iceberg_upsert`` / ``hudi_upsert``) DV-mark the matched old rows
and land the new copies as data files in the SAME atomic commit,
optionally emitting update_preimage/update_postimage/insert rows on
the change data feed. Both refuse to commit if a concurrent delete
touched one of their matched rows (committing would resurrect it as
an updated copy). Partitioned tables work end to end (round-12
follow-up): new files land in their hive partitions with recorded
partitionValues, and updated rows whose SET (or incoming values)
change a partition column simply MIGRATE partitions.

``delta_delete_where`` marks matching rows deleted by writing roaring
deletion vectors (``sources/dvcodec``) instead of rewriting parquet:
the protocol-:math:`\\geq 2` mechanism modern Delta writers use, and
the write-side complement of the reader's round-10 DV support.

Shape per PROTOCOL.md:

- matching row positions are found by ONE distributed scan of the
  live files with ``_metadata.row_index`` + ``_metadata.file_path``
  (grouped per partition tuple so the predicate may reference
  partition columns), collected with a ``limit(max+1)`` bound;
- per affected file the commit carries ``remove`` (the old add) +
  ``add`` of the SAME path with a ``deletionVector`` descriptor —
  inline (z85) under 512 bytes, UUID-addressed ``.bin`` sidecar
  otherwise; an existing DV is UNIONED with the new positions (a DV
  update re-adds the path, which is also why append-only change
  capture refuses such windows);
- the first DV upgrades the table protocol to
  ``minReaderVersion 3 / minWriterVersion 7`` with
  ``deletionVectors`` in both feature lists;
- the commit rides the same put-if-absent claim as ``write_delta``.

Honest bound: matched positions are collected driver-side (DV blobs
are metadata, but a predicate matching hundreds of millions of rows
would not be) — ``max_deleted_rows`` (default 10M) fails loudly with
the advice to use a rewrite-based delete (SnapTable ``delete_where``)
instead.
"""

from __future__ import annotations

import json
import posixpath
import time
import uuid
from urllib.parse import unquote

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs
from harness_aws_etl_pipeline_spark.sources.deltaread import (
    _commit_files,
    _load_dv,
    delta_snapshot,
)
from harness_aws_etl_pipeline_spark.sources.dvcodec import (
    encode_dv_blob,
    frame_dv_file,
    z85_encode,
)

__all__ = ["delta_delete_where", "delta_merge", "delta_update_where"]

_LOG = "_delta_log"
_INLINE_LIMIT = 512  # bytes; larger DVs go to a .bin sidecar


def _live_scan(spark: SparkSession, base: str, snap: dict):
    """One distributed scan of the snapshot's live files carrying
    ``__pos`` (``_metadata.row_index``) and ``__fp`` (scheme-stripped
    file path) plus partition columns reattached as typed literals;
    returns ``(scan, abs_to_key)``. NOTE: reads the raw files — rows
    already marked deleted by existing DVs are INCLUDED; callers
    subtract them where that matters."""
    from harness_aws_etl_pipeline_spark.sources.deltaread import (
        _mapped_read_plan,
    )

    pcols = snap["partition_columns"]
    ptypes = {
        f.name: f.dataType for f in snap["schema"].fields if f.name in pcols
    }
    # column-mapped tables: the scan addresses the files' PHYSICAL
    # layout and restores logical names right after, exactly like
    # read_delta — predicates/SET expressions then see logical names.
    # For an unmapped table this is the plain logical data schema and
    # a no-op rename.
    read_schema, rename = _mapped_read_plan(spark, snap)
    phys = (snap.get("column_mapping") or {}).get("physical") or {}

    def _strip(c):
        return F.regexp_replace(c, "^[a-zA-Z0-9+.-]+:/+", "/")

    # group files per partition tuple (predicates may reference
    # partition columns), key rows by scheme-stripped file path;
    # partitionValues keys are PHYSICAL on mapped tables
    groups: dict[tuple, list[tuple[str, str]]] = {}
    for key, add in snap["files"].items():
        pv = add.get("partitionValues") or {}
        pkey = tuple(pv.get(phys.get(c, c)) for c in pcols)
        groups.setdefault(pkey, []).append(
            (key, posixpath.join(base, unquote(key)))
        )
    abs_to_key: dict[str, str] = {}
    for pairs in groups.values():
        for key, apath in pairs:
            norm = (
                "/" + apath.split("://", 1)[1].lstrip("/")
                if "://" in apath
                else "/" + apath.lstrip("/")
            )
            abs_to_key[norm] = key
    scan = None
    for pkey, pairs in sorted(groups.items(), key=lambda kv: str(kv[0])):
        df = rename(
            spark.read.schema(read_schema).parquet(
                *[apath for _k, apath in pairs]
            ).select(
                "*",
                F.col("_metadata.row_index").alias("__pos"),
                _strip(F.col("_metadata.file_path")).alias("__fp"),
            )
        )
        for c in pcols:
            v = pkey[pcols.index(c)]
            df = df.withColumn(
                c,
                F.lit(v).cast(ptypes[c])
                if v is not None
                else F.lit(None).cast(ptypes[c]),
            )
        scan = df if scan is None else scan.unionByName(df)
    return scan, abs_to_key


def _existing_dv_pairs(fs, base: str, snap: dict) -> list[tuple[str, int]]:
    """(log key, position) of every row the snapshot's DVs already
    mark deleted."""
    out: list[tuple[str, int]] = []
    for key, add in snap["files"].items():
        dv = add.get("deletionVector")
        if dv and dv.get("storageType"):
            out.extend((key, int(i)) for i in _load_dv(fs, base, dv))
    return out


def _dv_descriptors(
    fs, base: str, matches: dict[str, list[int]]
) -> dict[str, dict]:
    """Inline/sidecar DV descriptors for the full per-file position
    lists (existing ∪ fresh). A retry may re-write a sidecar; the
    loser's orphan is never referenced by any commit and is
    vacuum-able."""
    blobs: list[bytes] = []
    descriptors: dict[str, dict] = {}
    sidecar_keys: list[str] = []
    for key, positions in sorted(matches.items()):
        blob = encode_dv_blob(positions)
        if len(blob) <= _INLINE_LIMIT:
            padded = blob + b"\x00" * ((-len(blob)) % 4)
            descriptors[key] = {
                "storageType": "i",
                "pathOrInlineDv": z85_encode(padded),
                "sizeInBytes": len(blob),
                "cardinality": len(positions),
            }
        else:
            sidecar_keys.append(key)
            blobs.append(blob)
    if blobs:
        data, offsets = frame_dv_file(blobs)
        u = uuid.uuid4()
        fs.write_bytes(
            posixpath.join(base, f"deletion_vector_{u}.bin"), data
        )
        enc = z85_encode(u.bytes)
        for key, blob, off in zip(sidecar_keys, blobs, offsets):
            descriptors[key] = {
                "storageType": "u",
                "pathOrInlineDv": enc,
                "offset": off,
                "sizeInBytes": len(blob),
                "cardinality": len(matches[key]),
            }
    return descriptors


def _protocol_upgrade_action(cur: dict) -> dict | None:
    proto = cur["protocol"]
    feats = set(proto.get("readerFeatures") or [])
    if (
        int(proto.get("minReaderVersion", 1)) >= 3
        and "deletionVectors" in feats
    ):
        return None
    return {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": sorted(feats | {"deletionVectors"}),
            "writerFeatures": sorted(
                set(proto.get("writerFeatures") or []) | {"deletionVectors"}
            ),
        }
    }


def _physicalize_for_write(spark: SparkSession, snap: dict, df):
    """``df`` (logical names) → the table's PHYSICAL write layout.
    Name mode: top-level rename + one-level nested struct rebuild
    (the reader's bound — delta_snapshot rejects deeper name-mode
    mapping up front). Id mode: the written files keep LOGICAL column
    names but carry ``parquet.field.id`` metadata at EVERY nesting
    level (id-mode readers — ours included — resolve strictly by
    field id, so names are immaterial and arbitrarily deep nesting
    round-trips); partition columns
    still rename to physical so staging dirs yield physical
    ``partitionValues`` keys. Extra non-table columns (``_change_type``)
    pass through. Unmapped tables return ``df`` unchanged."""
    from pyspark.sql.types import StructField, StructType

    cm = snap.get("column_mapping") or {}
    phys = cm.get("physical") or {}
    mode = cm.get("mode") or "none"
    if not phys:
        return df
    schema = snap["schema"]
    table_fields = {f.name: f for f in schema.fields}
    if mode == "id":
        # Files keep LOGICAL names — id-mode readers (ours included)
        # resolve strictly by field id, so names are immaterial and
        # arbitrarily deep nesting round-trips. FLAT mapped columns
        # attach ``parquet.field.id`` via ``alias(metadata=...)``
        # (cheap, proven); NESTED mapped columns need the metadata in
        # the TYPE, and the only RELIABLE carrier is a
        # ``mapInPandas`` identity whose output schema is used
        # verbatim — ``.to(schema)`` attaches metadata only when its
        # reconciliation happens to insert a projection (verified
        # live: a type-matching column silently loses its id).
        from pyspark.sql.types import ArrayType, MapType

        def _id_md_type(dt, where: str):
            if isinstance(dt, StructType):
                out_f = []
                for sf in dt.fields:
                    cid = (sf.metadata or {}).get("delta.columnMapping.id")
                    if cid is None:
                        raise ValueError(
                            "Delta id-mode column mapping: nested "
                            f"field {where}.{sf.name} carries no "
                            "delta.columnMapping.id"
                        )
                    out_f.append(
                        StructField(
                            sf.name,
                            _id_md_type(
                                sf.dataType, f"{where}.{sf.name}"
                            ),
                            True,
                            {"parquet.field.id": int(cid)},
                        )
                    )
                return StructType(out_f)
            if isinstance(dt, ArrayType):
                return ArrayType(
                    _id_md_type(dt.elementType, where + "[]"),
                    dt.containsNull,
                )
            if isinstance(dt, MapType):
                return MapType(
                    _id_md_type(dt.keyType, where + "{k}"),
                    _id_md_type(dt.valueType, where + "{v}"),
                    dt.valueContainsNull,
                )
            return dt

        def _has_nested_ids(dt) -> bool:
            if isinstance(dt, StructType):
                return any(
                    (sf.metadata or {}).get("delta.columnMapping.id")
                    is not None
                    or _has_nested_ids(sf.dataType)
                    for sf in dt.fields
                )
            if isinstance(dt, ArrayType):
                return _has_nested_ids(dt.elementType)
            if isinstance(dt, MapType):
                return _has_nested_ids(dt.keyType) or _has_nested_ids(
                    dt.valueType
                )
            return False

        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        nested = any(
            f is not None and _has_nested_ids(f.dataType)
            for f in (table_fields.get(c) for c in df.columns)
        )
        if nested:
            out_fields = []
            for c in df.columns:
                f = table_fields.get(c)
                if f is None:
                    out_fields.append(
                        StructField(c, df.schema[c].dataType, True)
                    )
                    continue
                cid = (f.metadata or {}).get("delta.columnMapping.id")
                if cid is None:
                    raise ValueError(
                        "Delta id-mode column mapping: field "
                        f"{c!r} carries no delta.columnMapping.id"
                    )
                out_fields.append(
                    StructField(
                        c,
                        _id_md_type(f.dataType, c),
                        True,
                        {"parquet.field.id": int(cid)},
                    )
                )
            target = StructType(out_fields)

            def _identity(batches):
                yield from batches

            out = df.to(
                StructType(
                    [
                        StructField(f.name, f.dataType, True)
                        for f in out_fields
                    ]
                )
            ).mapInPandas(_identity, target)
        else:
            sel = []
            for c in df.columns:
                f = table_fields.get(c)
                if f is None:
                    sel.append(F.col(c))
                    continue
                cid = (f.metadata or {}).get("delta.columnMapping.id")
                if cid is None:
                    raise ValueError(
                        "Delta id-mode column mapping: field "
                        f"{c!r} carries no delta.columnMapping.id"
                    )
                sel.append(
                    F.col(c).alias(
                        c, metadata={"parquet.field.id": int(cid)}
                    )
                )
            out = df.select(*sel)
        for c in snap["partition_columns"]:
            if c in df.columns and phys.get(c, c) != c:
                out = out.withColumnRenamed(c, phys[c])
        return out
    sel = []
    for c in df.columns:
        f = table_fields.get(c)
        if f is None:
            sel.append(F.col(c))
            continue
        pn = phys.get(c, c)
        col = F.col(c)
        if isinstance(f.dataType, StructType):
            inner = [
                (
                    sf,
                    (sf.metadata or {}).get(
                        "delta.columnMapping.physicalName"
                    )
                    or sf.name,
                )
                for sf in f.dataType.fields
            ]
            if any(ipn != sf.name for sf, ipn in inner):
                ptype = StructType(
                    [
                        StructField(ipn, sf.dataType, sf.nullable)
                        for sf, ipn in inner
                    ]
                )
                col = F.when(
                    col.isNull(), F.lit(None).cast(ptype)
                ).otherwise(
                    F.struct(
                        *[
                            col.getField(sf.name).alias(ipn)
                            for sf, ipn in inner
                        ]
                    ).cast(ptype)
                )
        sel.append(col.alias(pn))
    return df.select(*sel)


def _stage_new_files(
    spark: SparkSession, fs, base: str, df, ts_ms: int,
    pcols: list[str] | None = None,
    snap: dict | None = None,
) -> list[dict]:
    """Write ``df`` as new data files into the table layout (staged +
    exact-ownership move, write_delta's concurrency reasoning) and
    return their add actions (dataChange=true). Partitioned tables
    follow write_delta's conventions exactly: hive dirs carry over,
    partition columns are dropped from the files, and
    ``partitionValues`` come from the directory segments (PHYSICAL
    keys on column-mapped tables, matching the reader)."""
    from urllib.parse import quote

    pcols = list(pcols or [])
    if snap is not None:
        phys = (snap.get("column_mapping") or {}).get("physical") or {}
        df = _physicalize_for_write(spark, snap, df)
        pcols = [phys.get(c, c) for c in pcols]
    stage = posixpath.join(base, f".dml_stage-{uuid.uuid4().hex}")
    adds: list[dict] = []
    try:
        writer = df.write.mode("overwrite")
        if pcols:
            writer = writer.partitionBy(*pcols)
        writer.parquet(stage)
        for rel, _mt, size in fs.list_files(stage):
            if not rel.endswith(".parquet"):
                continue
            if pcols:
                dest_rel = rel  # hive dirs carry over unchanged
                parent = posixpath.dirname(dest_rel)
                if parent:
                    fs.mkdirs(posixpath.join(base, parent))
            else:
                dest_rel = f"part-{uuid.uuid4().hex}.parquet"
            if not fs.rename(
                posixpath.join(stage, rel), posixpath.join(base, dest_rel)
            ):
                raise RuntimeError(f"could not move staged file {rel!r}")
            pv: dict[str, str | None] = {}
            for seg in dest_rel.split("/")[:-1]:
                if "=" in seg:
                    k, _, v = seg.partition("=")
                    if k in pcols:
                        pv[k] = (
                            None
                            if v == "__HIVE_DEFAULT_PARTITION__"
                            else unquote(v)
                        )
            adds.append(
                {
                    "add": {
                        "path": quote(dest_rel, safe="/="),
                        "partitionValues": pv,
                        "size": size,
                        "modificationTime": ts_ms,
                        "dataChange": True,
                    }
                }
            )
    finally:
        fs.delete(stage, recursive=True)
    return adds


def _write_cdc_files(
    spark: SparkSession, fs, base: str, cdc_df, snap: dict | None = None
) -> list[dict]:
    """Distributed write of change rows (table columns +
    ``_change_type``) under ``_change_data/``; returns cdc actions.
    On column-mapped tables the change files follow the table's
    physical layout, like the data files."""
    if snap is not None:
        cdc_df = _physicalize_for_write(spark, snap, cdc_df)
    actions: list[dict] = []
    stage = posixpath.join(base, f".cdc_stage-{uuid.uuid4().hex}")
    try:
        cdc_df.write.mode("overwrite").parquet(stage)
        for rel, _mt, size in fs.list_files(stage):
            if not rel.endswith(".parquet"):
                continue
            fs.mkdirs(posixpath.join(base, "_change_data"))
            dest_rel = f"_change_data/{uuid.uuid4().hex}.parquet"
            if not fs.rename(
                posixpath.join(stage, rel), posixpath.join(base, dest_rel)
            ):
                raise RuntimeError(
                    f"could not move change-data file {rel!r}"
                )
            actions.append(
                {
                    "cdc": {
                        "path": dest_rel,
                        "partitionValues": {},
                        "size": size,
                        "dataChange": False,
                    }
                }
            )
    finally:
        fs.delete(stage, recursive=True)
    return actions


def delta_delete_where(
    spark: SparkSession,
    path: str,
    predicate: str,
    max_deleted_rows: int = 10_000_000,
    max_commit_retries: int = 20,
    change_data: bool | None = None,
) -> dict:
    """Delete rows matching the SQL ``predicate`` by writing deletion
    vectors. Returns ``{"version", "rows_deleted", "files_touched",
    "retries"}``. A predicate matching nothing commits nothing.

    ``change_data`` emits the deleted rows as a CHANGE DATA FEED file
    under ``_change_data/`` plus a ``cdc`` action in the commit (the
    Delta CDF protocol shape) so downstream incremental consumers
    (``delta_changes(cdf=True)``) can represent the delete as
    row-level changes. ``None`` auto-enables when the table sets
    ``delta.enableChangeDataFeed=true``."""
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    snap = delta_snapshot(spark, base)
    if snap["schema"] is None:
        raise ValueError("Delta table has no schema in its metadata")
    if change_data is None:
        change_data = (
            (snap.get("configuration") or {})
            .get("delta.enableChangeDataFeed", "")
            .lower()
            == "true"
        )
    pcols = snap["partition_columns"]

    # ---- find matching (file, row_index) pairs
    scan, abs_to_key = _live_scan(spark, base, snap)
    hits = (
        scan.where(predicate)
        .select("__fp", "__pos")
        .limit(max_deleted_rows + 1)
        .collect()
    )
    if len(hits) > max_deleted_rows:
        raise ValueError(
            f"predicate matches more than {max_deleted_rows} rows; "
            "use a rewrite-based delete (SnapTable delete_where) "
            "for bulk deletion"
        )
    by_key: dict[str, set[int]] = {}
    for r in hits:
        key = abs_to_key.get(r["__fp"])
        if key is not None:
            by_key.setdefault(key, set()).add(int(r["__pos"]))
    if not by_key:
        return {
            "version": snap["version"],
            "rows_deleted": 0,
            "files_touched": 0,
            "retries": 0,
        }

    ts_ms = int(time.time() * 1000)

    # ---- commit loop (put-if-absent, like write_delta). The DV union
    # and descriptors are (re)built against the snapshot the commit is
    # based on — a concurrent delete that lands a DV for the same file
    # between our scan and our winning commit would otherwise be
    # silently overwritten and its rows resurrected.
    log_dir = posixpath.join(base, _LOG)
    retries = 0
    while True:
        commits = _commit_files(fs, log_dir)
        version = (max(commits) + 1) if commits else 0
        cur = delta_snapshot(spark, base, version - 1) if version else snap
        matches: dict[str, list[int]] = {}
        fresh_by_key: dict[str, list[int]] = {}
        total = 0
        for key, pos in sorted(by_key.items()):
            add = cur["files"].get(key)
            if add is None:
                raise ValueError(
                    f"file {key!r} vanished from the snapshot while "
                    "deleting (concurrent rewrite); rerun the delete"
                )
            dv = add.get("deletionVector")
            already: set[int] = set()
            if dv and dv.get("storageType"):
                already = set(_load_dv(fs, base, dv))
            fresh = pos - already
            total += len(fresh)
            if fresh:
                matches[key] = sorted(pos | already)
                fresh_by_key[key] = sorted(fresh)
        if not matches:
            return {
                "version": cur["version"],
                "rows_deleted": 0,
                "files_touched": 0,
                "retries": retries,
            }

        # DV descriptors (inline or one shared .bin sidecar). A retry
        # may re-write a sidecar; the loser's orphan is never
        # referenced by any commit and is vacuum-able.
        blobs: list[bytes] = []
        descriptors: dict[str, dict] = {}
        sidecar_keys: list[str] = []
        for key, positions in sorted(matches.items()):
            blob = encode_dv_blob(positions)
            if len(blob) <= _INLINE_LIMIT:
                padded = blob + b"\x00" * ((-len(blob)) % 4)
                descriptors[key] = {
                    "storageType": "i",
                    "pathOrInlineDv": z85_encode(padded),
                    "sizeInBytes": len(blob),
                    "cardinality": len(positions),
                }
            else:
                sidecar_keys.append(key)
                blobs.append(blob)
        if blobs:
            data, offsets = frame_dv_file(blobs)
            u = uuid.uuid4()
            fs.write_bytes(
                posixpath.join(base, f"deletion_vector_{u}.bin"), data
            )
            enc = z85_encode(u.bytes)
            for key, blob, off in zip(sidecar_keys, blobs, offsets):
                descriptors[key] = {
                    "storageType": "u",
                    "pathOrInlineDv": enc,
                    "offset": off,
                    "sizeInBytes": len(blob),
                    "cardinality": len(matches[key]),
                }

        actions: list[dict] = []
        proto = cur["protocol"]
        feats = set(proto.get("readerFeatures") or [])
        if int(proto.get("minReaderVersion", 1)) < 3 or "deletionVectors" not in feats:
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": sorted(
                            feats | {"deletionVectors"}
                        ),
                        "writerFeatures": sorted(
                            set(proto.get("writerFeatures") or [])
                            | {"deletionVectors"}
                        ),
                    }
                }
            )
        touched = 0
        for key, desc in sorted(descriptors.items()):
            add = cur["files"].get(key)
            if add is None:
                raise ValueError(
                    f"file {key!r} vanished from the snapshot while "
                    "deleting (concurrent rewrite); rerun the delete"
                )
            actions.append(
                {
                    "remove": {
                        "path": key,
                        "deletionTimestamp": ts_ms,
                        "dataChange": True,
                    }
                }
            )
            new_add = {
                k: v
                for k, v in add.items()
                if v is not None and k != "deletionVector"
            }
            new_add["modificationTime"] = ts_ms
            new_add["dataChange"] = True
            new_add["deletionVector"] = desc
            actions.append({"add": new_add})
            touched += 1

        # ---- change data feed: the freshly deleted rows, written as
        # a _change_data/ parquet (table columns + _change_type) and
        # referenced by a cdc action — distributed write, no extra
        # driver materialization beyond the positions already held
        cdc_rels: list[str] = []
        if change_data and fresh_by_key:
            norm_of = {v: k for k, v in abs_to_key.items()}
            pairs = [
                (norm_of[key], int(p))
                for key, fresh in sorted(fresh_by_key.items())
                for p in fresh
            ]
            pairs_df = F.broadcast(
                spark.createDataFrame(pairs, "__fp string, __pos long")
            )
            cdc_df = (
                scan.join(pairs_df, ["__fp", "__pos"])
                .select(*[f.name for f in snap["schema"].fields])
                .withColumn("_change_type", F.lit("delete"))
            )
            cdc_stage = posixpath.join(base, f".cdc_stage-{uuid.uuid4().hex}")
            try:
                cdc_df.write.mode("overwrite").parquet(cdc_stage)
                for rel, _mt, size in fs.list_files(cdc_stage):
                    if not rel.endswith(".parquet"):
                        continue
                    fs.mkdirs(posixpath.join(base, "_change_data"))
                    dest_rel = f"_change_data/{uuid.uuid4().hex}.parquet"
                    if not fs.rename(
                        posixpath.join(cdc_stage, rel),
                        posixpath.join(base, dest_rel),
                    ):
                        raise RuntimeError(
                            f"could not move change-data file {rel!r}"
                        )
                    cdc_rels.append(dest_rel)
                    actions.append(
                        {
                            "cdc": {
                                "path": dest_rel,
                                "partitionValues": {},
                                "size": size,
                                "dataChange": False,
                            }
                        }
                    )
            finally:
                fs.delete(cdc_stage, recursive=True)
        actions.append(
            {
                "commitInfo": {
                    "timestamp": ts_ms,
                    "operation": "DELETE",
                    "operationParameters": {"predicate": predicate},
                    "engineInfo": "harness-aws-etl-pipeline-spark deltadml",
                }
            }
        )
        payload = (
            "\n".join(json.dumps(a) for a in actions) + "\n"
        ).encode("utf-8")
        tmp_dir = posixpath.join(base, ".dlw_tmp")
        fs.mkdirs(tmp_dir)
        tmp = posixpath.join(tmp_dir, f"{uuid.uuid4().hex}-{version:020d}.json")
        fs.write_bytes(tmp, payload)
        dest = posixpath.join(log_dir, f"{version:020d}.json")
        if fs.rename_if_absent(tmp, dest):
            return {
                "version": version,
                "rows_deleted": total,
                "files_touched": touched,
                "retries": retries,
            }
        fs.delete(tmp, recursive=False)
        for rel in cdc_rels:  # unreferenced by any commit; re-written next try
            fs.delete(posixpath.join(base, rel), recursive=False)
        retries += 1
        if retries > max_commit_retries:
            raise RuntimeError(
                f"lost the Delta commit race {retries} times at {base!r}"
            )


def _dml_guards(snap: dict, what: str) -> None:
    if snap["schema"] is None:
        raise ValueError("Delta table has no schema in its metadata")



def _auto_cdf(snap: dict, change_data: bool | None) -> bool:
    if change_data is not None:
        return change_data
    return (
        (snap.get("configuration") or {})
        .get("delta.enableChangeDataFeed", "")
        .lower()
        == "true"
    )


def _cleanup_rels(fs, base: str, actions: list[dict]) -> None:
    for a in actions:
        rel = (a.get("add") or a.get("cdc") or {}).get("path")
        if rel:
            fs.delete(
                posixpath.join(base, unquote(rel)), recursive=False
            )


def _commit_dml_rewrite(
    spark: SparkSession,
    fs,
    base: str,
    by_key: dict[str, set[int]],
    initial_already: dict[str, set[int]],
    new_adds: list[dict],
    cdc_actions: list[dict],
    commit_info: dict,
    max_commit_retries: int,
) -> dict:
    """Shared commit loop for UPDATE/MERGE: DV the matched old rows,
    land the staged new files + change data in ONE atomic commit.
    A concurrent delete that touched one of OUR matched rows between
    the scan and the commit raises loudly — committing would
    resurrect the concurrently-deleted row as its updated copy."""
    ts_ms = commit_info["timestamp"]
    log_dir = posixpath.join(base, _LOG)
    retries = 0
    try:
        while True:
            commits = _commit_files(fs, log_dir)
            version = (max(commits) + 1) if commits else 0
            cur = delta_snapshot(spark, base, version - 1)
            matches: dict[str, list[int]] = {}
            for key, pos in sorted(by_key.items()):
                add = cur["files"].get(key)
                if add is None:
                    raise ValueError(
                        f"file {key!r} vanished from the snapshot "
                        "(concurrent rewrite); rerun the DML"
                    )
                dv = add.get("deletionVector")
                already: set[int] = set()
                if dv and dv.get("storageType"):
                    already = set(_load_dv(fs, base, dv))
                conflict = (already - initial_already.get(key, set())) & pos
                if conflict:
                    raise ValueError(
                        f"{len(conflict)} matched row(s) in {key!r} were "
                        "deleted concurrently; committing would resurrect "
                        "them as updated copies — rerun the DML"
                    )
                matches[key] = sorted(pos | already)
            descriptors = _dv_descriptors(fs, base, matches)
            actions: list[dict] = []
            if descriptors:
                # DV protocol upgrade only when this commit actually
                # writes deletion vectors — a pure-insert merge must
                # not lock out protocol-v1/v2 readers.
                up = _protocol_upgrade_action(cur)
                if up:
                    actions.append(up)
            touched = 0
            for key, desc in sorted(descriptors.items()):
                add = cur["files"][key]
                actions.append(
                    {
                        "remove": {
                            "path": key,
                            "deletionTimestamp": ts_ms,
                            "dataChange": True,
                        }
                    }
                )
                new_add = {
                    k: v
                    for k, v in add.items()
                    if v is not None and k != "deletionVector"
                }
                new_add["modificationTime"] = ts_ms
                new_add["dataChange"] = True
                new_add["deletionVector"] = desc
                actions.append({"add": new_add})
                touched += 1
            actions.extend(new_adds)
            actions.extend(cdc_actions)
            actions.append({"commitInfo": commit_info})
            payload = (
                "\n".join(json.dumps(a) for a in actions) + "\n"
            ).encode("utf-8")
            tmp_dir = posixpath.join(base, ".dlw_tmp")
            fs.mkdirs(tmp_dir)
            tmp = posixpath.join(
                tmp_dir, f"{uuid.uuid4().hex}-{version:020d}.json"
            )
            fs.write_bytes(tmp, payload)
            dest = posixpath.join(log_dir, f"{version:020d}.json")
            if fs.rename_if_absent(tmp, dest):
                return {
                    "version": version,
                    "files_touched": touched,
                    "files_added": len(new_adds),
                    "retries": retries,
                }
            fs.delete(tmp, recursive=False)
            retries += 1
            if retries > max_commit_retries:
                raise RuntimeError(
                    f"lost the Delta commit race {retries} times at {base!r}"
                )
    except BaseException:
        # nothing referenced the staged data/cdc files — reclaim them
        _cleanup_rels(fs, base, new_adds + cdc_actions)
        raise


def delta_update_where(
    spark: SparkSession,
    path: str,
    predicate: str,
    set_exprs: dict[str, str],
    max_updated_rows: int = 10_000_000,
    max_commit_retries: int = 20,
    change_data: bool | None = None,
) -> dict:
    """UPDATE rows matching the SQL ``predicate``: deletion vectors
    mark the old rows and the updated copies (``set_exprs`` =
    ``{column: SQL expression}``, evaluated against the old row) land
    as new data files — ONE atomic commit, no rewrite of untouched
    rows. With ``change_data`` (or ``delta.enableChangeDataFeed``),
    update_preimage/update_postimage rows ride the change data feed.
    Returns ``{"version", "rows_updated", "files_touched",
    "files_added", "retries"}``."""
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    snap = delta_snapshot(spark, base)
    _dml_guards(snap, "delta_update_where")
    change_data = _auto_cdf(snap, change_data)
    cols = [f.name for f in snap["schema"].fields]
    bad = [c for c in set_exprs if c not in cols]
    if bad:
        raise ValueError(f"SET columns not in the table schema: {bad}")

    scan, abs_to_key = _live_scan(spark, base, snap)
    norm_of = {v: k for k, v in abs_to_key.items()}
    existing = _existing_dv_pairs(fs, base, snap)
    initial_already: dict[str, set[int]] = {}
    live = scan
    if existing:
        for key, p in existing:
            initial_already.setdefault(key, set()).add(p)
        rem = F.broadcast(
            spark.createDataFrame(
                [(norm_of[k], p) for k, p in existing],
                "__fp string, __pos long",
            )
        )
        live = scan.join(rem, ["__fp", "__pos"], "left_anti")
    matched = live.where(predicate)
    hits = (
        matched.select("__fp", "__pos")
        .limit(max_updated_rows + 1)
        .collect()
    )
    if len(hits) > max_updated_rows:
        raise ValueError(
            f"predicate matches more than {max_updated_rows} rows; "
            "use a rewrite-based update (SnapTable update_where) for "
            "bulk updates"
        )
    by_key: dict[str, set[int]] = {}
    for r in hits:
        key = abs_to_key.get(r["__fp"])
        if key is not None:
            by_key.setdefault(key, set()).add(int(r["__pos"]))
    if not by_key:
        return {
            "version": snap["version"],
            "rows_updated": 0,
            "files_touched": 0,
            "files_added": 0,
            "retries": 0,
        }

    # ALL SET expressions evaluate against the PRE-update row (SQL
    # UPDATE semantics): one select, so {'a': 'b', 'b': 'a'} swaps —
    # a sequential withColumn chain would feed later SETs the new
    # values of earlier ones.
    updated_out = matched.select(
        *[
            F.expr(set_exprs[c])
            .cast(snap["schema"][c].dataType)
            .alias(c)
            if c in set_exprs
            else F.col(c)
            for c in cols
        ]
    )
    ts_ms = int(time.time() * 1000)
    new_adds = _stage_new_files(
        spark, fs, base, updated_out, ts_ms,
        pcols=snap["partition_columns"], snap=snap,
    )
    cdc_actions: list[dict] = []
    if change_data:
        cdc_df = (
            matched.select(*cols)
            .withColumn("_change_type", F.lit("update_preimage"))
            .unionByName(
                updated_out.withColumn(
                    "_change_type", F.lit("update_postimage")
                )
            )
        )
        cdc_actions = _write_cdc_files(spark, fs, base, cdc_df, snap=snap)
    rep = _commit_dml_rewrite(
        spark, fs, base, by_key, initial_already, new_adds, cdc_actions,
        {
            "timestamp": ts_ms,
            "operation": "UPDATE",
            "operationParameters": {
                "predicate": predicate,
                "set": {c: str(e) for c, e in set_exprs.items()},
            },
            "engineInfo": "harness-aws-etl-pipeline-spark deltadml",
        },
        max_commit_retries,
    )
    rep["rows_updated"] = len(hits)
    return rep


def delta_merge(
    spark: SparkSession,
    df,
    path: str,
    keys: list[str],
    max_matched_rows: int = 10_000_000,
    max_commit_retries: int = 20,
    change_data: bool | None = None,
) -> dict:
    """Keyed MERGE (upsert) into a plain Delta table: incoming rows
    whose key matches a live row REPLACE it (deletion vector on the
    old row + the new copy in this commit's data files); unmatched
    keys INSERT. One atomic commit. Incoming keys must be unique.
    With change data enabled, matched rows ride the feed as
    update_preimage/update_postimage and unmatched as insert.
    A key matching MULTIPLE live rows (non-unique table) replaces
    ALL of them with the single incoming row. Returns ``{"version",
    "rows_updated" (distinct matched keys), "rows_replaced" (live
    rows removed), "rows_inserted", "files_touched", "files_added",
    "retries"}``."""
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    snap = delta_snapshot(spark, base)
    _dml_guards(snap, "delta_merge")
    change_data = _auto_cdf(snap, change_data)
    cols = [f.name for f in snap["schema"].fields]
    missing = [k for k in keys if k not in cols or k not in df.columns]
    if not keys or missing:
        raise ValueError(
            f"merge keys must exist on both sides; missing: {missing}"
        )
    extra = [c for c in cols if c not in df.columns]
    if extra:
        raise ValueError(
            f"incoming frame lacks table columns {extra}; merge writes "
            "whole rows"
        )
    counts = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("k"),
    ).first()
    incoming_total, distinct_keys = int(counts["n"]), int(counts["k"])
    if incoming_total != distinct_keys:
        raise ValueError(
            f"incoming keys must be unique: {incoming_total} rows but "
            f"{distinct_keys} distinct keys"
        )

    scan, abs_to_key = _live_scan(spark, base, snap)
    norm_of = {v: k for k, v in abs_to_key.items()}
    existing = _existing_dv_pairs(fs, base, snap)
    initial_already: dict[str, set[int]] = {}
    live = scan
    if existing:
        for key, p in existing:
            initial_already.setdefault(key, set()).add(p)
        rem = F.broadcast(
            spark.createDataFrame(
                [(norm_of[k], p) for k, p in existing],
                "__fp string, __pos long",
            )
        )
        live = scan.join(rem, ["__fp", "__pos"], "left_anti")
    matched = live.join(df.select(*keys).dropDuplicates(keys), keys)
    hits = (
        matched.select(*keys, "__fp", "__pos")
        .limit(max_matched_rows + 1)
        .collect()
    )
    if len(hits) > max_matched_rows:
        raise ValueError(
            f"merge matches more than {max_matched_rows} live rows; "
            "use SnapTable.merge for bulk keyed rewrites"
        )
    by_key: dict[str, set[int]] = {}
    mkeys: set[tuple] = set()
    for r in hits:
        key = abs_to_key.get(r["__fp"])
        if key is not None:
            by_key.setdefault(key, set()).add(int(r["__pos"]))
            mkeys.add(tuple(r[k] for k in keys))

    ts_ms = int(time.time() * 1000)
    new_adds = _stage_new_files(
        spark, fs, base, df.select(*cols), ts_ms,
        pcols=snap["partition_columns"], snap=snap,
    )
    cdc_actions: list[dict] = []
    if change_data:
        from pyspark.sql.types import StructType

        key_schema = StructType(
            [snap["schema"][k] for k in keys]
        )
        mk = F.broadcast(
            spark.createDataFrame(sorted(mkeys), key_schema)
            if mkeys
            else spark.createDataFrame([], key_schema)
        )
        cdc_df = (
            matched.select(*cols)
            .withColumn("_change_type", F.lit("update_preimage"))
            .unionByName(
                df.join(mk, keys, "left_semi")
                .select(*cols)
                .withColumn("_change_type", F.lit("update_postimage"))
            )
            .unionByName(
                df.join(mk, keys, "left_anti")
                .select(*cols)
                .withColumn("_change_type", F.lit("insert"))
            )
        )
        cdc_actions = _write_cdc_files(spark, fs, base, cdc_df, snap=snap)
    if not by_key:
        # pure insert: no DVs to write — still one atomic commit
        rep = _commit_dml_rewrite(
            spark, fs, base, {}, {}, new_adds, cdc_actions,
            {
                "timestamp": ts_ms,
                "operation": "MERGE",
                "operationParameters": {"keys": keys},
                "engineInfo": "harness-aws-etl-pipeline-spark deltadml",
            },
            max_commit_retries,
        )
    else:
        rep = _commit_dml_rewrite(
            spark, fs, base, by_key, initial_already, new_adds,
            cdc_actions,
            {
                "timestamp": ts_ms,
                "operation": "MERGE",
                "operationParameters": {"keys": keys},
                "engineInfo": "harness-aws-etl-pipeline-spark deltadml",
            },
            max_commit_retries,
        )
    rep["rows_updated"] = len(mkeys)
    # a key can match MULTIPLE live rows (non-unique tables): every
    # one is replaced by the single incoming row — report the count
    rep["rows_replaced"] = len(hits)
    rep["rows_inserted"] = incoming_total - len(mkeys)
    return rep
