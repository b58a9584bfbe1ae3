"""DELETE on Delta tables via DELETION VECTORS — no jar, no rewrite.

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

__all__ = ["delta_delete_where"]

_LOG = "_delta_log"
_INLINE_LIMIT = 512  # bytes; larger DVs go to a .bin sidecar


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
    if (snap.get("column_mapping") or {}).get("physical"):
        raise ValueError(
            "delta_delete_where does not support column-mapped tables yet"
        )

    # ---- find matching (file, row_index) pairs
    from pyspark.sql.types import StructType

    data_schema = StructType(
        [f for f in snap["schema"].fields if f.name not in pcols]
    )
    ptypes = {f.name: f.dataType for f in snap["schema"].fields if f.name in pcols}

    def _strip(c):
        return F.regexp_replace(c, "^[a-zA-Z0-9+.-]+:/+", "/")

    # one scan for ALL matches: group files per partition tuple (the
    # predicate may reference partition columns), key rows by
    # scheme-stripped _metadata.file_path, bound the collect
    groups: dict[tuple, list[tuple[str, str]]] = {}
    for key, add in snap["files"].items():
        pv = add.get("partitionValues") or {}
        pkey = tuple(pv.get(c) for c in pcols)
        groups.setdefault(pkey, []).append(
            (key, posixpath.join(base, unquote(key)))
        )
    abs_to_key = {}
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
        df = spark.read.schema(data_schema).parquet(
            *[apath for _k, apath in pairs]
        ).select(
            "*",
            F.col("_metadata.row_index").alias("__pos"),
            _strip(F.col("_metadata.file_path")).alias("__fp"),
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
