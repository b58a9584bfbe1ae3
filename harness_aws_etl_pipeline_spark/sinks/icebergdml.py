"""DELETE on Iceberg tables via v2 POSITION DELETES — no jar, no
rewrite: the Iceberg mirror of ``sinks/deltadml.delta_delete_where``
(same capped probe-then-write shape).

Per the open spec (iceberg.apache.org/spec#position-delete-files):

- matching ``(data file, row position)`` pairs come from ONE
  distributed scan of the live data files with
  ``_metadata.row_index`` / ``_metadata.file_path``, with already
  position-deleted rows anti-joined out BEFORE the bounded collect
  (a repeat delete is a no-op commit, and ``rows_deleted`` counts
  fresh rows only);
- the delete rows are written as a plain parquet of
  ``(file_path, pos)`` — ``file_path`` holding the data file's
  manifest-recorded path, columns tagged with the spec's reserved
  field ids 2147483546/2147483545 via parquet field-id metadata;
- the commit adds a DELETE manifest (entry content=1) to a new
  manifest list that carries every previous manifest forward, at the
  next sequence number, and claims ``vN+1.metadata.json`` by CAS —
  exactly ``write_iceberg``'s commit protocol, so racing writers
  retry cleanly.

Honest bounds: matched positions are collected driver-side
(``max_deleted_rows``, default 10M, fails loudly toward a
rewrite-based delete); tables carrying live EQUALITY deletes are
refused (the raw probe scan cannot see through them) — compact
first.

PARTITIONED tables (round 13): DML is spec-aware. Position-delete
files are written ONE PER PARTITION of the data files they reference,
and both delete and upsert manifest entries carry the referenced /
staged files' real partition values under the table's default spec id
(before this, DML hardcoded empty partition structs + spec id 0 —
spec-inconsistent metadata on partitioned tables). ``iceberg_upsert``
stages its new data files through ``write_iceberg``'s exact
partitioned staging (hive layout under the spec transforms), and its
global equality delete rides an UNPARTITIONED spec per the spec's
global-delete rule (one is added to ``partition-specs`` if the table
has none). A commit-time guard re-checks the spec signature so a
concurrent spec change can never land old-spec values.
"""

from __future__ import annotations

import json
import posixpath
import re
import time
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs
from harness_aws_etl_pipeline_spark.sinks.icebergwrite import (
    _ENTRY_SCHEMA,
    _MLIST_SCHEMA,
    _entry_schema,
    _field_meta,
    _stage_data_files,
)
from harness_aws_etl_pipeline_spark.sources.avroread import (
    _iter_container,
    write_avro_bytes,
)
from harness_aws_etl_pipeline_spark.sources.icebergread import (
    _latest_metadata,
    iceberg_snapshot,
)

__all__ = ["iceberg_delete_where", "iceberg_upsert"]


def _strip(p: str) -> str:
    return (
        "/" + p.split("://", 1)[1].lstrip("/")
        if "://" in p
        else "/" + p.lstrip("/")
    )


def _dml_spec_fields(
    md: dict, descs: list[dict], schema, op: str
) -> tuple[int, list[dict]]:
    """Commit-time spec resolution for DML: re-check that the table's
    default partition spec still matches the descriptors the probe /
    staging ran under (a concurrent overwrite can change the spec —
    committing old-spec partition values against a new spec id would
    be exactly the metadata corruption this round fixed), and return
    ``(default_spec_id, part_fields)`` where ``part_fields`` feeds
    ``_entry_schema`` (empty for unpartitioned tables)."""
    from harness_aws_etl_pipeline_spark.sources.icebergpart import (
        spec_transforms,
    )

    cur = [
        d
        for d in (spec_transforms(md) or [])
        if d["kind"] != "void"
    ]

    def _sig(ds):
        return [(d["kind"], d["param"], d["source"], d["field"]) for d in ds]

    if _sig(cur) != _sig(descs):
        raise ValueError(
            f"{op}: the table's partition spec changed concurrently "
            "(staged files/values follow the old spec); rerun the DML"
        )
    spec_id = int(md.get("default-spec-id", 0))
    if not descs:
        return spec_id, []
    _parse, field_avro, _types = _field_meta(descs, schema)
    part_fields = [
        {
            "name": d["field"],
            "avro": field_avro[d["field"]],
            "field-id": d.get("field_id") or (1000 + i),
        }
        for i, d in enumerate(descs)
    ]
    return spec_id, part_fields


def iceberg_delete_where(
    spark: SparkSession,
    path: str,
    predicate: str,
    max_deleted_rows: int = 10_000_000,
    max_commit_retries: int = 20,
) -> dict:
    """Delete rows matching the SQL ``predicate`` by writing a v2
    position-delete file + snapshot. Returns ``{"version" (snapshot
    id), "rows_deleted", "files_touched", "retries"}``."""
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    snap = iceberg_snapshot(spark, base)
    if snap.get("equality_delete_files"):
        raise ValueError(
            "table carries live equality deletes; the probe scan "
            "cannot see through them — compact first"
        )
    if not snap["files"]:
        return {
            "version": snap["snapshot_id"],
            "rows_deleted": 0,
            "files_touched": 0,
            "retries": 0,
        }
    origin_of = snap.get("origin_of") or {}
    # partitioned table: delete entries must carry the referenced data
    # file's REAL partition values under the table's spec (an empty
    # struct against a partitioned spec is metadata external readers
    # cannot decode)
    descs = [
        d
        for d in (snap.get("partition_spec_transforms") or [])
        if d["kind"] != "void"
    ]
    part_by_origin: dict[str, dict] = {}
    if descs:
        fields = [d["field"] for d in descs]
        pof = snap.get("partition_of") or {}
        uncovered = [
            f
            for f in snap["files"]
            if any(k not in (pof.get(f) or {}) for k in fields)
        ]
        if uncovered:
            raise ValueError(
                f"{len(uncovered)} live data file(s) carry no partition "
                "metadata for the table's spec (older specs or foreign "
                "writers) — iceberg_compact first, then rerun the delete"
            )
        for f in snap["files"]:
            part_by_origin[origin_of.get(f, f)] = {
                k: pof[f].get(k) for k in fields
            }

    # ---- probe: (manifest-recorded file path, row position) pairs
    scan = (
        spark.read.schema(snap["schema"])
        .parquet(*snap["files"])
        .select(
            "*",
            F.regexp_replace(
                F.col("_metadata.file_path"), "^[a-zA-Z0-9+.-]+:/+", "/"
            ).alias("__fp"),
            F.col("_metadata.row_index").alias("__pos"),
        )
    )
    mp = F.broadcast(
        spark.createDataFrame(
            [(_strip(f), origin_of.get(f, f)) for f in snap["files"]],
            "__fp string, file_path string",
        )
    )
    hits_df = (
        scan.where(predicate)
        .select("__fp", "__pos")
        .join(mp, "__fp")
        .select("file_path", F.col("__pos").alias("pos"))
    )
    pos_dels = snap.get("position_delete_files") or []
    if pos_dels:
        existing = spark.read.schema("file_path string, pos long").parquet(
            *pos_dels
        )
        hits_df = hits_df.join(existing, ["file_path", "pos"], "left_anti")
    hits = hits_df.limit(max_deleted_rows + 1).collect()
    if len(hits) > max_deleted_rows:
        raise ValueError(
            f"predicate matches more than {max_deleted_rows} live rows; "
            "use a rewrite-based delete (SnapTable delete_where) for "
            "bulk deletion"
        )
    if not hits:
        return {
            "version": snap["snapshot_id"],
            "rows_deleted": 0,
            "files_touched": 0,
            "retries": 0,
        }
    del_rows = sorted((r.file_path, int(r.pos)) for r in hits)
    touched = len({f for f, _ in del_rows})
    live_keys = {origin_of.get(f, f) for f in snap["files"]}

    # ---- the position-delete parquet(s) (spec-reserved field ids).
    # On a partitioned table delete rows are grouped by the REFERENCED
    # data file's partition tuple — one delete file per partition, so
    # every manifest entry carries real partition values under the
    # table's spec and external readers can prune delete files exactly
    # like data files.
    from pyspark.sql import types as T

    def _ptuple(fp: str) -> tuple:
        pv = part_by_origin.get(fp) or {}
        return tuple(pv.get(d["field"]) for d in descs)

    groups: dict[tuple, list[tuple[str, int]]] = {}
    for fp, pos in del_rows:
        groups.setdefault(_ptuple(fp), []).append((fp, pos))
    toks = {pt: str(i) for i, pt in enumerate(sorted(groups, key=repr))}
    part_of_tok = {
        toks[pt]: dict(zip([d["field"] for d in descs], pt))
        for pt in groups
    }
    count_of_tok = {toks[pt]: len(rows_) for pt, rows_ in groups.items()}

    del_schema = T.StructType(
        [
            T.StructField(
                "file_path", T.StringType(), False,
                {"parquet.field.id": 2147483546},
            ),
            T.StructField(
                "pos", T.LongType(), False,
                {"parquet.field.id": 2147483545},
            ),
            T.StructField("__tok", T.StringType(), False),
        ]
    )
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    stage = posixpath.join(base, f".stage-{uuid.uuid4().hex}")
    # del_files: rel path → (size, record_count, partition values)
    del_files: dict[str, tuple[int, int, dict]] = {}
    ts_ms = int(time.time() * 1000)
    retries = 0
    try:
        staged_rows = [
            (fp, pos, toks[pt])
            for pt, rows_ in groups.items()
            for fp, pos in rows_
        ]
        # repartition(1) + partitionBy → exactly ONE file per group
        # (driver-bounded rows by max_deleted_rows, same as before)
        spark.createDataFrame(staged_rows, del_schema).repartition(
            1
        ).write.partitionBy("__tok").mode("overwrite").parquet(stage)
        for rel, _mt, sz in fs.list_files(stage):
            if not rel.endswith(".parquet"):
                continue
            tok = next(
                (
                    comp.split("=", 1)[1]
                    for comp in rel.split("/")[:-1]
                    if comp.startswith("__tok=")
                ),
                "0",
            )
            dest_rel = f"data/{uuid.uuid4().hex}-deletes.parquet"
            if not fs.rename(
                posixpath.join(stage, rel), posixpath.join(base, dest_rel)
            ):
                raise RuntimeError("could not move staged delete file")
            del_files[dest_rel] = (
                sz,
                count_of_tok[tok],
                part_of_tok[tok],
            )
    finally:
        fs.delete(stage, recursive=True)
    assert sum(c for _s, c, _p in del_files.values()) == len(del_rows)

    # ---- commit loop (CAS on vN+1.metadata.json, like write_iceberg)
    mdir = posixpath.join(base, "metadata")
    while True:
        md = json.loads(
            fs.read_bytes(_latest_metadata(fs, base)).decode("utf-8")
        )
        cur_version = 0
        for rel, _mt, _sz in fs.list_files(mdir):
            m = re.match(
                r"v(\d+)\.metadata\.json$", posixpath.basename(rel)
            )
            if m:
                cur_version = max(cur_version, int(m.group(1)))
        if int(md.get("format-version", 1)) < 2:
            raise ValueError(
                "position deletes need an Iceberg format-version 2 table"
            )
        # the referenced data files must still be live (a concurrent
        # rewrite would orphan the delete rows)
        cur_snap = iceberg_snapshot(spark, base)
        cur_live = {
            (cur_snap.get("origin_of") or {}).get(f, f)
            for f in cur_snap["files"]
        }
        if not live_keys <= cur_live:
            raise ValueError(
                "referenced data file(s) vanished from the snapshot "
                "while deleting (concurrent rewrite); rerun the delete"
            )
        spec_id, part_fields = _dml_spec_fields(
            md, descs, snap["schema"], "iceberg_delete_where"
        )
        snapshot_id = int(uuid.uuid4().int % (1 << 62)) + 1
        seq = int(md.get("last-sequence-number", 0)) + 1
        entries = [
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": seq,
                "data_file": {
                    "content": 1,  # position deletes
                    "file_path": posixpath.join(base, rel_),
                    "file_format": "PARQUET",
                    "partition": pvals,
                    "record_count": cnt,
                    "file_size_in_bytes": sz,
                    "equality_ids": None,
                },
            }
            for rel_, (sz, cnt, pvals) in sorted(del_files.items())
        ]
        man_rel = f"metadata/{uuid.uuid4().hex}-d0.avro"
        man_bytes = write_avro_bytes(
            _entry_schema(part_fields) if part_fields else _ENTRY_SCHEMA,
            entries,
        )
        fs.write_bytes(posixpath.join(base, man_rel), man_bytes)
        new_manifest = {
            "manifest_path": posixpath.join(base, man_rel),
            "manifest_length": len(man_bytes),
            "partition_spec_id": spec_id,
            "content": 1,  # deletes manifest
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(entries),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": len(del_rows),
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }
        prev_manifests: list[dict] = []
        cur_md_snap = next(
            (
                s
                for s in md.get("snapshots") or []
                if s.get("snapshot-id") == md.get("current-snapshot-id")
            ),
            None,
        )
        if cur_md_snap is not None:
            mlist_rel = cur_md_snap["manifest-list"]
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
            write_avro_bytes(_MLIST_SCHEMA, prev_manifests + [new_manifest]),
        )
        snapshot = {
            "snapshot-id": snapshot_id,
            "timestamp-ms": ts_ms,
            "sequence-number": seq,
            "summary": {"operation": "delete"},
            "manifest-list": posixpath.join(base, mlist_rel),
            "schema-id": md.get("current-schema-id", 0),
        }
        new_md = dict(md)
        new_md["last-sequence-number"] = seq
        new_md["last-updated-ms"] = ts_ms
        new_md["snapshots"] = (md.get("snapshots") or []) + [snapshot]
        new_md["current-snapshot-id"] = snapshot_id
        new_md["snapshot-log"] = (md.get("snapshot-log") or []) + [
            {"snapshot-id": snapshot_id, "timestamp-ms": ts_ms}
        ]
        target = posixpath.join(mdir, f"v{cur_version + 1}.metadata.json")
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
                "version": snapshot_id,
                "rows_deleted": len(del_rows),
                "files_touched": touched,
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


def iceberg_upsert(
    spark: SparkSession,
    path: str,
    df,
    keys: list[str],
    max_commit_retries: int = 20,
) -> dict:
    """Keyed UPSERT as ONE atomic snapshot — the Flink streaming-upsert
    shape this engine's reader learned to consume this round: the
    commit carries the new data files at sequence N PLUS an EQUALITY
    delete file on ``keys`` at the same sequence. The spec's strict
    lower-sequence rule makes it atomic-by-construction: the delete
    removes every OLDER row with a matching key and cannot touch this
    commit's own rows. Returns ``{"snapshot_id", "rows_upserted",
    "retries"}``. A table that does not exist yet is created with a
    plain ``write_iceberg`` (nothing to delete)."""
    from harness_aws_etl_pipeline_spark.sinks.icebergwrite import (
        write_iceberg,
    )

    base = path.rstrip("/")
    fs = get_fs(base, spark)
    mdir = posixpath.join(base, "metadata")
    if not fs.exists(mdir):
        rep = write_iceberg(spark, df, base)
        return {
            "snapshot_id": rep["snapshot_id"],
            "rows_upserted": None,
            "retries": rep["retries"],
        }
    md = json.loads(
        fs.read_bytes(_latest_metadata(fs, base)).decode("utf-8")
    )
    if int(md.get("format-version", 1)) < 2:
        raise ValueError("equality deletes need a format-version 2 table")
    schemas = md.get("schemas") or (
        [dict(md["schema"], **{"schema-id": 0})] if md.get("schema") else []
    )
    cur_id = md.get("current-schema-id", 0)
    node = next(
        (s for s in schemas if s.get("schema-id") == cur_id), None
    )
    if node is None:
        raise ValueError("Iceberg metadata carries no current schema")
    ids_by_name = {f["name"]: int(f["id"]) for f in node["fields"]}
    missing = [k for k in keys if k not in ids_by_name]
    if missing:
        raise ValueError(f"key column(s) {missing} not in the table schema")
    if sorted(c for c in df.columns) != sorted(ids_by_name):
        raise ValueError(
            f"upsert frame columns {sorted(df.columns)} do not match the "
            f"table schema {sorted(ids_by_name)}"
        )
    eq_ids = [ids_by_name[k] for k in keys]

    # ---- resolve the table's partition spec: new data files must be
    # staged partitioned and their manifest entries must carry real
    # partition values (round 13 — before this, upsert files landed
    # unpartitioned with empty partition structs, degrading pruning
    # and writing spec-inconsistent metadata on partitioned tables)
    from harness_aws_etl_pipeline_spark.sources.icebergpart import (
        spec_transforms,
    )

    all_descs = spec_transforms(md) or []
    if any(d["kind"] == "void" for d in all_descs):
        raise ValueError(
            "table's partition spec carries void (dropped) fields; "
            "upserting through spec evolution is not supported"
        )
    descs = list(all_descs)
    field_parse: dict[str, str] = {}
    src_type: dict[str, str] = {}
    if descs:
        field_parse, _field_avro_unused, src_type = _field_meta(
            descs, df.schema
        )

    # ---- stage new data files (write_iceberg's exact staging: hive
    # layout under the spec transforms + exact-ownership move)
    new_files, part_of = _stage_data_files(
        spark, fs, base, df, descs, src_type, field_parse
    )
    del_rel = None

    # equality-delete parquet: the distinct keys, field-id tagged
    # via withMetadata — fully distributed, no driver collect. It is
    # a GLOBAL delete (spec: equality deletes stored with an
    # unpartitioned spec apply to the whole table), so it stays one
    # unpartitioned file regardless of the table's partitioning.
    kdf = df.select(*keys).distinct()
    for k in keys:
        kdf = kdf.withMetadata(k, {"parquet.field.id": ids_by_name[k]})
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    dstage = posixpath.join(base, f".stage-{uuid.uuid4().hex}")
    try:
        kdf.coalesce(1).write.mode("overwrite").parquet(dstage)
        (src,) = [
            rel
            for rel, _mt, _sz in fs.list_files(dstage)
            if rel.endswith(".parquet")
        ]
        del_size = next(
            sz for rel, _mt, sz in fs.list_files(dstage) if rel == src
        )
        del_rel = f"data/{uuid.uuid4().hex}-eqdeletes.parquet"
        if not fs.rename(
            posixpath.join(dstage, src), posixpath.join(base, del_rel)
        ):
            raise RuntimeError("could not move staged delete file")
    finally:
        fs.delete(dstage, recursive=True)
    del_count = spark.read.parquet(
        posixpath.join(base, del_rel)
    ).count()

    # per-file record counts, one grouped job over this write's files
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
        stripped = {_strip(ap): rel for ap, rel in paths.items()}
        for r in rows:
            rel = stripped.get(r.fp)
            if rel is not None:
                counts[rel] = int(r.n)
    rows_upserted = sum(counts.values())

    ts_ms = int(time.time() * 1000)
    retries = 0
    while True:
        md = json.loads(
            fs.read_bytes(_latest_metadata(fs, base)).decode("utf-8")
        )
        cur_version = 0
        for rel, _mt, _sz in fs.list_files(mdir):
            m = re.match(r"v(\d+)\.metadata\.json$", posixpath.basename(rel))
            if m:
                cur_version = max(cur_version, int(m.group(1)))
        data_spec_id, part_fields = _dml_spec_fields(
            md, descs, df.schema, "iceberg_upsert"
        )
        # the GLOBAL equality delete rides an UNPARTITIONED spec (the
        # spec's global-delete rule); add one to the table if it only
        # has partitioned specs
        specs = list(
            md.get("partition-specs") or [{"spec-id": 0, "fields": []}]
        )
        del_spec_id = next(
            (s["spec-id"] for s in specs if not s.get("fields")), None
        )
        if del_spec_id is None:
            del_spec_id = max(s["spec-id"] for s in specs) + 1
            specs = specs + [{"spec-id": del_spec_id, "fields": []}]
        snapshot_id = int(uuid.uuid4().int % (1 << 62)) + 1
        seq = int(md.get("last-sequence-number", 0)) + 1
        data_entries = [
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": seq,
                "data_file": {
                    "content": 0,
                    "file_path": posixpath.join(base, p),
                    "file_format": "PARQUET",
                    "partition": part_of.get(p) or {},
                    "record_count": counts.get(p, 0),
                    "file_size_in_bytes": sz,
                    "equality_ids": None,
                },
            }
            for p, sz in sorted(new_files.items())
        ]
        del_entries = [
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": seq,
                "data_file": {
                    "content": 2,  # equality deletes
                    "file_path": posixpath.join(base, del_rel),
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": del_count,
                    "file_size_in_bytes": del_size,
                    "equality_ids": eq_ids,
                },
            }
        ]
        dman_rel = f"metadata/{uuid.uuid4().hex}-m0.avro"
        dman = write_avro_bytes(
            _entry_schema(part_fields) if part_fields else _ENTRY_SCHEMA,
            data_entries,
        )
        fs.write_bytes(posixpath.join(base, dman_rel), dman)
        eman_rel = f"metadata/{uuid.uuid4().hex}-d0.avro"
        eman = write_avro_bytes(_ENTRY_SCHEMA, del_entries)
        fs.write_bytes(posixpath.join(base, eman_rel), eman)

        def _mf(rel_, blob, content, adds, rows_, spec_id_):
            return {
                "manifest_path": posixpath.join(base, rel_),
                "manifest_length": len(blob),
                "partition_spec_id": spec_id_,
                "content": content,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snapshot_id,
                "added_files_count": adds,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": rows_,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }

        prev_manifests: list[dict] = []
        cur_md_snap = next(
            (
                s
                for s in md.get("snapshots") or []
                if s.get("snapshot-id") == md.get("current-snapshot-id")
            ),
            None,
        )
        if cur_md_snap is not None:
            mlist_rel = cur_md_snap["manifest-list"]
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
                _MLIST_SCHEMA,
                prev_manifests
                + [
                    _mf(
                        dman_rel, dman, 0, len(data_entries),
                        rows_upserted, data_spec_id,
                    ),
                    _mf(eman_rel, eman, 1, 1, 1, del_spec_id),
                ],
            ),
        )
        snapshot = {
            "snapshot-id": snapshot_id,
            "timestamp-ms": ts_ms,
            "sequence-number": seq,
            "summary": {"operation": "overwrite"},
            "manifest-list": posixpath.join(base, mlist_rel),
            "schema-id": cur_id,
        }
        new_md = dict(md)
        # persist the unpartitioned spec if the global delete added
        # one (default-spec-id unchanged — data stays partitioned)
        new_md["partition-specs"] = specs
        new_md["last-sequence-number"] = seq
        new_md["last-updated-ms"] = ts_ms
        new_md["snapshots"] = (md.get("snapshots") or []) + [snapshot]
        new_md["current-snapshot-id"] = snapshot_id
        new_md["snapshot-log"] = (md.get("snapshot-log") or []) + [
            {"snapshot-id": snapshot_id, "timestamp-ms": ts_ms}
        ]
        target = posixpath.join(mdir, f"v{cur_version + 1}.metadata.json")
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
                "rows_upserted": rows_upserted,
                "retries": retries,
            }
        fs.delete(tmp, recursive=False)
        fs.delete(posixpath.join(base, dman_rel), recursive=False)
        fs.delete(posixpath.join(base, eman_rel), recursive=False)
        fs.delete(posixpath.join(base, mlist_rel), recursive=False)
        retries += 1
        if retries > max_commit_retries:
            raise RuntimeError(
                f"lost the Iceberg commit race {retries} times at {base!r}"
            )
