"""Read Apache Iceberg tables WITHOUT the Iceberg jar — the second
leg of the no-jar lakehouse interop tier (``deltaread`` is the
first). The Iceberg table format is an open spec
(iceberg.apache.org/spec): a table directory holds
``metadata/vN.metadata.json`` (current snapshot pointer, schemas,
partition specs), each snapshot points at a MANIFEST LIST (an Avro
file), which points at MANIFESTS (Avro files), which enumerate the
live parquet data files. The in-repo open-spec Avro decoder
(``sources/avroread``) reads both Avro layers, so the whole walk is
stdlib + one stock ``spark.read.parquet`` at the end.

Scope (honest): format v1 and v2 tables; entries with status=DELETED
are honored. v2 POSITION deletes (round 10) are applied: delete
files are plain parquet of ``(file_path, pos)`` rows, folded out via
one anti-join on the referenced data file's ``_metadata.row_index``
(the deltaread deletion-vector mechanism) — data files no delete
references keep the bulk scan. v2 EQUALITY deletes (round 11, the
Flink streaming-upsert staple) are applied too: ``equality_ids``
resolve against the current schema's top-level field ids, and each
distinct equality column set folds out as ONE null-safe anti-join
with the spec's strict sequence-number scoping (deletes hit only
data files with a LOWER data sequence). Nested / dropped-column
equality ids still reject loudly rather than silently misread.
Identity-partitioned and unpartitioned tables read directly (Iceberg
data files physically CONTAIN their partition source columns, unlike
Delta); hidden-transform partitioning (bucket/truncate/days) also
reads correctly for the same reason. Snapshot time travel via
``snapshot_id`` or ``timestamp_ms`` (newest snapshot at or before
the instant). The Iceberg schema JSON maps to Spark types
(struct/list/map, decimals, dates, timestamps; uuid → string).

Scale shape: metadata walk is driver-side over manifest-sized Avro
(exactly what every Iceberg client does); the data read is plain
parquet with pushdown/pruning intact.
"""

from __future__ import annotations

import json
import posixpath
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs
from harness_aws_etl_pipeline_spark.sources.avroread import _iter_container

__all__ = [
    "iceberg_changes",
    "iceberg_snapshot",
    "iceberg_snapshot_at",
    "iceberg_snapshots",
    "read_iceberg",
]


def _iceberg_to_spark(t) -> T.DataType:
    if isinstance(t, dict):
        k = t.get("type")
        if k == "struct":
            return T.StructType(
                [
                    T.StructField(
                        f["name"],
                        _iceberg_to_spark(f["type"]),
                        not f.get("required", False),
                    )
                    for f in t["fields"]
                ]
            )
        if k == "list":
            return T.ArrayType(
                _iceberg_to_spark(t["element"]),
                containsNull=not t.get("element-required", False),
            )
        if k == "map":
            return T.MapType(
                _iceberg_to_spark(t["key"]),
                _iceberg_to_spark(t["value"]),
                valueContainsNull=not t.get("value-required", False),
            )
        raise ValueError(f"unsupported Iceberg type node {t!r}")
    m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t or "")
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    if (t or "").startswith("fixed"):
        return T.BinaryType()
    prim = {
        "boolean": T.BooleanType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "date": T.DateType(),
        "time": T.LongType(),  # micros since midnight (no Spark TIME)
        "timestamp": T.TimestampNTZType(),
        "timestamptz": T.TimestampType(),
        "string": T.StringType(),
        "uuid": T.StringType(),
        "binary": T.BinaryType(),
    }.get(t)
    if prim is None:
        raise ValueError(f"unsupported Iceberg primitive {t!r}")
    return prim


def _rel(base: str, location: str | None, p: str) -> str:
    """Manifest paths are absolute URIs in real tables; remap them
    under ``base`` via the table location prefix (the standard trick
    for relocated/copied tables), pass relative paths through."""
    if "://" in p:
        if location and p.startswith(location):
            return base.rstrip("/") + "/" + p[len(location) :].lstrip("/")
        # same-scheme absolute path: try the tail after the table dir name
        tail = p.split("/" + posixpath.basename(base.rstrip("/")) + "/", 1)
        if len(tail) == 2:
            return posixpath.join(base, tail[1])
        return p
    if p.startswith("/") and location and p.startswith(location):
        return base.rstrip("/") + "/" + p[len(location) :].lstrip("/")
    return p if p.startswith("/") else posixpath.join(base, p)


def _latest_metadata(fs, base: str) -> str:
    mdir = posixpath.join(base, "metadata")
    hint = posixpath.join(mdir, "version-hint.text")
    if fs.exists(hint):
        v = fs.read_bytes(hint).decode("utf-8").strip()
        cand = posixpath.join(mdir, f"v{v}.metadata.json")
        if fs.exists(cand):
            return cand
    best = None
    best_v = -1
    for rel, _mt, _sz in fs.list_files(mdir):
        name = posixpath.basename(rel)
        m = re.match(r"v(\d+)\.metadata\.json$", name) or re.match(
            r"(\d+)-[0-9a-f-]+\.metadata\.json$", name
        )
        if m and int(m.group(1)) > best_v:
            best_v = int(m.group(1))
            best = posixpath.join(mdir, name)
    if best is None:
        raise ValueError(f"not an Iceberg table (no metadata json): {base}")
    return best


def _avro_records(fs, path: str) -> list[dict]:
    _schema, _names, recs = _iter_container(fs.read_bytes(path))
    return list(recs)


def iceberg_snapshots(spark: SparkSession, path: str) -> list[dict]:
    """The snapshot log: [{"snapshot_id", "timestamp_ms",
    "operation"}] oldest first."""
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    md = json.loads(fs.read_bytes(_latest_metadata(fs, base)).decode("utf-8"))
    out = []
    for s in md.get("snapshots") or []:
        out.append(
            {
                "snapshot_id": s.get("snapshot-id"),
                "timestamp_ms": s.get("timestamp-ms"),
                "operation": (s.get("summary") or {}).get("operation"),
            }
        )
    return sorted(out, key=lambda s: s["timestamp_ms"] or 0)


def iceberg_snapshot(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> dict:
    """Resolve a snapshot to its live data files:
    ``{"snapshot_id", "files": [paths], "schema" (StructType),
    "format_version", "delete_files": n}``."""
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    md = json.loads(fs.read_bytes(_latest_metadata(fs, base)).decode("utf-8"))
    location = md.get("location")
    fmt_v = int(md.get("format-version", 1))

    # schema: v2 carries "schemas" + current-schema-id; v1 "schema"
    schema_node = None
    if md.get("schemas") is not None:
        cur = md.get("current-schema-id", 0)
        for s in md["schemas"]:
            if s.get("schema-id") == cur:
                schema_node = s
                break
    schema_node = schema_node or md.get("schema")
    if schema_node is None:
        raise ValueError("Iceberg metadata carries no schema")
    spark_schema = _iceberg_to_spark(
        {"type": "struct", "fields": schema_node["fields"]}
    )

    snaps = md.get("snapshots") or []
    if not snaps:
        return {
            "snapshot_id": None,
            "files": [],
            "schema": spark_schema,
            "format_version": fmt_v,
            "delete_files": 0,
        }
    target_id = (
        snapshot_id
        if snapshot_id is not None
        else md.get("current-snapshot-id")
    )
    snap = next(
        (s for s in snaps if s.get("snapshot-id") == target_id), None
    )
    if snap is None:
        raise ValueError(
            f"snapshot {target_id} not found (have "
            f"{[s.get('snapshot-id') for s in snaps]})"
        )

    mlist_path = _rel(base, location, snap["manifest-list"])
    manifests = _avro_records(fs, mlist_path)
    files: list[str] = []
    origin_of: dict[str, str] = {}
    seq_of: dict[str, int] = {}
    partition_of: dict[str, dict] = {}
    position_deletes: list[str] = []
    equality_deletes: list[dict] = []
    # field-id → top-level column name, for equality_ids resolution
    names_by_id = {
        int(f["id"]): f["name"]
        for f in schema_node["fields"]
        if f.get("id") is not None
    }
    for man in manifests:
        mpath = _rel(base, location, man["manifest_path"])
        content = int(man.get("content") or 0)
        man_seq = int(man.get("sequence_number") or 0)
        entries = _avro_records(fs, mpath)
        for e in entries:
            status = int(e.get("status") or 0)
            if status == 2:  # DELETED
                continue
            df_ = e.get("data_file") or {}
            # the entry's own content field (v2) wins; a delete
            # manifest (list content=1) without it defaults to
            # position deletes per the spec's manifest typing
            ec = df_.get("content")
            ec = int(ec) if ec is not None else (1 if content == 1 else 0)
            rp = _rel(base, location, df_["file_path"])
            # sequence-number inheritance: ADDED entries with a null
            # sequence take the manifest's (spec §sequence numbers)
            eseq = e.get("sequence_number")
            eseq = int(eseq) if eseq is not None else man_seq
            if ec == 1:
                position_deletes.append(rp)
            elif ec == 2:
                ids = [int(i) for i in (df_.get("equality_ids") or [])]
                if not ids:
                    raise ValueError(
                        f"Iceberg equality delete file {rp} carries no "
                        "equality_ids"
                    )
                missing = [i for i in ids if i not in names_by_id]
                if missing:
                    raise ValueError(
                        "Iceberg equality delete references field ids "
                        f"{missing} that are not top-level columns of "
                        "the current schema; nested or dropped-column "
                        "equality deletes are not supported"
                    )
                equality_deletes.append(
                    {
                        "path": rp,
                        "seq": eseq,
                        "columns": [names_by_id[i] for i in ids],
                    }
                )
            else:
                files.append(rp)
                origin_of[rp] = df_["file_path"]
                seq_of[rp] = eseq
                part = df_.get("partition")
                if isinstance(part, dict) and part:
                    partition_of[rp] = dict(part)
    return {
        "snapshot_id": target_id,
        "files": files,
        "schema": spark_schema,
        "format_version": fmt_v,
        "delete_files": len(position_deletes) + len(equality_deletes),
        "position_delete_files": position_deletes,
        "equality_delete_files": equality_deletes,
        "origin_of": origin_of,
        "seq_of": seq_of,
        "partition_of": partition_of,
        "partition_spec_transforms": _safe_spec_transforms(md),
    }


def _safe_spec_transforms(md: dict) -> list[dict] | None:
    """The default partition spec as transform descriptors — lenient
    on READ (an exotic transform must not break plain snapshot reads;
    only partition_filter needs the descriptors and raises then)."""
    try:
        from harness_aws_etl_pipeline_spark.sources.icebergpart import (
            spec_transforms,
        )

        return spec_transforms(md)
    except ValueError:
        return None


def iceberg_snapshot_at(
    spark: SparkSession, path: str, timestamp_ms: int
) -> int:
    """Snapshot id of the newest snapshot at or before
    ``timestamp_ms`` (AS OF TIMESTAMP resolution)."""
    snaps = [
        s
        for s in iceberg_snapshots(spark, path)
        if (s["timestamp_ms"] or 0) <= timestamp_ms
    ]
    if not snaps:
        raise ValueError(
            f"no Iceberg snapshot at or before timestamp {timestamp_ms}"
        )
    return snaps[-1]["snapshot_id"]


def read_iceberg(
    spark: SparkSession,
    path: str,
    snapshot_id: int | None = None,
    timestamp_ms: int | None = None,
    partition_filter: dict | None = None,
) -> DataFrame:
    """The snapshot as a DataFrame (time travel via ``snapshot_id``).
    Iceberg data files physically contain every table column
    (including partition sources), so the read is one stock parquet
    scan with the table schema. Live position deletes are folded out
    by one anti-join on ``(referenced file, row position)`` — only
    the data files a delete row references leave the bulk scan.
    Time travel by ``snapshot_id`` or ``timestamp_ms``.

    ``partition_filter={col: value}`` prunes the FILE LIST via the
    manifests' partition structs (identity transforms) before any
    data is scanned — the metadata-level pruning real clients do —
    and also applies the equivalent row filter, so files written
    without partition metadata (older specs, DML rewrites) are
    conservatively scanned yet still row-filtered correctly."""
    from pyspark.sql import functions as F

    if snapshot_id is not None and timestamp_ms is not None:
        raise ValueError("pass snapshot_id OR timestamp_ms, not both")
    if timestamp_ms is not None:
        snapshot_id = iceberg_snapshot_at(spark, path, timestamp_ms)
    snap = iceberg_snapshot(spark, path, snapshot_id)
    spec_by_field = {
        d["field"]: d
        for d in (snap.get("partition_spec_transforms") or [])
    }
    src_types = {f.name: f.dataType.typeName() for f in snap["schema"].fields}

    def _pf(d: DataFrame) -> DataFrame:
        """Equivalent ROW filter per partition-filter key — identity
        compares the source column, hidden time/truncate transforms
        recompute the transform expression; bucket has no JVM
        expression, so its exactness rests on the strict
        metadata-coverage check below."""
        from harness_aws_etl_pipeline_spark.sources.icebergpart import (
            transform_column,
        )

        for k, v in (partition_filter or {}).items():
            desc = spec_by_field.get(k)
            if desc is None or desc["kind"] == "identity":
                col = desc["source"] if desc else k
                d = d.where(F.col(col).eqNullSafe(F.lit(v)))
            elif desc["kind"] == "bucket":
                continue
            else:
                d = d.where(
                    transform_column(
                        desc, src_types[desc["source"]]
                    ).eqNullSafe(F.lit(v))
                )
        return d

    if partition_filter:
        import datetime

        unknown = [
            k
            for k in partition_filter
            if k not in spec_by_field and k not in src_types
        ]
        if unknown:
            raise ValueError(
                f"partition_filter keys {unknown} match neither a "
                "partition spec field nor a table column"
            )
        # manifests store date partition values as days-since-epoch
        norm = {
            k: (
                (v - datetime.date(1970, 1, 1)).days
                if isinstance(v, datetime.date)
                and not isinstance(v, datetime.datetime)
                else v
            )
            for k, v in partition_filter.items()
        }
        pof = snap.get("partition_of") or {}
        bucket_keys = [
            k
            for k in partition_filter
            if (spec_by_field.get(k) or {}).get("kind") == "bucket"
        ]
        if bucket_keys:
            # bucket values are not recomputable as a row filter —
            # pruning is exact ONLY if every live file carries the
            # partition value (rows in a file share its tuple)
            uncovered = [
                f
                for f in snap["files"]
                if any(k not in pof.get(f, {}) for k in bucket_keys)
            ]
            if uncovered:
                raise ValueError(
                    f"cannot filter by bucket field(s) {bucket_keys}: "
                    f"{len(uncovered)} live file(s) carry no partition "
                    "metadata for them (DML rewrites or older specs)"
                )
        snap = dict(snap)
        snap["files"] = [
            f
            for f in snap["files"]
            # conservative inclusion: a file with no recorded value
            # for a key might still hold matching rows
            if all(
                k not in pof.get(f, {}) or pof[f][k] == v
                for k, v in norm.items()
            )
        ]
    if not snap["files"]:
        return spark.createDataFrame([], snap["schema"])
    pos_dels = snap.get("position_delete_files") or []
    eq_dels = snap.get("equality_delete_files") or []
    if eq_dels:
        return _pf(
            _read_with_equality_deletes(spark, snap, pos_dels, eq_dels)
        )
    if not pos_dels:
        return _pf(
            spark.read.schema(snap["schema"]).parquet(*snap["files"])
        )
    # delete files: plain parquet of (file_path, pos[, row]) — read
    # just the two addressing columns (spec field ids 2147483546/45)
    del_df = spark.read.schema("file_path string, pos long").parquet(
        *pos_dels
    )
    referenced = {
        r.file_path for r in del_df.select("file_path").distinct().collect()
    }
    origin_of = snap.get("origin_of") or {}
    clean = [f for f in snap["files"] if origin_of.get(f) not in referenced]
    dirty = [f for f in snap["files"] if origin_of.get(f) in referenced]
    cols = [f.name for f in snap["schema"].fields]
    out: DataFrame | None = None
    if clean:
        df = (
            spark.read.schema(snap["schema"])
            .parquet(*clean)
            .withColumns(
                {
                    "__pd_key": F.lit(None).cast("string"),
                    "__pd_pos": F.lit(None).cast("long"),
                }
            )
        )
        out = df
    for f in sorted(dirty):
        df = (
            spark.read.schema(snap["schema"])
            .parquet(f)
            .select(
                "*",
                F.col("_metadata.row_index").alias("__pd_pos"),
            )
            .withColumn("__pd_key", F.lit(origin_of[f]))
        )
        df = df.select(*cols, "__pd_key", "__pd_pos")
        out = df if out is None else out.unionByName(df)
    rem = del_df.select(
        F.col("file_path").alias("__pd_key"), F.col("pos").alias("__pd_pos")
    )
    return _pf(
        out.join(rem, ["__pd_key", "__pd_pos"], "left_anti").select(*cols)
    )


def _norm_path(p: str) -> str:
    return (
        "/" + p.split("://", 1)[1].lstrip("/")
        if "://" in p
        else "/" + p.lstrip("/")
    )


def _read_with_equality_deletes(
    spark: SparkSession, snap: dict, pos_dels: list, eq_dels: list
) -> DataFrame:
    """Snapshot read when live EQUALITY deletes exist (round 11):
    Flink-style streaming upserts write these routinely. Per the spec,
    an equality delete removes every data row whose values in the
    delete's equality columns match a delete row (null-safe) AND whose
    data sequence number is STRICTLY below the delete file's. The
    fold is one broadcast-joined (file → sequence) annotation plus one
    anti-join per distinct equality column set — delete files are
    metadata-scale next to the data, so the anti-join build sides stay
    small; the sequence predicate rides the join as a residual."""
    import functools

    from pyspark.sql import functions as F

    schema = snap["schema"]
    cols = [f.name for f in schema.fields]
    origin_of = snap.get("origin_of") or {}
    seq_of = snap.get("seq_of") or {}
    df = (
        spark.read.schema(schema)
        .parquet(*snap["files"])
        .select(
            "*",
            F.regexp_replace(
                F.col("_metadata.file_path"), "^[a-zA-Z0-9+.-]+:/+", "/"
            ).alias("__file"),
            F.col("_metadata.row_index").alias("__pd_pos"),
        )
    )
    mp = F.broadcast(
        spark.createDataFrame(
            [
                (_norm_path(f), origin_of.get(f), int(seq_of.get(f, 0)))
                for f in snap["files"]
            ],
            "__file string, __pd_key string, __seq long",
        )
    )
    df = df.join(mp, "__file").drop("__file")
    if pos_dels:
        rem = spark.read.schema("file_path string, pos long").parquet(
            *pos_dels
        ).select(
            F.col("file_path").alias("__pd_key"),
            F.col("pos").alias("__pd_pos"),
        )
        df = df.join(rem, ["__pd_key", "__pd_pos"], "left_anti")
    by_colset: dict[tuple, list[dict]] = {}
    for d in eq_dels:
        by_colset.setdefault(tuple(d["columns"]), []).append(d)
    for colset, dels in sorted(by_colset.items()):
        sub = T.StructType([f for f in schema.fields if f.name in colset])
        rows = None
        for d in dels:
            one = (
                spark.read.schema(sub)
                .parquet(d["path"])
                .withColumn("__eq_seq", F.lit(int(d["seq"])).cast("long"))
            )
            rows = one if rows is None else rows.unionByName(one)
        left = df.alias("l")
        right = rows.alias("r")
        cond = functools.reduce(
            lambda a, b: a & b,
            [
                F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
                for c in colset
            ],
        ) & (F.col("l.__seq") < F.col("r.__eq_seq"))
        df = left.join(right, cond, "left_anti")
    return df.select(*cols)


def _snapshot_meta(spark: SparkSession, path: str) -> dict:
    """snapshot-id → {"seq", "op"} from the table metadata."""
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    md = json.loads(
        fs.read_bytes(_latest_metadata(fs, base)).decode("utf-8")
    )
    return {
        s["snapshot-id"]: {
            "seq": int(s.get("sequence-number") or 0),
            "op": (s.get("summary") or {}).get("operation"),
        }
        for s in md.get("snapshots") or []
    }


def _iceberg_change_rows(
    spark: SparkSession, path: str, lo: dict, hi: dict
) -> DataFrame:
    """CHANGE-ROW replay of the snapshots in ``(lo, hi]`` — the batch
    twin of ``iceberg_nojar``'s ``readChangeFeed``: per snapshot,
    position deletes replay the referenced PREIMAGE rows (full
    values), equality deletes surface as key-only ``delete`` rows, new
    data files as ``insert`` rows; within one ``_commit_version`` (the
    snapshot's sequence number) deletes apply BEFORE inserts — the
    upsert-changelog order. Compaction snapshots (operation
    ``replace``) contribute nothing; other file-dropping snapshots
    reject loudly."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    base = path.rstrip("/")
    schema = hi["schema"]
    cols = [f.name for f in schema.fields]
    out_schema = T.StructType(
        list(schema.fields)
        + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_commit_version", T.LongType()),
        ]
    )
    meta = _snapshot_meta(spark, path)
    snaps = iceberg_snapshots(spark, path)
    ids = [s["snapshot_id"] for s in snaps]
    if lo["snapshot_id"] not in ids or hi["snapshot_id"] not in ids:
        raise ValueError("window endpoints are not in the snapshot log")
    window = ids[ids.index(lo["snapshot_id"]) + 1 : ids.index(
        hi["snapshot_id"]
    ) + 1]
    out: DataFrame | None = None
    prev = lo

    def _conform(df: DataFrame, ct: str, version: int) -> DataFrame:
        return df.select(
            *[
                F.col(c).cast(schema[c].dataType).alias(c)
                if c in df.columns
                else F.lit(None).cast(schema[c].dataType).alias(c)
                for c in cols
            ],
            F.lit(ct).alias("_change_type"),
            F.lit(version).cast("long").alias("_commit_version"),
        )

    for sid in window:
        cur = iceberg_snapshot(spark, path, sid)
        sm = meta.get(sid) or {}
        version = int(sm.get("seq") or 0)
        prev_files = set(prev["files"])
        prev_pd = set(prev.get("position_delete_files") or [])
        prev_eq = {d["path"] for d in prev.get("equality_delete_files") or []}
        cur_pd = set(cur.get("position_delete_files") or [])
        cur_eq = {d["path"] for d in cur.get("equality_delete_files") or []}
        dropped = prev_files - set(cur["files"])
        if sm.get("op") == "replace":
            prev = cur
            continue
        if dropped:
            raise ValueError(
                f"snapshot {sid} ({sm.get('op')}) drops {len(dropped)} "
                "data file(s) outside a compaction; change capture "
                "cannot reconstruct rewrite deltas"
            )
        if (prev_pd - cur_pd) or (prev_eq - cur_eq):
            raise ValueError(
                f"snapshot {sid} removes delete files outside a "
                "compaction; change capture cannot represent it"
            )
        new_pos = sorted(cur_pd - prev_pd)
        if new_pos:
            # preimage rows: scan the referenced data files of the
            # PRIOR snapshot with row positions, semi-joined to the
            # delete pairs — fully distributed
            del_df = spark.read.schema(
                "file_path string, pos long"
            ).parquet(*new_pos)
            origin_of = prev.get("origin_of") or {}
            mp = F.broadcast(
                spark.createDataFrame(
                    [
                        (
                            "/" + f.split("://", 1)[1].lstrip("/")
                            if "://" in f
                            else "/" + f.lstrip("/"),
                            origin_of.get(f, f),
                        )
                        for f in prev["files"]
                    ],
                    "__fp string, file_path string",
                )
            )
            scan = (
                spark.read.schema(schema)
                .parquet(*prev["files"])
                .select(
                    "*",
                    F.regexp_replace(
                        F.col("_metadata.file_path"),
                        "^[a-zA-Z0-9+.-]+:/+",
                        "/",
                    ).alias("__fp"),
                    F.col("_metadata.row_index").alias("pos"),
                )
                .join(mp, "__fp")
                .join(del_df, ["file_path", "pos"], "left_semi")
            )
            df = _conform(scan, "delete", version)
            out = df if out is None else out.unionByName(df)
        new_eq = [
            d
            for d in cur.get("equality_delete_files") or []
            if d["path"] not in prev_eq
        ]
        if new_eq and prev["files"]:
            # FULL preimage resolution: the rows an equality delete at
            # sequence N removes are exactly the PRIOR snapshot's live
            # rows matching the delete keys (all at sequence < N), so
            # read the prior snapshot through the normal reader (its
            # own deletes applied) and semi-join on the equality
            # columns — retraction-grade change rows, not key-only
            import functools

            prior = read_iceberg(
                spark, path, snapshot_id=prev["snapshot_id"]
            )
            for d in sorted(new_eq, key=lambda d: d["path"]):
                sub = T.StructType(
                    [f for f in schema.fields if f.name in d["columns"]]
                )
                keys = (
                    spark.read.schema(sub).parquet(d["path"]).distinct()
                )
                # NULL-SAFE equality, matching the snapshot read path
                # (the spec treats null delete values as IS NULL)
                cond = functools.reduce(
                    lambda a, b: a & b,
                    [
                        F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
                        for c in d["columns"]
                    ],
                )
                pre = prior.alias("l").join(
                    keys.alias("r"), cond, "left_semi"
                )
                df = _conform(pre, "delete", version)
                out = df if out is None else out.unionByName(df)
        new_files = sorted(set(cur["files"]) - prev_files)
        if new_files:
            df = _conform(
                spark.read.schema(schema).parquet(*new_files),
                "insert",
                version,
            )
            out = df if out is None else out.unionByName(df)
        prev = cur
    if out is None:
        return spark.createDataFrame([], out_schema)
    return out


def iceberg_changes(
    spark: SparkSession,
    path: str,
    since_snapshot_id: int,
    to_snapshot_id: int | None = None,
    change_rows: bool = False,
) -> DataFrame:
    """Append-only incremental consumer (the delta_changes mirror):
    rows in data files present in ``to`` but not in ``since``.
    Windows that drop pre-existing files (rewrites/deletes) are
    rejected as not representable without a changelog.

    ``change_rows=True`` (round 13) switches to CHANGE-ROW capture —
    the batch twin of ``iceberg_nojar``'s ``readChangeFeed``: upserts
    and deletes in the window surface as labeled change rows
    (``_change_type`` / ``_commit_version``) instead of rejecting."""
    lo = iceberg_snapshot(spark, path, since_snapshot_id)
    hi = iceberg_snapshot(spark, path, to_snapshot_id)
    if change_rows:
        return _iceberg_change_rows(spark, path, lo, hi)
    # a delete file appearing (or disappearing) inside the window
    # changes the visibility of previously-captured rows — not
    # representable as added-rows-only (round-10 guard, mirrors the
    # delta_changes per-commit remove replay)
    if set(hi.get("position_delete_files") or []) != set(
        lo.get("position_delete_files") or []
    ):
        raise ValueError(
            f"snapshots ({lo['snapshot_id']}, {hi['snapshot_id']}] change "
            "the live position-delete set; append-only change capture "
            "cannot represent that window"
        )
    if {d["path"] for d in hi.get("equality_delete_files") or []} != {
        d["path"] for d in lo.get("equality_delete_files") or []
    }:
        raise ValueError(
            f"snapshots ({lo['snapshot_id']}, {hi['snapshot_id']}] change "
            "the live equality-delete set; append-only change capture "
            "cannot represent that window"
        )
    dropped = set(lo["files"]) - set(hi["files"])
    if dropped:
        raise ValueError(
            f"snapshots ({lo['snapshot_id']}, {hi['snapshot_id']}] drop "
            f"{len(dropped)} pre-existing file(s); append-only change "
            "capture cannot represent that window"
        )
    new_files = sorted(set(hi["files"]) - set(lo["files"]))
    if not new_files:
        return spark.createDataFrame([], hi["schema"])
    return spark.read.schema(hi["schema"]).parquet(*new_files)
