"""Write Apache Hudi Copy-on-Write tables WITHOUT the jar — the third
writer of the interop tier (Delta, Iceberg, Hudi: each format now has
read + write + incremental-changes support, all no-jar).

Layout per the open spec (hudi.apache.org/tech-specs) and the shape
``sources/hudiread`` consumes:

- ``.hoodie/hoodie.properties`` declares the table (COPY_ON_WRITE);
- data files are ``<fileId>_<writeToken>_<instant>.parquet`` — each
  append creates brand-new file groups (fileId = uuid hex), staged
  and moved with exact ownership;
- the commit point is ``.hoodie/<instant>.commit`` claimed via
  PUT-IF-ABSENT; a writer losing the instant claim bumps to a later
  instant and retries (instants are the ordering, so the loser's
  files simply carry the later timestamp — they are invisible until
  their instant commits, exactly the reader's in-flight rule);
- ``mode="overwrite"`` is INSERT_OVERWRITE: new file groups plus a
  ``.replacecommit`` whose ``partitionToReplaceFileIds`` supersedes
  every previously-live group (the reader's round-10 replacecommit
  exclusion applies it; time travel before the replace still sees the
  old groups).

Scope (honest): CoW append / insert_overwrite (table-level replace,
not per-partition), plus (round 11) MERGE_ON_READ keyed upserts via
``hudi_upsert`` — log-block appends routed by a simple index, the
streaming-upsert shape MOR exists for. Round 12 adds PARTITIONED
layouts to both: ``partition_by=[cols]`` writes hive-style
``col=val/`` directories (data files still contain the source
columns), records the fields in ``hoodie.properties``
(``hoodie.table.partition.fields``), and scopes upsert key routing
to (partition path, record key) — Hudi's simple (non-global) index.
"""

from __future__ import annotations

import json
import posixpath
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs
from harness_aws_etl_pipeline_spark.sources.hudiread import hudi_snapshot

__all__ = ["hudi_upsert", "write_hudi"]

_DATA_RE_TOKEN = "0-1-2"


def _instant_now(last: str | None = None) -> str:
    """14+3-digit Hudi instant (yyyyMMddHHmmssSSS), strictly after
    ``last`` when given."""
    t = time.gmtime()
    ms = int((time.time() % 1) * 1000)
    inst = time.strftime("%Y%m%d%H%M%S", t) + f"{ms:03d}"
    if last is not None and inst <= last:
        inst = str(int(last) + 1)
    return inst


def _props_partition_fields(body: str) -> list[str]:
    for line in body.splitlines():
        line = line.strip()
        if line.startswith("hoodie.table.partition.fields="):
            v = line.split("=", 1)[1].strip()
            return [c for c in v.split(",") if c]
    return []


def _resolve_partitioning(
    fs,
    hoodie: str,
    props_path: str,
    df: DataFrame,
    partition_by: list[str] | None,
    table_name: str,
    table_type: str,
) -> list[str]:
    """Create-or-validate ``hoodie.properties``; returns the effective
    partition columns (inherited from the table when omitted)."""
    if fs.exists(props_path):
        body = fs.read_bytes(props_path).decode("utf-8")
        ttype = "MERGE_ON_READ" if "MERGE_ON_READ" in body else "COPY_ON_WRITE"
        if ttype != table_type:
            if table_type == "COPY_ON_WRITE":
                raise ValueError("cannot write into a MERGE_ON_READ table")
            raise ValueError(
                "hudi_upsert writes log files — a COPY_ON_WRITE table "
                "cannot carry them (use SnapTable.merge or write_delta "
                "for keyed CoW DML)"
            )
        existing = _props_partition_fields(body)
        part_cols = list(partition_by) if partition_by is not None else existing
        if part_cols != existing:
            raise ValueError(
                f"partitioning {part_cols} differs from the table's "
                f"{existing} (hoodie.table.partition.fields)"
            )
    else:
        part_cols = list(partition_by or [])
        fs.mkdirs(hoodie)
        extra = (
            f"hoodie.table.partition.fields={','.join(part_cols)}\n"
            if part_cols
            else ""
        )
        fs.write_bytes(
            props_path,
            (
                "#auto-generated\n"
                f"hoodie.table.name={table_name}\n"
                f"hoodie.table.type={table_type}\n" + extra
            ).encode("utf-8"),
        )
    missing = [c for c in part_cols if c not in df.columns]
    if missing:
        raise ValueError(f"partition columns not in the frame: {missing}")
    return part_cols


def _stage_partitioned(
    fs, df: DataFrame, stage: str, part_cols: list[str]
) -> list[tuple[str, str]]:
    """Write ``df`` into ``stage`` (hive dirs via duplicated ``__hw_``
    columns so data files keep the source columns); returns
    ``[(stage-relative path, partition path)]``."""
    from pyspark.sql import functions as F

    if part_cols:
        sdf = df
        for c in part_cols:
            sdf = sdf.withColumn(f"__hw_{c}", F.col(c).cast("string"))
        sdf.write.partitionBy(*[f"__hw_{c}" for c in part_cols]).mode(
            "overwrite"
        ).parquet(stage)
    else:
        df.write.mode("overwrite").parquet(stage)
    out: list[tuple[str, str]] = []
    for rel, _mt, _sz in fs.list_files(stage):
        if not rel.endswith(".parquet"):
            continue
        pdir = []
        for comp in rel.split("/")[:-1]:
            k, sep, v = comp.partition("=")
            if sep and k.startswith("__hw_"):
                pdir.append(f"{k[len('__hw_'):]}={v}")
        out.append((rel, "/".join(pdir)))
    return out


def write_hudi(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "append",
    table_name: str = "t",
    partition_by: list[str] | None = None,
    max_commit_retries: int = 20,
) -> dict:
    """Write ``df`` as one Hudi CoW commit. Returns ``{"instant",
    "files_added", "groups_replaced", "retries", "action"}``.
    ``partition_by`` lays data out hive-style (``col=val/``); omitted,
    it inherits the table's recorded partition fields."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append or overwrite: {mode!r}")
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    hoodie = posixpath.join(base, ".hoodie")
    props_path = posixpath.join(hoodie, "hoodie.properties")
    part_cols = _resolve_partitioning(
        fs, hoodie, props_path, df, partition_by, table_name,
        "COPY_ON_WRITE",
    )
    union = None
    if mode == "append":
        union = _check_schema_evolution(spark, base, df)
    if union is None:
        union = df.schema

    # groups to supersede on overwrite: recomputed from the LIVE
    # snapshot inside the retry loop — a concurrent append that lands
    # between our snapshot and our winning CAS must also be replaced,
    # or its rows would survive the insert_overwrite
    def _live_groups() -> dict[str, list[str]]:
        import re as _re

        out: dict[str, list[str]] = {}
        for p in hudi_snapshot(spark, base)["files"]:
            rel = p[len(base) + 1 :]
            m = _re.search(r"(?P<fid>[^_/]+)_[^_/]+_\d+\.parquet$", rel)
            if m:
                part = posixpath.dirname(rel)
                out.setdefault(part, []).append(m.group("fid"))
        return out

    replaced: dict[str, list[str]] = {}

    # ---- commit loop: claim the instant FIRST by staging data under
    # names carrying it; a lost claim bumps the instant and renames
    retries = 0
    last_instant: str | None = None
    stage = posixpath.join(base, f".stage-{uuid.uuid4().hex}")
    try:
        staged = _stage_partitioned(fs, df, stage, part_cols)
        while True:
            instant = _instant_now(last_instant)
            last_instant = instant
            suffix = "replacecommit" if mode == "overwrite" else "commit"
            meta: dict = {}
            rec_schema = _avro_schema_of(union)
            if rec_schema:
                # real-Hudi convention: the commit metadata records
                # the post-write table schema, so readers skip the
                # distributed footer-union pass
                meta["extraMetadata"] = {"schema": rec_schema}
            if mode == "overwrite":
                replaced = _live_groups()
                meta["partitionToReplaceFileIds"] = {
                    part: fids for part, fids in replaced.items()
                }
            tmp = posixpath.join(stage, f"commitmeta-{instant}.json")
            fs.write_bytes(tmp, json.dumps(meta).encode("utf-8"))
            dest = posixpath.join(hoodie, f"{instant}.{suffix}")
            # move the DATA first under this instant's names, then the
            # CAS on the instant file makes them visible atomically
            # (uncommitted instants are invisible to the reader)
            moved: list[tuple[str, str]] = []
            for rel, part in staged:
                fid = uuid.uuid4().hex
                dname = f"{fid}_{_DATA_RE_TOKEN}_{instant}.parquet"
                if part:
                    fs.mkdirs(posixpath.join(base, part))
                dpath = (
                    posixpath.join(base, part, dname)
                    if part
                    else posixpath.join(base, dname)
                )
                if not fs.rename(posixpath.join(stage, rel), dpath):
                    raise RuntimeError(f"could not move staged file {rel!r}")
                moved.append((dpath, part))
            if fs.rename_if_absent(tmp, dest):
                return {
                    "instant": instant,
                    "files_added": len(moved),
                    "groups_replaced": sum(
                        len(v) for v in replaced.values()
                    ),
                    "retries": retries,
                    "action": suffix,
                }
            # lost the instant: the moved files belong to an instant
            # that will never commit → rename them under the next one
            staged = []
            for dpath, part in moved:
                back = f"reclaim-{uuid.uuid4().hex}.parquet"
                fs.rename(dpath, posixpath.join(stage, back))
                staged.append((back, part))
            fs.delete(tmp, recursive=False)
            retries += 1
            if retries > max_commit_retries:
                raise RuntimeError(
                    f"lost the Hudi instant race {retries} times at {base!r}"
                )
    finally:
        fs.delete(stage, recursive=True)


# ---------------------------------------------------------------------------
# MERGE_ON_READ upsert (round 11) — the write-side complement of the
# round-11 MOR reader: updates/inserts land as Avro log blocks
# (sources/hudilog.py) on the owning file group, exactly the streaming
# upsert shape MOR exists for. Routing is Hudi's "simple index": one
# distributed join of the incoming keys against the live (key → file
# group) mapping scanned from base files + decoded log rows. Matched
# rows append a data block to THEIR group's next log file; unmatched
# keys start one new log-only file group. The commit point is the
# .deltacommit instant claimed via PUT-IF-ABSENT, so uncommitted log
# files stay invisible, same as write_hudi's data files.
#
# Honest bound: the routed rows are collected driver-side to encode
# the log blocks (`max_upsert_rows`, default 10M, fails loudly toward
# a CoW rewrite); column types are restricted to Avro-primitive-
# mappable Spark types.
# ---------------------------------------------------------------------------

_WIDEN_OK = {
    frozenset(p)
    for p in (
        ("int", "bigint"), ("smallint", "int"), ("smallint", "bigint"),
        ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
        ("float", "double"),
    )
}
_WIDTH_RANK = {
    "tinyint": 0, "smallint": 1, "int": 2, "bigint": 3,
    "float": 0, "double": 1,
}


def _avro_type_node(dt):
    """Avro type node for a Spark type — primitives plus the logical
    types the in-repo codec round-trips (date, timestamp-micros,
    decimal); ``None`` when unmappable."""
    tn = dt.typeName()
    prim = _AVRO_PRIM.get(tn)
    if prim is not None:
        return prim
    if tn == "date":
        return {"type": "int", "logicalType": "date"}
    if tn == "timestamp":
        return {"type": "long", "logicalType": "timestamp-micros"}
    if tn == "decimal":
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": int(dt.precision),
            "scale": int(dt.scale),
        }
    return None


def _avro_schema_of(schema) -> str | None:
    """Avro record schema for a Spark schema, or None when a column
    type has no Avro mapping (the caller then skips recording and
    readers fall back to the footer union)."""
    fields = []
    for f in schema.fields:
        node = _avro_type_node(f.dataType)
        if node is None:
            return None
        fields.append({"name": f.name, "type": ["null", node]})
    return json.dumps({"type": "record", "name": "rec", "fields": fields})


def _check_schema_evolution(
    spark: SparkSession, base: str, df, allow_new: bool = True
):
    """Append-time schema guard: a column present in both the live
    table and the batch must keep its type (lossless integer/float
    widening in either direction is allowed — the reader's union
    footer schema resolves to the wider type); conflicts raise before
    any data is staged. New and batch-missing columns are legal
    evolution for CoW appends — the union read fills nulls.
    ``allow_new=False`` (the MOR upsert path) also rejects NEW
    columns: they would ride log blocks the reader's base-file
    schema derivation never sees, so they'd silently vanish from
    merged reads.

    Returns the post-write TABLE schema (the union of the live schema
    and the batch, widened where applicable) for the caller to record
    in the commit metadata, or ``None`` for an empty table."""
    from pyspark.sql import types as T

    from harness_aws_etl_pipeline_spark.sources.hudiread import (
        hudi_snapshot,
        hudi_table_schema,
    )

    snap = hudi_snapshot(spark, base)
    if not snap["files"] and not snap.get("log_files"):
        return None
    cur = hudi_table_schema(spark, base, snap)
    if cur is None:
        return None
    cur_f = {f.name: f for f in cur.fields}
    for f in df.schema.fields:
        c = cur_f.get(f.name)
        b = f.dataType.simpleString()
        if c is None:
            if allow_new:
                continue
            raise ValueError(
                f"upsert batch adds column {f.name!r} not in the "
                "table; log-merged reads cannot surface log-only "
                "columns — rewrite the table with the evolved schema "
                "(write_hudi overwrite) first"
            )
        t = c.dataType.simpleString()
        if b == t or frozenset((b, t)) in _WIDEN_OK:
            continue
        raise ValueError(
            f"append schema conflict on column {f.name!r}: table has "
            f"{t}, batch has {b} (only lossless widening is allowed)"
        )
    # union: table fields first (widened where the batch is wider),
    # then the batch's new fields
    batch_f = {f.name: f for f in df.schema.fields}
    out = []
    for f in cur.fields:
        b = batch_f.get(f.name)
        if (
            b is not None
            and _WIDTH_RANK.get(b.dataType.simpleString(), -1)
            > _WIDTH_RANK.get(f.dataType.simpleString(), -1)
            and frozenset(
                (b.dataType.simpleString(), f.dataType.simpleString())
            )
            in _WIDEN_OK
        ):
            out.append(T.StructField(f.name, b.dataType, True))
        else:
            out.append(f)
    for f in df.schema.fields:
        if f.name not in cur_f:
            out.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(out)


_AVRO_PRIM = {
    "long": "long",
    "integer": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
}


def _avro_schema_for(df: DataFrame) -> str:
    fields = []
    for f in df.schema.fields:
        node = _avro_type_node(f.dataType)
        if node is None:
            raise ValueError(
                "hudi_upsert supports Avro-mappable column types only "
                "(primitives, date, timestamp, decimal); column "
                f"{f.name!r} is {f.dataType.simpleString()}"
            )
        fields.append({"name": f.name, "type": ["null", node]})
    return json.dumps({"type": "record", "name": "rec", "fields": fields})


def hudi_upsert(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key_col: str,
    table_name: str = "t",
    partition_by: list[str] | None = None,
    max_upsert_rows: int = 10_000_000,
    max_commit_retries: int = 20,
) -> dict:
    """Keyed upsert into a MERGE_ON_READ table (created on first call).
    Returns ``{"instant", "rows_upserted", "groups_logged",
    "new_groups", "retries"}``. With ``partition_by`` the simple index
    is partition-scoped — (partition path, record key) is the record
    identity, Hudi's non-global index — and log files land inside
    their partition's directory."""
    from harness_aws_etl_pipeline_spark.sources.hudilog import (
        encode_avro_block,
    )
    from harness_aws_etl_pipeline_spark.sources.hudiread import (
        hudi_snapshot,
        hudi_timeline,
    )

    if key_col not in df.columns:
        raise ValueError(f"key column {key_col!r} not in the frame")
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    hoodie = posixpath.join(base, ".hoodie")
    props_path = posixpath.join(hoodie, "hoodie.properties")
    part_cols = _resolve_partitioning(
        fs, hoodie, props_path, df, partition_by, table_name,
        "MERGE_ON_READ",
    )

    # ---- normalize the frame: meta columns first, like Hudi's layout
    from pyspark.sql import functions as F

    if part_cols:
        ppath = F.concat_ws(
            "/",
            *[
                F.concat(
                    F.lit(f"{c}="),
                    F.coalesce(
                        F.col(c).cast("string"),
                        F.lit("__HIVE_DEFAULT_PARTITION__"),
                    ),
                )
                for c in part_cols
            ],
        )
    elif "_hoodie_partition_path" in df.columns:
        ppath = F.coalesce(
            F.col("_hoodie_partition_path").cast("string"), F.lit("")
        )
    else:
        ppath = F.lit("")
    meta_free = [c for c in df.columns if not c.startswith("_hoodie_")]
    up = df.select(
        F.col(key_col).cast("string").alias("_hoodie_record_key"),
        ppath.alias("_hoodie_partition_path"),
        *[F.col(c) for c in meta_free],
    )
    table_union = _check_schema_evolution(spark, base, up, allow_new=False)

    # ---- driver-side row gate FIRST: log-block encoding is
    # driver-side, so the cap must fire before ANY other collect
    # (including the routing join below) can materialize an oversized
    # frame on the driver
    # collect under UTC so TimestampType values arrive as UTC wall
    # clocks — the avro encoder treats naive datetimes as UTC, and
    # timestamp-micros is a UTC instant per the spec (zone-proof,
    # the write_delta stats precedent)
    _tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        rows = up.limit(max_upsert_rows + 1).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", _tz)
    if len(rows) > max_upsert_rows:
        raise ValueError(
            f"upsert frame exceeds {max_upsert_rows} rows; log-block "
            "encoding is driver-side — batch the upsert or use a CoW "
            "rewrite"
        )
    schema_json = _avro_schema_for(up)
    names = up.columns

    # ---- simple index: route the (now bounded) incoming keys against
    # the live (record key → file group) mapping. The fid is always
    # derived from file metadata (_keys_with_groups): genuine Hudi
    # tables store the full file NAME in _hoodie_file_name, never the
    # bare fileId, so that column cannot be used as the group id.
    snap = hudi_snapshot(spark, base)
    key_to_fid: dict[tuple[str, str], str] = {}
    if snap["files"] or snap["log_files"]:
        keys = sorted(
            {
                (r["_hoodie_record_key"], r["_hoodie_partition_path"])
                for r in rows
            }
        )
        kdf = spark.createDataFrame(
            keys,
            "_hoodie_record_key string, _hoodie_partition_path string",
        )
        hits = kdf.join(
            _keys_with_groups(spark, base, snap),
            ["_hoodie_record_key", "_hoodie_partition_path"],
        ).collect()
        key_to_fid = {
            (r["_hoodie_record_key"], r["_hoodie_partition_path"]): r["fid"]
            for r in hits
        }

    # group key: (partition path, fid-or-None) — one log file (or one
    # fresh log-only group) per partitioned file group
    by_group: dict[tuple[str, str | None], list[dict]] = {}
    for r in rows:
        rec = {n: r[n] for n in names}
        if isinstance(rec.get(key_col), (bytes, bytearray)):
            raise ValueError("binary key columns are not supported")
        part = rec["_hoodie_partition_path"] or ""
        fid = key_to_fid.get((rec["_hoodie_record_key"], part))
        by_group.setdefault((part, fid), []).append(rec)

    def _group_meta(
        s: dict,
    ) -> tuple[dict[tuple[str, str], int], dict[tuple[str, str], str]]:
        """Per (partition, file group): newest log version and the
        base instant its next log file must name."""
        nv: dict[tuple[str, str], int] = {}
        bi: dict[tuple[str, str], str] = {}
        for lf in s.get("log_files") or []:
            k = (lf["part"], lf["fid"])
            nv[k] = max(nv.get(k, 0), int(lf["version"]))
            bi[k] = lf["base_instant"]
        for p in s.get("files") or []:
            rel = p[len(base) + 1 :] if p.startswith(base) else p
            m = _DATA_RE_PAT.search(rel)
            if m:
                bi.setdefault(
                    (posixpath.dirname(rel), m.group("fid")), m.group("ts")
                )
        return nv, bi

    next_ver, base_instant = _group_meta(snap)
    tl = hudi_timeline(spark, base)
    timeline_last = tl[-1]["instant"] if tl else None

    retries = 0
    staged: list[str] = []
    while True:
        instant = _instant_now(timeline_last)
        timeline_last = instant
        # per-attempt unique write token: two racing upserts on the
        # same file group must never share a log path — a shared name
        # would let the second write overwrite the first and the CAS
        # loser's cleanup delete the winner's committed file
        token = uuid.uuid4().hex
        staged = []
        groups_logged = new_groups = 0
        for (part, fid), recs in sorted(
            by_group.items(), key=lambda kv: (kv[0][0], str(kv[0][1]))
        ):
            block = encode_avro_block(schema_json, recs, instant)
            if fid is None:
                gid = uuid.uuid4().hex
                name = f".{gid}_{instant}.log.1_{token}"
                new_groups += 1
            else:
                bts = base_instant.get((part, fid))
                if bts is None:
                    raise RuntimeError(
                        f"file group {fid!r} vanished while retrying "
                        "the upsert commit (concurrent replace?); "
                        "re-run the upsert"
                    )
                ver = next_ver.get((part, fid), 0) + 1
                name = f".{fid}_{bts}.log.{ver}_{token}"
                groups_logged += 1
            if part:
                fs.mkdirs(posixpath.join(base, part))
            rel = posixpath.join(part, name) if part else name
            fs.write_bytes(posixpath.join(base, rel), block)
            staged.append(rel)
        tmp = posixpath.join(hoodie, f".commitmeta-{uuid.uuid4().hex}")
        rec_schema = _avro_schema_of(table_union) if table_union is not None else schema_json
        fs.write_bytes(
            tmp,
            json.dumps(
                {"extraMetadata": {"schema": rec_schema}}
                if rec_schema
                else {}
            ).encode("utf-8"),
        )
        dest = posixpath.join(hoodie, f"{instant}.deltacommit")
        if fs.rename_if_absent(tmp, dest):
            return {
                "instant": instant,
                "rows_upserted": len(rows),
                "groups_logged": groups_logged,
                "new_groups": new_groups,
                "retries": retries,
            }
        # lost the instant: the written log files reference an instant
        # that will never commit — the reader's committed-instant
        # filter makes them invisible, but clean up anyway (safe: the
        # unique token means no other writer shares these paths)
        fs.delete(tmp, recursive=False)
        for name in staged:
            fs.delete(posixpath.join(base, name), recursive=False)
        retries += 1
        if retries > max_commit_retries:
            raise RuntimeError(
                f"lost the Hudi instant race {retries} times at {base!r}"
            )
        # the racer that beat us may have appended log blocks or
        # compacted a base — recompute versions/base instants from a
        # FRESH snapshot so the retry names the correct next slice
        snap = hudi_snapshot(spark, base)
        next_ver, base_instant = _group_meta(snap)
        tl = hudi_timeline(spark, base)
        if tl and tl[-1]["instant"] > timeline_last:
            timeline_last = tl[-1]["instant"]


_DATA_RE_PAT = re.compile(
    r"(?P<fid>[^_/]+)_(?P<tok>[^_/]+)_(?P<ts>\d+)\.parquet$"
)


def _keys_with_groups(spark, base: str, snap: dict):
    """(record key, partition path, fid) over the LIVE view: base
    files keyed by their file PATH (partition dir + filename fid, the
    authoritative group identity); log rows keyed by their log file's
    (part, fid)."""
    import re as _re

    from pyspark.sql import functions as F

    out = None
    if snap["files"]:
        rel = F.regexp_replace(
            F.regexp_replace(
                F.col("_metadata.file_path"), r"^[a-zA-Z0-9+.-]+:/+", "/"
            ),
            "^" + _re.escape(base) + "/",
            "",
        )
        out = (
            spark.read.parquet(*snap["files"])
            .select(
                "_hoodie_record_key",
                F.regexp_extract(rel, r"^(.*)/[^/]+$", 1).alias(
                    "_hoodie_partition_path"
                ),
                F.regexp_extract(
                    F.col("_metadata.file_path"),
                    r"([^_/]+)_[^_/]+_\d+\.parquet$",
                    1,
                ).alias("fid"),
            )
        )
    for lf in snap.get("log_files") or []:
        from harness_aws_etl_pipeline_spark.sources.hudilog import (
            decode_log_blocks,
        )

        fs = get_fs(base, spark)
        keys = set()
        for blk in decode_log_blocks(fs.read_bytes(lf["path"])):
            if blk["instant"] not in set(snap["committed"]):
                continue
            if blk["type"] == "avro":
                keys.update(
                    r.get("_hoodie_record_key") for r in blk["records"]
                )
            else:
                for k, _p in blk["deletes"]:
                    keys.discard(k)
        if keys:
            kdf = spark.createDataFrame(
                [(k, lf["part"], lf["fid"]) for k in sorted(keys)],
                "_hoodie_record_key string, _hoodie_partition_path "
                "string, fid string",
            )
            out = kdf if out is None else out.unionByName(kdf)
    if out is None:
        out = spark.createDataFrame(
            [],
            "_hoodie_record_key string, _hoodie_partition_path string, "
            "fid string",
        )
    return out.dropDuplicates(
        ["_hoodie_record_key", "_hoodie_partition_path"]
    )
