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

Scope (honest): CoW, unpartitioned layout (Hudi data files CONTAIN
all columns, so partitioned layouts are a directory-shape concern the
reader already walks; the writer keeps one flat layout), append /
insert_overwrite, plus (round 11) MERGE_ON_READ keyed
upserts via ``hudi_upsert`` — log-block appends routed by a simple
index, the streaming-upsert shape MOR exists for.
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


def write_hudi(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "append",
    table_name: str = "t",
    max_commit_retries: int = 20,
) -> dict:
    """Write ``df`` as one Hudi CoW commit. Returns ``{"instant",
    "files_added", "groups_replaced", "retries", "action"}``."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append or overwrite: {mode!r}")
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    hoodie = posixpath.join(base, ".hoodie")
    props_path = posixpath.join(hoodie, "hoodie.properties")
    if fs.exists(props_path):
        body = fs.read_bytes(props_path).decode("utf-8")
        if "MERGE_ON_READ" in body:
            raise ValueError("cannot write into a MERGE_ON_READ table")
    else:
        fs.mkdirs(hoodie)
        fs.write_bytes(
            props_path,
            (
                "#auto-generated\n"
                f"hoodie.table.name={table_name}\n"
                "hoodie.table.type=COPY_ON_WRITE\n"
            ).encode("utf-8"),
        )

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
        df.write.mode("overwrite").parquet(stage)
        staged = [
            rel
            for rel, _mt, _sz in fs.list_files(stage)
            if rel.endswith(".parquet")
        ]
        while True:
            instant = _instant_now(last_instant)
            last_instant = instant
            suffix = "replacecommit" if mode == "overwrite" else "commit"
            meta: dict = {}
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
            moved = []
            for rel in staged:
                fid = uuid.uuid4().hex
                dname = f"{fid}_{_DATA_RE_TOKEN}_{instant}.parquet"
                if not fs.rename(
                    posixpath.join(stage, rel), posixpath.join(base, dname)
                ):
                    raise RuntimeError(f"could not move staged file {rel!r}")
                moved.append(dname)
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
            for dname in moved:
                back = f"reclaim-{uuid.uuid4().hex}.parquet"
                fs.rename(
                    posixpath.join(base, dname), posixpath.join(stage, back)
                )
                staged.append(back)
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
        prim = _AVRO_PRIM.get(f.dataType.typeName())
        if prim is None:
            raise ValueError(
                f"hudi_upsert supports Avro-primitive column types only; "
                f"column {f.name!r} is {f.dataType.simpleString()}"
            )
        fields.append({"name": f.name, "type": ["null", prim]})
    return json.dumps({"type": "record", "name": "rec", "fields": fields})


def hudi_upsert(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key_col: str,
    table_name: str = "t",
    max_upsert_rows: int = 10_000_000,
    max_commit_retries: int = 20,
) -> dict:
    """Keyed upsert into a MERGE_ON_READ table (created on first call).
    Returns ``{"instant", "rows_upserted", "groups_logged",
    "new_groups", "retries"}``."""
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
    if fs.exists(props_path):
        body = fs.read_bytes(props_path).decode("utf-8")
        if "MERGE_ON_READ" not in body:
            raise ValueError(
                "hudi_upsert writes log files — a COPY_ON_WRITE table "
                "cannot carry them (use SnapTable.merge or write_delta "
                "for keyed CoW DML)"
            )
    else:
        fs.mkdirs(hoodie)
        fs.write_bytes(
            props_path,
            (
                "#auto-generated\n"
                f"hoodie.table.name={table_name}\n"
                "hoodie.table.type=MERGE_ON_READ\n"
            ).encode("utf-8"),
        )

    # ---- normalize the frame: meta columns first, like Hudi's layout
    from pyspark.sql import functions as F

    meta_free = [c for c in df.columns if not c.startswith("_hoodie_")]
    up = df.select(
        F.col(key_col).cast("string").alias("_hoodie_record_key"),
        F.lit("").alias("_hoodie_partition_path"),
        *[F.col(c) for c in meta_free],
    )

    # ---- driver-side row gate FIRST: log-block encoding is
    # driver-side, so the cap must fire before ANY other collect
    # (including the routing join below) can materialize an oversized
    # frame on the driver
    rows = up.limit(max_upsert_rows + 1).collect()
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
    key_to_fid: dict[str, str] = {}
    if snap["files"] or snap["log_files"]:
        keys = sorted({r["_hoodie_record_key"] for r in rows})
        kdf = spark.createDataFrame(
            [(k,) for k in keys], "_hoodie_record_key string"
        )
        hits = kdf.join(
            _keys_with_groups(spark, base, snap), "_hoodie_record_key"
        ).collect()
        key_to_fid = {r[0]: r[1] for r in hits}

    by_group: dict[str | None, list[dict]] = {}
    for r in rows:
        rec = {n: r[n] for n in names}
        if isinstance(rec.get(key_col), (bytes, bytearray)):
            raise ValueError("binary key columns are not supported")
        fid = key_to_fid.get(rec["_hoodie_record_key"])
        by_group.setdefault(fid, []).append(rec)

    def _group_meta(s: dict) -> tuple[dict[str, int], dict[str, str]]:
        """Per file group: newest log version and the base instant its
        next log file must name."""
        nv: dict[str, int] = {}
        bi: dict[str, str] = {}
        for lf in s.get("log_files") or []:
            nv[lf["fid"]] = max(nv.get(lf["fid"], 0), int(lf["version"]))
            bi[lf["fid"]] = lf["base_instant"]
        for p in s.get("files") or []:
            m = _DATA_RE_PAT.search(p)
            if m:
                bi.setdefault(m.group("fid"), m.group("ts"))
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
        for fid, recs in sorted(
            by_group.items(), key=lambda kv: str(kv[0])
        ):
            block = encode_avro_block(schema_json, recs, instant)
            if fid is None:
                gid = uuid.uuid4().hex
                name = f".{gid}_{instant}.log.1_{token}"
                new_groups += 1
            else:
                bts = base_instant.get(fid)
                if bts is None:
                    raise RuntimeError(
                        f"file group {fid!r} vanished while retrying "
                        "the upsert commit (concurrent replace?); "
                        "re-run the upsert"
                    )
                ver = next_ver.get(fid, 0) + 1
                name = f".{fid}_{bts}.log.{ver}_{token}"
                groups_logged += 1
            fs.write_bytes(posixpath.join(base, name), block)
            staged.append(name)
        tmp = posixpath.join(hoodie, f".commitmeta-{uuid.uuid4().hex}")
        fs.write_bytes(tmp, b"{}")
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
    """(record key, fid) over the LIVE view: base files keyed by their
    filename's fid; log rows keyed by their log file's fid."""
    from pyspark.sql import functions as F

    out = None
    if snap["files"]:
        out = (
            spark.read.parquet(*snap["files"])
            .select(
                "_hoodie_record_key",
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
                [(k, lf["fid"]) for k in sorted(keys)],
                "_hoodie_record_key string, fid string",
            )
            out = kdf if out is None else out.unionByName(kdf)
    if out is None:
        out = spark.createDataFrame(
            [], "_hoodie_record_key string, fid string"
        )
    return out.dropDuplicates(["_hoodie_record_key"])
