"""Read Apache Hudi Copy-on-Write tables WITHOUT the Hudi jar — the
third leg of the no-jar lakehouse interop tier (Delta, Iceberg,
Hudi). Hudi's table layout is an open spec (hudi.apache.org/tech-specs):
a ``.hoodie/`` timeline of instant files (``<instant>.commit`` marks a
COMPLETED commit) plus data files named
``<fileId>_<writeToken>_<instantTime>.parquet`` — a FILE GROUP is all
versions of one fileId, and a snapshot at instant T is, per file
group, the newest file slice with ``instantTime <= T``.

Scope (honest): COPY_ON_WRITE tables only — MERGE_ON_READ needs log-
file merging (Avro delta blocks applied over base files) and is
DETECTED via ``hoodie.properties`` and rejected loudly. Snapshot and
as-of-instant (time travel) reads; partitioned layouts supported by
walking the data tree. Hudi's ``_hoodie_*`` meta columns are stored
IN the parquet files and pass through (drop them with
``drop_meta=True``).

Scale shape: timeline + file listing is driver-side metadata (what
every Hudi client's file-system view does); the data read is one
stock parquet scan over the chosen slices.
"""

from __future__ import annotations

import json
import posixpath
import re

from pyspark.sql import DataFrame, SparkSession

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

__all__ = ["hudi_changes", "hudi_snapshot", "hudi_timeline", "read_hudi"]

_DATA_RE = re.compile(r"(?P<fid>[^_/]+)_(?P<tok>[^_/]+)_(?P<ts>\d+)\.parquet$")
_META_COLS = (
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
    "_hoodie_file_name",
)


def _properties(fs, base: str) -> dict:
    p = posixpath.join(base, ".hoodie", "hoodie.properties")
    if not fs.exists(p):
        raise ValueError(f"not a Hudi table (no .hoodie/hoodie.properties): {base}")
    props: dict[str, str] = {}
    for line in fs.read_bytes(p).decode("utf-8").splitlines():
        line = line.strip()
        if line and not line.startswith("#") and "=" in line:
            k, _, v = line.partition("=")
            props[k.strip()] = v.strip()
    return props


def hudi_timeline(spark: SparkSession, path: str) -> list[dict]:
    """Completed commits, oldest first: [{"instant", "action"}]."""
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    _properties(fs, base)  # existence check
    out = []
    for rel, _mt, _sz in fs.list_files(posixpath.join(base, ".hoodie")):
        name = posixpath.basename(rel)
        m = re.fullmatch(r"(\d+)\.(commit|replacecommit)", name)
        if m:
            out.append({"instant": m.group(1), "action": m.group(2)})
    return sorted(out, key=lambda x: x["instant"])


def hudi_snapshot(
    spark: SparkSession, path: str, as_of_instant: str | None = None
) -> dict:
    """Resolve the snapshot: ``{"instant", "files": [paths],
    "table_type", "file_groups"}`` — per file group, the newest slice
    at or before the target instant."""
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    props = _properties(fs, base)
    ttype = props.get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype != "COPY_ON_WRITE":
        raise ValueError(
            f"Hudi table type {ttype} needs log-file merging this "
            "plain-parquet reader does not provide (compact to CoW first)"
        )
    timeline = hudi_timeline(spark, path)
    if not timeline:
        return {
            "instant": None, "files": [], "table_type": ttype,
            "file_groups": 0,
        }
    completed = [t["instant"] for t in timeline]
    target = as_of_instant or completed[-1]
    if target not in completed:
        usable = [i for i in completed if i <= target]
        if not usable:
            raise ValueError(
                f"no completed Hudi commit at or before {target!r}"
            )
        target = usable[-1]
    committed = {i for i in completed if i <= target}

    # replacecommits (clustering / insert_overwrite) supersede ENTIRE
    # file groups: the replaced fileIds stay on disk until cleaning,
    # so without this exclusion every affected row would be returned
    # twice (or stale rows would resurface). Time travel before the
    # replacecommit still sees the old groups — only replacecommits at
    # or before the target instant apply (round-10 fix).
    replaced: set[tuple[str, str]] = set()
    for t in timeline:
        if t["action"] != "replacecommit" or t["instant"] not in committed:
            continue
        p = posixpath.join(base, ".hoodie", f"{t['instant']}.replacecommit")
        try:
            meta = json.loads(fs.read_bytes(p).decode("utf-8") or "{}")
        except ValueError as ex:
            raise ValueError(
                f"unreadable Hudi replacecommit metadata {p}: {ex}"
            ) from ex
        for part, fids in (meta.get("partitionToReplaceFileIds") or {}).items():
            for fid in fids or []:
                replaced.add((part.strip("/"), fid))

    groups: dict[tuple[str, str], tuple[str, str]] = {}
    for rel, _mt, _sz in fs.list_files(base):
        if rel.startswith(".hoodie"):
            continue
        m = _DATA_RE.search(rel)
        if not m:
            continue
        ts = m.group("ts")
        if ts not in committed:
            continue  # in-flight / post-target slice
        part = posixpath.dirname(rel)
        key = (part, m.group("fid"))
        if (part.strip("/"), m.group("fid")) in replaced:
            continue  # file group superseded by a replacecommit
        if key not in groups or groups[key][0] < ts:
            groups[key] = (ts, posixpath.join(base, rel))
    return {
        "instant": target,
        "files": sorted(p for _ts, p in groups.values()),
        "table_type": ttype,
        "file_groups": len(groups),
    }


def read_hudi(
    spark: SparkSession,
    path: str,
    as_of_instant: str | None = None,
    drop_meta: bool = False,
) -> DataFrame:
    """The CoW snapshot as a DataFrame (time travel via
    ``as_of_instant``); ``drop_meta=True`` strips the ``_hoodie_*``
    bookkeeping columns the files carry."""
    snap = hudi_snapshot(spark, path, as_of_instant)
    if not snap["files"]:
        raise ValueError("Hudi table has no completed snapshot to read")
    df = spark.read.parquet(*snap["files"])
    if drop_meta:
        df = df.drop(*[c for c in _META_COLS if c in df.columns])
    return df


def hudi_changes(
    spark: SparkSession,
    path: str,
    since_instant: str,
    to_instant: str | None = None,
    drop_meta: bool = False,
) -> DataFrame:
    """Append-only incremental consumer (completes the trio next to
    ``delta_changes`` / ``iceberg_changes``): rows in file GROUPS that
    first appeared after ``since_instant`` up to ``to_instant``.

    CoW semantics make the guard precise: an instant that writes a new
    slice into an EXISTING file group rewrote rows (update/delete) —
    not representable as added rows — and any ``replacecommit`` in the
    window supersedes whole groups; both raise. Pure appends create
    only brand-new fileIds, whose single slice is exactly the new
    rows."""
    lo = hudi_snapshot(spark, path, since_instant)
    hi = hudi_snapshot(spark, path, to_instant)
    if lo["instant"] is None:
        raise ValueError("since_instant predates every completed commit")
    timeline = hudi_timeline(spark, path)
    in_window = [
        t
        for t in timeline
        if lo["instant"] < t["instant"] <= (hi["instant"] or "")
    ]
    for t in in_window:
        if t["action"] == "replacecommit":
            raise ValueError(
                f"instants ({lo['instant']}, {hi['instant']}] contain "
                f"replacecommit {t['instant']}; append-only change "
                "capture cannot represent that window"
            )

    def _groups(snap: dict) -> dict[tuple[str, str], str]:
        out = {}
        for p in snap["files"]:
            rel = p[len(path.rstrip("/")) + 1 :] if p.startswith(
                path.rstrip("/")
            ) else p
            m = _DATA_RE.search(rel)
            if m:
                out[(posixpath.dirname(rel), m.group("fid"))] = p
        return out

    lo_g = _groups(lo)
    hi_g = _groups(hi)
    rewritten = [
        k for k in lo_g if k in hi_g and lo_g[k] != hi_g[k]
    ]
    dropped = [k for k in lo_g if k not in hi_g]
    if rewritten or dropped:
        raise ValueError(
            f"instants ({lo['instant']}, {hi['instant']}] rewrite "
            f"{len(rewritten)} and drop {len(dropped)} pre-existing file "
            "group(s); append-only change capture cannot represent that "
            "window"
        )
    new_paths = sorted(hi_g[k] for k in hi_g if k not in lo_g)
    if not new_paths:
        schema = spark.read.parquet(*hi["files"]).schema if hi["files"] else None
        if schema is None:
            raise ValueError("Hudi table has no files to derive a schema from")
        return spark.createDataFrame([], schema)
    df = spark.read.parquet(*new_paths)
    if drop_meta:
        df = df.drop(*[c for c in _META_COLS if c in df.columns])
    return df
