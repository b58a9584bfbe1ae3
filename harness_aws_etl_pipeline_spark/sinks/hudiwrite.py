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
insert_overwrite only — no record-key upserts (use SnapTable.merge
and export, or write_delta, for keyed DML).
"""

from __future__ import annotations

import json
import posixpath
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs
from harness_aws_etl_pipeline_spark.sources.hudiread import hudi_snapshot

__all__ = ["write_hudi"]

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
