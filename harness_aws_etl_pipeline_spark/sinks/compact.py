"""Lakehouse MAINTENANCE — compaction for all three formats, no jar:
the lifecycle close-out of the round-10/11 DML and MOR machinery.

- :func:`delta_optimize` — bin-pack small files and PURGE deletion
  vectors (rows materialize into clean files): the commit removes the
  candidates and adds the rewritten files all with ``dataChange:
  false``, which is exactly what lets ``delta_changes`` and the
  ``delta_nojar`` stream source pass over compaction windows without
  re-emitting rows (the real Delta OPTIMIZE contract).
- :func:`iceberg_compact` — major compaction: the live snapshot (with
  position AND equality deletes applied) rewrites into fresh data
  files; the new snapshot's manifest list carries ONLY the new
  manifest, so every delete file falls out of scope.
- :func:`hudi_compact` — MOR compaction: each file group carrying
  delta logs gets its merged slice written as a NEW base parquet at a
  fresh ``commit`` instant; the reader's newest-slice rule then
  ignores the old base + logs (their base instant no longer matches).

All three commit through their format's native claim (put-if-absent
NNN.json / CAS metadata rename / instant CAS), so they compose with
concurrent writers the same way the writers themselves do.
"""

from __future__ import annotations

import json
import math
import posixpath
import time
import uuid

from pyspark.sql import SparkSession

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

__all__ = [
    "compact_lake",
    "compact_table",
    "delta_optimize",
    "delta_vacuum",
    "hudi_clean",
    "hudi_compact",
    "iceberg_compact",
    "iceberg_expire_snapshots",
]


def delta_optimize(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    small_file_bytes: int | None = None,
    purge_dvs: bool = True,
    zorder_by: list[str] | None = None,
    max_commit_retries: int = 20,
) -> dict:
    """OPTIMIZE: rewrite files smaller than ``small_file_bytes``
    (default half the target) plus, with ``purge_dvs``, every file
    carrying a deletion vector, into ~``target_file_bytes`` files.
    ``zorder_by`` lays the rewritten rows along the Morton curve of
    the named columns (OPTIMIZE ZORDER BY — with zorder EVERY live
    file of the affected partitions is rewritten, not just small
    ones, since the clustering is global per partition). Returns
    ``{"version", "files_removed", "files_added", "dvs_purged",
    "retries"}`` (version None = nothing to do).

    Partitioned tables optimize PER PARTITION (a bin never crosses a
    partition boundary, like the real OPTIMIZE). Column-mapped tables
    (name and id mode) are supported: the rewrite reads through the
    mapped plan (logical names) and stages back through the DML
    writer's physical layout, with physical partitionValues keys and
    physical-named per-file stats."""
    from harness_aws_etl_pipeline_spark.sources.deltaread import (
        _commit_files,
        _read_files_with_partitions,
        delta_snapshot,
    )

    base = path.rstrip("/")
    fs = get_fs(base, spark)
    snap = delta_snapshot(spark, base)
    phys = (snap.get("column_mapping") or {}).get("physical") or {}
    pcols = snap["partition_columns"]
    small = small_file_bytes or target_file_bytes // 2

    def _is_cand(add: dict) -> bool:
        if zorder_by:
            return True  # global re-clustering rewrites every file
        return int(add.get("size") or 0) < small or (
            purge_dvs
            and (add.get("deletionVector") or {}).get("storageType")
        )

    # candidates grouped by partition tuple; a group qualifies with
    # >= 2 bin-packable files or any DV to purge
    by_part: dict[tuple, dict[str, dict]] = {}
    for k, add in snap["files"].items():
        if not _is_cand(add):
            continue
        pv = add.get("partitionValues") or {}
        # partitionValues keys are PHYSICAL on mapped tables
        by_part.setdefault(
            tuple(pv.get(phys.get(c, c)) for c in pcols), {}
        )[k] = add
    cands: dict[str, dict] = {}
    groups: dict[tuple, dict[str, dict]] = {}
    for pkey, files in by_part.items():
        has_dv = any(
            (a.get("deletionVector") or {}).get("storageType")
            for a in files.values()
        )
        if zorder_by or len(files) >= 2 or has_dv:
            groups[pkey] = files
            cands.update(files)
    dvs = sum(
        1
        for a in cands.values()
        if (a.get("deletionVector") or {}).get("storageType")
    )
    if not cands:
        return {
            "version": None, "files_removed": 0, "files_added": 0,
            "dvs_purged": 0, "retries": 0,
        }

    # rewrite per partition group (DVs applied by the reader); new
    # files land at the table root with exact partitionValues in their
    # add actions — the protocol's source of truth (directory layout
    # is convention)
    new_files: dict[str, tuple[int, tuple]] = {}
    for pkey, files in sorted(groups.items(), key=lambda kv: str(kv[0])):
        subsnap = dict(snap)
        subsnap["files"] = files
        df = _read_files_with_partitions(spark, base, subsnap)
        if pcols:
            df = df.drop(*pcols)  # physical layout omits them
        total = sum(int(a.get("size") or 0) for a in files.values())
        nfiles = max(1, math.ceil(total / target_file_bytes))
        if zorder_by:
            from harness_aws_etl_pipeline_spark.operators.zorder import (
                zorder_by as _zorder,
            )

            df = _zorder(df, zorder_by, partitions=nfiles)
        else:
            df = df.repartition(nfiles)
        if phys:
            from harness_aws_etl_pipeline_spark.sinks.deltadml import (
                _physicalize_for_write,
            )

            df = _physicalize_for_write(spark, snap, df)
        stage = posixpath.join(base, f".dlw_stage-{uuid.uuid4().hex}")
        try:
            df.write.mode("overwrite").parquet(stage)
            for rel, _mt, size in fs.list_files(stage):
                if not rel.endswith(".parquet"):
                    continue
                dest = f"part-{uuid.uuid4().hex}.snappy.parquet"
                if not fs.rename(
                    posixpath.join(stage, rel), posixpath.join(base, dest)
                ):
                    raise RuntimeError(
                        f"could not move staged file {rel!r}"
                    )
                new_files[dest] = (size, pkey)
        finally:
            fs.delete(stage, recursive=True)

    # per-file stats for the rewritten files (real OPTIMIZE refreshes
    # them — data-skipping is half the point of clustering)
    from harness_aws_etl_pipeline_spark.sinks.deltawrite import (
        _collect_stats,
    )

    stats_frame = spark.createDataFrame([], snap["schema"])
    if phys:
        from harness_aws_etl_pipeline_spark.sinks.deltadml import (
            _physicalize_for_write,
        )

        stats_frame = _physicalize_for_write(spark, snap, stats_frame)
    stats_of = _collect_stats(
        spark,
        base,
        sorted(new_files),
        stats_frame,
        [phys.get(c, c) for c in pcols],
    )

    ts_ms = int(time.time() * 1000)
    log_dir = posixpath.join(base, "_delta_log")
    retries = 0
    while True:
        commits = _commit_files(fs, log_dir)
        version = (max(commits) + 1) if commits else 0
        cur = delta_snapshot(spark, base, version - 1) if version else snap
        for k in cands:
            cur_add = cur["files"].get(k)
            if cur_add is None or (cur_add.get("deletionVector") or {}) != (
                cands[k].get("deletionVector") or {}
            ):
                raise ValueError(
                    f"candidate file {k!r} changed under the optimize "
                    "(concurrent rewrite/delete); rerun"
                )
        actions = []
        for k in sorted(cands):
            actions.append(
                {
                    "remove": {
                        "path": k,
                        "deletionTimestamp": ts_ms,
                        "dataChange": False,
                    }
                }
            )
        for dest, (size, pkey) in sorted(new_files.items()):
            add = {
                "path": dest,
                "partitionValues": {
                    phys.get(c, c): v for c, v in zip(pcols, pkey)
                },
                "size": size,
                "modificationTime": ts_ms,
                "dataChange": False,
            }
            if dest in stats_of:
                add["stats"] = stats_of[dest]
            actions.append({"add": add})
        actions.append(
            {
                "commitInfo": {
                    "timestamp": ts_ms,
                    "operation": "OPTIMIZE",
                    "operationParameters": {
                        "targetSize": str(target_file_bytes)
                    },
                    "engineInfo": "harness-aws-etl-pipeline-spark compact",
                }
            }
        )
        payload = (
            "\n".join(json.dumps(a) for a in actions) + "\n"
        ).encode("utf-8")
        tmp_dir = posixpath.join(base, ".dlw_tmp")
        fs.mkdirs(tmp_dir)
        tmp = posixpath.join(tmp_dir, f"{uuid.uuid4().hex}.json")
        fs.write_bytes(tmp, payload)
        dest = posixpath.join(log_dir, f"{version:020d}.json")
        if fs.rename_if_absent(tmp, dest):
            return {
                "version": version,
                "files_removed": len(cands),
                "files_added": len(new_files),
                "dvs_purged": dvs,
                "retries": retries,
            }
        fs.delete(tmp, recursive=False)
        retries += 1
        if retries > max_commit_retries:
            raise RuntimeError(
                f"lost the Delta commit race {retries} times at {base!r}"
            )


def iceberg_compact(
    spark: SparkSession, path: str, max_commit_retries: int = 20
) -> dict:
    """Major compaction: rewrite the LIVE rows (position + equality
    deletes applied) into fresh data files; the new snapshot lists
    only the new manifest, dropping every delete file from scope.
    Returns ``{"snapshot_id", "files_added", "delete_files_dropped",
    "retries"}``."""
    from harness_aws_etl_pipeline_spark.sinks.icebergwrite import (
        write_iceberg,
    )
    from harness_aws_etl_pipeline_spark.sources.icebergread import (
        iceberg_snapshot,
        read_iceberg,
    )

    base = path.rstrip("/")
    snap = iceberg_snapshot(spark, base)
    dropped = int(snap.get("delete_files") or 0)
    live = read_iceberg(spark, base)
    # overwrite = a snapshot whose manifest list holds only the new
    # manifest — exactly compaction's contract; the CAS commit loop
    # in write_iceberg carries the race handling. The snapshot is
    # summarized as "replace" (the spec's data-neutral rewrite), so
    # change-feed consumers skip it instead of rejecting.
    rep = write_iceberg(
        spark, live, base, mode="overwrite", operation="replace"
    )
    return {
        "snapshot_id": rep["snapshot_id"],
        "files_added": rep["files_added"],
        "delete_files_dropped": dropped,
        "retries": rep["retries"],
    }


def hudi_compact(
    spark: SparkSession, path: str, max_commit_retries: int = 20
) -> dict:
    """MOR compaction: per file group carrying delta logs, write the
    MERGED slice as a new base parquet at a fresh ``commit`` instant
    (the reader's newest-slice rule then supersedes the old base +
    logs). Returns ``{"instant", "groups_compacted", "retries"}``."""
    from harness_aws_etl_pipeline_spark.sinks.hudiwrite import (
        _DATA_RE_TOKEN,
        _avro_schema_of,
        _instant_now,
    )
    from harness_aws_etl_pipeline_spark.sources.hudiread import (
        _merge_mor,
        hudi_snapshot,
        hudi_timeline,
    )

    base = path.rstrip("/")
    fs = get_fs(base, spark)
    snap = hudi_snapshot(spark, base)
    if snap["table_type"] != "MERGE_ON_READ":
        raise ValueError("hudi_compact applies to MERGE_ON_READ tables")
    if not snap.get("log_files"):
        return {"instant": None, "groups_compacted": 0, "retries": 0}

    tl = hudi_timeline(spark, base)
    last = tl[-1]["instant"] if tl else None
    retries = 0
    while True:
        logged = sorted(
            {(lf["part"], lf["fid"]) for lf in snap.get("log_files") or []}
        )
        if not logged:
            return {
                "instant": None, "groups_compacted": 0, "retries": retries,
            }
        instant = _instant_now(last)
        last = instant
        moved: list[str] = []
        for part, fid in logged:
            gsnap = dict(snap)
            gsnap["files"] = [
                p
                for p in snap["files"]
                if posixpath.basename(p).startswith(f"{fid}_")
                and posixpath.dirname(p[len(base) + 1 :]) == part
            ]
            gsnap["log_files"] = [
                lf
                for lf in snap["log_files"]
                if (lf["part"], lf["fid"]) == (part, fid)
            ]
            merged = _merge_mor(spark, base, gsnap)
            stage = posixpath.join(base, f".stage-{uuid.uuid4().hex}")
            try:
                merged.coalesce(1).write.mode("overwrite").parquet(stage)
                (src,) = [
                    rel
                    for rel, _mt, _sz in fs.list_files(stage)
                    if rel.endswith(".parquet")
                ]
                dname = f"{fid}_{_DATA_RE_TOKEN}_{instant}.parquet"
                dest = posixpath.join(base, part, dname) if part else (
                    posixpath.join(base, dname)
                )
                if not fs.rename(posixpath.join(stage, src), dest):
                    raise RuntimeError(
                        f"could not move compacted slice for {fid!r}"
                    )
                moved.append(dest)
            finally:
                fs.delete(stage, recursive=True)
        # re-validate right before the CAS: a concurrent hudi_upsert
        # deltacommit landing after our snapshot appends log blocks to
        # the OLD base instant, which our freshly committed base would
        # silently supersede — abort and re-merge from a fresh snapshot
        # if any compacted group grew a new log file (mirrors
        # delta_optimize's in-loop candidate re-check)
        fresh = hudi_snapshot(spark, base)
        seen = {
            (lf["part"], lf["fid"], lf["path"], lf["version"])
            for lf in snap.get("log_files") or []
        }
        compacted_set = set(logged)
        grew = [
            lf
            for lf in fresh.get("log_files") or []
            if (lf["part"], lf["fid"], lf["path"], lf["version"]) not in seen
            and (lf["part"], lf["fid"]) in compacted_set
        ]
        if grew:
            for m in moved:
                fs.delete(m, recursive=False)
            snap = fresh
            retries += 1
            if retries > max_commit_retries:
                raise RuntimeError(
                    f"concurrent deltacommits kept landing on compacted "
                    f"groups {retries} times at {base!r}"
                )
            tl = hudi_timeline(spark, base)
            if tl and tl[-1]["instant"] > last:
                last = tl[-1]["instant"]
            continue
        tmp = posixpath.join(
            base, ".hoodie", f".commitmeta-{uuid.uuid4().hex}"
        )
        # carry the table schema forward (the pre-compaction commit's
        # recording would otherwise stop being the newest one and
        # readers would fall back to the footer-union pass)
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_table_schema,
        )

        _ts = hudi_table_schema(spark, base, snap)
        rec_schema = _avro_schema_of(_ts) if _ts is not None else None
        fs.write_bytes(
            tmp,
            json.dumps(
                {"extraMetadata": {"schema": rec_schema}}
                if rec_schema
                else {}
            ).encode("utf-8"),
        )
        dest = posixpath.join(base, ".hoodie", f"{instant}.commit")
        if fs.rename_if_absent(tmp, dest):
            return {
                "instant": instant,
                "groups_compacted": len(logged),
                "retries": retries,
            }
        fs.delete(tmp, recursive=False)
        for m in moved:
            fs.delete(m, recursive=False)
        retries += 1
        if retries > max_commit_retries:
            raise RuntimeError(
                f"lost the Hudi instant race {retries} times at {base!r}"
            )
        # a lost CAS means another writer committed: refresh the
        # snapshot so the re-merge sees their blocks too
        snap = hudi_snapshot(spark, base)
        tl = hudi_timeline(spark, base)
        if tl and tl[-1]["instant"] > last:
            last = tl[-1]["instant"]


# ---------------------------------------------------------------------------
# Reference-counted space reclamation — the other half of maintenance
# (the age-based sweep in sinks/retention.py is per-file mtime with no
# table awareness; these walk the table's OWN metadata).
# ---------------------------------------------------------------------------


def delta_vacuum(
    spark: SparkSession,
    path: str,
    retain_hours: float = 168.0,
    dry_run: bool = False,
) -> dict:
    """VACUUM: delete data files and DV sidecars NOT referenced by the
    CURRENT snapshot whose modification time is older than
    ``retain_hours`` (the standard trade: time travel to versions
    whose files age out stops working). Returns ``{"removed",
    "bytes", "dry_run", "candidates"}``."""
    from urllib.parse import unquote

    from harness_aws_etl_pipeline_spark.sources.deltaread import (
        delta_snapshot,
    )

    base = path.rstrip("/")
    fs = get_fs(base, spark)
    snap = delta_snapshot(spark, base)
    live: set[str] = set()
    for k, add in snap["files"].items():
        live.add(unquote(k))
        dv = add.get("deletionVector") or {}
        if dv.get("storageType") == "u":
            import uuid as _uuid

            from harness_aws_etl_pipeline_spark.sources.dvcodec import (
                z85_decode,
            )

            enc = dv["pathOrInlineDv"]
            u = _uuid.UUID(bytes=z85_decode(enc[-20:]))
            prefix = enc[:-20]
            rel = f"deletion_vector_{u}.bin"
            live.add(posixpath.join(prefix, rel) if prefix else rel)
    cutoff = time.time() - retain_hours * 3600.0
    removed = 0
    freed = 0
    cands: list[str] = []
    for rel, mtime, size in fs.list_files(base):
        top = rel.split("/", 1)[0]
        if top == "_delta_log" or top.startswith("."):
            continue
        name = posixpath.basename(rel)
        if name.startswith(".") or name.startswith("_"):
            continue
        if not (name.endswith(".parquet") or name.endswith(".bin")):
            continue
        if rel in live or mtime >= cutoff:
            continue
        cands.append(rel)
        freed += size
        if not dry_run:
            fs.delete(posixpath.join(base, rel), recursive=False)
            removed += 1
    return {
        "removed": removed,
        "bytes": freed,
        "dry_run": dry_run,
        "candidates": sorted(cands),
    }


def iceberg_expire_snapshots(
    spark: SparkSession,
    path: str,
    keep_last: int = 1,
    max_commit_retries: int = 20,
) -> dict:
    """Expire all but the newest ``keep_last`` snapshots: a new
    metadata version lists only the retained snapshots, then every
    manifest list, manifest, and data/delete file reachable ONLY from
    expired snapshots is deleted. Returns ``{"expired",
    "files_removed", "retries"}``."""
    from harness_aws_etl_pipeline_spark.sources.avroread import (
        _iter_container,
    )
    from harness_aws_etl_pipeline_spark.sources.icebergread import (
        _latest_metadata,
        _rel,
    )

    base = path.rstrip("/")
    fs = get_fs(base, spark)
    mdir = posixpath.join(base, "metadata")
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")

    def _reachable(md: dict, snaps: list[dict]) -> set[str]:
        out: set[str] = set()
        location = md.get("location")
        for s in snaps:
            mlist = _rel(base, location, s["manifest-list"])
            out.add(mlist)
            if not fs.exists(mlist):
                continue
            _s, _n, recs = _iter_container(fs.read_bytes(mlist))
            for man in recs:
                mpath = _rel(base, location, man["manifest_path"])
                out.add(mpath)
                if not fs.exists(mpath):
                    continue
                _s2, _n2, entries = _iter_container(fs.read_bytes(mpath))
                for e in entries:
                    df_ = e.get("data_file") or {}
                    if df_.get("file_path"):
                        out.add(_rel(base, location, df_["file_path"]))
        return out

    retries = 0
    while True:
        import re as _re

        md = json.loads(
            fs.read_bytes(_latest_metadata(fs, base)).decode("utf-8")
        )
        snaps = md.get("snapshots") or []
        if len(snaps) <= keep_last:
            return {"expired": 0, "files_removed": 0, "retries": retries}
        snaps_sorted = sorted(snaps, key=lambda s: s.get("timestamp-ms") or 0)
        expired = snaps_sorted[:-keep_last]
        retained = snaps_sorted[-keep_last:]
        cur_version = 0
        for rel, _mt, _sz in fs.list_files(mdir):
            m = _re.match(r"v(\d+)\.metadata\.json$", posixpath.basename(rel))
            if m:
                cur_version = max(cur_version, int(m.group(1)))
        new_md = dict(md)
        new_md["snapshots"] = retained
        retained_ids = {s["snapshot-id"] for s in retained}
        new_md["snapshot-log"] = [
            e
            for e in md.get("snapshot-log") or []
            if e.get("snapshot-id") in retained_ids
        ]
        new_md["last-updated-ms"] = int(time.time() * 1000)
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
            keep = _reachable(md, retained)
            drop = _reachable(md, expired) - keep
            removed = 0
            for p in sorted(drop):
                if fs.exists(p):
                    fs.delete(p, recursive=False)
                    removed += 1
            return {
                "expired": len(expired),
                "files_removed": removed,
                "retries": retries,
            }
        fs.delete(tmp, recursive=False)
        retries += 1
        if retries > max_commit_retries:
            raise RuntimeError(
                f"lost the Iceberg commit race {retries} times at {base!r}"
            )


def hudi_clean(
    spark: SparkSession, path: str, keep_last: int = 1
) -> dict:
    """CLEAN: per file group, keep the newest ``keep_last`` base
    slices (plus the logs of the RETAINED slices); older slices and
    their logs are deleted, and a ``<instant>.clean`` marker records
    the pass. Time travel behind the cleaned slices stops working —
    Hudi's own cleaner trade. Returns ``{"files_removed",
    "instant"}``."""
    from harness_aws_etl_pipeline_spark.sinks.hudiwrite import _instant_now
    from harness_aws_etl_pipeline_spark.sources.hudiread import (
        _DATA_RE,
        _LOG_RE,
        hudi_timeline,
    )

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    tl = hudi_timeline(spark, base)
    committed = {t["instant"] for t in tl}
    slices: dict[tuple[str, str], list[tuple[str, str]]] = {}
    logs: dict[tuple[str, str, str], list[str]] = {}
    for rel, _mt, _sz in fs.list_files(base):
        if rel.startswith(".hoodie"):
            continue
        name = posixpath.basename(rel)
        lm = _LOG_RE.match(name)
        if lm is not None:
            key = (posixpath.dirname(rel), lm.group("fid"), lm.group("bts"))
            logs.setdefault(key, []).append(rel)
            continue
        m = _DATA_RE.search(rel)
        if m is not None and m.group("ts") in committed:
            slices.setdefault(
                (posixpath.dirname(rel), m.group("fid")), []
            ).append((m.group("ts"), rel))
    removed = 0
    for (part, fid), lst in slices.items():
        lst.sort()
        for ts, rel in lst[:-keep_last]:
            fs.delete(posixpath.join(base, rel), recursive=False)
            removed += 1
            for lrel in logs.pop((part, fid, ts), []):
                fs.delete(posixpath.join(base, lrel), recursive=False)
                removed += 1
    instant = None
    if removed:
        instant = _instant_now(tl[-1]["instant"] if tl else None)
        fs.write_bytes(
            posixpath.join(base, ".hoodie", f"{instant}.clean"), b"{}"
        )
    return {"files_removed": removed, "instant": instant}


# --------------------------------------------------------------------
# Plain-parquet small-file compaction (pre-dates the lakehouse tier;
# kept for hive-layout tables without a transaction log)
# --------------------------------------------------------------------


def compact_table(
    spark: SparkSession,
    path: str,
    partition_cols: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
    files_per_partition: int = 1,
    target_path: str | None = None,
) -> dict:
    """Rewrite ``path`` with compacted files; in-place when
    ``target_path`` is None (write to temp sibling, then swap).

    All path operations go through the Hadoop FileSystem adapter
    (sinks/fs.py) so the swap works on any scheme the cluster has a
    connector for, not just the local filesystem. Single-writer
    operation: the staging dir name is deterministic (so a crashed
    run's leftovers are found and cleaned), which also means two
    concurrent compactions of the same table would clobber each other
    — serialize them like any other table rewrite.
    """
    from pyspark.sql import functions as F

    fs = get_fs(path, spark)
    df = spark.read.parquet(path)
    in_place = target_path is None
    # deterministic temp sibling (same parent → same filesystem, so
    # the final rename is a metadata move, never a copy)
    dest = target_path or path.rstrip("/") + ".__compacting__"
    if in_place and fs.exists(dest):
        fs.delete(dest, recursive=True)  # stale leftover from a crash

    if partition_cols:
        if files_per_partition > 1:
            split = (F.rand(7) * files_per_partition).cast("int")
            df = df.repartition(*[F.col(c) for c in partition_cols], split)
        else:
            df = df.repartition(*[F.col(c) for c in partition_cols])
        writer = df.write.mode("overwrite").partitionBy(*partition_cols)
    else:
        df = df.coalesce(max(files_per_partition, 1))
        writer = df.write.mode("overwrite")
    writer.option("maxRecordsPerFile", max_records_per_file).parquet(dest)

    if in_place:
        # rename-aside swap: a crash at any point leaves either the
        # old table or both copies on disk, never neither
        aside = path.rstrip("/") + ".__old__"
        if fs.exists(aside):
            fs.delete(aside, recursive=True)
        if not fs.rename(path, aside):
            raise IOError(f"compact: could not move table aside to {aside!r}")
        if not fs.rename(dest, path):
            fs.rename(aside, path)  # roll back
            raise IOError("compact: swap rename failed; table restored")
        fs.delete(aside, recursive=True)
        dest = path

    return {"path": dest, "parquet_files": fs.file_count(dest, ".parquet")}


def compact_lake(spark: SparkSession, path: str, **kwargs) -> dict:
    """Format-dispatching maintenance face (the ``read_lake`` /
    ``write_lake`` sibling): detect the table's layout and run its
    compaction — Delta → :func:`delta_optimize`, Iceberg →
    :func:`iceberg_compact`, Hudi MOR → :func:`hudi_compact`, plain
    parquet/hive → :func:`compact_table`. kwargs pass through to the
    chosen implementation."""
    from harness_aws_etl_pipeline_spark.sources.lakeread import (
        detect_lake_format,
    )

    fmt = detect_lake_format(spark, path)
    if fmt == "delta":
        rep = delta_optimize(spark, path, **kwargs)
    elif fmt == "iceberg":
        rep = iceberg_compact(spark, path, **kwargs)
    elif fmt == "hudi":
        rep = hudi_compact(spark, path, **kwargs)
    elif fmt in ("parquet", "snaptable", "avro"):
        if fmt != "parquet":
            raise ValueError(
                f"compact_lake: use the {fmt}-native maintenance "
                "(SnapTable.compact / rewrite) for this layout"
            )
        rep = compact_table(spark, path, **kwargs)
    else:
        raise ValueError(f"compact_lake: unknown layout {fmt!r}")
    return {"format": fmt, **rep}
