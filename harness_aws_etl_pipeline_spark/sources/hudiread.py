"""Read Apache Hudi tables WITHOUT the Hudi jar — the third leg of
the no-jar lakehouse interop tier (Delta, Iceberg, Hudi). Hudi's
table layout is an open spec (hudi.apache.org/tech-specs):
a ``.hoodie/`` timeline of instant files (``<instant>.commit`` /
``.deltacommit`` mark COMPLETED commits) plus data files named
``<fileId>_<writeToken>_<instantTime>.parquet`` — a FILE GROUP is all
versions of one fileId, and a snapshot at instant T is, per file
group, the newest file slice with ``instantTime <= T``.

MERGE_ON_READ (round 11): a file slice is the base parquet PLUS its
``.<fileId>_<baseInstant>.log.<version>_<token>`` delta logs; the
snapshot read decodes the log blocks (``sources/hudilog``) on the
EXECUTORS via a binaryFile scan + ``mapInPandas``, then merges
latest-wins by ``_hoodie_record_key`` — only file groups that carry
logs enter the merge window (one shuffle on the record key); logless
groups stay a plain parquet scan. Delete blocks are tombstones in the
same window; rollback command blocks void their log file's earlier
target-instant blocks; hfile/parquet/cdc blocks and foreign content
versions reject loudly.

Snapshot and as-of-instant (time travel) reads; partitioned layouts
supported by walking the data tree. Hudi's ``_hoodie_*`` meta columns
are stored IN the files and pass through (drop them with
``drop_meta=True``).

Scale shape: timeline + file listing is driver-side metadata (what
every Hudi client's file-system view does); the data read is one
stock parquet scan over the chosen slices, plus the bounded
log-merge window for slices that have deltas.
"""

from __future__ import annotations

import json
import posixpath
import re

from pyspark.sql import DataFrame, SparkSession

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

__all__ = ["hudi_changes", "hudi_snapshot", "hudi_timeline", "read_hudi"]

_DATA_RE = re.compile(r"(?P<fid>[^_/]+)_(?P<tok>[^_/]+)_(?P<ts>\d+)\.parquet$")
_LOG_RE = re.compile(
    r"^\.(?P<fid>[^_/]+)_(?P<bts>\d+)\.log\.(?P<ver>\d+)(_(?P<tok>[^/]+))?$"
)
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
        m = re.fullmatch(r"(\d+)\.(commit|deltacommit|replacecommit)", name)
        if m:
            out.append({"instant": m.group(1), "action": m.group(2)})
    return sorted(out, key=lambda x: x["instant"])


def hudi_recorded_schema(
    spark, path: str, target_instant: str | None = None
):
    """Table schema RECORDED in the newest completed commit's
    metadata (``extraMetadata.schema``, the real-Hudi convention this
    engine's writers follow) — or ``None`` when that commit carries
    no recording (foreign writers, pre-recording history), in which
    case callers fall back to the parquet-footer union. Only the
    NEWEST usable commit is consulted: an older recording could be
    stale across schema evolution."""
    from harness_aws_etl_pipeline_spark.sources.avroread import (
        avro_spark_schema,
    )

    base = path.rstrip("/")
    fs = get_fs(base, spark)
    usable = [
        t
        for t in hudi_timeline(spark, base)
        if target_instant is None or t["instant"] <= target_instant
    ]
    if not usable:
        return None
    t = usable[-1]
    p = posixpath.join(base, ".hoodie", f"{t['instant']}.{t['action']}")
    try:
        meta = json.loads(fs.read_bytes(p).decode("utf-8") or "{}")
    except (OSError, ValueError):
        return None
    sj = (meta.get("extraMetadata") or {}).get("schema")
    if not sj:
        return None
    try:
        return avro_spark_schema(sj)
    except ValueError:
        return None


def hudi_table_schema(spark: SparkSession, path: str, snap: dict):
    """The snapshot's table schema: the commit-recorded schema when
    the newest commit carries one (no data access), else the UNION of
    every live base-file footer, else the first log avro block for
    log-only tables; ``None`` for an empty table."""
    base = path.rstrip("/")
    rec = hudi_recorded_schema(spark, base, snap.get("instant"))
    if rec is not None:
        return rec
    if snap["files"]:
        return (
            spark.read.option("mergeSchema", "true")
            .parquet(*snap["files"])
            .schema
        )
    if snap.get("log_files"):
        from harness_aws_etl_pipeline_spark.sources.avroread import (
            avro_spark_schema,
        )
        from harness_aws_etl_pipeline_spark.sources.hudilog import (
            decode_log_blocks,
        )

        with open(
            _strip_scheme(snap["log_files"][0]["path"]), "rb"
        ) as fh:
            blocks = decode_log_blocks(fh.read())
        avro_blocks = [b for b in blocks if b["type"] == "avro"]
        if not avro_blocks:
            return None
        return avro_spark_schema(avro_blocks[0]["schema"])
    return None


def hudi_snapshot(
    spark: SparkSession, path: str, as_of_instant: str | None = None
) -> dict:
    """Resolve the snapshot: ``{"instant", "files": [paths],
    "table_type", "file_groups", "log_files", "committed"}`` — per
    file group, the newest slice at or before the target instant;
    for MERGE_ON_READ, ``log_files`` carries each chosen slice's
    delta logs (``read_hudi`` merges them)."""
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    props = _properties(fs, base)
    ttype = props.get("hoodie.table.type", "COPY_ON_WRITE")
    if ttype not in ("COPY_ON_WRITE", "MERGE_ON_READ"):
        raise ValueError(f"unknown Hudi table type {ttype!r}")
    timeline = hudi_timeline(spark, path)
    if not timeline:
        return {
            "instant": None, "files": [], "table_type": ttype,
            "file_groups": 0, "log_files": [], "committed": [],
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
    raw_logs: list[tuple[str, str, str, str, int]] = []
    for rel, _mt, _sz in fs.list_files(base):
        if rel.startswith(".hoodie"):
            continue
        name = posixpath.basename(rel)
        if name.endswith(".crc"):
            # Hadoop checksum shadow of a dot-prefixed log file —
            # POSIX listings (JVM-less DataSource workers) surface
            # them, and _LOG_RE's token group would swallow ".crc"
            continue
        lm = _LOG_RE.match(name)
        if lm is not None:
            raw_logs.append(
                (
                    posixpath.dirname(rel),
                    lm.group("fid"),
                    lm.group("bts"),
                    posixpath.join(base, rel),
                    int(lm.group("ver")),
                )
            )
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

    # MOR: attach each chosen slice's delta logs (base instant must
    # match the slice); a log-only file group (inserts routed to logs)
    # contributes a base-less slice. CoW tables with stray log files
    # are malformed — reject rather than silently drop rows.
    log_files: list[dict] = []
    if raw_logs and ttype != "MERGE_ON_READ":
        raise ValueError(
            "found Hudi log files in a COPY_ON_WRITE table — "
            "corrupt or mislabeled layout"
        )
    for part, fid, bts, apath, ver in raw_logs:
        if bts > target:
            continue  # slice started after the target instant
        if (part.strip("/"), fid) in replaced:
            continue
        key = (part, fid)
        if key in groups and groups[key][0] != bts:
            continue  # log belongs to a compacted-away older slice
        log_files.append(
            {
                "path": apath,
                "part": part,
                "fid": fid,
                "base_instant": bts,
                "version": ver,
            }
        )
    return {
        "instant": target,
        "files": sorted(p for _ts, p in groups.values()),
        "table_type": ttype,
        "file_groups": len(
            set(groups) | {(lf["part"], lf["fid"]) for lf in log_files}
        ),
        "log_files": sorted(
            log_files, key=lambda x: (x["part"], x["fid"], x["version"])
        ),
        "committed": sorted(committed),
    }


def _strip_scheme(p: str) -> str:
    return re.sub(r"^[a-zA-Z0-9+.-]+:/+", "/", p)


def _merge_mor(spark: SparkSession, base: str, snap: dict) -> DataFrame:
    """MOR snapshot assembly: plain-scan logless file groups; for
    logged slices, decode delta blocks on the executors and merge
    latest-wins by record key (delete blocks are tombstones in the
    same window). One shuffle, scoped to the logged slices only."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.window import Window

    from harness_aws_etl_pipeline_spark.sources.avroread import (
        avro_spark_schema,
    )
    from harness_aws_etl_pipeline_spark.sources.hudilog import (
        decode_log_blocks,
    )

    committed = frozenset(snap["committed"])
    logged: dict[tuple[str, str], list[dict]] = {}
    for lf in snap["log_files"]:
        logged.setdefault((lf["part"], lf["fid"]), []).append(lf)
    base_by_key: dict[tuple[str, str], str] = {}
    for p in snap["files"]:
        rel = p[len(base) + 1 :]
        m = _DATA_RE.search(rel)
        if m:
            base_by_key[(posixpath.dirname(rel), m.group("fid"))] = p
    plain = sorted(
        p for k, p in base_by_key.items() if k not in logged
    )
    merged_bases = sorted(
        p for k, p in base_by_key.items() if k in logged
    )

    schema = hudi_table_schema(spark, base, snap)
    if schema is None:
        raise ValueError(
            "cannot derive a schema: the first Hudi log file has "
            "no avro data block"
        )
    names = [f.name for f in schema.fields]
    if "_hoodie_record_key" not in names:
        raise ValueError(
            "MERGE_ON_READ merge needs the _hoodie_record_key meta "
            "column; this table does not populate it"
        )
    key_cols = ["_hoodie_record_key"] + (
        ["_hoodie_partition_path"]
        if "_hoodie_partition_path" in names
        else []
    )

    out_schema = T.StructType(
        list(schema.fields)
        + [
            T.StructField("__inst", T.StringType()),
            T.StructField("__seq", T.LongType()),
            T.StructField("__del", T.BooleanType()),
        ]
    )

    def _decode_logs(batches):
        import pandas as pd

        for pdf in batches:
            cols: dict[str, list] = {n: [] for n in names}
            inst: list = []
            seq: list = []
            tomb: list = []
            for pth, ver in zip(pdf["path"], pdf["version"]):
                with open(_strip_scheme(pth), "rb") as fh:
                    content = fh.read()
                ver = int(ver)
                for bi, blk in enumerate(decode_log_blocks(content)):
                    if blk["instant"] not in committed:
                        continue  # in-flight / post-target delta
                    if blk["type"] == "avro":
                        for ri, rec in enumerate(blk["records"]):
                            for n in names:
                                cols[n].append(rec.get(n))
                            inst.append(blk["instant"])
                            seq.append(
                                (ver * 100_000 + bi) * 1_000_000 + ri
                            )
                            tomb.append(False)
                    else:  # delete block
                        for ri, (k, p) in enumerate(blk["deletes"]):
                            for n in names:
                                if n == "_hoodie_record_key":
                                    cols[n].append(k)
                                elif n == "_hoodie_partition_path":
                                    cols[n].append(p)
                                else:
                                    cols[n].append(None)
                            inst.append(blk["instant"])
                            seq.append(
                                (ver * 100_000 + bi) * 1_000_000 + ri
                            )
                            tomb.append(True)
            # object dtype everywhere: an all-skipped batch must not
            # emit float64 empties that fail the Arrow cast
            data = {n: pd.Series(cols[n], dtype="object") for n in names}
            data["__inst"] = pd.Series(inst, dtype="object")
            data["__seq"] = pd.Series(seq, dtype="int64")
            data["__del"] = pd.Series(tomb, dtype="bool")
            yield pd.DataFrame(data)

    # Hadoop file sources refuse dot-prefixed (hidden) files — exactly
    # why Hudi names logs that way — so the file LIST is distributed
    # and the bytes are opened on the executors. POSIX paths only; an
    # object-store deployment needs an executor-side client here.
    if "://" in base and not base.startswith("file:"):
        raise ValueError(
            "MERGE_ON_READ log merging reads log bytes via POSIX open "
            f"on the executors; unsupported scheme in {base!r}"
        )
    files_df = spark.createDataFrame(
        [(lf["path"], int(lf["version"])) for lf in snap["log_files"]],
        "path string, version int",
    )
    log_df = files_df.repartition(
        min(len(snap["log_files"]), 64)
    ).mapInPandas(_decode_logs, out_schema)
    union = log_df
    if merged_bases:
        bdf = (
            spark.read.schema(schema)
            .parquet(*merged_bases)
            .select(
                "*",
                F.regexp_extract(
                    F.col("_metadata.file_path"), r"_(\d+)\.parquet$", 1
                ).alias("__inst"),
            )
            .withColumn("__seq", F.lit(-1).cast("long"))
            .withColumn("__del", F.lit(False))
        )
        union = union.unionByName(bdf)
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc("__inst"), F.desc("__seq")
    )
    merged = (
        union.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (~F.col("__del")))
        .select(*names)
    )
    if plain:
        merged = merged.unionByName(
            spark.read.schema(schema).parquet(*plain)
        )
    return merged


def read_hudi(
    spark: SparkSession,
    path: str,
    as_of_instant: str | None = None,
    drop_meta: bool = False,
) -> DataFrame:
    """The snapshot as a DataFrame (time travel via
    ``as_of_instant``) — plain parquet for CoW, log-merged for MOR;
    ``drop_meta=True`` strips the ``_hoodie_*`` bookkeeping columns
    the files carry."""
    snap = hudi_snapshot(spark, path, as_of_instant)
    if not snap["files"] and not snap["log_files"]:
        raise ValueError("Hudi table has no completed snapshot to read")
    if snap["log_files"]:
        df = _merge_mor(spark, path.rstrip("/"), snap)
    else:
        rec = hudi_recorded_schema(spark, path, snap.get("instant"))
        df = (
            spark.read.schema(rec).parquet(*snap["files"])
            if rec is not None
            else spark.read.option("mergeSchema", "true").parquet(
                *snap["files"]
            )
        )
    if drop_meta:
        df = df.drop(*[c for c in _META_COLS if c in df.columns])
    return df


def _hudi_change_rows(
    spark: SparkSession, path: str, lo: dict, hi: dict
) -> DataFrame:
    """CHANGE-ROW replay of the instants in ``(lo, hi]`` — the batch
    twin of ``hudi_nojar``'s ``readChangeFeed``: brand-new file
    groups' base files are ``insert`` rows; MOR deltacommit log
    blocks ARE the change data (avro → ``upsert`` rows, delete
    blocks → key-only ``delete`` rows on ``_hoodie_record_key``),
    labeled with the block's instant as ``_commit_version``.
    Base-slice rewrites (CoW upserts, compaction — including the
    first base slice of a log-only group) reject loudly."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from harness_aws_etl_pipeline_spark.sources.avroread import (
        avro_spark_schema,
    )
    from harness_aws_etl_pipeline_spark.sources.hudilog import (
        decode_log_blocks,
    )

    base = path.rstrip("/")
    timeline = hudi_timeline(spark, path)
    window = [
        t["instant"]
        for t in timeline
        if lo["instant"] < t["instant"] <= (hi["instant"] or "")
    ]
    for t in timeline:
        if t["instant"] in window and t["action"] == "replacecommit":
            raise ValueError(
                f"replacecommit {t['instant']} in the window; change "
                "capture cannot represent it"
            )

    # table schema: commit-recorded, else footer union, else the
    # first log avro block
    schema = hudi_table_schema(spark, base, hi)
    if schema is None:
        raise ValueError("Hudi table has no files to derive a schema from")
    names = [f.name for f in schema.fields]
    out_schema = T.StructType(
        list(schema.fields)
        + [
            T.StructField("_change_type", T.StringType()),
            T.StructField("_commit_version", T.LongType()),
        ]
    )

    def _groups(snap: dict) -> dict[tuple[str, str], str]:
        out = {}
        for p in snap["files"]:
            rel = p[len(base) + 1 :] if p.startswith(base) else p
            m = _DATA_RE.search(rel)
            if m:
                out[(posixpath.dirname(rel), m.group("fid"))] = p
        return out

    def _conform(df: DataFrame, ct: str, version: int) -> DataFrame:
        return df.select(
            *[
                F.col(c).cast(schema[c].dataType).alias(c)
                if c in df.columns
                else F.lit(None).cast(schema[c].dataType).alias(c)
                for c in names
            ],
            F.lit(ct).alias("_change_type"),
            F.lit(version).cast("long").alias("_commit_version"),
        )

    out: DataFrame | None = None
    prev_inst = lo["instant"]
    for inst in window:
        snap_prev = hudi_snapshot(spark, path, prev_inst)
        snap_cur = hudi_snapshot(spark, path, inst)
        lo_g, hi_g = _groups(snap_prev), _groups(snap_cur)
        rewritten = [k for k in lo_g if k in hi_g and lo_g[k] != hi_g[k]]
        dropped = [k for k in lo_g if k not in hi_g]
        if rewritten or dropped:
            raise ValueError(
                f"instant {inst} rewrites {len(rewritten)} / drops "
                f"{len(dropped)} base file slice(s); base rewrites "
                "carry no row-level change data"
            )
        prev_logged = {
            (lf["part"], lf["fid"])
            for lf in snap_prev.get("log_files") or []
        }
        new_paths = []
        for k in sorted(hi_g):
            if k in lo_g:
                continue
            if k in prev_logged:
                raise ValueError(
                    f"instant {inst} compacts log-only file group "
                    f"{k[1]!r} into a base slice; base rewrites carry "
                    "no row-level change data"
                )
            new_paths.append(hi_g[k])
        if new_paths:
            df = _conform(
                spark.read.parquet(*new_paths), "insert", int(inst)
            )
            out = df if out is None else out.unionByName(df)
        prev_inst = inst

    # log blocks: distributed decode over the hi snapshot's log list,
    # filtered to the window's committed instants (log FILES do not
    # time-travel — a version-2 log carries its group's original base
    # instant — but their BLOCKS label their own instant)
    log_paths = sorted(
        lf["path"] for lf in hi.get("log_files") or []
    )
    if log_paths and window:
        window_set = frozenset(window)

        def _decode(batches):
            import pandas as pd

            for pdf in batches:
                cols: dict[str, list] = {n: [] for n in names}
                ctypes: list = []
                versions: list = []
                for pth in pdf["path"]:
                    with open(_strip_scheme(pth), "rb") as fh:
                        content = fh.read()
                    for blk in decode_log_blocks(content):
                        inst = blk.get("instant")
                        if inst not in window_set:
                            continue
                        if blk["type"] == "avro":
                            for rec in blk["records"]:
                                for n in names:
                                    cols[n].append(rec.get(n))
                                ctypes.append("upsert")
                                versions.append(int(inst))
                        elif blk["type"] == "delete":
                            for key, part in blk["deletes"]:
                                for n in names:
                                    if n == "_hoodie_record_key":
                                        cols[n].append(key)
                                    elif n == "_hoodie_partition_path":
                                        cols[n].append(part)
                                    else:
                                        cols[n].append(None)
                                ctypes.append("delete")
                                versions.append(int(inst))
                # object dtype so all-skipped batches don't emit
                # float64 empties that fail the Arrow cast
                data = {
                    n: pd.Series(cols[n], dtype="object") for n in names
                }
                data["_change_type"] = pd.Series(ctypes, dtype="object")
                data["_commit_version"] = pd.Series(
                    versions, dtype="int64"
                )
                yield pd.DataFrame(data)

        ldf = spark.createDataFrame(
            [(p,) for p in log_paths], "path string"
        ).repartition(min(len(log_paths), 32))
        df = ldf.mapInPandas(_decode, out_schema)
        out = df if out is None else out.unionByName(df)
    if out is None:
        return spark.createDataFrame([], out_schema)
    return out


def hudi_changes(
    spark: SparkSession,
    path: str,
    since_instant: str,
    to_instant: str | None = None,
    drop_meta: bool = False,
    change_rows: bool = False,
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
    if change_rows:
        return _hudi_change_rows(spark, path, lo, hi)
    if hi.get("log_files"):
        raise ValueError(
            "MERGE_ON_READ snapshot carries delta log files; "
            "append-only change capture cannot represent log-merged "
            "rows (compact first; change_rows=True consumes them as "
            "change rows)"
        )
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
