"""Iceberg and Hudi tables as STRUCTURED STREAMING SOURCES — no jar:
Spark 4 Python DataSources completing the streaming interop trio
(``sources/deltastream.py`` is the Delta leg).

    register_lake_streams(spark)
    spark.readStream.format("iceberg_nojar").option("path", p).load()
    spark.readStream.format("hudi_nojar").option("path", p).load()

- **iceberg_nojar**: the offset is ``{"sid": "<snapshot-id>"}`` — the
  newest snapshot emitted (``None`` before the first batch). Snapshot
  ids are STABLE across ``iceberg_expire_snapshots``, unlike list
  positions: a checkpointed stream resuming after expiration resolves
  its id against the current snapshot log and fails loudly if that
  snapshot was expired (legacy positional ``{"idx": N}`` offsets are
  still accepted). A micro-batch is the data files ADDED between two
  snapshots; windows that drop files or touch the delete-file sets
  raise (append-only capture, the ``iceberg_changes`` rule).
- **hudi_nojar**: the offset is ``{"instant": "..."}`` — the newest
  completed instant emitted. A micro-batch is the file GROUPS that
  first appeared in the window; rewrites of existing groups,
  replacecommits, and MOR log files raise (the ``hudi_changes``
  rule).

``readChangeFeed=true`` (round 13) switches BOTH sources to CHANGE
ROW consumption — the delta_nojar mirror for the other two formats.
The schema gains ``_change_type`` / ``_commit_version``; within one
commit version deletes apply BEFORE inserts (the upsert changelog
order):

- Iceberg: an ``iceberg_upsert`` surfaces as key-only ``delete`` rows
  (the equality-delete file) + ``insert`` rows (the new data files);
  an ``iceberg_delete_where`` replays the referenced PREIMAGE rows as
  full-value ``delete`` rows (position deletes resolved in-task);
  ``iceberg_compact`` snapshots (operation ``replace``) contribute
  nothing; other file-dropping snapshots reject loudly.
  ``_commit_version`` is the snapshot's sequence number.
- Hudi: brand-new file groups are ``insert`` rows; MOR deltacommit
  log files ARE the change data (avro blocks → ``upsert`` rows,
  delete blocks → key-only ``delete`` rows on
  ``_hoodie_record_key``); base-slice rewrites (CoW upserts, MOR
  compaction) reject loudly — restart the change stream from a fresh
  checkpoint after them. ``_commit_version`` is the instant as a
  long.

Both plan offsets driver-side from table metadata (what every client
does) and read one file per task via pyarrow in the executors'
Python workers — local/posix paths, like the Delta leg.
"""

from __future__ import annotations

import posixpath
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = [
    "HudiStreamDataSource",
    "IcebergStreamDataSource",
    "register_lake_streams",
]


class _FilePartition(InputPartition):
    def __init__(
        self, path: str, columns: list, arrow_schema=None, change=None
    ):
        self.path = path
        self.columns = columns
        # target arrow schema (picklable): read() emits whole
        # RecordBatches — the Spark 4 Python-DataSource fast path
        self.arrow_schema = arrow_schema
        # readChangeFeed: ("insert"|"delete"|"upsert", commit_version)
        # emitted as constant _change_type/_commit_version columns
        self.change = change


def _pad_to_schema(tbl, arrow_schema, change=None):
    """File columns cast to the target schema; missing columns null
    out; the change columns (when asked) fill as constants."""
    import pyarrow as pa

    n = tbl.num_rows
    names = set(tbl.column_names)
    consts = {}
    if change is not None:
        consts = {"_change_type": change[0], "_commit_version": change[1]}
    cols = []
    for field in arrow_schema:
        if field.name in names:
            cols.append(tbl.column(field.name).cast(field.type))
        elif field.name in consts:
            cols.append(pa.array([consts[field.name]] * n, type=field.type))
        else:
            cols.append(pa.nulls(n, field.type))
    return pa.table(cols, schema=arrow_schema).combine_chunks()


def _read_parquet_rows(partition: _FilePartition):
    """Arrow-batch read — no per-row Python tuples."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(partition.path.removeprefix("file:"))
    if tbl.num_rows == 0:
        return
    out = _pad_to_schema(
        tbl, partition.arrow_schema, getattr(partition, "change", None)
    )
    yield from out.to_batches()


class _PosDeletePartition(InputPartition):
    """One Iceberg position-delete file: emits the REFERENCED rows
    (full preimage values) as ``delete`` change rows — the delete
    parquet names (data file, row position) pairs, so the task reads
    each referenced data file once and ``take``s the positions."""

    def __init__(self, path: str, local_of: dict, arrow_schema, version):
        self.path = path
        self.local_of = local_of  # manifest-recorded path → local path
        self.arrow_schema = arrow_schema
        self.version = version


def _read_pos_delete_rows(partition: _PosDeletePartition):
    import pyarrow.parquet as pq

    dt = pq.read_table(
        partition.path.removeprefix("file:"), columns=["file_path", "pos"]
    )
    by_file: dict[str, list[int]] = {}
    for fp, pos in zip(
        dt.column("file_path").to_pylist(), dt.column("pos").to_pylist()
    ):
        by_file.setdefault(fp, []).append(int(pos))
    for fp in sorted(by_file):
        local = partition.local_of.get(fp)
        if local is None:
            raise ValueError(
                f"position-delete file references {fp!r}, which is not "
                "a live data file of the prior snapshot"
            )
        tbl = pq.read_table(local.removeprefix("file:"))
        sel = tbl.take(sorted(by_file[fp]))
        out = _pad_to_schema(
            sel, partition.arrow_schema, ("delete", partition.version)
        )
        yield from out.to_batches()


class _HudiLogPartition(InputPartition):
    """One Hudi MOR log file: avro data blocks yield ``upsert`` change
    rows, delete blocks yield key-only ``delete`` rows. Blocks outside
    ``instants`` (in-flight / other windows) are skipped."""

    def __init__(self, path: str, arrow_schema, instants: list, key_col):
        self.path = path
        self.arrow_schema = arrow_schema
        self.instants = set(instants)
        self.key_col = key_col


def _read_hudi_log_changes(partition: _HudiLogPartition):
    import pyarrow as pa

    from harness_aws_etl_pipeline_spark.sources.hudilog import (
        decode_log_blocks,
    )

    with open(partition.path.removeprefix("file:"), "rb") as fh:
        blocks = decode_log_blocks(fh.read())
    asch = partition.arrow_schema
    data_names = [
        f.name
        for f in asch
        if f.name not in ("_change_type", "_commit_version")
    ]
    for blk in blocks:
        inst = blk.get("instant")
        if inst not in partition.instants:
            continue
        version = int(inst)
        if blk["type"] == "avro":
            recs = blk["records"]
            if not recs:
                continue
            tbl = pa.table(
                {
                    n: pa.array(
                        [r.get(n) for r in recs],
                        type=asch.field(n).type,
                    )
                    for n in data_names
                }
            )
            out = _pad_to_schema(tbl, asch, ("upsert", version))
            yield from out.to_batches()
        elif blk["type"] == "delete":
            dels = blk["deletes"]
            if not dels:
                continue
            tbl = pa.table(
                {
                    partition.key_col: pa.array(
                        [k for k, _p in dels],
                        type=asch.field(partition.key_col).type,
                    )
                }
            )
            out = _pad_to_schema(tbl, asch, ("delete", version))
            yield from out.to_batches()


# ------------------------------------------------------------- Iceberg


class _IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema, starting_idx: int, cdf=False):
        self._base = path.rstrip("/")
        self._schema = schema
        self._start = starting_idx
        self._cdf = cdf

    def _snap_ids(self) -> list[int]:
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_snapshots,
        )

        return [
            s["snapshot_id"]
            for s in iceberg_snapshots(None, self._base)  # type: ignore[arg-type]
        ]

    def _snap_meta(self) -> dict:
        """snapshot-id → {"seq", "op"} from the table metadata (the
        change feed labels rows with the snapshot's SEQUENCE NUMBER —
        durable and monotonic, unlike log positions)."""
        import json

        from harness_aws_etl_pipeline_spark.sinks.fs import get_fs
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            _latest_metadata,
        )

        fs = get_fs(self._base, None)
        md = json.loads(
            fs.read_bytes(_latest_metadata(fs, self._base)).decode("utf-8")
        )
        return {
            s["snapshot-id"]: {
                "seq": int(s.get("sequence-number") or 0),
                "op": (s.get("summary") or {}).get("operation"),
            }
            for s in md.get("snapshots") or []
        }

    def initialOffset(self) -> dict:
        if self._start <= 0:
            return {"sid": None}
        ids = self._snap_ids()
        if self._start > len(ids):
            raise ValueError(
                f"startingIdx {self._start} exceeds the snapshot log "
                f"({len(ids)} snapshots)"
            )
        return {"sid": str(ids[self._start - 1])}

    def latestOffset(self) -> dict:
        ids = self._snap_ids()
        return {"sid": str(ids[-1]) if ids else None}

    @staticmethod
    def _resolve(off: dict, ids: list[int]) -> int:
        """Offset → count of already-emitted snapshots. Snapshot IDS
        are the durable coordinate — positions shift when
        iceberg_expire_snapshots rewrites the snapshot list, so a
        positional offset resumed after expiration would silently
        skip or replay batches. Legacy {"idx": N} offsets (pre-r12
        checkpoints) are still honored positionally."""
        if "idx" in off:
            return int(off["idx"])
        sid = off.get("sid")
        if sid is None:
            return 0
        strs = [str(i) for i in ids]
        if str(sid) not in strs:
            raise ValueError(
                f"checkpointed offset snapshot {sid} is no longer in "
                "the snapshot log (expired?); cannot resume this "
                "stream safely — restart it from a fresh checkpoint"
            )
        return strs.index(str(sid)) + 1

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_snapshot,
        )

        ids = self._snap_ids()
        lo, hi = self._resolve(start, ids), self._resolve(end, ids)
        cols = [f.name for f in self._schema.fields]
        from pyspark.sql.pandas.types import to_arrow_schema

        asch = to_arrow_schema(self._schema)
        meta = self._snap_meta() if self._cdf else None
        parts: list[InputPartition] = []
        prev = (
            iceberg_snapshot(None, self._base, ids[lo - 1])  # type: ignore[arg-type]
            if lo > 0
            else None
        )
        for i in range(lo, hi):
            cur = iceberg_snapshot(None, self._base, ids[i])  # type: ignore[arg-type]
            prev_files = set(prev["files"]) if prev else set()
            prev_pd = set(prev["position_delete_files"]) if prev else set()
            prev_eq = (
                {d["path"] for d in prev["equality_delete_files"]}
                if prev
                else set()
            )
            cur_pd = set(cur["position_delete_files"])
            cur_eq = {d["path"] for d in cur["equality_delete_files"]}
            new_data = sorted(set(cur["files"]) - prev_files)
            dropped = prev_files - set(cur["files"])
            if not self._cdf:
                if cur_pd != prev_pd or cur_eq != prev_eq or dropped:
                    # compaction (operation "replace") is data-neutral
                    # — rows were already emitted from the files it
                    # rewrites, so the append stream passes over it
                    # (the delta_nojar dataChange=false rule)
                    if meta is None:
                        meta = self._snap_meta()
                    if (meta.get(ids[i]) or {}).get("op") == "replace":
                        prev = cur
                        continue
                if cur_pd != prev_pd or cur_eq != prev_eq:
                    raise ValueError(
                        f"snapshot {ids[i]} changes the live delete-file "
                        "set; append-only streaming cannot represent it "
                        "(readChangeFeed=true consumes deletes/upserts "
                        "as change rows)"
                    )
                if dropped:
                    raise ValueError(
                        f"snapshot {ids[i]} drops {len(dropped)} data "
                        "file(s); append-only streaming cannot represent "
                        "it"
                    )
                for f in new_data:
                    parts.append(_FilePartition(f, cols, arrow_schema=asch))
                prev = cur
                continue

            # ---- CHANGE FEED: per snapshot, deletes (position deletes
            # replay the referenced preimage rows; equality deletes are
            # key-only rows) then inserts — within one _commit_version,
            # deletes apply BEFORE inserts, the upsert changelog order.
            sm = meta.get(ids[i]) or {}
            version = int(sm.get("seq") or (i + 1))
            if sm.get("op") == "replace":
                # compaction: file set rewrite, row set unchanged — the
                # change feed is empty for this snapshot
                prev = cur
                continue
            if dropped:
                raise ValueError(
                    f"snapshot {ids[i]} ({sm.get('op')}) drops "
                    f"{len(dropped)} data file(s) outside a compaction; "
                    "the change feed cannot reconstruct rewrite deltas"
                )
            if (prev_pd - cur_pd) or (prev_eq - cur_eq):
                raise ValueError(
                    f"snapshot {ids[i]} removes delete files outside a "
                    "compaction; the change feed cannot represent it"
                )
            if prev is not None and cur_pd - prev_pd:
                local_of = {
                    (prev.get("origin_of") or {}).get(f, f): f
                    for f in prev["files"]
                }
                for dfp in sorted(cur_pd - prev_pd):
                    parts.append(
                        _PosDeletePartition(dfp, local_of, asch, version)
                    )
            for efp in sorted(cur_eq - prev_eq):
                parts.append(
                    _FilePartition(
                        efp, cols, arrow_schema=asch,
                        change=("delete", version),
                    )
                )
            for f in new_data:
                parts.append(
                    _FilePartition(
                        f, cols, arrow_schema=asch,
                        change=("insert", version),
                    )
                )
            prev = cur
        return parts

    def read(self, partition):
        if isinstance(partition, _PosDeletePartition):
            return _read_pos_delete_rows(partition)
        return _read_parquet_rows(partition)

    def commit(self, end: dict) -> None:
        pass


class IcebergStreamDataSource(DataSource):
    """``spark.readStream.format("iceberg_nojar").option("path", …)``."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_nojar"

    def _cdf(self) -> bool:
        return (
            str(self.options.get("readChangeFeed", "false")).lower()
            == "true"
        )

    def schema(self):
        from pyspark.sql import types as T

        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_snapshot,
        )

        path = self.options.get("path")
        if not path:
            raise ValueError("iceberg_nojar needs .option('path', ...)")
        base = iceberg_snapshot(None, path)["schema"]  # type: ignore[arg-type]
        if not self._cdf():
            return base
        return T.StructType(
            list(base.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
            ]
        )

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _IcebergStreamReader(
            self.options["path"],
            schema,
            int(self.options.get("startingIdx", 0)),
            cdf=self._cdf(),
        )


# ---------------------------------------------------------------- Hudi


class _HudiStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema, starting_instant: str, cdf=False):
        self._base = path.rstrip("/")
        self._schema = schema
        self._start = starting_instant
        self._cdf = cdf

    def initialOffset(self) -> dict:
        return {"instant": self._start}

    def latestOffset(self) -> dict:
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_timeline,
        )

        tl = hudi_timeline(None, self._base)  # type: ignore[arg-type]
        return {"instant": tl[-1]["instant"] if tl else self._start}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            _DATA_RE,
            hudi_snapshot,
            hudi_timeline,
        )

        lo, hi = start["instant"], end["instant"]
        if hi <= lo:
            return []
        tl = hudi_timeline(None, self._base)  # type: ignore[arg-type]
        for t in tl:
            if lo < t["instant"] <= hi and t["action"] == "replacecommit":
                raise ValueError(
                    f"replacecommit {t['instant']} in the window; "
                    "streaming cannot represent it"
                )

        def _groups(snap):
            # keys are (BASE-RELATIVE partition dir, fid) so they
            # compare against log_files' "part" (relative) directly
            out = {}
            for p in snap["files"]:
                rel = (
                    p[len(self._base) + 1:]
                    if p.startswith(self._base)
                    else p
                )
                m = _DATA_RE.search(rel)
                if m:
                    out[(posixpath.dirname(rel), m.group("fid"))] = p
            return out

        cols = [f.name for f in self._schema.fields]
        from pyspark.sql.pandas.types import to_arrow_schema

        asch = to_arrow_schema(self._schema)

        if self._cdf:
            # ---- CHANGE FEED: brand-new file groups' base files are
            # ``insert`` rows (base slices time-travel exactly, so a
            # per-instant diff is accurate); MOR log files are
            # ``upsert``/``delete`` change rows — the avro/delete
            # blocks ARE the change data. Log files do NOT time-travel
            # at the file level (a version-2 log carries its group's
            # ORIGINAL base instant), so every hi-snapshot log file is
            # scanned once with the window's committed instants as the
            # block filter: blocks label their own instant, windows
            # partition committed instants → exactly-once. Base-slice
            # rewrites (CoW upserts, MOR compaction) carry no
            # row-level deltas and reject loudly.
            parts: list[InputPartition] = []
            window = [
                t["instant"]
                for t in tl
                if lo < t["instant"] <= hi
            ]
            prev_inst = lo
            for inst in window:
                snap_prev = (
                    hudi_snapshot(None, self._base, prev_inst)  # type: ignore[arg-type]
                    if prev_inst != "0"
                    else {"files": [], "log_files": []}
                )
                snap_cur = hudi_snapshot(None, self._base, inst)  # type: ignore[arg-type]
                lo_g, hi_g = _groups(snap_prev), _groups(snap_cur)
                rewritten = [
                    k for k in lo_g if k in hi_g and lo_g[k] != hi_g[k]
                ]
                dropped = [k for k in lo_g if k not in hi_g]
                if rewritten or dropped:
                    raise ValueError(
                        f"instant {inst} rewrites {len(rewritten)} / "
                        f"drops {len(dropped)} base file slice(s); "
                        "base rewrites carry no row-level change data "
                        "— restart the change stream from a fresh "
                        "checkpoint after compaction/CoW upserts"
                    )
                version = int(inst)
                prev_logged = {
                    (lf["part"], lf["fid"])
                    for lf in snap_prev.get("log_files") or []
                }
                for k in sorted(hi_g):
                    if k in lo_g:
                        continue
                    if k in prev_logged:
                        # first base slice of a previously log-only
                        # group = MOR compaction, not an insert —
                        # emitting it would replay merged rows
                        raise ValueError(
                            f"instant {inst} compacts log-only file "
                            f"group {k[1]!r} into a base slice; base "
                            "rewrites carry no row-level change data "
                            "— restart the change stream from a fresh "
                            "checkpoint after compaction"
                        )
                    parts.append(
                        _FilePartition(
                            hi_g[k], cols, arrow_schema=asch,
                            change=("insert", version),
                        )
                    )
                prev_inst = inst
            snap_hi = hudi_snapshot(None, self._base, hi)  # type: ignore[arg-type]
            for lf in snap_hi.get("log_files") or []:
                parts.append(
                    _HudiLogPartition(
                        lf["path"], asch, window,
                        key_col="_hoodie_record_key",
                    )
                )
            return parts

        snap_lo = (
            hudi_snapshot(None, self._base, lo)  # type: ignore[arg-type]
            if lo != "0"
            else {"files": [], "log_files": []}
        )
        snap_hi = hudi_snapshot(None, self._base, hi)  # type: ignore[arg-type]
        if snap_hi.get("log_files"):
            raise ValueError(
                "MERGE_ON_READ snapshot carries delta log files; "
                "append-only streaming cannot represent log-merged rows "
                "(readChangeFeed=true consumes them as change rows)"
            )
        lo_g, hi_g = _groups(snap_lo), _groups(snap_hi)
        rewritten = [k for k in lo_g if k in hi_g and lo_g[k] != hi_g[k]]
        dropped = [k for k in lo_g if k not in hi_g]
        if rewritten or dropped:
            raise ValueError(
                f"instants ({lo}, {hi}] rewrite {len(rewritten)} and drop "
                f"{len(dropped)} file group(s); append-only streaming "
                "cannot represent it"
            )
        return [
            _FilePartition(hi_g[k], cols, arrow_schema=asch)
            for k in sorted(hi_g)
            if k not in lo_g
        ]

    def read(self, partition):
        if isinstance(partition, _HudiLogPartition):
            return _read_hudi_log_changes(partition)
        return _read_parquet_rows(partition)

    def commit(self, end: dict) -> None:
        pass


class HudiStreamDataSource(DataSource):
    """``spark.readStream.format("hudi_nojar").option("path", …)``."""

    @classmethod
    def name(cls) -> str:
        return "hudi_nojar"

    def _cdf(self) -> bool:
        return (
            str(self.options.get("readChangeFeed", "false")).lower()
            == "true"
        )

    def schema(self):
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_snapshot,
        )

        path = self.options.get("path")
        if not path:
            raise ValueError("hudi_nojar needs .option('path', ...)")
        snap = hudi_snapshot(None, path)  # type: ignore[arg-type]
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_recorded_schema,
        )

        rec = hudi_recorded_schema(None, path, snap.get("instant"))
        if rec is not None:
            sch = rec
        elif snap["files"]:
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema

            # footer UNION across live files — a single sampled footer
            # drops columns added by schema-evolved appends
            schemas = [
                pq.read_schema(f.removeprefix("file:"))
                for f in snap["files"]
            ]
            try:
                unified = pa.unify_schemas(
                    schemas, promote_options="permissive"
                )
            except TypeError:  # older pyarrow: no promote_options
                unified = pa.unify_schemas(schemas)
            sch = from_arrow_schema(unified)
        elif snap.get("log_files"):
            # log-only MOR table (hudi_upsert-created): the avro
            # block's schema is the table schema. POSIX open — log
            # files are dot-prefixed and Hadoop FS reads of hidden
            # files trip over their checksum shadows (hudiread rule).
            from harness_aws_etl_pipeline_spark.sources.avroread import (
                avro_spark_schema,
            )
            from harness_aws_etl_pipeline_spark.sources.hudilog import (
                decode_log_blocks,
            )

            with open(
                snap["log_files"][0]["path"].removeprefix("file:"), "rb"
            ) as fh:
                blocks = decode_log_blocks(fh.read())
            avro_blocks = [b for b in blocks if b["type"] == "avro"]
            if not avro_blocks:
                raise ValueError(
                    "cannot derive a schema: the first Hudi log file "
                    "has no avro data block"
                )
            sch = avro_spark_schema(avro_blocks[0]["schema"])
        else:
            raise ValueError(
                "Hudi table has no base files to derive a schema from"
            )
        if not self._cdf():
            return sch
        from pyspark.sql import types as T

        return T.StructType(
            list(sch.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
            ]
        )

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _HudiStreamReader(
            self.options["path"],
            schema,
            str(self.options.get("startingInstant", "0")),
            cdf=self._cdf(),
        )


def register_lake_streams(spark) -> None:
    """Register both sources on a session (idempotent)."""
    spark.dataSource.register(IcebergStreamDataSource)
    spark.dataSource.register(HudiStreamDataSource)
