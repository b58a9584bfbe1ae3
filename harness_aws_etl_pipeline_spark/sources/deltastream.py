"""Delta tables as a STRUCTURED STREAMING SOURCE — no jar: a Spark 4
Python DataSource (``pyspark.sql.datasource``) whose offsets are Delta
log versions, completing the interop loop (`stream_to_delta` is the
exactly-once sink; this is the source).

    from harness_aws_etl_pipeline_spark.sources.deltastream import (
        register_delta_stream,
    )
    register_delta_stream(spark)
    df = (spark.readStream.format("delta_nojar")
          .option("path", "/lake/events").load())

Shape per Delta's own streaming source semantics:

- an OFFSET is ``{"version": N}`` — the newest log version whose adds
  have been emitted; Spark checkpoints it, so restarts resume exactly;
- a micro-batch ``(start, end]`` is the set of data files ADDED by the
  commits in that version window — ONE InputPartition per file, read
  in the executors' Python workers via pyarrow (the planner runs in a
  JVM-less worker, which is why ``delta_snapshot``'s checkpoint replay
  has a pyarrow path);
- append-only guard like ``delta_changes``: a ``remove`` with
  ``dataChange`` or a deletion-vector re-add inside the window raises
  (an update/delete is not representable as appended rows);
- ``startingVersion`` option (default ``-1`` → include version 0's
  files) mirrors the jar's option of the same name;
- partition columns are reattached as typed literals from
  ``add.partitionValues`` (string/numeric/boolean/date primitives —
  exotic partition types reject loudly at planning time);
- ``readChangeFeed=true`` (round 12) streams the CHANGE DATA FEED
  instead: per commit, ``cdc`` actions (written by the CDF-emitting
  DML in ``sinks/deltadml``) are the authoritative change rows, pure
  appends surface as ``insert`` rows, compactions contribute
  nothing, and a rewrite WITHOUT change data raises — output schema
  gains ``_change_type`` + ``_commit_version``;
- COLUMN-MAPPED tables stream (round 13): the Arrow reader resolves
  file columns by physical name (name mode) or parquet field id (id
  mode) and partitionValues by physical key; NESTED mapped columns
  reject loudly.

Scale shape: offset planning is driver-side metadata (the same log
fold every Delta client does); data reading is distributed one file
per task. Local/posix paths (the Python workers ``open()`` the
parquet directly); an object-store deployment plugs a pyarrow
filesystem in here.
"""

from __future__ import annotations

import json
import posixpath
from urllib.parse import unquote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = ["DeltaStreamDataSource", "register_delta_stream"]


class _FilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        pvalues: dict,
        columns: list,
        ctype: str | None = None,
        version: int | None = None,
        arrow_schema=None,
        colmap: dict | None = None,
        cm_mode: str = "none",
    ):
        self.path = path
        self.pvalues = pvalues  # partition column name -> typed value
        self.columns = columns  # output order (table schema order)
        # CDF mode: constant _change_type for insert partitions, None
        # for cdc files (the file carries the column); commit version
        self.ctype = ctype
        self.version = version
        # target arrow schema (picklable): read() emits whole
        # RecordBatches instead of per-row tuples — the Spark 4
        # Python-DataSource fast path
        self.arrow_schema = arrow_schema
        # column mapping (round 13): logical name -> physical name
        # (name mode) or -> delta.columnMapping.id (id mode); the
        # Arrow reader resolves file columns through it
        self.colmap = colmap
        self.cm_mode = cm_mode


def _typed_partition_value(raw: str | None, dt) -> object:
    if raw is None:
        return None
    t = dt.typeName()
    if t in ("byte", "short", "integer", "long"):
        return int(raw)
    if t in ("float", "double"):
        return float(raw)
    if t == "boolean":
        return raw.lower() == "true"
    if t == "string":
        return raw
    if t == "date":
        import datetime as _dt

        return _dt.date.fromisoformat(raw)
    raise ValueError(
        f"partition column type {t!r} is not supported by the "
        "delta_nojar stream source"
    )


class _DeltaStreamReader(DataSourceStreamReader):
    def __init__(
        self, path: str, schema, starting_version: int, cdf: bool = False
    ):
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_snapshot,
        )

        self._base = path.rstrip("/")
        self._schema = schema
        self._start = starting_version
        self._cdf = cdf
        snap = delta_snapshot(None, self._base)
        cm = snap.get("column_mapping") or {}
        self._phys = cm.get("physical") or {}
        self._cm_mode = cm.get("mode") or "none"
        self._colmap: dict | None = None
        if self._phys:
            # round 13: mapped tables stream — the Arrow reader
            # resolves columns by physical name (name mode) or parquet
            # field id (id mode). NESTED mapped columns would need
            # struct surgery in Arrow; reject those loudly.
            from pyspark.sql.types import StructType as _St

            from harness_aws_etl_pipeline_spark.sources.deltaread import (
                _phys_below,
            )

            colmap: dict = {}
            for f in snap["schema"].fields:
                md = f.metadata or {}
                nested = _phys_below(f.dataType) or (
                    isinstance(f.dataType, _St)
                    and any(
                        (sf.metadata or {}).get(
                            "delta.columnMapping.physicalName"
                        )
                        for sf in f.dataType.fields
                    )
                )
                if nested:
                    raise ValueError(
                        "delta_nojar streaming on tables with NESTED "
                        f"mapped columns (column {f.name!r}) is not "
                        "supported"
                    )
                if self._cm_mode == "id":
                    cid = md.get("delta.columnMapping.id")
                    if cid is None:
                        raise ValueError(
                            "Delta id-mode column mapping: field "
                            f"{f.name!r} carries no delta.columnMapping.id"
                        )
                    colmap[f.name] = int(cid)
                else:
                    colmap[f.name] = md.get(
                        "delta.columnMapping.physicalName"
                    ) or f.name
            self._colmap = colmap
        self._pcols = snap["partition_columns"]
        self._latest = snap["version"]

    # -- offsets -------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        from harness_aws_etl_pipeline_spark.sinks.fs import get_fs
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            _commit_files,
        )

        fs = get_fs(self._base, None)
        commits = _commit_files(fs, posixpath.join(self._base, "_delta_log"))
        self._latest = max(commits) if commits else self._latest
        return {"version": self._latest}

    # -- planning ------------------------------------------------------
    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from harness_aws_etl_pipeline_spark.sinks.fs import get_fs
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            _commit_files,
        )

        fs = get_fs(self._base, None)
        commits = _commit_files(fs, posixpath.join(self._base, "_delta_log"))
        lo, hi = int(start["version"]), int(end["version"])
        ptypes = {
            f.name: f.dataType
            for f in self._schema.fields
            if f.name in self._pcols
        }
        cols = [f.name for f in self._schema.fields]
        from pyspark.sql.pandas.types import to_arrow_schema

        asch = to_arrow_schema(self._schema)
        if self._cdf:
            return self._cdf_partitions(
                fs, commits, lo, hi, ptypes, cols, asch
            )
        parts: list[InputPartition] = []
        for v in range(lo + 1, hi + 1):
            p = commits.get(v)
            if p is None:
                continue  # log-cleaned versions below a checkpoint
            for line in fs.read_bytes(p).decode("utf-8").splitlines():
                if not line.strip():
                    continue
                a = json.loads(line)
                rem = a.get("remove")
                if rem and rem.get("dataChange", True):
                    raise ValueError(
                        f"commit {v} removes data file {rem.get('path')!r}"
                        " — an update/delete window is not representable"
                        " as a stream of appended rows"
                    )
                add = a.get("add")
                if not add or not add.get("path"):
                    continue
                if add.get("dataChange", True) is False:
                    continue  # compaction re-add: rows already emitted
                if (add.get("deletionVector") or {}).get("storageType"):
                    raise ValueError(
                        f"commit {v} adds a deletion-vector'd file — "
                        "not representable as appended rows"
                    )
                pv = add.get("partitionValues") or {}
                parts.append(
                    _FilePartition(
                        posixpath.join(self._base, unquote(add["path"])),
                        {
                            c: _typed_partition_value(
                                pv.get(self._phys.get(c, c)), ptypes[c]
                            )
                            for c in self._pcols
                        },
                        cols,
                        arrow_schema=asch,
                        colmap=self._colmap,
                        cm_mode=self._cm_mode,
                    )
                )
        return parts

    def _cdf_partitions(
        self,
        fs,
        commits: dict,
        lo: int,
        hi: int,
        ptypes: dict,
        cols: list,
        asch,
    ) -> list[InputPartition]:
        parts: list[InputPartition] = []
        for v in range(lo + 1, hi + 1):
            p = commits.get(v)
            if p is None:
                raise ValueError(
                    f"commit {v} is folded into a checkpoint; CDF "
                    "streaming needs the JSON commits in the window"
                )
            cdc_acts: list[dict] = []
            adds_true: list[dict] = []
            removes_true = 0
            for line in fs.read_bytes(p).decode("utf-8").splitlines():
                if not line.strip():
                    continue
                a = json.loads(line)
                if a.get("cdc") and a["cdc"].get("path"):
                    cdc_acts.append(a["cdc"])
                add = a.get("add")
                if add and add.get("path") and add.get("dataChange", True):
                    adds_true.append(add)
                rem = a.get("remove")
                if rem and rem.get("path") and rem.get("dataChange", True):
                    removes_true += 1
            if cdc_acts:
                # authoritative change rows; the commit's add/remove
                # pairs (DV re-adds, merge data files) are bookkeeping
                # for the same change
                for c in cdc_acts:
                    pv = c.get("partitionValues") or {}
                    parts.append(
                        _FilePartition(
                            posixpath.join(self._base, unquote(c["path"])),
                            {
                                k: _typed_partition_value(
                                    pv.get(self._phys.get(k, k)),
                                    ptypes[k],
                                )
                                for k in self._pcols
                            },
                            cols,
                            ctype=None,  # the file carries _change_type
                            version=v,
                            arrow_schema=asch,
                            colmap=self._colmap,
                            cm_mode=self._cm_mode,
                        )
                    )
                continue
            if removes_true:
                raise ValueError(
                    f"commit {v} rewrites or deletes files without "
                    "change data; CDF streaming cannot represent it — "
                    "enable change data on the writer"
                )
            for add in adds_true:
                if (add.get("deletionVector") or {}).get("storageType"):
                    raise ValueError(
                        f"commit {v} adds a deletion-vector'd file "
                        "without change data — not representable"
                    )
                pv = add.get("partitionValues") or {}
                parts.append(
                    _FilePartition(
                        posixpath.join(self._base, unquote(add["path"])),
                        {
                            k: _typed_partition_value(
                                pv.get(self._phys.get(k, k)), ptypes[k]
                            )
                            for k in self._pcols
                        },
                        cols,
                        ctype="insert",
                        version=v,
                        arrow_schema=asch,
                        colmap=self._colmap,
                        cm_mode=self._cm_mode,
                    )
                )
        return parts

    # -- reading (executor-side Python worker) --------------------------
    def read(self, partition: _FilePartition):
        """Emits whole Arrow RecordBatches (the Spark 4
        Python-DataSource fast path — no per-row Python tuples):
        file columns are cast to the target schema, partition values
        and CDF labels become constant arrays, missing columns null
        out. cdc files may carry partition columns inline — the
        file's value wins over the planned literal."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path.removeprefix("file:"))
        n = tbl.num_rows
        if n == 0:
            return
        target = partition.arrow_schema
        names = set(tbl.column_names)
        colmap = getattr(partition, "colmap", None)
        by_id: dict[int, int] = {}
        if colmap and getattr(partition, "cm_mode", "none") == "id":
            for i, fld in enumerate(tbl.schema):
                fid = (fld.metadata or {}).get(b"PARQUET:field_id")
                if fid is not None:
                    by_id[int(fid)] = i

        def _src(c):
            """The file column backing logical column ``c`` — by
            parquet field id (id mode), physical name (name mode), or
            its own name — or None when the file lacks it."""
            if colmap and c in colmap:
                if by_id or getattr(partition, "cm_mode", "") == "id":
                    i = by_id.get(colmap[c])
                    return None if i is None else tbl.column(i)
                pn = colmap[c]
                return tbl.column(pn) if pn in names else None
            return tbl.column(c) if c in names else None

        cols = []
        for field in target:
            c = field.name
            if c == "_change_type" and partition.ctype is not None:
                cols.append(pa.array([partition.ctype] * n, field.type))
            elif c == "_commit_version":
                cols.append(
                    pa.array([partition.version] * n, field.type)
                )
            elif (src := _src(c)) is not None:
                cols.append(src.cast(field.type))
            elif c in partition.pvalues:
                cols.append(
                    pa.array([partition.pvalues[c]] * n, field.type)
                )
            else:
                cols.append(pa.nulls(n, field.type))
        out = pa.table(cols, schema=target).combine_chunks()
        yield from out.to_batches()

    def commit(self, end: dict) -> None:
        pass


class DeltaStreamDataSource(DataSource):
    """``spark.readStream.format("delta_nojar").option("path", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "delta_nojar"

    def _cdf(self) -> bool:
        return (
            str(self.options.get("readChangeFeed", "false")).lower()
            == "true"
        )

    def schema(self):
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_snapshot,
        )

        path = self.options.get("path")
        if not path:
            raise ValueError("delta_nojar needs .option('path', ...)")
        snap = delta_snapshot(None, path)
        if snap["schema"] is None:
            raise ValueError("Delta table has no schema in its metadata")
        if self._cdf():
            return StructType(
                list(snap["schema"].fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                ]
            )
        return snap["schema"]

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _DeltaStreamReader(
            self.options["path"],
            schema,
            int(self.options.get("startingVersion", -1)),
            cdf=self._cdf(),
        )


def register_delta_stream(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(DeltaStreamDataSource)
