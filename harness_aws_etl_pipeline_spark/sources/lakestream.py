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
    def __init__(self, path: str, columns: list, arrow_schema=None):
        self.path = path
        self.columns = columns
        # target arrow schema (picklable): read() emits whole
        # RecordBatches — the Spark 4 Python-DataSource fast path
        self.arrow_schema = arrow_schema


def _read_parquet_rows(partition: _FilePartition):
    """Arrow-batch read: file columns cast to the target schema,
    missing columns null out — no per-row Python tuples."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(partition.path.removeprefix("file:"))
    n = tbl.num_rows
    if n == 0:
        return
    names = set(tbl.column_names)
    cols = []
    for field in partition.arrow_schema:
        if field.name in names:
            cols.append(tbl.column(field.name).cast(field.type))
        else:
            cols.append(pa.nulls(n, field.type))
    out = pa.table(cols, schema=partition.arrow_schema).combine_chunks()
    yield from out.to_batches()


# ------------------------------------------------------------- Iceberg


class _IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema, starting_idx: int):
        self._base = path.rstrip("/")
        self._schema = schema
        self._start = starting_idx

    def _snap_ids(self) -> list[int]:
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_snapshots,
        )

        return [
            s["snapshot_id"]
            for s in iceberg_snapshots(None, self._base)  # type: ignore[arg-type]
        ]

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
            if set(cur["position_delete_files"]) != prev_pd or {
                d["path"] for d in cur["equality_delete_files"]
            } != prev_eq:
                raise ValueError(
                    f"snapshot {ids[i]} changes the live delete-file "
                    "set; append-only streaming cannot represent it"
                )
            dropped = prev_files - set(cur["files"])
            if dropped:
                raise ValueError(
                    f"snapshot {ids[i]} drops {len(dropped)} data "
                    "file(s); append-only streaming cannot represent it"
                )
            for f in sorted(set(cur["files"]) - prev_files):
                parts.append(_FilePartition(f, cols, arrow_schema=asch))
            prev = cur
        return parts

    def read(self, partition: _FilePartition):
        return _read_parquet_rows(partition)

    def commit(self, end: dict) -> None:
        pass


class IcebergStreamDataSource(DataSource):
    """``spark.readStream.format("iceberg_nojar").option("path", …)``."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_nojar"

    def schema(self):
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_snapshot,
        )

        path = self.options.get("path")
        if not path:
            raise ValueError("iceberg_nojar needs .option('path', ...)")
        return iceberg_snapshot(None, path)["schema"]  # type: ignore[arg-type]

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _IcebergStreamReader(
            self.options["path"],
            schema,
            int(self.options.get("startingIdx", 0)),
        )


# ---------------------------------------------------------------- Hudi


class _HudiStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema, starting_instant: str):
        self._base = path.rstrip("/")
        self._schema = schema
        self._start = starting_instant

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
                    "append-only streaming cannot represent it"
                )
        snap_lo = (
            hudi_snapshot(None, self._base, lo)  # type: ignore[arg-type]
            if lo != "0"
            else {"files": [], "log_files": []}
        )
        snap_hi = hudi_snapshot(None, self._base, hi)  # type: ignore[arg-type]
        if snap_hi.get("log_files"):
            raise ValueError(
                "MERGE_ON_READ snapshot carries delta log files; "
                "append-only streaming cannot represent log-merged rows"
            )

        def _groups(snap):
            out = {}
            for p in snap["files"]:
                m = _DATA_RE.search(p)
                if m:
                    out[(posixpath.dirname(p), m.group("fid"))] = p
            return out

        lo_g, hi_g = _groups(snap_lo), _groups(snap_hi)
        rewritten = [k for k in lo_g if k in hi_g and lo_g[k] != hi_g[k]]
        dropped = [k for k in lo_g if k not in hi_g]
        if rewritten or dropped:
            raise ValueError(
                f"instants ({lo}, {hi}] rewrite {len(rewritten)} and drop "
                f"{len(dropped)} file group(s); append-only streaming "
                "cannot represent it"
            )
        cols = [f.name for f in self._schema.fields]
        from pyspark.sql.pandas.types import to_arrow_schema

        asch = to_arrow_schema(self._schema)
        return [
            _FilePartition(hi_g[k], cols, arrow_schema=asch)
            for k in sorted(hi_g)
            if k not in lo_g
        ]

    def read(self, partition: _FilePartition):
        return _read_parquet_rows(partition)

    def commit(self, end: dict) -> None:
        pass


class HudiStreamDataSource(DataSource):
    """``spark.readStream.format("hudi_nojar").option("path", …)``."""

    @classmethod
    def name(cls) -> str:
        return "hudi_nojar"

    def schema(self):
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_snapshot,
        )

        path = self.options.get("path")
        if not path:
            raise ValueError("hudi_nojar needs .option('path', ...)")
        snap = hudi_snapshot(None, path)  # type: ignore[arg-type]
        if not snap["files"]:
            raise ValueError(
                "Hudi table has no base files to derive a schema from"
            )
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        sch = pq.read_schema(snap["files"][0].removeprefix("file:"))
        return from_arrow_schema(sch)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _HudiStreamReader(
            self.options["path"],
            schema,
            str(self.options.get("startingInstant", "0")),
        )


def register_lake_streams(spark) -> None:
    """Register both sources on a session (idempotent)."""
    spark.dataSource.register(IcebergStreamDataSource)
    spark.dataSource.register(HudiStreamDataSource)
