"""L1–L7 — format sinks, partitioned layout, empty-skip, archival.

Reference semantics (etl/src/load/loader.py):

- L1 Parquet sink, snappy (:120-121)
- L2 CSV sink with header (:122-123)
- L3 JSON-lines sink (:124-125)
- L4 hive-partitioned output layout ``year=/month=/day=`` (:77-96) —
  the reference partitions by *wall-clock processing date*; the engine
  partitions by the data-derived ``_year/_month/_day`` columns (T8),
  which is what actually enables partition pruning downstream
  (reference etl/README.md:125-144 states that goal).
- L5 empty-input skip (:53-59)
- L6 size report after write (:128-160)
- L7 source archival — natively subsumed by Structured Streaming's
  ``cleanSource=archive`` in streaming mode (streaming/ingest.py); the
  batch-mode helper here moves processed inputs to an archive dir
  (:162-204).

Scale notes: ``target_file_rows`` controls small-file compaction — the
reference emits one file per job (loader.py:94) which at 1000s of jobs
is the classic small-file problem; here output parallelism defaults to
the data's partitioning and can be coalesced per partition via
``maxRecordsPerFile`` rather than a blanket ``repartition(1)``.
"""

from __future__ import annotations

import posixpath
from typing import Any

from pyspark.sql import DataFrame

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs, join_path


# L6 — MIME type per output format (reference loader.py:153-160)
CONTENT_TYPES = {
    "parquet": "application/octet-stream",
    "orc": "application/octet-stream",
    "csv": "text/csv",
    "json": "application/json",
    "jsonl": "application/json",
    "snaptable": "application/octet-stream",
}


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "append",
    partition_by: list[str] | None = None,
    compression: str | None = None,
    max_records_per_file: int | None = None,
    sort_by: list[str] | None = None,
) -> dict | None:
    """L1/L2/L3/L4 — write ``df`` in ``fmt`` with optional hive
    partitioning.

    ``sort_by`` sorts within partitions before writing — for parquet
    this clusters values so row-group min/max statistics become
    selective, enabling data skipping on those columns at read time
    (the layout-level complement to partition pruning; at 100 TB,
    sorting the silver layer by its hottest filter column routinely
    skips most row groups).
    """
    if fmt == "snaptable":
        # transactional sink: one atomic snapshot commit instead of a
        # directory write — readers never see a partial load, re-runs
        # are versioned history. Hive partition columns become CLUSTER
        # columns (Iceberg-style hidden partitioning): file-level
        # min/max stats give the same pruning with no directory
        # encoding, and the swap/type-inference failure modes of
        # path-based partitions disappear. compression / sort_by /
        # max_records_per_file are honored exactly like the directory
        # formats (sort before handoff; writer options through the
        # snapshot's own data-file write).
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        if sort_by:
            df = df.sortWithinPartitions(*sort_by)
        opts: dict = {"compression": compression or "snappy"}
        if max_records_per_file:
            opts["maxRecordsPerFile"] = max_records_per_file
        cluster = [c for c in (partition_by or []) if c in df.columns]
        return SnapTable(df.sparkSession, path).write(
            df,
            mode=mode,
            cluster_by=cluster or None,
            stats_cols=cluster or None,
            write_options=opts,
        )
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    w = df.write.mode(mode)
    if partition_by:
        present = [c for c in partition_by if c in df.columns]
        if present:
            w = w.partitionBy(*present)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    if fmt == "parquet":
        w.option("compression", compression or "snappy").parquet(path)
    elif fmt == "csv":
        w.option("header", True).csv(path)
    elif fmt in ("json", "jsonl"):
        w.json(path)
    elif fmt == "orc":
        w.option("compression", compression or "snappy").orc(path)
    else:
        raise ValueError(f"unsupported output format: {fmt!r}")


def _tree_size_bytes(path: str, spark=None) -> int:
    # Hadoop FileSystem contentSummary (one LIST, any scheme) with a
    # local os.walk fallback — see sinks/fs.py
    return get_fs(path, spark).tree_size(path)


def load(
    df: DataFrame | None,
    path: str,
    fmt: str = "parquet",
    mode: str = "append",
    partition_by: list[str] | None = None,
    compression: str | None = None,
    assume_nonempty: bool = False,
) -> dict[str, Any]:
    """L1–L6 — full load step with empty-skip and size report.

    Returns a status dict mirroring the reference loader's result shape
    (loader.py:53-75): ``{"status": "skipped"|"success", ...}``.
    Row count comes from a post-write metric, not an extra pre-count
    pass (``df.isEmpty()`` is a cheap limit-1 probe).

    ``assume_nonempty=True`` skips the probe — required when ``df``
    carries ``observe`` metrics (the probe's partial action would
    become the observation's first-completed action and freeze bogus
    values); the caller must have checked emptiness on an unobserved
    twin of the plan.
    """
    if df is None or (not assume_nonempty and df.isEmpty()):
        return {"status": "skipped", "reason": "empty input"}
    snap_out = write_table(
        df, path, fmt=fmt, mode=mode, partition_by=partition_by, compression=compression
    )
    result: dict[str, Any] = {
        "status": "success",
        "path": path,
        "format": fmt,
        # L6 content-type tagging (reference loader.py:153-160 sets it
        # as the S3 object ContentType; on a filesystem sink it rides
        # in the result metadata)
        "content_type": CONTENT_TYPES.get(fmt, "application/octet-stream"),
    }
    if snap_out is not None:
        # snaptable: THIS commit's bytes from its manifest entries —
        # the whole-tree size would grow with table history and count
        # other snapshots' files against this load
        result["bytes_written"] = snap_out.get("bytes_added", 0)
        return result
    try:
        result["bytes_written"] = _tree_size_bytes(path, df.sparkSession)
    except ValueError:
        # remote scheme without a reachable JVM (Spark Connect): the
        # write itself succeeded — skip the size metric rather than
        # fail the whole load after the fact
        pass
    return result


def archive_source(path: str, archive_root: str) -> str:
    """L7 (batch mode) — move a processed input file under
    ``archive_root``, preserving its basename (reference
    loader.py:162-204 copies to ``archive/YYYY/MM/<key>`` then deletes).

    Streaming mode needs none of this: the file source's
    ``cleanSource=archive`` + ``sourceArchiveDir`` do it natively.
    """
    fs = get_fs(archive_root)
    fs.mkdirs(archive_root)
    dest = join_path(archive_root, posixpath.basename(path.rstrip("/")))
    # Hadoop FileSystem.rename reports failure by returning False (e.g.
    # a cross-filesystem move, which rename cannot do) — reporting the
    # file archived while leaving it in the landing dir would make the
    # next sweep re-ingest it as duplicates
    if not fs.rename(path, dest):
        raise IOError(
            f"archive rename {path!r} -> {dest!r} failed (cross-"
            "filesystem moves need a copy, not a rename)"
        )
    return dest
