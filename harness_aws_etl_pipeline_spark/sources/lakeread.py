"""``read_lake`` / ``write_lake``: point the engine at ANY lake table
directory and it detects the format and reads it — the one-call face
over the no-jar interop tier (Delta / Iceberg / Hudi readers, Delta /
Iceberg writers) plus this engine's own SnapTable, plain parquet
directories, and Avro containers.

Detection is by layout marker, cheapest first: ``_snaplog/`` →
SnapTable, ``_delta_log/`` → Delta, ``metadata/*.metadata.json`` →
Iceberg, ``.hoodie/`` → Hudi, ``*.avro`` files → Avro, parquet files
→ plain parquet. Ambiguous layouts (a SnapTable that also carries an
exported ``_delta_log``) resolve to the NATIVE format — the richer
metadata wins.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

__all__ = [
    "detect_lake_format",
    "lake_changes",
    "read_lake",
    "write_lake",
]


def detect_lake_format(spark: SparkSession, path: str) -> str:
    """'snaptable' / 'delta' / 'iceberg' / 'hudi' / 'avro' /
    'parquet'; raises when nothing readable is found."""
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    if fs.exists(posixpath.join(base, "_snaplog")):
        return "snaptable"
    if fs.exists(posixpath.join(base, "_delta_log")):
        return "delta"
    if fs.exists(posixpath.join(base, ".hoodie", "hoodie.properties")):
        return "hudi"
    meta = posixpath.join(base, "metadata")
    if fs.exists(meta) and any(
        posixpath.basename(rel).endswith(".metadata.json")
        for rel, _mt, _sz in fs.list_files(meta)
    ):
        return "iceberg"
    names = [rel for rel, _mt, _sz in fs.list_files(base)]
    if any(n.endswith(".avro") for n in names):
        return "avro"
    if any(n.endswith(".parquet") for n in names):
        return "parquet"
    raise ValueError(f"no recognizable lake table layout under {path!r}")


def write_lake(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    format: str = "delta",  # noqa: A002 - mirrors spark.write API
    **kwargs,
) -> dict:
    """Dispatch face for the writer tier (the :func:`read_lake`
    mirror): ``delta`` → ``sinks/deltawrite``, ``iceberg`` →
    ``sinks/icebergwrite``, ``hudi`` → ``sinks/hudiwrite``,
    ``snaptable`` → ``SnapTable.write``, ``parquet`` → stock writer. kwargs pass through (``mode``,
    ``partition_by``, ``zorder``/``zorder_by``, ...)."""
    if format == "delta":
        from harness_aws_etl_pipeline_spark.sinks.deltawrite import (
            write_delta,
        )

        return write_delta(spark, df, path, **kwargs)
    if format == "iceberg":
        from harness_aws_etl_pipeline_spark.sinks.icebergwrite import (
            write_iceberg,
        )

        return write_iceberg(spark, df, path, **kwargs)
    if format == "hudi":
        from harness_aws_etl_pipeline_spark.sinks.hudiwrite import write_hudi

        return write_hudi(spark, df, path, **kwargs)
    if format == "snaptable":
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        return SnapTable(spark, path).write(df, **kwargs)
    if format == "parquet":
        mode = kwargs.pop("mode", "append")
        df.write.mode(mode).parquet(path, **kwargs)
        return {"format": "parquet", "path": path}
    raise ValueError(f"unknown lake write format {format!r}")


def read_lake(spark: SparkSession, path: str, **kwargs) -> DataFrame:
    """Detect + read. ``kwargs`` pass through to the format's reader
    (e.g. ``version=`` for snaptable/delta, ``snapshot_id=`` for
    iceberg, ``as_of_instant=`` for hudi)."""
    kind = detect_lake_format(spark, path)
    if kind == "snaptable":
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        return SnapTable(spark, path).read(**kwargs)
    if kind == "delta":
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            read_delta,
        )

        return read_delta(spark, path, **kwargs)
    if kind == "iceberg":
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            read_iceberg,
        )

        return read_iceberg(spark, path, **kwargs)
    if kind == "hudi":
        from harness_aws_etl_pipeline_spark.sources.hudiread import read_hudi

        return read_hudi(spark, path, **kwargs)
    if kind == "avro":
        from harness_aws_etl_pipeline_spark.sources.avroread import read_avro

        return read_avro(spark, path, **kwargs)
    return spark.read.parquet(path, **kwargs)


def lake_changes(
    spark: SparkSession,
    path: str,
    since,
    to=None,
    change_rows: bool = False,
    **kwargs,
) -> DataFrame:
    """Detect + incremental-consume: the one-call face over the four
    change-capture readers (``SnapTable.read_changes``,
    ``delta_changes``, ``iceberg_changes``, ``hudi_changes``).
    ``since``/``to`` are the format's own cursor — version int
    (snaptable/delta), snapshot id (iceberg), instant string (hudi);
    a consumer checkpoints whatever cursor it last processed and
    passes it back here.

    Default mode is append-only capture (rewrites reject loudly);
    ``change_rows=True`` switches every format to CHANGE-ROW capture
    (``_change_type`` / ``_commit_version`` labeled rows replaying
    upserts and deletes). Extra ``kwargs`` pass through to the
    format's reader (e.g. ``on_rewrite=`` for snaptable)."""
    kind = detect_lake_format(spark, path)
    if kind == "snaptable":
        from harness_aws_etl_pipeline_spark.sinks.snaptable import SnapTable

        return SnapTable(spark, path).read_changes(
            int(since),
            None if to is None else int(to),
            change_rows=change_rows,
            **kwargs,
        )
    if kind == "delta":
        from harness_aws_etl_pipeline_spark.sources.deltaread import (
            delta_changes,
        )

        return delta_changes(
            spark, path, int(since), to, cdf=change_rows, **kwargs
        )
    if kind == "iceberg":
        from harness_aws_etl_pipeline_spark.sources.icebergread import (
            iceberg_changes,
        )

        return iceberg_changes(
            spark, path, int(since), to, change_rows=change_rows, **kwargs
        )
    if kind == "hudi":
        from harness_aws_etl_pipeline_spark.sources.hudiread import (
            hudi_changes,
        )

        return hudi_changes(
            spark, path, str(since), to, change_rows=change_rows, **kwargs
        )
    raise ValueError(
        f"{kind!r} layouts have no change-capture log; lake_changes "
        "needs a snaptable/delta/iceberg/hudi table"
    )
