"""``read_lake``: point the engine at ANY lake table directory and it
detects the format and reads it — the one-call face over the no-jar
interop tier (Delta / Iceberg / Hudi readers) plus this engine's own
SnapTable, plain parquet directories, and Avro containers.

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

__all__ = ["detect_lake_format", "read_lake"]


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
