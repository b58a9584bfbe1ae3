"""Schema-evolution-tolerant parquet reading.

A long-lived lake accumulates files written under different schema
versions: columns appear and disappear, and upstream type changes
widen int→long or float→double. Spark's ``mergeSchema=true`` handles
column ADDITION but hard-errors on type conflicts ("Failed to merge
incompatible data types int and bigint"), and a plain multi-path read
silently takes the first footer's schema — both wrong answers for a
100 TB table with years of history.

This module reads such a table correctly:

1. **Distributed footer scan** — every file's parquet schema is read
   on the EXECUTORS (one pyarrow ``read_schema`` per file, a footer-
   only operation; files fan out over tasks) and shipped back as
   Arrow IPC bytes, so the driver never opens a single data file.
   At millions of files this is one short all-metadata job.
2. **Type-widening reconciliation** — per column name, the observed
   types fold through a promotion lattice (integral widths widen to
   the largest; float→double; integral ⊎ fractional → double; decimal
   widens to cover both precision ranges). Incompatible families
   (string vs int, struct shape changes) raise loudly — silent
   coercion of those is how corrupt tables happen.
3. **Group-cast-union read** — files are grouped by their EXACT
   schema (distinct-schema count is small in practice — one group per
   writer version); each group is read with its own explicit schema
   (so the vectorized reader never upcasts), cast to the widened
   target, and ``unionByName(allowMissingColumns=True)`` fills
   dropped/added columns with NULLs. The result is one DataFrame
   with the evolved schema and ALL rows, regardless of which schema
   version wrote them.

Reference scope note: the reference reads one file per Lambda event
with per-file inference (etl/src/extract/extractor.py:94-99) — schema
drift across files is simply a failed run there. This extends the
engine's S-class family (multi-file union, error isolation) with the
evolution semantics a lakehouse table format provides.
"""

from __future__ import annotations

import re
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "widen_type",
    "evolved_schema",
    "scan_parquet_schemas",
    "read_parquet_evolved",
]

_PART_SEG = re.compile(r"^([^=/]+)=(.*)$")
_INT_RE = re.compile(r"^-?\d+$")
_FLOAT_RE = re.compile(r"^-?\d+(\.\d+)?$")
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _partition_schema(rels: list[str]) -> list[tuple[str, str]]:
    """(name, type) of the hive partition columns encoded in the
    RELATIVE file paths, inferred ONCE across all files so every
    schema group casts to the same types (per-group inference could
    disagree: one group's ``year`` values all digits, another's not).
    All files must agree on the partition key sequence — a mixed
    layout is a data bug to surface, not guess around."""
    keys_order: list[str] | None = None
    values: dict[str, set[str]] = {}
    for rel in rels:
        pairs = []
        for seg in rel.split("/")[:-1]:
            m = _PART_SEG.match(seg)
            if m:
                pairs.append((m.group(1), unquote(m.group(2))))
        ks = [k for k, _v in pairs]
        if keys_order is None:
            keys_order = ks
        elif ks != keys_order:
            raise ValueError(
                f"inconsistent hive partition layout: {ks} vs {keys_order} "
                "(all files under an evolved table must share one partition "
                "key sequence)"
            )
        for k, v in pairs:
            values.setdefault(k, set()).add(v)
    if not keys_order:
        return []
    out = []
    for k in keys_order:
        vs = {v for v in values[k] if v != _HIVE_NULL}
        if vs and all(_INT_RE.match(v) for v in vs):
            t = "bigint"
        elif vs and all(_FLOAT_RE.match(v) for v in vs):
            t = "double"
        elif vs and all(_DATE_RE.match(v) for v in vs):
            t = "date"
        else:
            t = "string"
        out.append((k, t))
    return out

_INT_ORDER = {"byte": 0, "short": 1, "integer": 2, "long": 3}
_FLOAT_ORDER = {"float": 0, "double": 1}


def widen_type(a: T.DataType, b: T.DataType) -> T.DataType:
    """The least common type ``a`` and ``b`` both losslessly widen to.

    Integral widths widen to the larger; float→double; an integral
    meeting a fractional widens to double (the standard lake-format
    rule — longs above 2^53 lose precision there, same trade-off
    Delta/Iceberg accept); decimals widen to cover both ranges
    (integer digits AND scale). Arrays/maps widen element-wise;
    everything else must match exactly — a string-vs-int or
    struct-shape conflict is a data bug to surface, not coerce."""
    if a == b:
        return a
    an, bn = a.typeName(), b.typeName()
    if an in _INT_ORDER and bn in _INT_ORDER:
        return a if _INT_ORDER[an] >= _INT_ORDER[bn] else b
    if an in _FLOAT_ORDER and bn in _FLOAT_ORDER:
        return T.DoubleType()
    if (an in _INT_ORDER and bn in _FLOAT_ORDER) or (
        an in _FLOAT_ORDER and bn in _INT_ORDER
    ):
        return T.DoubleType()
    if an == "decimal" and bn == "decimal":
        ints = max(a.precision - a.scale, b.precision - b.scale)
        scale = max(a.scale, b.scale)
        if ints + scale > 38:
            raise ValueError(
                f"cannot widen {a.simpleString()} and {b.simpleString()}: "
                f"combined precision {ints + scale} exceeds decimal(38)"
            )
        return T.DecimalType(ints + scale, scale)
    if an == "decimal" and bn in _INT_ORDER:
        return widen_type(a, T.DecimalType(20, 0))
    if bn == "decimal" and an in _INT_ORDER:
        return widen_type(T.DecimalType(20, 0), b)
    if an == "array" and bn == "array":
        return T.ArrayType(widen_type(a.elementType, b.elementType), True)
    if an == "map" and bn == "map":
        return T.MapType(
            widen_type(a.keyType, b.keyType),
            widen_type(a.valueType, b.valueType),
            True,
        )
    raise ValueError(
        f"incompatible schema evolution: {a.simpleString()} vs "
        f"{b.simpleString()} (only width/precision widening is safe to "
        "reconcile automatically)"
    )


def evolved_schema(schemas: list[T.StructType]) -> T.StructType:
    """Fold per-file schemas into the widened target. The inputs are
    folded in a DETERMINISTIC order (sorted by ``simpleString`` —
    footer-scan collect order is executor-scheduling-dependent, so
    first-seen order would differ run to run for the same table);
    column order is then first-seen across that sorted fold, so a
    given SET of schemas always evolves to the same column order.
    Every field is nullable (a column absent from some file IS null
    there)."""
    if not schemas:
        raise ValueError("no schemas to evolve")
    order: list[str] = []
    types: dict[str, T.DataType] = {}
    for sch in sorted(schemas, key=lambda s: s.simpleString()):
        for f in sch.fields:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.dataType
            else:
                try:
                    types[f.name] = widen_type(types[f.name], f.dataType)
                except ValueError as exc:
                    raise ValueError(f"column {f.name!r}: {exc}") from exc
    return T.StructType([T.StructField(n, types[n], True) for n in order])


def scan_parquet_schemas(
    spark: SparkSession, paths: list[str], tasks: int = 64
) -> list[tuple[str, T.StructType]]:
    """(path, schema) for every file — footers read on the EXECUTORS
    (pyarrow ``read_schema``: a footer-only open, no row groups
    touched), returned to the driver as Arrow IPC bytes. The collect
    is one row per FILE (bounded metadata, not data); schema
    deserialization happens driver-side via the same Arrow→Spark
    mapping the Pandas-UDF machinery uses."""
    if not paths:
        return []
    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_schema

    pdf = spark.createDataFrame([(p,) for p in paths], "path string")

    def _scan(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for b in batches:
            rows = [
                (p, pq.read_schema(p).serialize().to_pybytes())
                for p in b["path"]
            ]
            out = pd.DataFrame(rows, columns=["path", "schema_ipc"])
            out["schema_ipc"] = out["schema_ipc"].astype(object)
            yield out

    got = (
        pdf.repartition(min(len(paths), tasks))
        .mapInPandas(_scan, "path string, schema_ipc binary")
        .collect()
    )
    return [
        (
            r["path"],
            from_arrow_schema(pa.ipc.read_schema(pa.BufferReader(r["schema_ipc"]))),
        )
        for r in got
    ]


def read_parquet_evolved(
    spark: SparkSession, path: str | list[str]
) -> DataFrame:
    """Every row of every file under ``path`` (a directory, or an
    explicit file list) as ONE DataFrame with the widened evolved
    schema — files written under older schema versions contribute
    NULLs for columns they predate and widened values for columns
    whose type grew.

    Plan shape: one group per DISTINCT file schema, each group read
    with its exact schema (vectorized reader, no upcast surprises),
    cast column-wise to the target, unioned by name. The union is a
    metadata operation — no shuffle; downstream operators see a
    single scan-shaped relation per group.

    Hive-partitioned layouts (directory input only): DIRECTORY-ENCODED
    partition columns (``year=2024/…`` — the engine's own L4 sink
    layout) ARE reconstructed: the partition key sequence and types
    are inferred ONCE from the relative paths (all-int → bigint,
    numeric → double, ISO date → date, else string; consistent across
    schema groups by construction), each group is read with
    ``basePath`` so Spark appends the partition values, and the
    columns are cast to the shared inferred types. A partition key
    that also appears in a file footer raises — a shadowed data
    column is a layout bug. An explicit FILE-LIST input has no root
    to parse against, so no partition recovery happens there."""
    part_schema: list[tuple[str, str]] = []
    if isinstance(path, str):
        from harness_aws_etl_pipeline_spark.sinks.fs import get_fs, join_path

        fs = get_fs(path, spark)
        rels = [
            rel
            for rel, _mtime, size in fs.list_files(path)
            if rel.endswith(".parquet") and size > 0
        ]
        files = [join_path(path, rel) for rel in rels]
        part_schema = _partition_schema(rels)
    else:
        files = list(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    per_file = scan_parquet_schemas(spark, files)
    groups: dict[str, tuple[T.StructType, list[str]]] = {}
    for p, sch in per_file:
        key = sch.simpleString()
        groups.setdefault(key, (sch, []))[1].append(p)
    target = evolved_schema([sch for sch, _files in groups.values()])
    shadowed = sorted(
        {f.name for f in target.fields} & {k for k, _t in part_schema}
    )
    if shadowed:
        raise ValueError(
            f"partition column(s) {shadowed} also exist in the file "
            "footers; a directory-encoded value shadowing a data column "
            "is ambiguous — rename one of them"
        )
    saved_inference = spark.conf.get(
        "spark.sql.sources.partitionColumnTypeInference.enabled", "true"
    )
    out: DataFrame | None = None
    try:
        if part_schema:
            # per-group Spark inference could type the same key
            # differently (group-local values); read as string and
            # cast to the globally inferred type instead
            spark.conf.set(
                "spark.sql.sources.partitionColumnTypeInference.enabled",
                "false",
            )
        for _key, (sch, grp_files) in sorted(groups.items()):
            have = {f.name: f.dataType for f in sch.fields}
            reader = spark.read.schema(sch)
            if part_schema:
                reader = reader.option("basePath", str(path))
            df = reader.parquet(*sorted(grp_files))
            df = df.select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    for f in target.fields
                    if f.name in have
                ],
                *[F.col(k).cast(t).alias(k) for k, t in part_schema],
            )
            out = (
                df
                if out is None
                else out.unionByName(df, allowMissingColumns=True)
            )
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionColumnTypeInference.enabled",
            saved_inference,
        )
    # a final column-order normalization: unionByName keeps the first
    # branch's order, which may miss target columns entirely
    return out.select(
        *[
            F.col(f.name) if f.name in out.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in target.fields
        ],
        *[F.col(k) for k, _t in part_schema],
    )
