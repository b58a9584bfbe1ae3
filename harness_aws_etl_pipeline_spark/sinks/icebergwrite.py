"""Write Apache Iceberg tables WITHOUT the jar — the writer mirror of
``sources/icebergread`` (as ``sinks/deltawrite`` mirrors
``sources/deltaread``). Targets the HadoopTables / filesystem-catalog
layout of the open spec (iceberg.apache.org/spec):

- data files are plain parquet (written staged, moved with exact
  ownership — same concurrency reasoning as deltawrite);
- each commit writes a MANIFEST (Avro, ``manifest_entry`` records) via
  the in-repo open-spec Avro encoder, a MANIFEST LIST (Avro,
  ``manifest_file`` records), and a new ``metadata/vN.metadata.json``;
- the commit point is the metadata json claimed via PUT-IF-ABSENT
  (``fs.rename_if_absent`` CAS) — exactly the HadoopCatalog's atomic
  version rename; a losing writer re-reads and retries at the next
  version. ``version-hint.text`` is refreshed after the claim (it is a
  hint, not the commit point, per the layout's own semantics);
- appends carry the previous snapshot's manifests forward in the new
  manifest list; overwrite lists only the new manifest (a snapshot IS
  the files its manifest list reaches).

Scope (honest): format v2, append/overwrite, unpartitioned or
PARTITIONED tables (round 12): ``partition_by`` entries are
``"col"`` (identity), ``"days(ts)"`` / ``years`` / ``months`` /
``hours``, ``"bucket(N, col)"`` (spec-exact murmur3 bucketing), or
``"truncate(W, col)"`` — a partition spec with per-field ids (1000+),
hive-style ``data/<field>=<value>/`` layout, and populated manifest
partition structs; data files still physically CONTAIN the partition
source columns, as the spec requires. Partition-spec evolution on
append is rejected; omitted ``partition_by`` inherits the table's
spec (transforms included).
Schema evolution on APPEND (round 12): added columns register an
evolved schema whose new fields take fresh ids above
``last-column-id`` (never reused — the spec's field-id discipline),
int→long / float→double widen in place, and incompatible changes
reject; overwrite may replace the schema outright. Field ids are
assigned sequentially from the Spark schema on table creation and
REUSED by name afterwards.
Per-file ``record_count`` (required by the spec) comes from one
grouped count over this write's files only.
"""

from __future__ import annotations

import json
import posixpath
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.sinks.fs import get_fs
from harness_aws_etl_pipeline_spark.sources.avroread import write_avro_bytes

__all__ = ["write_iceberg"]

def _entry_schema(part_fields: list[dict] | None = None) -> str:
    """Manifest-entry Avro schema; ``part_fields`` (name/avro type/
    field-id triples) populate the ``partition`` record to match the
    table's partition spec — empty for unpartitioned tables."""
    return json.dumps({
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "field-id": 3},
            {"name": "data_file", "field-id": 2, "type": {
                "type": "record", "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string",
                     "field-id": 100},
                    {"name": "file_format", "type": "string",
                     "field-id": 101},
                    # spec-required: a struct matching the partition
                    # spec (empty for unpartitioned tables)
                    {"name": "partition", "field-id": 102, "type": {
                        "type": "record", "name": "r102",
                        "fields": [
                            {
                                "name": pf["name"],
                                "type": ["null", pf["avro"]],
                                "field-id": pf["field-id"],
                            }
                            for pf in (part_fields or [])
                        ],
                    }},
                    {"name": "record_count", "type": "long",
                     "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                    # null for data/position entries; the
                    # equality-delete writer (icebergdml.
                    # iceberg_upsert) sets the field ids
                    {"name": "equality_ids", "field-id": 135,
                     "type": ["null", {"type": "array", "items": "int"}]},
                ],
            }},
        ],
    })


_ENTRY_SCHEMA = _entry_schema()

# identity-partition source column types this writer can round-trip
# through hive path values and the manifest partition struct
_PART_AVRO = {
    "integer": "int",
    "long": "long",
    "string": "string",
    "boolean": "boolean",
    "date": {"type": "int", "logicalType": "date"},
}


def _parse_pval(raw: str, type_name: str):
    """Hive-path partition value string → typed manifest value."""
    if type_name in ("integer", "long"):
        return int(raw)
    if type_name == "boolean":
        return raw.lower() == "true"
    if type_name == "date":
        import datetime

        return (
            datetime.date.fromisoformat(raw) - datetime.date(1970, 1, 1)
        ).days
    return raw

_MLIST_SCHEMA = json.dumps({
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
})


def _spark_to_iceberg(dt, next_id) -> object:
    """Spark type → Iceberg schema type node (primitives + the
    containers the engine's tables use)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        return {
            "type": "struct",
            "fields": [
                {
                    "id": next_id(),
                    "name": f.name,
                    "required": False,
                    "type": _spark_to_iceberg(f.dataType, next_id),
                }
                for f in dt.fields
            ],
        }
    if isinstance(dt, T.ArrayType):
        return {
            "type": "list",
            "element-id": next_id(),
            "element": _spark_to_iceberg(dt.elementType, next_id),
            "element-required": False,
        }
    if isinstance(dt, T.MapType):
        return {
            "type": "map",
            "key-id": next_id(),
            "value-id": next_id(),
            "key": _spark_to_iceberg(dt.keyType, next_id),
            "value": _spark_to_iceberg(dt.valueType, next_id),
            "value-required": False,
        }
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    m = {
        "boolean": "boolean",
        "integer": "int",
        "short": "int",
        "byte": "int",
        "long": "long",
        "float": "float",
        "double": "double",
        "date": "date",
        "timestamp": "timestamptz",
        "timestamp_ntz": "timestamp",
        "string": "string",
        "binary": "binary",
    }.get(dt.typeName())
    if m is None:
        raise ValueError(f"unsupported Spark type for Iceberg: {dt}")
    return m


_WIDEN = {("int", "long"), ("float", "double")}


def _strip_ids(t):
    """Type node with every field/element/key/value id removed, for
    structural comparison across independently-assigned id spaces."""
    if isinstance(t, dict):
        out = {}
        for k, v in t.items():
            if k in ("id", "element-id", "key-id", "value-id", "schema-id"):
                continue
            if k == "fields":
                out[k] = [_strip_ids(x) for x in v]
            elif k in ("element", "key", "value", "type"):
                out[k] = _strip_ids(v)
            else:
                out[k] = v
        return out
    return t


def _evolve_fields(
    cur_fields: list[dict], df: DataFrame, last_column_id: int
) -> tuple[list[dict], int]:
    """Append-time schema evolution per the Iceberg spec's field-id
    discipline: existing columns KEEP their ids (int→long /
    float→double widen in place — the safe promotions), NEW columns
    get fresh ids above ``last-column-id`` (ids are never reused),
    and table columns missing from the frame survive (the new files
    simply read null for them). Incompatible changes raise."""
    by_name = {f["name"]: f for f in cur_fields}
    out = [dict(f) for f in cur_fields]
    pos = {f["name"]: i for i, f in enumerate(out)}
    next_free = int(last_column_id)
    for f in df.schema.fields:
        probe = {"n": 0}

        def _pid():
            probe["n"] += 1
            return probe["n"]

        t_probe = _spark_to_iceberg(f.dataType, _pid)
        cur = by_name.get(f.name)
        if cur is not None:
            if _strip_ids(cur["type"]) == _strip_ids(t_probe):
                continue
            if (
                isinstance(cur["type"], str)
                and isinstance(t_probe, str)
                and (cur["type"], t_probe) in _WIDEN
            ):
                out[pos[f.name]] = dict(cur, type=t_probe)
                continue
            if (
                isinstance(cur["type"], str)
                and isinstance(t_probe, str)
                and (t_probe, cur["type"]) in _WIDEN
            ):
                # batch NARROWER than the table (int file under a long
                # column): exactly the state the spec's int→long
                # evolution leaves behind — readers widen old int32/
                # float files natively, so the column keeps its type
                continue
            raise ValueError(
                f"append changes column {f.name!r} from {cur['type']} "
                f"to {t_probe} — not a safe promotion (int→long, "
                "float→double); overwrite to change the schema"
            )
        holder = {"n": next_free}

        def _nid():
            holder["n"] += 1
            return holder["n"]

        fid = _nid()
        out.append(
            {
                "id": fid,
                "name": f.name,
                "required": False,
                "type": _spark_to_iceberg(f.dataType, _nid),
            }
        )
        next_free = holder["n"]
    return out, next_free


def _schema_node(df: DataFrame, schema_id: int) -> tuple[dict, int]:
    counter = {"n": 0}

    def next_id() -> int:
        counter["n"] += 1
        return counter["n"]

    node = _spark_to_iceberg(df.schema, next_id)
    node["schema-id"] = schema_id
    return node, counter["n"]


def _field_meta(
    descs: list[dict], schema
) -> tuple[dict[str, str], dict[str, object], dict[str, str]]:
    """Per partition-spec field: source-type validation + hive-value
    parse type + avro type of the manifest partition struct member.
    ``schema`` is a Spark StructType (the frame's on write, the
    TABLE's on DML). Shared by ``write_iceberg`` and the DML paths
    (``sinks/icebergdml``) so both stage and record partition values
    identically."""
    _TIME_SRC = ("date", "timestamp", "timestamp_ntz")
    field_parse: dict[str, str] = {}
    field_avro: dict[str, object] = {}
    src_type: dict[str, str] = {}
    for d in descs:
        tn = schema[d["source"]].dataType.typeName()
        src_type[d["field"]] = tn
        k = d["kind"]
        if k == "identity":
            if tn not in _PART_AVRO:
                raise ValueError(
                    f"unsupported identity-partition column type {tn!r} "
                    f"for {d['source']!r} (supported: {sorted(_PART_AVRO)})"
                )
            field_parse[d["field"]] = tn
            field_avro[d["field"]] = _PART_AVRO[tn]
        elif k in ("year", "month", "day"):
            if tn not in _TIME_SRC:
                raise ValueError(
                    f"{k} transform needs a date/timestamp column; "
                    f"{d['source']!r} is {tn!r}"
                )
            field_parse[d["field"]] = "integer"
            field_avro[d["field"]] = "int"
        elif k == "hour":
            if tn not in ("timestamp", "timestamp_ntz"):
                raise ValueError(
                    f"hour transform needs a timestamp column; "
                    f"{d['source']!r} is {tn!r}"
                )
            field_parse[d["field"]] = "integer"
            field_avro[d["field"]] = "int"
        elif k == "bucket":
            if tn not in ("integer", "long", "string", "date"):
                raise ValueError(
                    f"bucket transform unsupported for {tn!r} column "
                    f"{d['source']!r}"
                )
            field_parse[d["field"]] = "integer"
            field_avro[d["field"]] = "int"
        elif k == "truncate":
            if tn not in ("integer", "long", "string"):
                raise ValueError(
                    f"truncate transform unsupported for {tn!r} column "
                    f"{d['source']!r}"
                )
            field_parse[d["field"]] = tn
            field_avro[d["field"]] = _PART_AVRO[tn]
        else:
            raise ValueError(f"unsupported transform kind {k!r}")
    return field_parse, field_avro, src_type


def _stage_data_files(
    spark: SparkSession,
    fs,
    base: str,
    df: DataFrame,
    descs: list[dict],
    src_type: dict[str, str],
    field_parse: dict[str, str],
) -> tuple[dict[str, int], dict[str, dict]]:
    """Staged write + exact-ownership move into ``data/`` — hive
    layout under the spec's transform values for partitioned tables.
    Returns ``(new_files {rel: size}, part_of {rel: {field: typed
    partition value}})``. Shared by ``write_iceberg`` and
    ``iceberg_upsert`` so DML files land partitioned exactly like
    appends (the spec requires DML data files to carry real partition
    values; without them partition pruning silently degrades)."""
    from urllib.parse import unquote

    from harness_aws_etl_pipeline_spark.sources.icebergpart import (
        transform_column,
    )

    stage = posixpath.join(base, f".stage-{uuid.uuid4().hex}")
    new_files: dict[str, int] = {}
    part_of: dict[str, dict] = {}
    fields = [d["field"] for d in descs]
    try:
        if descs:
            staged_df = df
            for d in descs:
                staged_df = staged_df.withColumn(
                    f"__icw_{d['field']}",
                    transform_column(d, src_type[d["field"]]),
                )
            staged_df.write.partitionBy(
                *[f"__icw_{d['field']}" for d in descs]
            ).mode("overwrite").parquet(stage)
        else:
            df.write.mode("overwrite").parquet(stage)
        for rel, _mt, size in fs.list_files(stage):
            if not rel.endswith(".parquet"):
                continue
            pvals: dict[str, object] = {}
            pdir: list[str] = []
            for comp in rel.split("/")[:-1]:
                k, sep, v = comp.partition("=")
                if not sep or not k.startswith("__icw_"):
                    continue
                c = k[len("__icw_"):]
                raw = unquote(v)
                pvals[c] = (
                    None
                    if raw == "__HIVE_DEFAULT_PARTITION__"
                    else _parse_pval(raw, field_parse[c])
                )
                pdir.append(f"{c}={v}")
            dest_dir = "/".join(["data"] + pdir)
            if pdir:
                fs.mkdirs(posixpath.join(base, dest_dir))
            dest_rel = (
                f"{dest_dir}/{uuid.uuid4().hex}-{posixpath.basename(rel)}"
            )
            if not fs.rename(
                posixpath.join(stage, rel), posixpath.join(base, dest_rel)
            ):
                raise RuntimeError(f"could not move staged file {rel!r}")
            new_files[dest_rel] = size
            if fields:
                part_of[dest_rel] = {c: pvals.get(c) for c in fields}
    finally:
        fs.delete(stage, recursive=True)
    return new_files, part_of


def _latest_md(fs, mdir: str) -> tuple[dict | None, int]:
    """Newest ``vN.metadata.json`` (parsed) and its version, or
    ``(None, 0)`` for a fresh table."""
    import re as _re

    best = -1
    if fs.exists(mdir):
        for rel, _mt, _sz in fs.list_files(mdir):
            m = _re.match(r"v(\d+)\.metadata\.json$", posixpath.basename(rel))
            if m and int(m.group(1)) > best:
                best = int(m.group(1))
    if best < 0:
        return None, 0
    md = json.loads(
        fs.read_bytes(
            posixpath.join(mdir, f"v{best}.metadata.json")
        ).decode("utf-8")
    )
    return md, best


def write_iceberg(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    max_commit_retries: int = 20,
    operation: str | None = None,
) -> dict:
    """Write ``df`` as one Iceberg snapshot at ``path``. Returns
    ``{"snapshot_id", "metadata_version", "files_added", "retries"}``.
    ``partition_by`` declares the partitioning — identity columns or
    hidden transforms (``days(ts)``, ``bucket(16, id)``,
    ``truncate(4, name)``, ...); omitted, it inherits the table's
    existing spec."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append or overwrite: {mode!r}")
    base = path.rstrip("/")
    fs = get_fs(base, spark)
    mdir = posixpath.join(base, "metadata")
    ddir = posixpath.join(base, "data")
    fs.mkdirs(mdir)
    fs.mkdirs(ddir)

    # ---- resolve the effective partitioning against the table spec
    # (identity OR hidden transforms: year/month/day/hour, bucket[N],
    # truncate[W] — round 12)
    from harness_aws_etl_pipeline_spark.sources.icebergpart import (
        parse_transform,
        spec_transforms,
        transform_json,
    )

    md0, _v0 = _latest_md(fs, mdir)
    existing = spec_transforms(md0)
    if existing and any(d["kind"] == "void" for d in existing):
        raise ValueError(
            "table's partition spec carries void (dropped) fields; "
            "writing through spec evolution is not supported"
        )

    def _sig(ds):
        return [(d["kind"], d["param"], d["source"]) for d in ds]

    if partition_by is None:
        descs = list(existing or [])
    else:
        descs = [parse_transform(s) for s in partition_by]
        if (
            mode == "append"
            and existing is not None
            and _sig(descs) != _sig(existing)
        ):
            raise ValueError(
                f"append partitioning {[transform_json(d) for d in descs]}"
                f" on {[d['source'] for d in descs]} differs from the "
                "table's partition spec "
                f"{[transform_json(d) for d in existing]} on "
                f"{[d['source'] for d in existing]}; overwrite to change it"
            )
    missing = [d["source"] for d in descs if d["source"] not in df.columns]
    if missing:
        raise ValueError(f"partition columns not in the frame: {missing}")
    field_parse, field_avro, src_type = _field_meta(descs, df.schema)

    # ---- data: staged write + exact-ownership move (deltawrite's
    # concurrency reasoning). Partitioned writes duplicate the
    # partition columns under __icw_ aliases for the directory layout
    # so the data files still CONTAIN the source columns (the spec
    # requires it; the reader's one-scan design relies on it).
    new_files, part_of = _stage_data_files(
        spark, fs, base, df, descs, src_type, field_parse
    )

    # per-file record counts in ONE job over this write's files only
    counts: dict[str, int] = {}
    if new_files:
        paths = {posixpath.join(base, p): p for p in new_files}
        rows = (
            spark.read.parquet(*paths)
            .select(
                F.regexp_replace(
                    F.col("_metadata.file_path"), "^[a-zA-Z0-9+.-]+:/+", "/"
                ).alias("fp")
            )
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        # scheme-strip both sides so file:/s3a:/hdfs: URIs match the
        # paths we constructed (same normalization as deltaread)
        stripped = {
            "/" + ap.lstrip("/") if "://" not in ap
            else "/" + ap.split("://", 1)[1].lstrip("/"): rel
            for ap, rel in paths.items()
        }
        for r in rows:
            rel = stripped.get(r.fp)
            if rel is not None:
                counts[rel] = int(r.n)

    ts_ms = int(time.time() * 1000)
    retries = 0
    while True:
        # ---- latest metadata (if any)
        md, cur_version = _latest_md(fs, mdir)

        snapshot_id = int(uuid.uuid4().int % (1 << 62)) + 1
        seq = int(md.get("last-sequence-number", 0)) + 1 if md else 1

        # ---- schema resolution: an exact structural match reuses its
        # schema-id; APPENDS evolve the current schema (added columns
        # get fresh field ids, int→long / float→double widen in place,
        # table columns missing from the frame survive); overwrites
        # register a brand-new schema
        schemas = []
        if md:
            schemas = list(md.get("schemas") or [])
            if not schemas and md.get("schema"):
                schemas = [dict(md["schema"], **{"schema-id": 0})]
        node, last_col = _schema_node(df, 0)
        cur_node = next(
            (
                s
                for s in schemas
                if s.get("schema-id") == (md or {}).get("current-schema-id")
            ),
            None,
        )
        # the exact-match shortcut compares against the CURRENT schema
        # ONLY: matching a historical schema would move
        # current-schema-id BACK to it, silently undoing evolution
        # (dropping added columns / narrowing widened ones)
        same = (
            cur_node["schema-id"]
            if cur_node is not None
            and cur_node.get("fields") == node["fields"]
            else None
        )
        if same is not None:
            schema_id = same
            eff_fields = node["fields"]
        elif mode == "append" and md and cur_node is not None:
            eff_fields, last_col = _evolve_fields(
                cur_node["fields"], df, int(md.get("last-column-id", 0))
            )
            if eff_fields == cur_node["fields"]:
                schema_id = cur_node["schema-id"]
            else:
                schema_id = (
                    max((s["schema-id"] for s in schemas), default=-1) + 1
                )
                schemas = schemas + [
                    {
                        "type": "struct",
                        "schema-id": schema_id,
                        "fields": eff_fields,
                    }
                ]
        else:
            schema_id = max((s["schema-id"] for s in schemas), default=-1) + 1
            node["schema-id"] = schema_id
            schemas = schemas + [node]
            eff_fields = node["fields"]

        # ---- partition spec for this write (source ids resolved
        # against the EFFECTIVE schema, so evolved field ids hold)
        name_to_fid = {f["name"]: f["id"] for f in eff_fields}
        prev_specs = list((md or {}).get("partition-specs") or [])
        # Partition field ids must be UNIQUE across all of the table's
        # specs (Iceberg v2 — old snapshots' manifests still reference
        # the old spec): reuse an id only for a field identical to one
        # in an existing spec, otherwise allocate past the largest id
        # ever assigned (tracked by last-partition-id).
        prev_field_id = {
            (f["name"], f["transform"], f["source-id"]): int(f["field-id"])
            for s in prev_specs
            for f in s.get("fields") or []
        }
        next_fid = (
            max(
                [
                    int((md or {}).get("last-partition-id", 999)),
                    999,
                ]
                + list(prev_field_id.values())
            )
            + 1
        )
        spec_fields = []
        for d in descs:
            key = (d["field"], transform_json(d), name_to_fid[d["source"]])
            fid = prev_field_id.get(key)
            if fid is None:
                fid = next_fid
                next_fid += 1
            spec_fields.append(
                {
                    "name": key[0],
                    "transform": key[1],
                    "source-id": key[2],
                    "field-id": fid,
                }
            )
        same_spec = next(
            (
                s
                for s in prev_specs
                if [
                    (f["name"], f["transform"], f["source-id"])
                    for f in s.get("fields") or []
                ]
                == [
                    (f["name"], f["transform"], f["source-id"])
                    for f in spec_fields
                ]
            ),
            None,
        )
        if same_spec is not None:
            spec_id = same_spec["spec-id"]
            specs = prev_specs
        else:
            spec_id = max(
                (s["spec-id"] for s in prev_specs), default=-1
            ) + 1
            specs = prev_specs + [
                {"spec-id": spec_id, "fields": spec_fields}
            ]

        # ---- manifest for this write
        entries = [
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "sequence_number": seq,
                "data_file": {
                    "content": 0,
                    # full location-based path, like real clients
                    # (the reader maps it back via the location prefix)
                    "file_path": posixpath.join(base, p),
                    "file_format": "PARQUET",
                    "partition": part_of.get(p) or {},
                    "record_count": counts.get(p, 0),
                    "file_size_in_bytes": sz,
                    "equality_ids": None,
                },
            }
            for p, sz in sorted(new_files.items())
        ]
        man_rel = f"metadata/{uuid.uuid4().hex}-m0.avro"
        man_bytes = write_avro_bytes(
            _entry_schema(
                [
                    {
                        "name": f["name"],
                        "avro": field_avro[f["name"]],
                        "field-id": f["field-id"],
                    }
                    for f in spec_fields
                ]
            ),
            entries,
        )
        fs.write_bytes(posixpath.join(base, man_rel), man_bytes)
        rows_added = sum(counts.values())
        new_manifest = {
            "manifest_path": posixpath.join(base, man_rel),
            "manifest_length": len(man_bytes),
            "partition_spec_id": spec_id,
            "content": 0,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(entries),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": rows_added,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }

        # carry previous manifests forward on append
        prev_manifests: list[dict] = []
        if mode == "append" and md and md.get("current-snapshot-id"):
            cur_snap = next(
                (
                    s
                    for s in md.get("snapshots") or []
                    if s.get("snapshot-id") == md["current-snapshot-id"]
                ),
                None,
            )
            if cur_snap is not None:
                from harness_aws_etl_pipeline_spark.sources.avroread import (
                    _iter_container,
                )

                mlist_rel = cur_snap["manifest-list"]
                mlist_path = (
                    mlist_rel
                    if mlist_rel.startswith("/")
                    else posixpath.join(base, mlist_rel)
                )
                _s, _n, recs = _iter_container(fs.read_bytes(mlist_path))
                prev_manifests = list(recs)

        mlist_rel = f"metadata/snap-{snapshot_id}.avro"
        fs.write_bytes(
            posixpath.join(base, mlist_rel),
            write_avro_bytes(
                _MLIST_SCHEMA, prev_manifests + [new_manifest]
            ),
        )

        # ---- new metadata json
        snapshot = {
            "snapshot-id": snapshot_id,
            "timestamp-ms": ts_ms,
            "sequence-number": seq,
            # "replace" marks data-NEUTRAL file rewrites (compaction —
            # the spec's RewriteDataFiles operation); change-feed
            # consumers skip those snapshots
            "summary": {"operation": operation or mode},
            "manifest-list": posixpath.join(base, mlist_rel),
            "schema-id": schema_id,
        }
        new_md = {
            "format-version": 2,
            "table-uuid": (md or {}).get("table-uuid") or str(uuid.uuid4()),
            "location": base,
            "last-sequence-number": seq,
            "last-updated-ms": ts_ms,
            "last-column-id": max(
                int((md or {}).get("last-column-id", 0)), last_col
            ),
            "schemas": schemas,
            "current-schema-id": schema_id,
            "partition-specs": specs or [{"spec-id": 0, "fields": []}],
            "default-spec-id": spec_id,
            "last-partition-id": max(
                [999]
                + [
                    int(f["field-id"])
                    for s in specs
                    for f in s.get("fields") or []
                ]
            ),
            "sort-orders": [{"order-id": 0, "fields": []}],
            "default-sort-order-id": 0,
            "snapshots": ((md or {}).get("snapshots") or []) + [snapshot],
            "current-snapshot-id": snapshot_id,
            "snapshot-log": ((md or {}).get("snapshot-log") or [])
            + [{"snapshot-id": snapshot_id, "timestamp-ms": ts_ms}],
            "metadata-log": [],
        }
        target = posixpath.join(mdir, f"v{cur_version + 1}.metadata.json")
        # temp OUTSIDE metadata/ — concurrent writers list that dir
        # and Hadoop's listing stats each entry (vanishing-file race)
        tmp_dir = posixpath.join(base, ".icw_tmp")
        fs.mkdirs(tmp_dir)
        tmp = posixpath.join(tmp_dir, f"{uuid.uuid4().hex}.json")
        fs.write_bytes(tmp, json.dumps(new_md).encode("utf-8"))
        if fs.rename_if_absent(tmp, target):
            fs.write_bytes(
                posixpath.join(mdir, "version-hint.text"),
                str(cur_version + 1).encode("utf-8"),
            )
            return {
                "snapshot_id": snapshot_id,
                "metadata_version": cur_version + 1,
                "files_added": len(new_files),
                "retries": retries,
            }
        fs.delete(tmp, recursive=False)
        fs.delete(posixpath.join(base, man_rel), recursive=False)
        fs.delete(posixpath.join(base, mlist_rel), recursive=False)
        retries += 1
        if retries > max_commit_retries:
            raise RuntimeError(
                f"lost the Iceberg commit race {retries} times at {base!r}"
            )
