"""Avro Object Container Files WITHOUT spark-avro — pure-stdlib
decode of the open specification (avro.apache.org/docs/current/spec):
zigzag-varint binary encoding, OCF framing (magic ``Obj\\x01``, file
metadata map, 16-byte sync markers, block counts/sizes), ``null`` and
``deflate`` codecs (stdlib zlib, raw window), and the full type
lattice a lake actually uses: primitives, records, arrays, maps,
enums, fixed, and unions — nullable ``[null, X]``, plus (round 10)
GENERAL unions via the spark-avro mapping: {int,long} widens to long,
{float,double} to double, anything else becomes a struct of
``member0..memberN`` fields with exactly one non-null member per
datum; ``null`` anywhere contributes nullability.

Why: Avro is the classic streaming/CDC landing format (Kafka
ecosystems, Debezium, sqoop-era exports); the stock Spark distribution
needs the external ``spark-avro`` jar this container doesn't ship.
The reader keeps Spark-first shape anyway: ONE driver-side header
read derives the Spark schema, then decoding fans out as a
``binaryFile`` scan + ``mapInPandas`` over whole files — per-file
parallelism (the natural Avro split at container granularity),
no shuffle, malformed files isolated to NULL rows when
``permissive=True``.

Logical types pass through as their underlying primitives when
unknown (the spec's own fallback rule); known ones (date, timestamps,
decimal, uuid) convert to the matching Spark types.

``write_avro_bytes`` is the test-side encoder (same spec, mirrored)
so round trips exercise real varint/block/sync machinery.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["avro_spark_schema", "read_avro", "write_avro_bytes"]

_MAGIC = b"Obj\x01"


# ------------------------------------------------------ binary layer


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise ValueError("truncated Avro varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag


def _write_long(out: bytearray, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise ValueError("truncated Avro bytes")
    return data


def _classify_union(schema: list) -> tuple[str, list]:
    """Union mapping policy (mirrors spark-avro): ``null`` branches
    → nullability; one remaining branch → that type; {int,long} →
    long, {float,double} → double (numeric widening); anything else →
    a struct of ``member0..memberN`` fields with exactly one non-null
    member per datum. Returns ``(kind, non_null_branches)`` with kind
    in {"simple", "long", "double", "struct"}."""
    non_null = [s for s in schema if s != "null"]
    if len(non_null) <= 1:
        return "simple", non_null
    as_names = {s if isinstance(s, str) else None for s in non_null}
    if as_names <= {"int", "long"}:
        return "long", non_null
    if as_names <= {"float", "double"}:
        return "double", non_null
    return "struct", non_null


def _decode(schema, buf: io.BytesIO, names: dict):
    """Schema-driven single-datum decode → python value."""
    if isinstance(schema, str):
        schema = names.get(schema, schema)
    if isinstance(schema, list):  # union: branch index then datum
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError(f"Avro union index {idx} out of range")
        kind, non_null = _classify_union(schema)
        if kind != "struct" or schema[idx] == "null":
            return _decode(schema[idx], buf, names)
        positions = [i for i, s in enumerate(schema) if s != "null"]
        mi = positions.index(idx)
        v = _decode(schema[idx], buf, names)
        return {
            f"member{j}": (v if j == mi else None)
            for j in range(len(non_null))
        }
    if isinstance(schema, dict):
        t = schema["type"]
        lt = schema.get("logicalType")
        if lt:
            # decode the UNDERLYING shape (fixed/bytes carriers keep
            # their dict node, primitives decode by name), then apply
            # the logical conversion
            if t in ("record", "array", "map", "enum", "fixed"):
                base = {k: x for k, x in schema.items() if k != "logicalType"}
                v = _decode(base, buf, names)
            else:
                v = _decode(t, buf, names)
            return _logical(lt, schema, v)
        if t == "record":
            return {
                f["name"]: _decode(f["type"], buf, names)
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:
                    _read_long(buf)  # block byte size — skippable
                    n = -n
                for _ in range(n):
                    out.append(_decode(schema["items"], buf, names))
            return out
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    break
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode(schema["values"], buf, names)
            return out
        if t == "enum":
            idx = _read_long(buf)
            syms = schema["symbols"]
            if not 0 <= idx < len(syms):
                raise ValueError(f"Avro enum index {idx} out of range")
            return syms[idx]
        if t == "fixed":
            data = buf.read(schema["size"])
            if len(data) != schema["size"]:
                raise ValueError("truncated Avro fixed")
            return data
        return _decode(t, buf, names)  # {"type": "long", ...} wrapper
    if schema == "null":
        return None
    if schema == "boolean":
        b = buf.read(1)
        if not b:
            raise ValueError("truncated Avro boolean")
        return b[0] == 1
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    raise ValueError(f"unsupported Avro type {schema!r}")


def _logical(lt: str, schema: dict, v):
    """Spec logical types → python values Spark's Arrow path accepts.
    Unknown logical types fall back to the underlying primitive (the
    spec's own rule)."""
    import datetime as _dt
    import decimal as _dec

    if v is None:
        return None
    if lt == "date":
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=int(v))
    # timestamp-millis/micros are UTC INSTANTS per the Avro spec — a
    # naive datetime of the UTC wall clock would be reinterpreted in
    # spark.sql.session.timeZone by the Arrow path and shift every
    # value by the session's UTC offset (round-10 fix, matches
    # spark-avro); tz-aware UTC datetimes pin the instant regardless
    # of session zone
    if lt == "timestamp-millis":
        return _dt.datetime(
            1970, 1, 1, tzinfo=_dt.timezone.utc
        ) + _dt.timedelta(milliseconds=int(v))
    if lt == "timestamp-micros":
        return _dt.datetime(
            1970, 1, 1, tzinfo=_dt.timezone.utc
        ) + _dt.timedelta(microseconds=int(v))
    if lt == "decimal":
        scale = int(schema.get("scale", 0))
        unscaled = int.from_bytes(bytes(v), "big", signed=True)
        return _dec.Decimal(unscaled).scaleb(-scale)
    if lt == "uuid":
        return str(v)
    return v


def _collect_names(schema, names: dict) -> None:
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed") and "name" in schema:
            names[schema["name"]] = schema
        if t == "record":
            for f in schema.get("fields", []):
                _collect_names(f["type"], names)
        elif t == "array":
            _collect_names(schema.get("items"), names)
        elif t == "map":
            _collect_names(schema.get("values"), names)
    elif isinstance(schema, list):
        for s in schema:
            _collect_names(s, names)


# ------------------------------------------------------ schema map


def _spark_type(schema, names: dict) -> tuple[T.DataType, bool]:
    """Avro schema node → (Spark type, nullable)."""
    if isinstance(schema, str):
        resolved = names.get(schema)
        if resolved is not None and resolved is not schema:
            return _spark_type(resolved, names)
        prim = {
            "null": T.NullType(),
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
        }.get(schema)
        if prim is None:
            raise ValueError(f"unsupported Avro type {schema!r}")
        return prim, False
    if isinstance(schema, list):
        kind, non_null = _classify_union(schema)
        nullable = len(non_null) < len(schema)
        if kind == "simple":
            if not non_null:  # ["null"] alone
                return T.NullType(), True
            dt, _ = _spark_type(non_null[0], names)
            return dt, True
        if kind == "long":
            return T.LongType(), nullable
        if kind == "double":
            return T.DoubleType(), nullable
        # struct-of-branches (the spark-avro convention): memberI per
        # non-null branch, exactly one non-null per datum (round 10 —
        # general unions were previously rejected)
        fields = []
        for i, b in enumerate(non_null):
            dt, _ = _spark_type(b, names)
            fields.append(T.StructField(f"member{i}", dt, True))
        return T.StructType(fields), nullable
    lt = schema.get("logicalType")
    if lt == "date":
        return T.DateType(), False
    if lt in ("timestamp-millis", "timestamp-micros"):
        return T.TimestampType(), False
    if lt == "decimal":
        return (
            T.DecimalType(
                int(schema.get("precision", 38)), int(schema.get("scale", 0))
            ),
            False,
        )
    if lt == "uuid":
        return T.StringType(), False
    t = schema["type"]
    if t == "record":
        fields = []
        for f in schema["fields"]:
            dt, nullable = _spark_type(f["type"], names)
            fields.append(T.StructField(f["name"], dt, nullable or True))
        return T.StructType(fields), False
    if t == "array":
        dt, nullable = _spark_type(schema["items"], names)
        return T.ArrayType(dt, containsNull=nullable), False
    if t == "map":
        dt, nullable = _spark_type(schema["values"], names)
        return T.MapType(T.StringType(), dt, valueContainsNull=nullable), False
    if t == "enum":
        return T.StringType(), False
    if t == "fixed":
        return T.BinaryType(), False
    return _spark_type(t, names)


def avro_spark_schema(schema_json: str) -> T.StructType:
    """Top-level record schema → Spark StructType (the driver-side
    step of read_avro; exposed for tests and tooling)."""
    schema = json.loads(schema_json)
    names: dict = {}
    _collect_names(schema, names)
    dt, _ = _spark_type(schema, names)
    if not isinstance(dt, T.StructType):
        raise ValueError("top-level Avro schema must be a record")
    return dt


# ------------------------------------------------------- container


def _iter_container(payload: bytes):
    """OCF → (schema dict, names, iterator of decoded records)."""
    buf = io.BytesIO(payload)
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro object container (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    names: dict = {}
    _collect_names(schema, names)

    def _records():
        while True:
            head = buf.read(1)
            if not head:
                return
            buf.seek(-1, 1)
            count = _read_long(buf)
            size = _read_long(buf)
            block = buf.read(size)
            if len(block) != size:
                raise ValueError("truncated Avro block")
            if codec == "deflate":
                block = zlib.decompress(block, -15)
            bbuf = io.BytesIO(block)
            for _ in range(count):
                yield _decode(schema, bbuf, names)
            if buf.read(16) != sync:
                raise ValueError("Avro sync marker mismatch")

    return schema, names, _records()


def read_avro(
    spark: SparkSession,
    path: str,
    glob: str = "*.avro",
    permissive: bool = False,
) -> DataFrame:
    """Avro container files under ``path`` → DataFrame. One header
    read on the driver pins the schema; decoding distributes as a
    binaryFile + mapInPandas whole-file pass. Files whose schema
    differs from the first file's are an error (Avro's own contract
    is per-file schemas; evolve upstream); ``permissive=True`` turns
    any malformed FILE into a single all-NULL row tagged by
    ``_corrupt_avro_file`` instead of failing the scan."""
    from collections.abc import Iterator as _Iter

    import pandas as pd

    src = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )
    first = src.select("content").limit(1).collect()
    if not first:
        raise ValueError(f"no Avro files match {glob!r} under {path}")
    schema0, _, _ = _iter_container(bytes(first[0][0]))
    schema_json = json.dumps(schema0)
    sschema = avro_spark_schema(schema_json)
    out_schema = T.StructType(
        list(sschema.fields)
        + [T.StructField("_corrupt_avro_file", T.StringType(), True)]
    )
    cols = [f.name for f in sschema.fields]

    def _run(batches: "_Iter[pd.DataFrame]") -> "_Iter[pd.DataFrame]":
        for pdf in batches:
            rows: list[dict] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    fschema, _, recs = _iter_container(bytes(content))
                    if fschema != schema0:
                        raise ValueError(
                            f"schema mismatch vs first file: {p}"
                        )
                    for r in recs:
                        r["_corrupt_avro_file"] = None
                        rows.append(r)
                except (
                    ValueError,  # includes UnicodeDecodeError
                    KeyError,
                    zlib.error,
                    struct.error,  # file truncated mid float/double
                ) as exc:
                    if not permissive:
                        raise
                    rows.append(
                        {**{c: None for c in cols},
                         "_corrupt_avro_file": f"{p}: {exc}"}
                    )
            yield pd.DataFrame(
                {
                    c: pd.Series([r.get(c) for r in rows], dtype="object")
                    for c in [*cols, "_corrupt_avro_file"]
                }
            )

    out = src.mapInPandas(_run, out_schema)
    return out if permissive else out.drop("_corrupt_avro_file")


# ------------------------------------------------------ test writer


def _pick_branch(schema: list, value, names: dict) -> int:
    """Fixture-writer branch selection for general unions: first
    non-null branch whose Avro type is compatible with the python
    value's type (bool before int — python bools are ints)."""

    def _matches(branch) -> bool:
        import datetime as _dt
        import decimal as _dec

        b = names.get(branch, branch) if isinstance(branch, str) else branch
        if isinstance(b, dict):
            lt = b.get("logicalType")
            if lt == "date":
                return isinstance(value, _dt.date) and not isinstance(
                    value, _dt.datetime
                )
            if lt in ("timestamp-millis", "timestamp-micros"):
                return isinstance(value, _dt.datetime)
            if lt == "decimal":
                return isinstance(value, _dec.Decimal)
            t = b["type"]
            if t in ("record",):
                return isinstance(value, dict)
            if t == "map":
                return isinstance(value, dict)
            if t == "array":
                return isinstance(value, (list, tuple))
            if t == "enum":
                return isinstance(value, str) and value in b.get("symbols", ())
            if t == "fixed":
                return isinstance(value, (bytes, bytearray))
            b = t
        if b == "boolean":
            return isinstance(value, bool)
        if b in ("int", "long"):
            return isinstance(value, int) and not isinstance(value, bool)
        if b in ("float", "double"):
            return isinstance(value, float)
        if b == "string":
            return isinstance(value, str)
        if b == "bytes":
            return isinstance(value, (bytes, bytearray))
        return False

    for i, s in enumerate(schema):
        if s != "null" and _matches(s):
            return i
    return next(i for i, s in enumerate(schema) if s != "null")


def _encode_logical(lt: str, schema: dict, value, out: bytearray) -> None:
    """Logical-typed datum → underlying primitive bytes (the write
    mirror of ``_logical``): date → days, timestamp-millis/micros →
    epoch delta (tz-aware converted; naive treated as UTC wall time —
    callers pin the session zone to UTC before collecting),
    decimal → big-endian two's-complement unscaled bytes."""
    import datetime as _dt
    import decimal as _dec

    if lt == "date":
        days = (
            int(value)
            if isinstance(value, int)
            else (value - _dt.date(1970, 1, 1)).days
        )
        _write_long(out, days)
        return
    if lt in ("timestamp-millis", "timestamp-micros"):
        if isinstance(value, int):
            n = int(value)
        else:
            epoch = (
                _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
                if value.tzinfo is not None
                else _dt.datetime(1970, 1, 1)
            )
            unit = (
                _dt.timedelta(milliseconds=1)
                if lt == "timestamp-millis"
                else _dt.timedelta(microseconds=1)
            )
            n = (value - epoch) // unit
        _write_long(out, n)
        return
    if lt == "decimal":
        if isinstance(value, (bytes, bytearray)):
            # pre-encoded unscaled bytes (fixture-writer passthrough)
            b = bytes(value)
        else:
            scale = int(schema.get("scale", 0))
            d = (
                value
                if isinstance(value, _dec.Decimal)
                else _dec.Decimal(str(value))
            )
            unscaled = int(d.scaleb(scale).to_integral_value())
            b = unscaled.to_bytes(
                max(1, (unscaled.bit_length() + 8) // 8),
                "big",
                signed=True,
            )
        _write_long(out, len(b))
        out += b
        return
    if lt == "uuid":
        b = str(value).encode("utf-8")
        _write_long(out, len(b))
        out += b
        return
    # unknown logical types fall back to the underlying primitive —
    # the spec's own rule, mirroring the read side
    _encode(schema["type"], value, out, {})


def _encode(schema, value, out: bytearray, names: dict) -> None:
    if isinstance(schema, str):
        schema = names.get(schema, schema)
    if isinstance(schema, list):
        if value is None and "null" in schema:
            idx = schema.index("null")
        else:
            idx = _pick_branch(schema, value, names)
        _write_long(out, idx)
        _encode(schema[idx], value, out, names)
        return
    if isinstance(schema, dict):
        t = schema["type"]
        lt = schema.get("logicalType")
        if lt and t not in ("record", "array", "map", "enum", "fixed"):
            _encode_logical(lt, schema, value, out)
            return
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], value[f["name"]], out, names)
            return
        if t == "array":
            if value:
                _write_long(out, len(value))
                for v in value:
                    _encode(schema["items"], v, out, names)
            _write_long(out, 0)
            return
        if t == "map":
            if value:
                _write_long(out, len(value))
                for k, v in value.items():
                    kb = k.encode("utf-8")
                    _write_long(out, len(kb))
                    out += kb
                    _encode(schema["values"], v, out, names)
            _write_long(out, 0)
            return
        if t == "enum":
            _write_long(out, schema["symbols"].index(value))
            return
        if t == "fixed":
            out += value
            return
        _encode(t, value, out, names)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out.append(1 if value else 0)
        return
    if schema in ("int", "long"):
        _write_long(out, int(value))
        return
    if schema == "float":
        out += struct.pack("<f", value)
        return
    if schema == "double":
        out += struct.pack("<d", value)
        return
    if schema in ("bytes", "string"):
        b = value.encode("utf-8") if schema == "string" else bytes(value)
        _write_long(out, len(b))
        out += b
        return
    raise ValueError(f"unsupported Avro type {schema!r}")


def write_avro_bytes(
    schema_json: str,
    records: list[dict],
    codec: str = "null",
    block_size: int = 2,
    sync: bytes = b"0123456789abcdef",
) -> bytes:
    """Spec-mirroring test encoder: OCF with the given codec and
    ``block_size`` records per block (multiple blocks exercise the
    sync-marker walk)."""
    schema = json.loads(schema_json)
    names: dict = {}
    _collect_names(schema, names)
    out = bytearray(_MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_long(out, len(kb))
        out += kb
        _write_long(out, len(v))
        out += v
    _write_long(out, 0)
    out += sync
    for i in range(0, len(records), block_size):
        chunk = records[i : i + block_size]
        body = bytearray()
        for r in chunk:
            _encode(schema, r, body, names)
        data = bytes(body)
        if codec == "deflate":
            comp = zlib.compressobj(wbits=-15)
            data = comp.compress(data) + comp.flush()
        _write_long(out, len(chunk))
        _write_long(out, len(data))
        out += data
        out += sync
    return bytes(out)
