"""Iceberg PARTITION TRANSFORMS — the spec's hidden partitioning
(iceberg.apache.org/spec §Partition Transforms), shared by the writer
(``sinks/icebergwrite``: staging columns + manifest partition values)
and the reader (``sources/icebergread``: partition_filter pruning).

Supported: ``identity``, ``year``/``month``/``day``/``hour`` (int
offsets from 1970, the spec's result types), ``truncate[W]`` (numeric
floor-truncate / string prefix), ``bucket[N]``. Bucket fidelity is
spec-exact: ``(murmur3_x86_32(serialized) & Int.MAX) % N`` with the
spec's serializations (int/long/date widened to 8-byte little-endian
longs, strings as UTF-8 bytes) — pinned against the spec's published
test vectors (hash(34)=2017239379, hash("iceberg")=1210000089,
hash(date 2017-11-16)=-653330422) in ``tests/test_icebergwrite.py``.

Everything but bucket compiles to JVM-side Column expressions; bucket
needs murmur3 over spec byte layouts, which Spark's ``F.hash`` (seed
42, Spark's own serialization) cannot reproduce — it runs as an
Arrow-batched pandas UDF, used only on the writer's staging pass and
never in a read path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "bucket_value",
    "murmur3_32",
    "murmur3_32_i64_batch",
    "parse_transform",
    "spec_transforms",
    "transform_column",
    "transform_json",
]

_TIME_RE = re.compile(r"^(years?|months?|days?|hours?)\(\s*(\w+)\s*\)$")
_BUCKET_RE = re.compile(r"^bucket\(\s*(\d+)\s*,\s*(\w+)\s*\)$")
_TRUNC_RE = re.compile(r"^truncate\(\s*(\d+)\s*,\s*(\w+)\s*\)$")
_IDENT_RE = re.compile(r"^\w+$")


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 (unsigned 32-bit result) — the hash the spec's
    bucket transform is defined over."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    n = len(data) & ~3
    for i in range(0, n, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[n:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def bucket_value(v, n: int, type_name: str) -> int | None:
    """Spec bucket id of one value (driver-side twin of the staging
    UDF — used by tests and the reader's strict checks)."""
    import struct

    if v is None:
        return None
    if type_name in ("integer", "long"):
        data = struct.pack("<q", int(v))
    elif type_name == "date":
        import datetime

        days = (
            (v - datetime.date(1970, 1, 1)).days
            if isinstance(v, datetime.date)
            else int(v)
        )
        data = struct.pack("<q", days)
    elif type_name == "string":
        data = str(v).encode("utf-8")
    else:
        raise ValueError(f"bucket transform unsupported for {type_name!r}")
    return (murmur3_32(data) & 0x7FFFFFFF) % n


def parse_transform(s: str) -> dict:
    """User string → descriptor ``{"kind", "param", "source",
    "field"}``: ``"col"`` (identity), ``"days(ts)"``,
    ``"bucket(16, id)"``, ``"truncate(4, name)"``. Field names follow
    Iceberg's defaults (``ts_day``, ``id_bucket``, ``name_trunc``)."""
    s = s.strip()
    m = _BUCKET_RE.match(s)
    if m:
        return {
            "kind": "bucket",
            "param": int(m.group(1)),
            "source": m.group(2),
            "field": f"{m.group(2)}_bucket",
        }
    m = _TRUNC_RE.match(s)
    if m:
        return {
            "kind": "truncate",
            "param": int(m.group(1)),
            "source": m.group(2),
            "field": f"{m.group(2)}_trunc",
        }
    m = _TIME_RE.match(s)
    if m:
        kind = m.group(1).rstrip("s")
        return {
            "kind": kind,
            "param": None,
            "source": m.group(2),
            "field": f"{m.group(2)}_{kind}",
        }
    if _IDENT_RE.match(s):
        return {"kind": "identity", "param": None, "source": s, "field": s}
    raise ValueError(f"unparseable partition transform {s!r}")


def transform_json(desc: dict) -> str:
    """Descriptor → the spec's JSON transform string."""
    k = desc["kind"]
    if k == "identity":
        return "identity"
    if k in ("year", "month", "day", "hour"):
        return k
    if k == "bucket":
        return f"bucket[{desc['param']}]"
    if k == "truncate":
        return f"truncate[{desc['param']}]"
    raise ValueError(f"unknown transform kind {k!r}")


def spec_transforms(md: dict) -> list[dict] | None:
    """The table's default partition spec as descriptors (source ids
    resolved to column names via the current schema); ``None`` when
    the metadata carries no default spec. Unknown transform names
    raise — better loud than a wrong layout."""
    if not md:
        return None
    specs = md.get("partition-specs") or []
    spec = next(
        (
            s
            for s in specs
            if s.get("spec-id") == md.get("default-spec-id", 0)
        ),
        None,
    )
    if spec is None:
        return None
    names_by_id: dict[int, str] = {}
    schemas = md.get("schemas") or ([md["schema"]] if md.get("schema") else [])
    cur = md.get("current-schema-id", 0)
    node = next((s for s in schemas if s.get("schema-id") == cur), None)
    for f in (node or {}).get("fields") or []:
        names_by_id[int(f["id"])] = f["name"]
    out: list[dict] = []
    for f in spec.get("fields") or []:
        t = f.get("transform")
        if t == "identity":
            kind, param = "identity", None
        elif t in ("year", "month", "day", "hour"):
            kind, param = t, None
        elif isinstance(t, str) and t.startswith("bucket["):
            kind, param = "bucket", int(t[7:-1])
        elif isinstance(t, str) and t.startswith("truncate["):
            kind, param = "truncate", int(t[9:-1])
        elif t == "void":
            kind, param = "void", None
        else:
            raise ValueError(f"unsupported partition transform {t!r}")
        source = names_by_id.get(int(f["source-id"]))
        if source is None and kind != "void":
            raise ValueError(
                f"partition spec field {f.get('name')!r} references "
                f"unknown source column id {f.get('source-id')}"
            )
        out.append(
            {
                "kind": kind,
                "param": param,
                "source": source,
                "field": f["name"],
                "field_id": f.get("field-id"),
            }
        )
    return out


def _utc_date(c: Column, dtype_name: str) -> Column:
    """The source value's calendar date per the Iceberg spec: UTC for
    ``timestamp`` (spec defines time transforms over UTC epoch micros,
    independent of ``spark.sql.session.timeZone``), the stored local
    value for ``timestamp_ntz``, the value itself for ``date``."""
    if dtype_name == "timestamp":
        # epoch-day via unix_micros (tz-independent), floor handles
        # pre-1970 instants; date_add back onto the epoch gives a
        # DateType whose year/month extraction is tz-free.
        epoch_day = F.floor(
            F.unix_micros(c) / F.lit(86_400_000_000)
        ).cast("int")
        return F.date_add(F.to_date(F.lit("1970-01-01")), epoch_day)
    # date: identity. timestamp_ntz: cast-to-date truncates the stored
    # local datetime — no timezone is involved for either.
    return c.cast("date")


def transform_column(desc: dict, dtype_name: str) -> Column:
    """The transform as a Column over the source column — JVM-side
    expressions everywhere except bucket's string path (spec murmur3
    via an Arrow-batched pandas UDF; writer staging only).

    Time transforms follow the spec exactly: for ``timestamp`` they
    are derived from UTC epoch micros (``unix_micros``), never from
    session-timezone field extraction, so ``days(ts)`` and
    ``hours(ts)//24`` always agree; for ``timestamp_ntz`` they use the
    stored local value; for ``date`` the value itself."""
    kind, param, src = desc["kind"], desc["param"], desc["source"]
    c = F.col(src)
    if kind == "identity":
        return c
    if kind in ("year", "month", "day", "hour"):
        if kind == "hour" and dtype_name not in (
            "timestamp",
            "timestamp_ntz",
        ):
            raise ValueError("hour transform needs a timestamp column")
        if kind == "hour":
            if dtype_name == "timestamp":
                return F.floor(
                    F.unix_micros(c) / F.lit(3_600_000_000)
                ).cast("int")
            # timestamp_ntz: no numeric cast exists; hours since epoch
            # of the stored local value = local-epoch-day * 24 + hour.
            d = F.datediff(
                c.cast("date"), F.to_date(F.lit("1970-01-01"))
            )
            return (d * F.lit(24) + F.hour(c)).cast("int")
        ud = _utc_date(c, dtype_name)
        if kind == "year":
            return (F.year(ud) - F.lit(1970)).cast("int")
        if kind == "month":
            return (
                (F.year(ud) - F.lit(1970)) * F.lit(12)
                + F.month(ud)
                - F.lit(1)
            ).cast("int")
        return F.datediff(
            ud, F.to_date(F.lit("1970-01-01"))
        ).cast("int")
    if kind == "truncate":
        if dtype_name == "string":
            return F.substring(c, 1, param)
        if dtype_name in ("integer", "long"):
            w = F.lit(param)
            return (c - (((c % w) + w) % w)).cast(dtype_name)
        raise ValueError(
            f"truncate transform unsupported for {dtype_name!r}"
        )
    if kind == "bucket":
        if dtype_name in ("integer", "long", "date"):
            # Serialize JVM-side to the spec's 8-byte long (dates as
            # days-since-epoch), null-fill with 0 so the Arrow batch
            # arrives as exact int64 (a nullable int batch converts to
            # float64 in pandas and silently rounds > 2^53), and mask
            # nulls back afterwards.
            v = (
                F.datediff(c, F.to_date(F.lit("1970-01-01")))
                if dtype_name == "date"
                else c
            ).cast("long")
            return F.when(
                c.isNotNull(),
                _bucket_i64_udf(param)(F.coalesce(v, F.lit(0))),
            )
        return _bucket_udf(param, dtype_name)(c)
    raise ValueError(f"unknown transform kind {kind!r}")


def murmur3_32_i64_batch(vals):
    """Vectorized murmur3_x86_32 over int64 values serialized as the
    spec's 8-byte little-endian blocks (the int/long/date bucket
    layout) — pure numpy bit-ops, no per-row Python. Returns a uint32
    ndarray. Matches :func:`murmur3_32` bit-for-bit (two 4-byte body
    blocks, no tail, length 8)."""
    import numpy as np

    c1 = np.uint32(0xCC9E2D51)
    c2 = np.uint32(0x1B873593)
    blocks = (
        np.ascontiguousarray(vals, dtype="<i8").view("<u4").reshape(-1, 2)
    )
    with np.errstate(over="ignore"):
        h = np.zeros(blocks.shape[0], dtype=np.uint32)
        for i in (0, 1):
            k = blocks[:, i] * c1
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * c2
            h = h ^ k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h = h ^ np.uint32(8)  # total byte length
        h = h ^ (h >> np.uint32(16))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0xC2B2AE35)
        h = h ^ (h >> np.uint32(16))
    return h


def _bucket_i64_udf(n: int):
    """Fixed-width bucket path: whole-batch numpy murmur3 over exact
    non-null int64 input (the caller null-fills and masks JVM-side) —
    every row of a bucket-partitioned write flows through here, so no
    per-row Python."""
    import pandas as pd  # noqa: F401 (resolved via globals by pyspark)

    globals()["pd"] = pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _b(s: "pd.Series") -> "pd.Series":
        import numpy as np

        vals = s.to_numpy(dtype=np.int64)
        h = murmur3_32_i64_batch(vals)
        out = (
            (h & np.uint32(0x7FFFFFFF)).astype(np.int64) % n
        ).astype(np.int32)
        return pd.Series(out, index=s.index)

    return _b


def _bucket_udf(n: int, type_name: str):
    # module-level pandas import: with `from __future__ import
    # annotations` the UDF's type hints are strings, and pyspark
    # resolves them against the function's globals
    import pandas as pd  # noqa: F401 (resolved via globals by pyspark)

    globals()["pd"] = pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _b(s: "pd.Series") -> "pd.Series":
        return s.map(
            lambda v: None if v is None else bucket_value(v, n, type_name)
        ).astype("Int32")

    return _b
