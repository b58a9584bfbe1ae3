"""Apache Hudi log-file format (HoodieLogFormat v1) — the delta-block
codec behind MERGE_ON_READ reads, jar-free like the rest of the
interop tier (``deltaread`` / ``icebergread`` / ``avroread``).

Layout per the open spec (hudi.apache.org/tech-specs#log-file-format),
one or more blocks back to back:

``#HUDI#`` magic (6) | block length (8) | format version (4) |
block type (4) | header length (8) | header map | content length (8) |
content | footer length (8) | footer map | total block length (8)

- header/footer maps: 4-byte entry count, then per entry a 4-byte
  ``HeaderMetadataType`` ordinal + 4-byte length + UTF-8 bytes;
- AVRO data block content: 4-byte content version (3), 4-byte record
  count, then per record 4-byte length + binary-Avro bytes of the
  schema carried in the ``SCHEMA`` header (decoded by the in-repo
  ``avroread`` binary decoder);
- DELETE block content: 4-byte content version (2), 4-byte payload
  length, payload = binary-Avro ``HoodieDeleteRecordList``
  (``recordKey`` / ``partitionPath`` per delete);
- COMMAND block (rollback): empty content; ``TARGET_INSTANT_TIME``
  names the instant whose earlier blocks in this log file it voids.

Honest scope: avro / delete / command / corrupt blocks; ``hfile`` /
``parquet`` / ``cdc`` data blocks and unknown content versions are
DETECTED and rejected loudly (they need readers this tier does not
carry). All integers are big-endian, per the JVM DataOutputStream the
format was defined with.
"""

from __future__ import annotations

import io
import json
import struct

from harness_aws_etl_pipeline_spark.sources.avroread import (
    _collect_names,
    _decode,
    _encode,
)

__all__ = [
    "DELETE_SCHEMA",
    "decode_log_blocks",
    "encode_avro_block",
    "encode_command_block",
    "encode_delete_block",
]

_MAGIC = b"#HUDI#"
_FMT_VERSION = 1

# HoodieLogBlockType ordinals
_T_COMMAND, _T_DELETE, _T_CORRUPT, _T_AVRO = 0, 1, 2, 3
_T_HFILE, _T_PARQUET, _T_CDC = 4, 5, 6
_TYPE_NAMES = {
    _T_COMMAND: "command",
    _T_DELETE: "delete",
    _T_CORRUPT: "corrupt",
    _T_AVRO: "avro",
    _T_HFILE: "hfile",
    _T_PARQUET: "parquet",
    _T_CDC: "cdc",
}

# HeaderMetadataType ordinals
H_INSTANT_TIME = 0
H_TARGET_INSTANT_TIME = 1
H_SCHEMA = 2
H_COMMAND_BLOCK_TYPE = 3

DELETE_SCHEMA = json.dumps(
    {
        "type": "record",
        "name": "HoodieDeleteRecordList",
        "fields": [
            {
                "name": "deleteRecordList",
                "type": {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "HoodieDeleteRecord",
                        "fields": [
                            {"name": "recordKey", "type": ["null", "string"]},
                            {
                                "name": "partitionPath",
                                "type": ["null", "string"],
                            },
                        ],
                    },
                },
            }
        ],
    }
)


def _enc_map(entries: dict[int, str]) -> bytes:
    out = bytearray(struct.pack(">i", len(entries)))
    for k, v in sorted(entries.items()):
        vb = v.encode("utf-8")
        out += struct.pack(">ii", k, len(vb))
        out += vb
    return bytes(out)


def _dec_map(buf: io.BytesIO) -> dict[int, str]:
    (n,) = struct.unpack(">i", buf.read(4))
    out: dict[int, str] = {}
    for _ in range(n):
        k, ln = struct.unpack(">ii", buf.read(8))
        out[k] = buf.read(ln).decode("utf-8")
    return out


def _frame_block(btype: int, headers: dict[int, str], content: bytes) -> bytes:
    hdr = _enc_map(headers)
    ftr = _enc_map({})
    # block length excludes the magic and the length field itself
    body = bytearray()
    body += struct.pack(">i", _FMT_VERSION)
    body += struct.pack(">i", btype)
    body += struct.pack(">q", len(hdr))
    body += hdr
    body += struct.pack(">q", len(content))
    body += content
    body += struct.pack(">q", len(ftr))
    body += ftr
    total = len(_MAGIC) + 8 + len(body) + 8  # incl. trailing total field
    body += struct.pack(">q", total)
    return _MAGIC + struct.pack(">q", len(body)) + bytes(body)


def encode_avro_block(
    schema_json: str, records: list[dict], instant: str
) -> bytes:
    """One AVRO data block: records binary-encoded with the given
    writer schema (carried in the SCHEMA header, like the jar does)."""
    schema = json.loads(schema_json)
    names: dict = {}
    _collect_names(schema, names)
    content = bytearray(struct.pack(">ii", 3, len(records)))
    for r in records:
        rb = bytearray()
        _encode(schema, r, rb, names)
        content += struct.pack(">i", len(rb))
        content += rb
    return _frame_block(
        _T_AVRO,
        {H_INSTANT_TIME: instant, H_SCHEMA: schema_json},
        bytes(content),
    )


def encode_delete_block(
    deletes: list[tuple[str, str]], instant: str
) -> bytes:
    """One DELETE block: ``deletes`` is [(recordKey, partitionPath)]."""
    schema = json.loads(DELETE_SCHEMA)
    names: dict = {}
    _collect_names(schema, names)
    payload = bytearray()
    _encode(
        schema,
        {
            "deleteRecordList": [
                {"recordKey": k, "partitionPath": p} for k, p in deletes
            ]
        },
        payload,
        names,
    )
    content = struct.pack(">ii", 2, len(payload)) + bytes(payload)
    return _frame_block(_T_DELETE, {H_INSTANT_TIME: instant}, content)


def encode_command_block(instant: str, target_instant: str) -> bytes:
    """A ROLLBACK command block voiding this log file's earlier blocks
    whose instant equals ``target_instant``."""
    return _frame_block(
        _T_COMMAND,
        {
            H_INSTANT_TIME: instant,
            H_TARGET_INSTANT_TIME: target_instant,
            H_COMMAND_BLOCK_TYPE: "0",  # ROLLBACK_PREVIOUS_BLOCK
        },
        b"",
    )


def _parse_block(buf: io.BytesIO) -> dict | None:
    magic = buf.read(len(_MAGIC))
    if not magic:
        return None
    if len(magic) < len(_MAGIC):
        # torn tail write → corrupt trailer, like the jar's scanner
        return {"type": "corrupt", "headers": {}, "content": b""}
    if magic != _MAGIC:
        raise ValueError(
            f"corrupt Hudi log file: bad magic {magic!r}"
        )
    lb = buf.read(8)
    if len(lb) < 8:
        return {"type": "corrupt", "headers": {}, "content": b""}
    (blen,) = struct.unpack(">q", lb)
    body = buf.read(blen)
    if len(body) < blen:
        # torn tail write → treat as a corrupt block, like the jar
        return {"type": "corrupt", "headers": {}, "content": b""}
    b = io.BytesIO(body)
    version, btype = struct.unpack(">ii", b.read(8))
    if version != _FMT_VERSION:
        raise ValueError(
            f"unsupported Hudi log format version {version}"
        )
    (hlen,) = struct.unpack(">q", b.read(8))
    headers = _dec_map(io.BytesIO(b.read(hlen)))
    (clen,) = struct.unpack(">q", b.read(8))
    content = b.read(clen)
    tname = _TYPE_NAMES.get(btype)
    if tname is None:
        raise ValueError(f"unknown Hudi log block type ordinal {btype}")
    return {"type": tname, "headers": headers, "content": content}


def decode_log_blocks(data: bytes) -> list[dict]:
    """Parse a whole log file into semantic blocks, applying rollback
    command blocks (which void this file's earlier blocks of the
    target instant) and skipping corrupt blocks. Returns
    ``[{"type": "avro", "instant", "records": [dict]} |
    {"type": "delete", "instant", "deletes": [(key, part)]}]``."""
    buf = io.BytesIO(data)
    raw: list[dict] = []
    while True:
        blk = _parse_block(buf)
        if blk is None:
            break
        raw.append(blk)
    out: list[dict] = []
    for blk in raw:
        t = blk["type"]
        h = blk["headers"]
        if t == "corrupt":
            continue
        if t == "command":
            target = h.get(H_TARGET_INSTANT_TIME)
            out = [x for x in out if x["instant"] != target]
            continue
        if t in ("hfile", "parquet", "cdc"):
            raise ValueError(
                f"Hudi {t} data blocks need a reader this jar-free "
                "tier does not carry (compact the table first)"
            )
        instant = h.get(H_INSTANT_TIME)
        if instant is None:
            raise ValueError("Hudi log block missing INSTANT_TIME header")
        c = io.BytesIO(blk["content"])
        if t == "avro":
            schema_json = h.get(H_SCHEMA)
            if not schema_json:
                raise ValueError("Hudi avro block missing SCHEMA header")
            cver, n = struct.unpack(">ii", c.read(8))
            if cver != 3:
                raise ValueError(
                    f"unsupported Hudi avro block content version {cver}"
                )
            schema = json.loads(schema_json)
            names: dict = {}
            _collect_names(schema, names)
            recs = []
            for _ in range(n):
                (ln,) = struct.unpack(">i", c.read(4))
                recs.append(_decode(schema, io.BytesIO(c.read(ln)), names))
            out.append(
                {
                    "type": "avro",
                    "instant": instant,
                    "records": recs,
                    "schema": schema_json,
                }
            )
        elif t == "delete":
            cver, ln = struct.unpack(">ii", c.read(8))
            if cver != 2:
                raise ValueError(
                    f"unsupported Hudi delete block content version {cver}"
                )
            schema = json.loads(DELETE_SCHEMA)
            names = {}
            _collect_names(schema, names)
            rec = _decode(schema, io.BytesIO(c.read(ln)), names)
            out.append(
                {
                    "type": "delete",
                    "instant": instant,
                    "deletes": [
                        (d.get("recordKey"), d.get("partitionPath"))
                        for d in rec["deleteRecordList"]
                    ],
                }
            )
    return out
