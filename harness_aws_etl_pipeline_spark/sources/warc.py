"""WARC (Web ARChive, ISO 28500) source — web-crawl ingestion.

Common Crawl and every serious web corpus ship as WARC: a sequence of
records, each a ``WARC/1.0`` header block (named headers, CRLF
terminated) + ``Content-Length`` bytes of payload, ``\\r\\n\\r\\n``
separated. Crawl archives gzip each record as its OWN gzip member so
readers can stream records without decompressing the whole file;
Python's ``gzip.decompress`` handles multi-member streams natively.

Reading strategy (the standard one for Spark): WARC is not
line-splittable, so each FILE is one task — ``binaryFile`` rows
(path, content) → Arrow-batched parse → one row per selected record.
Parallelism comes from file count (a crawl segment is tens of
thousands of ~1 GB files; 1000 executors stay busy), not intra-file
splits. The parse is a single forward scan per file: header block,
``Content-Length`` jump, next record — no regex over payloads.

For ``response`` records the HTTP envelope is split off: status code
+ Content-Type come out as columns, the entity body is the
``payload`` binary column — exactly what :mod:`operators.html`
(markup → text), :mod:`operators.urlops` (the WARC-Target-URI), and
:mod:`operators.containers` (binary media) consume downstream. That
chain — WARC → html_to_text → canonical-URL dedup → quality gates →
dedup family — is the engine's end-to-end web-corpus path.

:func:`build_warc` writes spec-conforming fixtures (plain or
per-record-gzip) so tests exercise real structure.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["build_warc", "parse_warc", "read_warc", "read_wet"]

_CRLF2 = b"\r\n\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    """Header block (after the version line) → dict; values keep their
    case, names are matched case-insensitively via lower()."""
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
    return headers


class _Stream:
    """Buffered reader over a file-like object with bounded lookahead:
    ``read_until(sep)`` and ``read_exact(n)`` hold at most the current
    header block / payload in memory — never the inflated file."""

    __slots__ = ("f", "buf")

    def __init__(self, f):
        self.f = f
        self.buf = b""

    def _fill(self, n: int = 65536) -> bool:
        chunk = self.f.read(n)
        if not chunk:
            return False
        self.buf += chunk
        return True

    def read_until(self, sep: bytes, limit: int = 1 << 20) -> bytes | None:
        """Bytes up to and EXCLUDING sep (consumed); None when sep
        doesn't arrive within ``limit`` bytes or the stream ends."""
        while True:
            i = self.buf.find(sep)
            if i >= 0:
                out, self.buf = self.buf[:i], self.buf[i + len(sep) :]
                return out
            if len(self.buf) > limit or not self._fill():
                return None

    def read_exact(self, n: int) -> bytes | None:
        while len(self.buf) < n:
            if not self._fill(max(65536, n - len(self.buf))):
                return None
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def skip_crlf_runs(self) -> None:
        while True:
            while self.buf[:2] == b"\r\n":
                self.buf = self.buf[2:]
            if len(self.buf) >= 2 or not self._fill():
                return


def parse_warc(data: "bytes | Any") -> Iterator[dict[str, Any]]:
    """One forward STREAMING scan over a WARC byte stream — ``data``
    may be bytes or a binary file-like object; gzip (including the
    crawl-archive per-record-member layout) is detected and inflated
    lazily, so peak memory is O(largest record), never O(inflated
    file) — the property that matters when one task owns a ~1 GB
    member file that inflates 4×. Yields one dict per record: warc
    headers + raw payload. Malformed/truncated tails stop the scan
    cleanly rather than raising."""
    f = io.BytesIO(data) if isinstance(data, (bytes, bytearray)) else data
    head = f.read(2)
    f.seek(-len(head), io.SEEK_CUR)
    if head == b"\x1f\x8b":
        # GzipFile reads across concatenated members transparently and
        # decompresses on demand via read(n)
        f = gzip.GzipFile(fileobj=f, mode="rb")
    s = _Stream(f)
    while True:
        s.skip_crlf_runs()
        head_block = s.read_until(_CRLF2)
        if head_block is None or not head_block.startswith(b"WARC/"):
            break
        version_line, _, header_block = head_block.partition(b"\r\n")
        headers = _parse_headers(header_block)
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        payload = s.read_exact(length)
        if payload is None:
            break  # truncated record: Content-Length not satisfied
        yield {
            "version": version_line.decode("ascii", "replace"),
            "headers": headers,
            "payload": payload,
        }


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response envelope → (status, content_type, body)."""
    sep = payload.find(_CRLF2)
    if sep < 0 or not payload[:5] == b"HTTP/":
        return None, None, payload
    head = payload[:sep]
    status_line, _, header_block = head.partition(b"\r\n")
    parts = status_line.split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    ctype = _parse_headers(header_block).get("content-type")
    return status, ctype, payload[sep + 4 :]


WARC_SCHEMA = StructType(
    [
        StructField("warc_file", StringType(), True),
        StructField("record_id", StringType(), True),
        StructField("record_type", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("content_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("payload_length", LongType(), True),
    ]
)


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
    glob: str | None = None,
) -> DataFrame:
    """WARC files under ``path`` → one row per selected record.

    ``binaryFile`` keeps one file per task (WARC has no split
    points); ``record_types`` filters on the WARC-Type header
    (``("response",)`` default — pass ``()`` for every record).
    Response payloads arrive with the HTTP envelope split off
    (``http_status`` / ``content_type`` columns, entity body in
    ``payload``)."""
    import pandas as pd

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")
    want = tuple(record_types)

    chunk_records = 256  # bound the in-flight rows, not file-at-a-time

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        rows: list[dict] = []
        emitted = False
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc(bytes(content)):
                    h = rec["headers"]
                    rtype = h.get("warc-type")
                    if want and rtype not in want:
                        continue
                    payload = rec["payload"]
                    status, ctype, body = (
                        _split_http(payload)
                        if rtype == "response"
                        else (None, h.get("content-type"), payload)
                    )
                    rows.append(
                        {
                            "warc_file": fpath,
                            "record_id": h.get("warc-record-id"),
                            "record_type": rtype,
                            "target_uri": h.get("warc-target-uri"),
                            "warc_date": h.get("warc-date"),
                            "http_status": status,
                            "content_type": ctype,
                            "payload": body,
                            "payload_length": len(body),
                        }
                    )
                    if len(rows) >= chunk_records:
                        emitted = True
                        yield pd.DataFrame(rows, columns=cols).astype("object")
                        rows = []
        if rows or not emitted:
            yield pd.DataFrame(rows, columns=cols).astype("object")

    return files.mapInPandas(_parse, WARC_SCHEMA)


def read_wet(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """WET sidecar files (the extracted-text companions crawl archives
    publish next to raw WARC): structurally WARC, but the useful rows
    are ``conversion`` records whose payload is UTF-8 plain text —
    the cheap entry point when raw markup isn't needed. Same
    one-file-per-task scan as :func:`read_warc`; payload surfaced as
    a ``text`` string column."""
    from pyspark.sql import functions as F

    return read_warc(
        spark, path, record_types=("conversion",), glob=glob
    ).select(
        "warc_file",
        "record_id",
        "target_uri",
        "warc_date",
        F.col("payload").cast("string").alias("text"),
        "payload_length",
    )


def build_warc(
    records: list[dict[str, Any]],
    per_record_gzip: bool = False,
) -> bytes:
    """Spec-conforming WARC/1.0 writer for fixtures and tests. Each
    ``record`` dict: ``type`` (warcinfo/request/response/...),
    ``uri``, ``date``, ``payload`` (bytes — for responses, the full
    HTTP envelope), optional ``record_id``. ``per_record_gzip``
    emits one gzip member per record, the crawl-archive layout."""
    out = io.BytesIO()
    for i, rec in enumerate(records):
        payload = rec["payload"]
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + rec["type"].encode(),
            b"WARC-Record-ID: "
            + rec.get("record_id", f"<urn:uuid:rec-{i}>").encode(),
            b"WARC-Date: " + rec.get("date", "2024-01-01T00:00:00Z").encode(),
        ]
        if rec.get("uri"):
            headers.append(b"WARC-Target-URI: " + rec["uri"].encode())
        headers.append(b"Content-Length: " + str(len(payload)).encode())
        raw = b"\r\n".join(headers) + _CRLF2 + payload + _CRLF2
        if per_record_gzip:
            member = io.BytesIO()
            with gzip.GzipFile(fileobj=member, mode="wb", mtime=0) as gz:
                gz.write(raw)
            out.write(member.getvalue())
        else:
            out.write(raw)
    return out.getvalue()


def http_response(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html",
) -> bytes:
    """HTTP/1.1 envelope around a body — response-record payloads."""
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body
