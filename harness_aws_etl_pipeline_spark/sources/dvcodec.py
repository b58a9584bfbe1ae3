"""Delta Lake deletion-vector codec — pure Python, no jar.

The Delta transaction protocol (github.com/delta-io/delta
PROTOCOL.md, "Deletion Vectors" — an open spec) stores the deleted
row indexes of a data file as a 64-bit RoaringBitmapArray:

- serialized blob = ``int32 LE magic (1681511377)`` followed by the
  64-bit "portable" RoaringBitmapArray format: ``int64 LE number of
  32-bit buckets``, then per bucket ``int32 LE high key`` + the
  STANDARD 32-bit RoaringBitmap portable serialization
  (github.com/RoaringBitmap/RoaringFormatSpec);
- inline storage (``storageType "i"``): the blob is Z85-encoded
  (ZeroMQ base85, rfc.zeromq.org/spec/32) straight into the log;
- file storage (``"u"``/``"p"``): a ``.bin`` file starting with a
  1-byte format version (1); each DV within sits at ``offset`` as
  ``int32 BE blob size | blob | int32 BE CRC-32(blob)``.

The decoder handles all three 32-bit container kinds (array, bitmap,
run — both SERIAL_COOKIE layouts); the encoder emits array/bitmap
containers with the no-run cookie, which is what the reference JVM
writer produces for freshly-built DVs. The encoder exists so the
test fixtures exercise the real wire format end-to-end; production
tables only ever hit the decoder.
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "z85_decode",
    "z85_encode",
    "decode_dv_blob",
    "encode_dv_blob",
    "frame_dv_file",
    "read_dv_from_file_bytes",
]

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

#: little-endian magic prefixing every serialized deletion vector
DV_MAGIC = 1681511377

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85: 4 bytes → 5 chars, big-endian base 85. Input length
    must be a multiple of 4 (the spec's requirement — Delta's UUIDs
    and DV blobs are padded to it by construction)."""
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    """Inverse of :func:`z85_encode` (5 chars → 4 bytes)."""
    if len(text) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for ch in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise ValueError(f"invalid z85 character {ch!r}") from None
        if v > 0xFFFFFFFF:
            raise ValueError("z85 chunk overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


# ------------------------------------------------ 32-bit roaring codec


def _decode_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one standard-portable 32-bit RoaringBitmap starting at
    ``pos``; returns (sorted values, next position)."""
    (cookie32,) = struct.unpack_from("<i", buf, pos)
    cookie = cookie32 & 0xFFFF
    run_flags = b""
    if cookie == _SERIAL_COOKIE:
        n_containers = ((cookie32 >> 16) & 0xFFFF) + 1
        pos += 4
        nbytes = (n_containers + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie})")

    def is_run(idx: int) -> bool:
        return bool(run_flags) and bool(
            run_flags[idx // 8] & (1 << (idx % 8))
        )

    keys: list[int] = []
    cards: list[int] = []
    for i in range(n_containers):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        keys.append(k)
        cards.append(cm1 + 1)
        pos += 4
    # offset header present iff no-run cookie, or enough containers
    if cookie == _SERIAL_COOKIE_NO_RUN or n_containers >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n_containers  # offsets are redundant for a linear scan
    values: list[int] = []
    for i in range(n_containers):
        base = keys[i] << 16
        if is_run(i):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + start, base + start + length + 1))
        elif cards[i] > 4096:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            pos += 2 * cards[i]
            values.extend(base + v for v in vals)
    return values, pos


def _encode_rb32(values: list[int]) -> bytes:
    """Standard-portable 32-bit encode (array/bitmap containers,
    no-run cookie). ``values`` sorted, de-duplicated, < 2^32."""
    by_key: dict[int, list[int]] = {}
    for v in values:
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    out = bytearray(struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys)))
    for k in keys:
        out += struct.pack("<HH", k, len(by_key[k]) - 1)
    # offset header (mandatory with the no-run cookie)
    off = len(out) + 4 * len(keys)
    offsets = []
    for k in keys:
        offsets.append(off)
        card = len(by_key[k])
        off += 8192 if card > 4096 else 2 * card
    out += struct.pack(f"<{len(keys)}i", *offsets)
    for k in keys:
        vals = by_key[k]
        if len(vals) > 4096:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            out += struct.pack("<1024Q", *words)
        else:
            out += struct.pack(f"<{len(vals)}H", *vals)
    return bytes(out)


# ------------------------------------------------ 64-bit DV blob


def decode_dv_blob(blob: bytes) -> list[int]:
    """Serialized DV (magic + 64-bit portable RoaringBitmapArray) →
    sorted list of deleted row indexes."""
    if len(blob) < 12:
        raise ValueError("deletion vector blob too short")
    (magic,) = struct.unpack_from("<i", blob, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad deletion vector magic {magic}")
    (n_buckets,) = struct.unpack_from("<q", blob, 4)
    pos = 12
    out: list[int] = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<i", blob, pos)
        pos += 4
        vals, pos = _decode_rb32(blob, pos)
        out.extend((high << 32) | v for v in vals)
    # Z85 operates on 4-byte groups, so an inline blob may carry up to
    # 3 trailing ZERO padding bytes; anything else is corruption
    tail = blob[pos:]
    if len(tail) > 3 or any(tail):
        raise ValueError(
            f"deletion vector blob has {len(blob) - pos} trailing bytes"
        )
    return out


def encode_dv_blob(indexes: list[int]) -> bytes:
    """Sorted/unique row indexes → serialized DV blob (fixture writer
    + round-trip oracle for the decoder)."""
    idx = sorted(set(int(i) for i in indexes))
    if idx and idx[0] < 0:
        raise ValueError("row indexes must be non-negative")
    buckets: dict[int, list[int]] = {}
    for v in idx:
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", DV_MAGIC, len(buckets)))
    for high in sorted(buckets):
        out += struct.pack("<i", high)
        out += _encode_rb32(buckets[high])
    return bytes(out)


# ------------------------------------------------ .bin file framing


def frame_dv_file(blobs: list[bytes]) -> tuple[bytes, list[int]]:
    """Build a DV ``.bin`` file holding ``blobs``; returns
    ``(file_bytes, offsets)`` where ``offsets[i]`` is the value to put
    in the add action for blob i (points at its int32 BE size)."""
    out = bytearray(b"\x01")  # format version
    offsets = []
    for blob in blobs:
        offsets.append(len(out))
        out += struct.pack(">i", len(blob))
        out += blob
        out += struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF)
    return bytes(out), offsets


def read_dv_from_file_bytes(
    data: bytes, offset: int, size_in_bytes: int
) -> list[int]:
    """Extract + verify one DV from ``.bin`` file content."""
    if not data or data[0] != 1:
        raise ValueError(
            f"unsupported deletion vector file version {data[0] if data else '<empty>'}"
        )
    (size,) = struct.unpack_from(">i", data, offset)
    if size != size_in_bytes:
        raise ValueError(
            f"deletion vector size mismatch: file says {size}, "
            f"log says {size_in_bytes}"
        )
    blob = data[offset + 4 : offset + 4 + size]
    (crc,) = struct.unpack_from(">I", data, offset + 4 + size)
    if zlib.crc32(blob) & 0xFFFFFFFF != crc:
        raise ValueError("deletion vector checksum mismatch")
    return decode_dv_blob(blob)
