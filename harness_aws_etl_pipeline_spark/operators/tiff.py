"""Pure numpy + stdlib TIFF 6.0 codec (baseline decode + test encoder).

Joins the PPM/BMP/PNG/GIF/JPEG/WAV family in
:mod:`operators.multimodal`: no codec library exists in this
container, so the decode step is implemented against the published
specification (TIFF 6.0, Adobe 1992). TIFF is the scan/document-
corpus format — multi-page scanners, fax archives, and scientific
capture emit it — so a training-data pipeline that ingests document
scans meets it right after PDF.

Decoder scope (baseline TIFF): both byte orders (``II``
little-endian, ``MM`` big-endian), striped layout with any
RowsPerStrip, Compression 1 (none), 5 (LZW — MSB-first code packing
with the spec's EarlyChange width bump), and 32773 (PackBits),
horizontal-differencing Predictor (tag 317 = 2), and the baseline
photometrics: 0/1 bilevel+gray (WhiteIsZero inverted per spec,
1-bit rows byte-aligned and MSB-first), 2 RGB (extra samples
dropped), 3 palette (ColorMap's 16-bit ramps reduced to their high
byte). 8-bit samples plus 1-bit bilevel — the baseline set. Output
is ``(h, w, 3) uint8`` RGB like every sibling decoder.

The encoder exists so tests can round-trip arbitrary arrays through
REAL compressed streams: uncompressed / PackBits (the spec's own
run-length algorithm) / literal-code LZW that tracks the decoder's
table so the variable width GROWS through the full 9→12-bit
EarlyChange ladder, optional predictor, either byte order.
Spec-valid output, no compression ambition beyond PackBits runs.

Reference scope note: the reference pipeline has no media path at
all (etl/ handles CSV/JSON/parquet only) — this extends the [EXT]
multimodal family.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_tiff", "encode_tiff", "tiff_meta"]

_II = b"II\x2a\x00"
_MM = b"MM\x00\x2a"

# type code → (struct char, byte size); the baseline set we read
_TYPES = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4), 2: ("s", 1), 5: ("II", 8)}


def _read_ifd(payload: bytes) -> tuple[dict, str]:
    """Header + first IFD → ({tag: (values tuple)}, endian char)."""
    if payload[:4] == _II:
        e = "<"
    elif payload[:4] == _MM:
        e = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order/magic)")
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF IFD offset out of range")
    (n,) = struct.unpack_from(e + "H", payload, ifd_off)
    tags: dict = {}
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(e + "HHI", payload, base)
        info = _TYPES.get(typ)
        if info is None:
            continue  # skip types we don't need (baseline reader)
        ch, size = info
        total = size * cnt
        if total <= 4:
            off = base + 8
        else:
            (off,) = struct.unpack_from(e + "I", payload, base + 8)
        if off + total > len(payload):
            raise ValueError(f"TIFF tag {tag} data out of range")
        if typ == 2:  # ASCII — not used structurally, keep raw
            tags[tag] = (payload[off : off + cnt],)
        elif typ == 5:  # RATIONAL — store as float
            vals = struct.unpack_from(e + "II" * cnt, payload, off)
            tags[tag] = tuple(
                (a / b if b else 0.0) for a, b in zip(vals[::2], vals[1::2])
            )
        else:
            tags[tag] = struct.unpack_from(e + ch * cnt, payload, off)
    return tags, e


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:  # literal run of n+1 bytes
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("PackBits repeat truncated")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op per spec
    if len(out) < expected:
        raise ValueError("PackBits stream shorter than strip")
    return bytes(out[:expected])


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, CLEAR=256, EOI=257,
    9→12-bit codes with the spec's EarlyChange (width bumps one code
    EARLY — at table sizes 510/1022/2046)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset() -> None:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.append(b"")  # 256 CLEAR
        table.append(b"")  # 257 EOI

    reset()
    width = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                reset()
                width = 9
                prev = None
                continue
            if code == EOI:
                if len(out) < expected:
                    raise ValueError("TIFF LZW ended before strip filled")
                return bytes(out[:expected])
            if prev is None:
                if code >= len(table):
                    raise ValueError(f"bad initial LZW code {code}")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError(f"LZW code {code} beyond table")
            out += entry
            prev = entry
            # EarlyChange: bump the width when ONE MORE code would
            # overflow the current width
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    if len(out) < expected:
        raise ValueError("TIFF LZW stream shorter than strip")
    return bytes(out[:expected])


def _tag1(tags: dict, tag: int, default=None):
    v = tags.get(tag)
    if v is None:
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default
    return v[0]


def tiff_meta(payload: bytes) -> dict:
    """Structural probe (containers.py style): dimensions, layout and
    compression WITHOUT decoding pixels."""
    tags, e = _read_ifd(payload)
    return {
        "container": "tiff",
        "endian": "little" if e == "<" else "big",
        "width": int(_tag1(tags, 256)),
        "height": int(_tag1(tags, 257)),
        "bits_per_sample": int(_tag1(tags, 258, 1)),
        "compression": int(_tag1(tags, 259, 1)),
        "photometric": int(_tag1(tags, 262)),
        "samples_per_pixel": int(_tag1(tags, 277, 1)),
        "strips": len(tags.get(273, ())),
        "predictor": int(_tag1(tags, 317, 1)),
    }


def decode_tiff(payload: bytes) -> "np.ndarray":
    """Baseline TIFF → (h, w, 3) uint8 RGB (first IFD only)."""
    tags, _e = _read_ifd(payload)
    w = int(_tag1(tags, 256))
    h = int(_tag1(tags, 257))
    bits = tags.get(258, (1,))
    comp = int(_tag1(tags, 259, 1))
    photo = int(_tag1(tags, 262))
    spp = int(_tag1(tags, 277, 1))
    offsets = tags.get(273)
    counts = tags.get(279)
    rps = int(_tag1(tags, 278, h))
    predictor = int(_tag1(tags, 317, 1))
    if offsets is None or counts is None:
        raise ValueError("TIFF missing StripOffsets/StripByteCounts")
    if len(offsets) != len(counts):
        raise ValueError("TIFF strip offset/count mismatch")
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"unsupported TIFF photometric {photo}")
    depth = int(bits[0])
    if any(int(b) != depth for b in bits):
        raise ValueError("TIFF mixed bits-per-sample unsupported")
    if depth not in (1, 8):
        raise ValueError(f"unsupported TIFF bit depth {depth} (baseline: 1/8)")
    if depth == 1 and (spp != 1 or photo > 1):
        raise ValueError("1-bit TIFF must be single-sample bilevel")
    if photo == 3 and spp != 1:
        raise ValueError("palette TIFF must be single-sample")

    row_bytes = (w * spp * depth + 7) // 8
    raw = bytearray()
    rows_left = h
    for off, cnt in zip(offsets, counts):
        strip_rows = min(rps, rows_left)
        rows_left -= strip_rows
        expected = strip_rows * row_bytes
        chunk = payload[int(off) : int(off) + int(cnt)]
        if comp == 1:
            if len(chunk) < expected:
                raise ValueError("TIFF uncompressed strip truncated")
            raw += chunk[:expected]
        elif comp == 5:
            raw += _lzw_decode(chunk, expected)
        elif comp == 32773:
            raw += _packbits_decode(chunk, expected)
        else:
            raise ValueError(f"unsupported TIFF compression {comp}")
    if rows_left:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")

    arr = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, row_bytes)
    if depth == 1:
        bits_ = np.unpackbits(arr, axis=1)[:, :w]
        gray = (bits_ * 255).astype(np.uint8)
        if photo == 0:  # WhiteIsZero
            gray = 255 - gray
        return np.repeat(gray[..., None], 3, axis=2)

    px = arr.reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing: undo by cumulative sum along the
        # row, per sample channel (mod 256)
        px = (
            np.cumsum(px.astype(np.int32), axis=1) % 256
        ).astype(np.uint8)
    elif predictor != 1:
        raise ValueError(f"unsupported TIFF predictor {predictor}")

    if photo == 3:
        cmap = tags.get(320)
        if cmap is None:
            raise ValueError("palette TIFF missing ColorMap")
        n = 1 << depth
        if len(cmap) != 3 * n:
            raise ValueError("TIFF ColorMap size mismatch")
        # three 16-bit ramps → high byte
        pal = (
            np.asarray(cmap, dtype=np.uint32).reshape(3, n).T >> 8
        ).astype(np.uint8)
        return pal[px[:, :, 0]]
    if photo == 2:
        if spp < 3:
            raise ValueError("RGB TIFF needs >= 3 samples per pixel")
        return np.ascontiguousarray(px[:, :, :3])
    # photometric 0/1 gray
    gray = px[:, :, 0]
    if photo == 0:
        gray = 255 - gray
    return np.repeat(gray[..., None], 3, axis=2)


def _packbits_encode(row: bytes) -> bytes:
    """Spec PackBits: repeat runs ≥ 3 become (257-n, byte); literals
    batch up to 128."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        # literal: extend until a ≥3 run starts or 128 bytes
        j = i + 1
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and row[j + r] == row[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + row[i:j]
        i = j
    return bytes(out)


def _lzw_encode_literal(data: bytes) -> bytes:
    """Literal-code TIFF LZW (test encoder): CLEAR, then raw byte
    codes, EOI — never emitting a multi-byte table code, but tracking
    the table the decoder builds so the variable code width GROWS per
    the spec's EarlyChange rule (width++ once the table's next code
    would be 2^w − 1; every emitted code after the first since CLEAR
    adds one decoder entry), with a CLEAR before the 12-bit table
    fills. MSB-first packing. This exercises the decoder's real
    9→10→11→12-bit path, not just the 9-bit prefix."""
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)
    table_len = 258
    first = True
    for b in data:
        if table_len >= 4094:
            emit(256)  # CLEAR at the CURRENT width, then reset
            width = 9
            table_len = 258
            first = True
        emit(b)
        if first:
            first = False
        else:
            table_len += 1
            if table_len == (1 << width) - 1 and width < 12:
                width += 1
    emit(257)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    arr: "np.ndarray",
    compression: str = "none",
    predictor: bool = False,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """(h, w, 3) uint8 RGB → striped baseline TIFF. ``compression``:
    none / packbits / lzw (literal codes). ``predictor`` applies
    horizontal differencing (valid with any compression here)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got shape {a.shape}")
    h, w = a.shape[:2]
    e = ">" if big_endian else "<"
    rps = rows_per_strip or h
    comp_code = {"none": 1, "packbits": 32773, "lzw": 5}.get(compression)
    if comp_code is None:
        raise ValueError(f"unknown compression {compression!r}")

    src = a
    if predictor:
        d = src.astype(np.int16)
        d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
        src = (d % 256).astype(np.uint8)

    strips = []
    for y0 in range(0, h, rps):
        block = src[y0 : y0 + rps].reshape(-1).tobytes()
        if comp_code == 1:
            strips.append(block)
        elif comp_code == 32773:
            # PackBits is defined per ROW by the spec
            rows = src[y0 : y0 + rps]
            strips.append(
                b"".join(
                    _packbits_encode(rows[y].tobytes())
                    for y in range(rows.shape[0])
                )
            )
        else:
            strips.append(_lzw_encode_literal(block))

    n_strips = len(strips)

    def entry(tag: int, typ: int, cnt: int, value_or_off: int) -> bytes:
        # inline values are LEFT-JUSTIFIED in the 4-byte field: a
        # big-endian SHORT sits in the FIRST two bytes, not the last
        if typ == 3 and cnt == 1:
            field = struct.pack(e + "H", value_or_off) + b"\x00\x00"
        else:
            field = struct.pack(e + "I", value_or_off)
        return struct.pack(e + "HHI", tag, typ, cnt) + field

    # layout: header(8) + IFD + tag-overflow area + strip data
    tags = []  # (tag, typ, cnt, inline_value or None, payload bytes or None)
    tags.append((256, 4, 1, w, None))
    tags.append((257, 4, 1, h, None))
    tags.append((258, 3, 3, None, struct.pack(e + "HHH", 8, 8, 8)))
    tags.append((259, 3, 1, comp_code, None))
    tags.append((262, 3, 1, 2, None))
    tags.append((277, 3, 1, 3, None))
    tags.append((278, 4, 1, rps, None))
    if predictor:
        tags.append((317, 3, 1, 2, None))
    # strip offsets/counts filled after layout below
    n_tags = len(tags) + 2
    ifd_off = 8
    after_ifd = ifd_off + 2 + 12 * n_tags + 4

    overflow = bytearray()

    def place(data: bytes) -> int:
        off = after_ifd + len(overflow)
        overflow.extend(data)
        if len(data) & 1:
            overflow.append(0)
        return off

    entries = []
    for tag, typ, cnt, inline, payload in sorted(
        tags, key=lambda t: t[0]
    ):
        if payload is None:
            entries.append((tag, typ, cnt, inline))
        else:
            if len(payload) <= 4:
                v = int.from_bytes(
                    payload.ljust(4, b"\x00"),
                    "big" if big_endian else "little",
                )
                entries.append((tag, typ, cnt, v))
            else:
                entries.append((tag, typ, cnt, place(payload)))

    # strip tables (after overflow so their offsets are final we do a
    # two-pass: reserve table space first)
    counts_payload = struct.pack(e + "I" * n_strips, *[len(s) for s in strips])
    if n_strips == 1:
        counts_ref = ("inline", len(strips[0]))
    else:
        counts_ref = ("off", place(counts_payload))
    offsets_pos = None
    if n_strips == 1:
        offsets_ref = ("inline", None)  # patched below
    else:
        offsets_pos = place(b"\x00" * 4 * n_strips)
        offsets_ref = ("off", offsets_pos)

    data_start = after_ifd + len(overflow)
    strip_offsets = []
    pos = data_start
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s) + (len(s) & 1)

    if n_strips == 1:
        entries.append((273, 4, 1, strip_offsets[0]))
        entries.append((279, 4, 1, counts_ref[1]))
    else:
        struct.pack_into(
            e + "I" * n_strips,
            overflow,
            offsets_pos - after_ifd,
            *strip_offsets,
        )
        entries.append((273, 4, n_strips, offsets_ref[1]))
        entries.append((279, 4, n_strips, counts_ref[1]))
    entries.sort(key=lambda t: t[0])

    out = bytearray()
    out += (_MM if big_endian else _II)[:4]
    out += struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", n_tags)
    for tag, typ, cnt, val in entries:
        out += entry(tag, typ, cnt, val)
    out += struct.pack(e + "I", 0)  # no next IFD
    out += overflow
    for s in strips:
        out += s
        if len(s) & 1:
            out += b"\x00"
    return bytes(out)
