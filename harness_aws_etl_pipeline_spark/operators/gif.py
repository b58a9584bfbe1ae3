"""Pure numpy + stdlib GIF87a/89a codec (decode + test encoder).

Joins the PPM/BMP/PNG/baseline-JPEG/WAV family in
:mod:`operators.multimodal`: no codec library exists in this
container, so the decode step is implemented against the published
specification (GIF89a, CompuServe 1990: logical screen descriptor,
color tables, LZW-compressed image data in 255-byte sub-blocks,
graphic-control extensions, 4-pass interlace). GIF matters beyond
"one more still format": an animated GIF is a real multi-frame
container, which makes the video-path frame sampling
(multimodal.sample_frames) exercise genuine frame boundaries,
disposal composition, and palette application — the same contract a
future MP4/ffmpeg decoder plugs into.

Decoder scope: GIF87a + GIF89a, global/local color tables, interlace,
transparency, disposal methods 0/1/2 (unspecified / leave / restore
background) — enough for real-world animated GIFs; disposal 3
(restore previous) falls back to leave-in-place. The LZW decode is
table-driven Python over the sub-block byte stream — model-sized
work per frame; the pixel composition is numpy.

The encoder exists so tests can round-trip arbitrary frames: it
writes a 256-entry global table and literal LZW codes (the classic
"emit CLEAR before the code width would grow" technique), optionally
interlaced — spec-valid output, no compression ambition.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "split_gif_frames", "encode_gif"]

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF-variant LZW: variable code width starting at
    min_code_size+1, LSB-first bit packing, CLEAR/EOI codes, table
    growth capped at 12 bits (deferred-clear tolerated)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code = eoi + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < expected:
        byte_i = bitpos >> 3
        code = (
            int.from_bytes(data[byte_i : byte_i + 3], "little") >> (bitpos & 7)
        ) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = dict(base)
            next_code = eoi + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise ValueError(f"LZW: first code {code} not in table")
        elif code in table:
            entry = table[code]
            if next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
        elif code == next_code:  # the KwKwK case
            entry = prev + prev[:1]
            table[next_code] = entry
            next_code += 1
        else:
            raise ValueError(f"LZW: code {code} beyond table ({next_code})")
        out += entry
        prev = entry
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out)


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(payload):
            raise ValueError("GIF: truncated sub-block stream")
        n = payload[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(payload[pos : pos + n])
        pos += n


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    order = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
    out = np.empty_like(idx)
    out[np.array(order, dtype=np.int64)] = idx
    return out


def split_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Decode every frame of a (possibly animated) GIF, composed onto
    the logical screen per the disposal rules → list of (h, w, 3)
    uint8 RGB arrays."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError(f"not a GIF (magic {payload[:6]!r})")
    width, height, flags, bg_index = struct.unpack_from("<HHBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    # background: spec says bg color index (only meaningful with a
    # GCT); real decoders show transparent/black — use black, the
    # common rendering
    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                packed, _delay, tindex = struct.unpack_from("<BHB", data, 0)
                disposal = (packed >> 2) & 0x07
                transparent = tindex if packed & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        left, top, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF: frame has neither local nor global color table")
        min_code = payload[pos]
        pos += 1
        lzw, pos = _read_subblocks(payload, pos)
        idx_flat = _lzw_decode(lzw, min_code, w * h)
        if len(idx_flat) < w * h:
            raise ValueError(
                f"GIF: LZW stream produced {len(idx_flat)} of {w * h} pixels"
            )
        idx = np.frombuffer(idx_flat, np.uint8, w * h).reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max()) >= len(table):
            raise ValueError("GIF: pixel index beyond color table")

        region = canvas[top : top + h, left : left + w]
        rgb = table[idx]
        if transparent is not None:
            opaque = idx != transparent
            region = np.where(opaque[:, :, None], rgb, region)
        else:
            region = rgb
        if disposal == 2:  # restore-to-background AFTER presenting
            presented = canvas.copy()
            presented[top : top + h, left : left + w] = region
            frames.append(presented)
            canvas[top : top + h, left : left + w] = 0
        else:  # 0/1 leave in place; 3 approximated as leave
            canvas[top : top + h, left : left + w] = region
            frames.append(canvas.copy())
        # a Graphic Control Extension scopes to ONLY the first
        # rendering block after it (GIF89a §23) — a GCE-less later
        # frame must not inherit stale transparency/disposal
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF: no image data blocks")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First composed frame as (h, w, 3) uint8 RGB — the still-image
    view of the container (what `decode_image` dispatches to)."""
    return split_gif_frames(payload)[0]


def _lzw_encode_literal(indices: bytes, min_code_size: int = 8) -> bytes:
    """Spec-valid LZW stream that emits every pixel as a literal code,
    inserting CLEAR whenever the decoder's table would next force the
    code width past min_code_size+1 — no compression, no table state."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    # decoder's next_code starts at eoi+1 and grows by 1 per emitted
    # code after the first; keep it strictly below 2^code_size
    budget = (1 << code_size) - (eoi + 1) - 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    since_clear = 0
    for b in indices:
        if since_clear >= budget:
            emit(clear)
            since_clear = 0
        emit(b)
        since_clear += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    frames: "list[np.ndarray] | np.ndarray",
    interlace: bool = False,
    transparent: int | None = None,
    disposal: int = 1,
) -> bytes:
    """Frames → animated GIF89a. Each frame carries a local color
    table built from its own distinct colors; raises if a frame has
    more than 256 of them (this is a round-trip test encoder, not a
    quantizer)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = arrs[0].shape[:2]
    for a in arrs:
        if a.shape != (h, w, 3):
            raise ValueError("all frames must be (h, w, 3) uint8 of equal size")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBB", w, h, 0x00, 0)  # no global table
    out.append(0)  # aspect
    for a in arrs:
        flat = a.reshape(-1, 3)
        colors, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError(f"frame has {len(colors)} colors (>256)")
        table = np.zeros((256, 3), dtype=np.uint8)
        table[: len(colors)] = colors
        idx = inverse.astype(np.uint8).reshape(h, w)
        # graphic control (for animation delay/transparency semantics)
        packed = ((disposal & 0x07) << 2) | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04"
        out += struct.pack(
            "<BHB", packed, 2, 0 if transparent is None else transparent
        )
        out.append(0)
        iflags = 0x80 | 0x07  # local table, 256 entries
        if interlace:
            iflags |= 0x40
            order = [
                r for start, step in _INTERLACE_PASSES for r in range(start, h, step)
            ]
            idx = idx[np.array(order, dtype=np.int64)]
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        out += table.tobytes()
        out.append(8)  # min LZW code size
        stream = _lzw_encode_literal(idx.tobytes(), 8)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
