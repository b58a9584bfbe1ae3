"""[EXT] Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct (modality, byte size, content hash). The Spark-side
plumbing — schema, Arrow batch shape, mapInPandas partition flow — is
real and tested.

Image decode is REAL for four formats — binary PPM (P6), uncompressed
24-bit BMP, 8-bit PNG incl. Adam7 (gray/RGB/RGBA; stdlib zlib IDAT
inflate + numpy scanline unfilter, all five filters), and baseline
JPEG (operators/jpeg.py: huffman entropy decode, dequantize, IDCT,
4:2:0/4:2:2/4:4:4 sampling, YCbCr→RGB) — via
``decode_image``/``encode_ppm``/``encode_bmp``/``encode_png``/
``encode_jpeg``, reachable from ``extract_features(decode=True)`` and
``resize_media(decode=True)`` (nearest-neighbor resample on the
decoded array). Audio decode is REAL for WAV/RIFF across PCM
8/16/24/32-bit, IEEE float32/64, G.711 A-law/µ-law (exact CCITT
expansions), and WAVE_FORMAT_EXTENSIBLE
(``decode_wav``/``audio_features`` — proper chunk walk, stdlib struct
+ numpy). JPEG covers BOTH baseline (SOF0/1) and progressive (SOF2)
frames (operators/jpeg.py); video frame-sampling is REAL for MJPG
AVIs (operators/video.py — RIFF walk + per-frame JPEG decode).
Formats that need codec libraries not present here (mp3/aac,
inter-frame video codecs) remain STUBBED behind
``decode_stub``: deterministic fake features by default,
``NotImplementedError`` when ``strict=True``.

Scale notes: media payloads are large and must never be shuffle keys —
all grouping/joining happens on ``content_hash`` or ids. Feature
extraction is ``mapInPandas`` (Arrow-batched, one Python worker per
partition); batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
large blobs doesn't OOM the Python worker.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("byte_size", LongType(), True),
        StructField("content_hash", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("byte_size", LongType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, source_col: str, id_col: str, modality: str = "blob"
) -> DataFrame:
    """Wrap a column as an opaque media payload with typed metadata.

    (Test data has no real media files, so payloads are derived from an
    existing column via utf-8 encode — the schema and partition flow
    are identical to real media ingested with
    ``spark.read.format("binaryFile")``.)
    """
    payload = F.encode(F.col(source_col).cast("string"), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("byte_size"),
        F.md5(payload).alias("content_hash"),
    )


def decode_stub(payload: bytes, modality: str, strict: bool = False) -> list[float]:
    """STUB for the real media decode (PIL/librosa/ffmpeg are not
    available in this container). Deterministic fake feature: 8-bin
    byte histogram, normalized. ``strict=True`` raises, marking exactly
    where a real decoder plugs in."""
    if strict:
        raise NotImplementedError(
            f"real {modality} decode requires media libraries not present here"
        )
    if payload is None:
        return [0.0] * 8
    counts = [0] * 8
    for byte in payload:
        counts[byte >> 5] += 1
    total = float(len(payload)) or 1.0
    return [c / total for c in counts]


# ------------------------------------------------- real image codecs
#
# Pure-numpy (+ stdlib) codecs: binary PPM (P6), uncompressed 24-bit
# BMP, 8-bit PNG — sequential AND Adam7 (zlib) — and JPEG — baseline AND
# progressive (operators/jpeg.py). These make the decode step of the
# multimodal path REAL — the mapInPandas plumbing feeds actual pixel
# arrays, not fakes. Motion-JPEG AVI frame sampling rides the same
# JPEG path (operators/video.py); FLAC decode is real too
# (operators/flac.py via decode_audio); mp3/aac and inter-frame
# video codecs stay stubbed (their codecs aren't in this container).


def encode_ppm(arr: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM (P6) bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got shape {a.shape}")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_bmp(arr: "np.ndarray") -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP (BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding, BGR byte order)."""
    import struct

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got shape {a.shape}")
    h, w = a.shape[:2]
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    # bottom-up scanlines, RGB → BGR, each row padded
    body = b"".join(
        a[y, :, ::-1].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1)
    )
    pixel_offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pixel_offset + len(body), 0, 0, pixel_offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + dib + body


def _parse_ppm_header(payload: bytes, start: int) -> tuple[int, int, int]:
    """Parse a P6 header at ``start``: magic + 3 ints (w, h, maxval)
    with '#' comments allowed, one whitespace byte, then the raster.
    Returns (w, h, raster_offset)."""
    if payload[start : start + 2] != b"P6":
        raise ValueError(f"not a P6 PPM at offset {start}")
    pos, fields = start + 2, []
    while len(fields) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        ch = payload[pos : pos + 1]
        if ch == b"#":
            pos = payload.index(b"\n", pos) + 1
        elif ch.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            fields.append(int(payload[pos:end]))
            pos = end
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    return w, h, pos + 1  # single whitespace separates header from raster


def split_ppm_frames(payload: bytes) -> list[bytes]:
    """Split a concatenated-P6 stream (the no-codec stand-in for a
    video container: frames back-to-back) into per-frame byte strings.
    Each frame's extent comes from its own header — REAL container
    parsing, not byte-stride guessing."""
    frames: list[bytes] = []
    pos = 0
    while pos < len(payload):
        w, h, raster = _parse_ppm_header(payload, pos)
        end = raster + w * h * 3
        if end > len(payload):
            raise ValueError(f"truncated frame {len(frames)} at offset {pos}")
        frames.append(payload[pos:end])
        pos = end
    return frames


def encode_ppm_sequence(arrays: "list[np.ndarray]") -> bytes:
    """Concatenate frames into the P6-sequence container."""
    return b"".join(encode_ppm(a) for a in arrays)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# Adam7 pass geometry: (x_start, y_start, x_step, y_step) — spec
# order; a pass is absent when its sub-grid is empty for the image size
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _filter_rows(
    rows: "np.ndarray", bpp: int, filter_type: int | str
) -> list[bytes]:
    """Apply PNG scanline filters to a (n, stride) uint8 block (one
    image, or one Adam7 pass — the filter chain restarts per pass by
    spec). Returns per-row ``filter_byte + encoded`` strings."""
    lines = []
    stride = rows.shape[1] if rows.size else 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(rows.shape[0]):
        row = rows[y]
        ft = (y % 5) if filter_type == "mixed" else int(filter_type)
        left = np.concatenate([np.zeros(bpp, dtype=np.uint8), row[:-bpp]])
        up_left = np.concatenate([np.zeros(bpp, dtype=np.uint8), prev[:-bpp]])
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = row - left
        elif ft == 2:
            enc = row - prev
        elif ft == 3:
            enc = row - ((left.astype(np.uint16) + prev) // 2).astype(np.uint8)
        elif ft == 4:
            enc = row - _paeth(left, prev, up_left)
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = row
    return lines


def encode_png(
    arr: "np.ndarray",
    filter_type: int | str = 0,
    interlace: bool = False,
) -> bytes:
    """(h, w, 3) uint8 RGB → PNG bytes, stdlib ``zlib`` only.

    ``filter_type``: 0–4 applies that PNG scanline filter to every row;
    ``"mixed"`` cycles 0..4 by row — useful to exercise every unfilter
    path in :func:`decode_image` round-trip tests.

    ``interlace=True`` writes Adam7: the seven spec passes, each its
    own filtered scanline group (the filter chain restarts per pass),
    concatenated into one IDAT stream — round-trip bit-identity with
    the sequential encode is the decoder's pin."""
    import struct
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got shape {a.shape}")
    h, w = a.shape[:2]
    bpp = 3

    lines: list[bytes] = []
    if interlace:
        for x0, y0, xs, ys in _ADAM7:
            sub = a[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            lines.extend(
                _filter_rows(
                    sub.reshape(sub.shape[0], -1), bpp, filter_type
                )
            )
    else:
        lines = _filter_rows(a.reshape(h, -1), bpp, filter_type)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(
        ">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0
    )  # 8-bit RGB
    idat = zlib.compress(b"".join(lines))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _paeth(left: "np.ndarray", up: "np.ndarray", up_left: "np.ndarray") -> "np.ndarray":
    """Vectorized Paeth predictor (PNG filter 4)."""
    a = left.astype(np.int16)
    b = up.astype(np.int16)
    c = up_left.astype(np.int16)
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    # spec tie-break order: a if pa<=pb and pa<=pc, else b if pb<=pc,
    # else c
    out = np.where(pb <= pc, b, c)
    out = np.where((pa <= pb) & (pa <= pc), a, out)
    return out.astype(np.uint8)


_PNG_DEPTHS = {0: {1, 2, 4, 8, 16}, 2: {8, 16}, 3: {1, 2, 4, 8}, 6: {8, 16}}


def _decode_png(payload: bytes) -> "np.ndarray":
    """Pure numpy + stdlib-zlib PNG decode: IDAT inflate + per-scanline
    unfilter, sequential or Adam7-interlaced. Covers the color types
    and depths real corpora use — gray (1/2/4/8/16-bit), RGB (8/16),
    palette (PLTE, 1/2/4/8), RGBA (8/16; alpha dropped) — and all five
    scanline filters. 16-bit samples downscale to their high byte (the
    spec's 8-bit reduction); sub-byte depths unpack MSB-first. Returns
    (h, w, 3) uint8 RGB."""
    import struct
    import zlib

    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype_v, _comp, _filt, interlace = ihdr
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    if ctype_v not in _PNG_DEPTHS:
        raise ValueError(f"unsupported PNG color type {ctype_v}")
    if depth not in _PNG_DEPTHS[ctype_v]:
        raise ValueError(
            f"unsupported PNG depth {depth} for color type {ctype_v}"
        )
    if ctype_v == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")

    channels_raw = {0: 1, 2: 3, 3: 1, 6: 4}[ctype_v]
    bits_pp = depth * channels_raw
    bpp = max(1, bits_pp // 8)  # filter step, byte-rounded per spec

    def _stride(pw: int) -> int:
        return (pw * bits_pp + 7) // 8

    def _to_rgb(block: "np.ndarray", pw: int) -> "np.ndarray":
        """(n, stride) reconstructed bytes → (n, pw, 3) uint8 RGB."""
        n = block.shape[0]
        if depth == 16:
            # big-endian sample pairs; keep the high byte
            px = block.reshape(n, pw * channels_raw, 2)[:, :, 0].reshape(
                n, pw, channels_raw
            )
        elif depth == 8:
            px = block.reshape(n, pw, channels_raw)
        else:
            bits = np.unpackbits(block, axis=1)[:, : pw * depth]
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
            px = (
                (bits.reshape(n, pw, depth) * weights)
                .sum(axis=2)
                .astype(np.uint8)[..., None]
            )
        if ctype_v == 3:
            if int(px.max(initial=0)) >= len(plte):
                raise ValueError("PNG palette index out of range")
            return plte[px[..., 0]]
        if channels_raw == 1:
            if depth < 8:
                px = (
                    px.astype(np.uint16) * 255 // ((1 << depth) - 1)
                ).astype(np.uint8)
            return np.repeat(px, 3, axis=2)
        return np.ascontiguousarray(px[:, :, :3])

    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)

    if interlace == 0:
        stride = _stride(w)
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel data length mismatch")
        return _to_rgb(_unfilter_rows(raw.reshape(h, stride + 1), bpp), w)

    # Adam7: seven independent filtered scanline groups, unfiltered
    # per pass and scattered onto the pixel grid
    img = np.zeros((h, w, 3), dtype=np.uint8)
    pos = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw == 0 or ph == 0:
            continue
        stride = _stride(pw)
        need = ph * (stride + 1)
        if pos + need > len(raw):
            raise ValueError("PNG interlaced pixel data truncated")
        block = raw[pos : pos + need].reshape(ph, stride + 1)
        pos += need
        img[y0::ys, x0::xs] = _to_rgb(_unfilter_rows(block, bpp), pw)
    if pos != len(raw):
        raise ValueError("PNG interlaced pixel data length mismatch")
    return img


def _unfilter_rows(raw: "np.ndarray", bpp: int) -> "np.ndarray":
    """Reverse PNG scanline filters over one filtered block — a whole
    sequential image or a single Adam7 pass (the filter chain is
    per-block by spec). ``raw`` is (n, stride+1) with the leading
    filter byte; returns (n, stride) reconstructed bytes."""
    n, stride1 = raw.shape
    stride = stride1 - 1
    out = np.zeros((n, stride), dtype=np.uint8)
    zero = np.zeros(bpp, dtype=np.uint8)
    for y in range(n):
        ft = int(raw[y, 0])
        line = raw[y, 1:].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ft == 0:
            out[y] = line
        elif ft == 1:
            # recon[x] = raw[x] + recon[x-bpp]: cumulative sum down the
            # row in pixel steps (uint8 wraparound via int32 cumsum)
            cols = line.reshape(-1, bpp).astype(np.int32)
            out[y] = (np.cumsum(cols, axis=0) % 256).astype(np.uint8).reshape(-1)
        elif ft == 2:
            out[y] = line + prev
        elif ft == 3:
            # average depends on the just-reconstructed left pixel →
            # sequential in pixel steps, vectorized across channels
            row = out[y]
            row[:] = line
            left = zero
            for x in range(0, stride, bpp):
                px = row[x : x + bpp] + (
                    (left.astype(np.uint16) + prev[x : x + bpp]) // 2
                ).astype(np.uint8)
                row[x : x + bpp] = px
                left = px
        elif ft == 4:
            row = out[y]
            row[:] = line
            left = zero
            up_left = zero
            for x in range(0, stride, bpp):
                up = prev[x : x + bpp]
                px = row[x : x + bpp] + _paeth(left, up, up_left)
                row[x : x + bpp] = px
                left, up_left = px, up
        else:
            raise ValueError(f"unknown PNG filter {ft} on row {y}")
    return out


def decode_image(payload: bytes) -> "np.ndarray":
    """REAL image decode (pure numpy + stdlib): binary PPM (P6),
    uncompressed 24-bit BMP, 8-bit PNG incl. Adam7 (gray/RGB/RGBA),
    JPEG (baseline SOF0/1 + progressive SOF2, any 1-2 sampling
    factors), GIF87a/89a (LZW; first composed frame), or baseline
    TIFF (operators/tiff.py: II/MM, strips, None/LZW/PackBits,
    predictor, gray/RGB/palette/bilevel) → (h, w, 3) uint8 RGB array.
    Raises ``ValueError`` on anything else — decode callers asserted
    their payloads are images."""
    import struct

    if payload is None:
        raise ValueError("cannot decode a null payload")
    if bytes(payload[: len(_PNG_SIG)]) == _PNG_SIG:
        return _decode_png(bytes(payload))
    if bytes(payload[:2]) == b"\xff\xd8":
        from harness_aws_etl_pipeline_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(bytes(payload))
    if bytes(payload[:4]) == b"GIF8":
        from harness_aws_etl_pipeline_spark.operators.gif import decode_gif

        return decode_gif(bytes(payload))
    if bytes(payload[:4]) in (b"II\x2a\x00", b"MM\x00\x2a"):
        from harness_aws_etl_pipeline_spark.operators.tiff import decode_tiff

        return decode_tiff(bytes(payload))
    if payload[:2] == b"P6":
        w, h, raster = _parse_ppm_header(payload, 0)
        data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=raster)
        return data.reshape(h, w, 3).copy()
    if payload[:2] == b"BM":
        pixel_offset = struct.unpack_from("<I", payload, 10)[0]
        dib_size = struct.unpack_from("<I", payload, 14)[0]
        if dib_size < 40:
            raise ValueError("BMP core-header variant not supported")
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0:
            raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
        bottom_up = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=h * stride, offset=pixel_offset
        ).reshape(h, stride)
        img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
        return (img[::-1] if bottom_up else img).copy()
    raise ValueError(f"unrecognized image format (magic {payload[:2]!r})")


def image_features(payload: bytes) -> list[float]:
    """Decoded-image feature vector:
    ``[width, height, channels, mean_r, mean_g, mean_b]``."""
    arr = decode_image(payload)
    h, w, c = arr.shape
    means = arr.reshape(-1, c).mean(axis=0, dtype=np.float64)
    return [float(w), float(h), float(c), *(float(m) for m in means)]


def extract_features(
    df: DataFrame, strict: bool = False, decode: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over media rows (mapInPandas).

    One Python worker pass per partition. With ``decode=True`` each
    payload is REALLY decoded (PPM/BMP via :func:`decode_image`) and
    the feature is ``[w, h, channels, mean_r, mean_g, mean_b]``;
    otherwise the byte-histogram ``decode_stub`` runs. The output
    drops the payload column — features flow on, blobs don't.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode:
                features = [image_features(p) for p in pdf["payload"]]
            else:
                features = [
                    decode_stub(p, m, strict)
                    for p, m in zip(pdf["payload"], pdf["modality"])
                ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "byte_size": pdf["byte_size"],
                    "feature": features,
                }
            )
            yield out

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


def synthesize_ppm_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL image per row (for pipelines/tests without
    media files): a P6 PPM whose dimensions and solid color derive
    from the id — ``w = 1 + id % 16``, ``h = 1 + id % 8``, every pixel
    ``(id % 256, id*7 % 256, id*13 % 256)``. Decoded properties are
    therefore closed-form in the id, which is what makes the decode
    path oracle-checkable end-to-end."""
    from hashlib import md5

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 1 + mid % 16, 1 + mid % 8
                arr = np.empty((h, w, 3), dtype=np.uint8)
                arr[..., 0] = mid % 256
                arr[..., 1] = mid * 7 % 256
                arr[..., 2] = mid * 13 % 256
                payloads.append(encode_ppm(arr))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "image/ppm",
                    "payload": payloads,
                    "byte_size": [len(p) for p in payloads],
                    "content_hash": [md5(p).hexdigest() for p in payloads],
                }
            )

    return ids.mapInPandas(_gen, MEDIA_SCHEMA)


# ------------------------------------------------- real audio codec
#
# WAV/RIFF is a length-prefixed chunk container with raw PCM samples —
# no compression codec needed, so the audio modality can be REAL with
# stdlib struct + numpy alone. Compressed audio (mp3/aac/flac) stays
# behind decode_stub.


def encode_wav(
    samples: "np.ndarray", sample_rate: int = 16_000
) -> bytes:
    """(n,) or (n, channels) int16 PCM → WAV (RIFF) bytes."""
    import struct

    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, channels = a.shape
    data = a.reshape(-1).tobytes()  # interleaved frames
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# IMA/DVI ADPCM (WAV format tag 0x0011) — the canonical step/index
# tables (IMA ADPCM reference, reproduced in RFCs and every codec)
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
], dtype=np.int32)
_IMA_INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)


def _ima_decode_channel(
    nibbles: "np.ndarray", predictor: int, index: int
) -> "np.ndarray":
    """One channel's nibble stream → int16 samples (the per-sample
    recurrence is inherent to ADPCM; blocks are small and independent,
    so parallelism lives at the block level)."""
    out = np.empty(len(nibbles), dtype=np.int16)
    pred = int(predictor)
    idx = int(index)
    for i, n in enumerate(nibbles):
        n = int(n)
        step = int(_IMA_STEPS[idx])
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        if n & 8:
            diff = -diff
        pred = max(-32768, min(32767, pred + diff))
        idx = max(0, min(88, idx + int(_IMA_INDEX[n & 7])))
        out[i] = pred
    return out


def _decode_ima_adpcm(
    data: bytes, channels: int, block_align: int, samples_per_block: int
) -> "np.ndarray":
    """WAV IMA ADPCM data chunk → (n, channels) int16. Per block and
    channel: a 4-byte header (predictor int16, step index, reserved)
    — the predictor IS the first output sample — then nibble data in
    4-byte per-channel interleaved groups, low nibble first."""
    import struct

    frames: list = []
    for off in range(0, len(data) - block_align + 1, block_align):
        block = data[off : off + block_align]
        preds = []
        idxs = []
        for c in range(channels):
            p, i, _r = struct.unpack_from("<hBB", block, c * 4)
            if i > 88:
                raise ValueError(f"IMA ADPCM step index {i} out of range")
            preds.append(p)
            idxs.append(i)
        body = np.frombuffer(block, dtype=np.uint8, count=len(block))[
            4 * channels :
        ]
        nib = np.empty(len(body) * 2, dtype=np.uint8)
        nib[0::2] = body & 0x0F  # low nibble first
        nib[1::2] = body >> 4
        # per-channel nibble streams: 8-nibble (4-byte) groups rotate
        # through the channels
        chans = []
        for c in range(channels):
            groups = nib.reshape(-1, 8)[c::channels]
            stream = groups.reshape(-1)[: samples_per_block - 1]
            chans.append(
                np.concatenate(
                    (
                        np.array([preds[c]], dtype=np.int16),
                        _ima_decode_channel(stream, preds[c], idxs[c]),
                    )
                )
            )
        frames.append(np.stack(chans, axis=1))
    if not frames:
        return np.zeros((0, channels), dtype=np.int16)
    return np.concatenate(frames, axis=0)


def encode_wav_ima_adpcm(
    samples: "np.ndarray",
    sample_rate: int = 16_000,
    samples_per_block: int = 505,
) -> bytes:
    """(n,) or (n, channels) int16 → IMA ADPCM WAV (format 0x0011),
    the standard block layout real encoders emit. The companion of
    :func:`decode_wav`'s format-17 branch; round-trip tests pin the
    nibble/group conventions against each other AND against the
    spec's hand-computable first samples."""
    import struct

    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    if (samples_per_block - 1) % 8 != 0:
        raise ValueError("samples_per_block must be 1 + a multiple of 8")
    n, channels = a.shape
    if n == 0:
        a = np.zeros((1, channels), dtype=np.int16)
        n = 1
    pad = (-len(a)) % samples_per_block
    if pad:
        a = np.vstack([a, np.repeat(a[-1:], pad, axis=0)])
    block_align = 4 * channels + (samples_per_block - 1) // 2 * channels
    blocks = []
    idx = [0] * channels
    for b0 in range(0, len(a), samples_per_block):
        chunk = a[b0 : b0 + samples_per_block]
        # header sample = first frame; encode the rest
        hdr = b""
        streams = []
        for c in range(channels):
            pred = int(chunk[0, c])
            hdr += struct.pack("<hBB", pred, idx[c], 0)
            nibs = []
            for s in chunk[1:samples_per_block, c]:
                step = int(_IMA_STEPS[idx[c]])
                delta = int(s) - pred
                code = 0
                if delta < 0:
                    code = 8
                    delta = -delta
                if delta >= step:
                    code |= 4
                    delta -= step
                if delta >= step >> 1:
                    code |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    code |= 1
                # reconstruct like the decoder to track the predictor
                diff = step >> 3
                if code & 1:
                    diff += step >> 2
                if code & 2:
                    diff += step >> 1
                if code & 4:
                    diff += step
                if code & 8:
                    diff = -diff
                pred = max(-32768, min(32767, pred + diff))
                idx[c] = max(0, min(88, idx[c] + int(_IMA_INDEX[code & 7])))
                nibs.append(code)
            while len(nibs) < samples_per_block - 1:
                nibs.append(0)
            streams.append(np.array(nibs, dtype=np.uint8).reshape(-1, 8))
        inter = np.empty(
            (streams[0].shape[0] * channels, 8), dtype=np.uint8
        )
        for c in range(channels):
            inter[c::channels] = streams[c]
        flat = inter.reshape(-1)
        packed = (flat[0::2] | (flat[1::2] << 4)).astype(np.uint8)
        blocks.append(hdr + packed.tobytes())
    data = b"".join(blocks)
    byte_rate = (sample_rate * block_align) // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH",
        0x11, channels, sample_rate, byte_rate, block_align, 4,
        2, samples_per_block,
    )
    fact = struct.pack("<I", n)
    return (
        b"RIFF"
        + struct.pack(
            "<I", 4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(data)
        )
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<I", len(fact))
        + fact
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _mulaw_expand(codes: "np.ndarray") -> "np.ndarray":
    """G.711 µ-law byte → int16, the closed-form spec expansion:
    complement, split sign/exponent/mantissa, rebuild the biased
    magnitude ``((2·mantissa + 33) << exponent) − 33`` scaled to the
    14-bit range (×4 into int16 like every reference decoder)."""
    u = (~codes.astype(np.uint8)) & 0xFF
    sign = u >> 7
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((2 * mant.astype(np.int32) + 33) << exp) - 33) * 4
    return np.where(sign == 1, -mag, mag).astype(np.int16)


def _alaw_expand(codes: "np.ndarray") -> "np.ndarray":
    """G.711 A-law byte → int16: XOR 0x55, then the spec's two-branch
    magnitude (segment 0 linear, higher segments exponential) at the
    reference decoder's 16-bit placement (max ±32256); a SET sign bit
    after the XOR means positive, per the CCITT reference."""
    a = (codes.astype(np.uint8) ^ 0x55).astype(np.int32)
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(
        exp == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(exp - 1, 0),
    )
    return np.where(sign != 0, mag, -mag).astype(np.int16)


def decode_wav(payload: bytes) -> "tuple[np.ndarray, int]":
    """REAL audio decode: WAV (RIFF) → ((n, channels) int16 array,
    sample_rate). Walks the chunk list properly (extra chunks like
    LIST/fact are skipped), so files from real recorders parse, not
    just our own encoder's output.

    Formats: PCM (format 1) at 8-bit unsigned / 16-bit / 24-bit /
    32-bit signed, IEEE float32/64 (format 3, clipped to [-1, 1)),
    G.711 A-law (6) and µ-law (7) via the exact closed-form spec
    expansions, and WAVE_FORMAT_EXTENSIBLE (0xFFFE, resolved through
    the SubFormat GUID). Everything lands in int16 (high bytes for
    the wider PCM widths — the standard reduction)."""
    import struct

    if payload is None or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    fmt_body = b""
    data = None
    fact_frames = None
    while pos + 8 <= len(payload):
        ctype, length = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if ctype == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            fmt_body = body
        elif ctype == b"data":
            data = body
        elif ctype == b"fact" and length >= 4:
            # true sample count per channel — compressed formats pad
            # their final block; real decoders trim to this
            fact_frames = struct.unpack_from("<I", body, 0)[0]
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _rate, _align, bits = fmt
    if channels < 1:
        raise ValueError("WAV with zero channels")
    if audio_format == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real format is the first two
        # bytes of the 16-byte SubFormat GUID at offset 24
        if len(fmt_body) < 26:
            raise ValueError("EXTENSIBLE WAV fmt chunk truncated")
        audio_format = struct.unpack_from("<H", fmt_body, 24)[0]

    if audio_format == 1:
        if bits == 16:
            width, dt = 2, "<i2"
        elif bits == 8:
            width, dt = 1, "u1"
        elif bits == 24:
            width, dt = 3, None
        elif bits == 32:
            width, dt = 4, "<i4"
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
        n = (len(data) // (width * channels)) * channels
        if bits == 16:
            frames = np.frombuffer(data, dtype=dt, count=n)
        elif bits == 8:
            # unsigned with 0x80 midpoint → int16 high-byte placement
            u = np.frombuffer(data, dtype=dt, count=n).astype(np.int16)
            frames = (u - 128) << 8
        elif bits == 24:
            raw = np.frombuffer(data, dtype=np.uint8, count=n * 3).reshape(
                -1, 3
            )
            # little-endian 24-bit → keep the top 16 bits
            frames = (
                raw[:, 1].astype(np.uint16)
                | (raw[:, 2].astype(np.uint16) << 8)
            ).astype(np.int16)
        else:  # 32
            frames = (
                np.frombuffer(data, dtype=dt, count=n) >> 16
            ).astype(np.int16)
    elif audio_format == 3:
        if bits == 32:
            f = np.frombuffer(
                data, dtype="<f4", count=(len(data) // (4 * channels)) * channels
            )
        elif bits == 64:
            f = np.frombuffer(
                data, dtype="<f8", count=(len(data) // (8 * channels)) * channels
            )
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
        frames = np.clip(
            np.round(f.astype(np.float64) * 32768.0), -32768, 32767
        ).astype(np.int16)
    elif audio_format in (6, 7):
        if bits != 8:
            raise ValueError(f"G.711 WAV must be 8-bit, got {bits}")
        n = (len(data) // channels) * channels
        codes = np.frombuffer(data, dtype=np.uint8, count=n)
        frames = (
            _alaw_expand(codes) if audio_format == 6 else _mulaw_expand(codes)
        )
    elif audio_format in (0x11, 0x0011):  # IMA/DVI ADPCM (round 11)
        if bits != 4:
            raise ValueError(f"IMA ADPCM WAV must be 4-bit, got {bits}")
        if len(fmt_body) >= 20:
            import struct as _struct

            samples_per_block = _struct.unpack_from("<H", fmt_body, 18)[0]
        else:
            samples_per_block = ((_align - 4 * channels) * 2) // channels + 1
        out = _decode_ima_adpcm(data, channels, _align, samples_per_block)
        if fact_frames is not None:
            out = out[:fact_frames]
        return out, sample_rate
    else:
        raise ValueError(f"unsupported WAV format code {audio_format}")
    return frames.reshape(-1, channels).copy(), sample_rate


def decode_audio(payload: bytes) -> "tuple[np.ndarray, int]":
    """Audio decode dispatch: WAV (RIFF) or FLAC (round 10 —
    compressed audio is no longer fully stubbed; the integer-only
    FLAC codec lives in ``operators/flac.py``, spec-complete decode
    incl. LPC/rice/mid-side with CRC + STREAMINFO-MD5 verification).
    Output is the WAV convention: ((n, channels) int16, rate) — wider
    FLAC depths reduce to the high 16 bits, narrower shift up.
    mp3/aac remain out of reach in this container (float DSP stacks)."""
    if payload is not None and payload[:4] == b"fLaC":
        from harness_aws_etl_pipeline_spark.operators.flac import (
            decode_flac,
        )

        arr, rate, bps = decode_flac(payload)
        if bps > 16:
            arr = arr >> (bps - 16)
        elif bps < 16:
            arr = arr << (16 - bps)
        return arr.astype(np.int16), rate
    return decode_wav(payload)


def audio_features(payload: bytes) -> list[float]:
    """Decoded-audio feature vector:
    ``[sample_rate, channels, n_frames, duration_s, mean, rms]`` —
    the audio analogue of :func:`image_features`. WAV or FLAC
    (:func:`decode_audio`)."""
    frames, rate = decode_audio(payload)
    n = frames.shape[0]
    x = frames.astype(np.float64)
    mean = float(x.mean()) if n else 0.0
    rms = float(np.sqrt((x * x).mean())) if n else 0.0
    return [
        float(rate),
        float(frames.shape[1]),
        float(n),
        n / rate if rate else 0.0,
        mean,
        rms,
    ]


def synthesize_wav_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL WAV per row: mono 16-bit PCM, ``n = 50 +
    id % 100`` frames of the constant amplitude ``(id * 17) % 2000 -
    1000`` at 8 kHz. Constant signals make decoded mean/RMS closed-form
    in the id (|amp| for RMS), so the decode path is oracle-checkable
    end-to-end like the PPM/PNG legs."""
    from hashlib import md5

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = 50 + mid % 100
                amp = (mid * 17) % 2000 - 1000
                payloads.append(
                    encode_wav(
                        np.full(n, amp, dtype=np.int16), sample_rate=8000
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "audio/wav",
                    "payload": payloads,
                    "byte_size": [len(p) for p in payloads],
                    "content_hash": [md5(p).hexdigest() for p in payloads],
                }
            )

    return ids.mapInPandas(_gen, MEDIA_SCHEMA)


def synthesize_flac_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL FLAC per row — the SAME signal definitions
    as :func:`synthesize_wav_media` (mono 16-bit, ``n = 50 + id %
    100`` frames of constant amplitude ``(id * 17) % 2000 - 1000``)
    compressed through ``operators/flac.py``, so the decoded sums are
    closed-form in the id AND container-invariant: the FLAC leg's
    oracle values equal the WAV leg's by construction."""
    from hashlib import md5

    from harness_aws_etl_pipeline_spark.operators.flac import encode_flac

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = 50 + mid % 100
                amp = (mid * 17) % 2000 - 1000
                payloads.append(
                    encode_flac(
                        np.full(n, amp, dtype=np.int64),
                        sample_rate=8000,
                        bits_per_sample=16,
                        blocksize=64,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "audio/flac",
                    "payload": payloads,
                    "byte_size": [len(p) for p in payloads],
                    "content_hash": [md5(p).hexdigest() for p in payloads],
                }
            )

    return ids.mapInPandas(_gen, MEDIA_SCHEMA)



def synthesize_adpcm_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL IMA-ADPCM WAV per row — the SAME signal
    definitions as :func:`synthesize_wav_media` (mono 16-bit,
    ``n = 50 + id %% 100`` frames of constant amplitude
    ``(id * 17) %% 2000 - 1000``) through the round-11 ADPCM encoder.
    Constant signals survive 4-bit ADPCM BIT-EXACTLY (delta 0 →
    nibble 0 → step stays at the table floor) and the ``fact`` chunk
    trims the final block's padding, so the decoded sums are
    closed-form AND equal to the WAV/FLAC legs' — three containers,
    one oracle."""
    from hashlib import md5

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = 50 + mid % 100
                amp = (mid * 17) % 2000 - 1000
                payloads.append(
                    encode_wav_ima_adpcm(
                        np.full(n, amp, dtype=np.int16),
                        sample_rate=8000,
                        samples_per_block=9,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "audio/wav",
                    "payload": payloads,
                    "byte_size": [len(p) for p in payloads],
                    "content_hash": [md5(p).hexdigest() for p in payloads],
                }
            )

    return ids.mapInPandas(_gen, MEDIA_SCHEMA)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio feature extraction (decode_wav per
    payload) — same shape as :func:`extract_features`."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "byte_size": pdf["byte_size"],
                    "feature": [audio_features(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


def synthesize_jpeg_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL baseline JPEG per row: ``w = 1 + id % 10``,
    ``h = 1 + id % 5``, solid GRAY level ``(id * 29) % 256`` at
    quality 100. Grayscale-valued RGB at q100 survives the DCT →
    quantize → huffman round-trip EXACTLY (chroma sits at 128, DC
    quantizer is 1), so decoded dims and channel means stay closed-form
    in the id — the property the oracle leg checks through the full
    entropy-decode + IDCT path."""
    from hashlib import md5

    from harness_aws_etl_pipeline_spark.operators.jpeg import encode_jpeg

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 1 + mid % 10, 1 + mid % 5
                arr = np.full((h, w, 3), mid * 29 % 256, dtype=np.uint8)
                payloads.append(encode_jpeg(arr, quality=100))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "image/jpeg",
                    "payload": payloads,
                    "byte_size": [len(p) for p in payloads],
                    "content_hash": [md5(p).hexdigest() for p in payloads],
                }
            )

    return ids.mapInPandas(_gen, MEDIA_SCHEMA)


def synthesize_progressive_jpeg_media(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL progressive (SOF2) JPEG per row — the same
    closed forms as :func:`synthesize_jpeg_media` (``w = 1 + id % 10``,
    ``h = 1 + id % 5``, solid gray ``(id * 29) % 256``, quality 100)
    but emitted through the 10-scan progressive script, so the oracle
    leg drives the successive-approximation decode path end-to-end:
    the scans transmit the exact quantized coefficients, hence the
    q100 exact-round-trip property carries over unchanged."""
    from hashlib import md5

    from harness_aws_etl_pipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 1 + mid % 10, 1 + mid % 5
                arr = np.full((h, w, 3), mid * 29 % 256, dtype=np.uint8)
                payloads.append(encode_jpeg_progressive(arr, quality=100))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "image/jpeg",
                    "payload": payloads,
                    "byte_size": [len(p) for p in payloads],
                    "content_hash": [md5(p).hexdigest() for p in payloads],
                }
            )

    return ids.mapInPandas(_gen, MEDIA_SCHEMA)


def synthesize_avi_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL MJPG AVI per row: ``1 + id % 3`` solid-gray
    frames of ``w = 1 + id % 10``, ``h = 1 + id % 5``, level
    ``(id * 29) % 256`` (the jpeg-leg closed forms) at quality 100 —
    every sampled frame decodes exactly, so per-frame counts, widths
    and means stay closed-form in the id through the full container
    walk + entropy decode (operators/video.py)."""
    from hashlib import md5

    from harness_aws_etl_pipeline_spark.operators.video import (
        encode_avi_mjpeg,
    )

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 1 + mid % 10, 1 + mid % 5
                arr = np.full((h, w, 3), mid * 29 % 256, dtype=np.uint8)
                payloads.append(
                    encode_avi_mjpeg([arr] * (1 + mid % 3), fps=10)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "video/x-msvideo",
                    "payload": payloads,
                    "byte_size": [len(p) for p in payloads],
                    "content_hash": [md5(p).hexdigest() for p in payloads],
                }
            )

    return ids.mapInPandas(_gen, MEDIA_SCHEMA)


def synthesize_png_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL PNG per row: ``w = 1 + id % 12``,
    ``h = 1 + id % 6``, every pixel ``(id*3 % 256, id*5 % 256,
    id*11 % 256)``, scanline filters cycling 0..4 by row so the decode
    leg exercises every unfilter path. Decoded properties are
    closed-form in the id → oracle-checkable end-to-end through
    inflate + unfilter."""
    from hashlib import md5

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 1 + mid % 12, 1 + mid % 6
                arr = np.empty((h, w, 3), dtype=np.uint8)
                arr[..., 0] = mid * 3 % 256
                arr[..., 1] = mid * 5 % 256
                arr[..., 2] = mid * 11 % 256
                payloads.append(encode_png(arr, filter_type="mixed"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "image/png",
                    "payload": payloads,
                    "byte_size": [len(p) for p in payloads],
                    "content_hash": [md5(p).hexdigest() for p in payloads],
                }
            )

    return ids.mapInPandas(_gen, MEDIA_SCHEMA)


def synthesize_tiff_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL TIFF per row: ``w = 1 + id % 9``,
    ``h = 1 + id % 4``, every pixel ``(id*19 % 256, id*23 % 256,
    id*31 % 256)``; compression cycles none/PackBits/LZW by
    ``id % 3``, the horizontal-differencing predictor toggles on odd
    ids and the byte order on ``id // 2`` — so one pass exercises
    every strip-decode path while the decoded properties stay
    closed-form in the id (operators/tiff.py)."""
    from hashlib import md5

    from harness_aws_etl_pipeline_spark.operators.tiff import encode_tiff

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        comps = ("none", "packbits", "lzw")
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 1 + mid % 9, 1 + mid % 4
                arr = np.empty((h, w, 3), dtype=np.uint8)
                arr[..., 0] = mid * 19 % 256
                arr[..., 1] = mid * 23 % 256
                arr[..., 2] = mid * 31 % 256
                payloads.append(
                    encode_tiff(
                        arr,
                        compression=comps[mid % 3],
                        predictor=bool(mid % 2),
                        big_endian=bool((mid // 2) % 2),
                        rows_per_strip=2,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "image/tiff",
                    "payload": payloads,
                    "byte_size": [len(p) for p in payloads],
                    "content_hash": [md5(p).hexdigest() for p in payloads],
                }
            )

    return ids.mapInPandas(_gen, MEDIA_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("byte_size", LongType(), True),
        StructField("content_hash", StringType(), True),
        StructField("target_w", LongType(), False),
        StructField("target_h", LongType(), False),
    ]
)


def resize_stub(payload: bytes, w: int, h: int, strict: bool = False) -> bytes:
    """STUB for image resize (no codec libs here). Deterministic fake:
    truncate/pad the byte stream to w*h bytes — preserves the real
    contract (binary → binary of target-determined size)."""
    if strict:
        raise NotImplementedError("real resize requires an image library")
    target = w * h
    if payload is None:
        return bytes(target)
    return payload[:target] + bytes(max(0, target - len(payload)))


def resize_image(
    payload: bytes, width: int, height: int, method: str = "nearest"
) -> bytes:
    """REAL resize: decode, resample to (height, width) pure-numpy —
    ``nearest`` (index maps) or ``bilinear`` (round 11: the standard
    half-pixel-center convention PIL/OpenCV use, edge-clamped) —
    re-encode as PPM."""
    arr = decode_image(payload)
    h, w = arr.shape[:2]
    if method == "nearest":
        ys = (np.arange(height) * h // height).clip(max=h - 1)
        xs = (np.arange(width) * w // width).clip(max=w - 1)
        return encode_ppm(arr[ys][:, xs])
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    a = arr.astype(np.float64)
    squeeze = a.ndim == 2
    if squeeze:
        a = a[:, :, None]
    # src = (dst + 0.5) * scale - 0.5; fractional weights are taken
    # BEFORE clamping, so edge samples (y0 == y1) are weight-agnostic
    ys = (np.arange(height) + 0.5) * (h / height) - 0.5
    xs = (np.arange(width) + 0.5) * (w / width) - 0.5
    wy = (ys - np.floor(ys))[:, None, None]
    wx = (xs - np.floor(xs))[None, :, None]
    fy = np.floor(ys).astype(np.int64)
    fx = np.floor(xs).astype(np.int64)
    y0 = np.clip(fy, 0, h - 1)
    x0 = np.clip(fx, 0, w - 1)
    y1 = np.clip(fy + 1, 0, h - 1)
    x1 = np.clip(fx + 1, 0, w - 1)
    out = (
        a[np.ix_(y0, x0)] * (1 - wy) * (1 - wx)
        + a[np.ix_(y0, x1)] * (1 - wy) * wx
        + a[np.ix_(y1, x0)] * wy * (1 - wx)
        + a[np.ix_(y1, x1)] * wy * wx
    )
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    if squeeze:
        out = out[:, :, 0]
    return encode_ppm(out)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    strict: bool = False,
    decode: bool = False,
    method: str = "nearest",
) -> DataFrame:
    """Arrow-batched resize over media rows. With ``decode=True`` the
    payloads are really decoded and resampled (:func:`resize_image`,
    ``method`` = nearest | bilinear); otherwise the byte-truncation
    stub runs. Output carries refreshed byte_size/content_hash
    metadata."""
    from hashlib import md5

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode:
                resized = [
                    resize_image(p, width, height, method)
                    for p in pdf["payload"]
                ]
            else:
                resized = [resize_stub(p, width, height, strict) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": resized,
                    "byte_size": [len(r) for r in resized],
                    "content_hash": [md5(r).hexdigest() for r in resized],
                    "target_w": width,
                    "target_h": height,
                }
            )

    return df.mapInPandas(_resize, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    strict: bool = False,
    decode: bool = False,
    frame_stride: int = 1,
) -> DataFrame:
    """Frame sampling for video-like payloads (one input row → N output
    rows via mapInPandas).

    With ``decode=True`` the payload is parsed as a REAL multi-frame
    container — animated GIF (:mod:`operators.gif`: LZW decode +
    disposal composition, frames re-encoded as PPM) or concatenated
    P6 (:func:`split_ppm_frames`): every ``frame_stride``-th frame is
    emitted, up to ``max_frames``, each an intact decodable PPM — the
    keyframe-sampling shape with actual frame boundaries. Default
    mode is the codec-free stub (fixed-stride byte windows);
    ``strict=True`` marks where a real video decoder would plug in
    for other containers.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict and not decode:
            raise NotImplementedError("real frame sampling requires a video decoder")
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                if decode:
                    if bytes(payload[:4]) == b"GIF8":
                        from harness_aws_etl_pipeline_spark.operators.gif import (
                            split_gif_frames,
                        )

                        # decode all (LZW is sequential), but PPM-
                        # encode only the sampled survivors
                        all_frames = split_gif_frames(bytes(payload))
                    else:
                        all_frames = split_ppm_frames(bytes(payload))
                    for i, fr in enumerate(all_frames[::frame_stride][:max_frames]):
                        ids.append(media_id)
                        idxs.append(i)
                        frames.append(
                            fr if isinstance(fr, (bytes, bytearray)) else encode_ppm(fr)
                        )
                else:
                    for i in range(
                        min(max_frames, max(1, len(payload) // every_n_bytes))
                    ):
                        ids.append(media_id)
                        idxs.append(i)
                        frames.append(
                            payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                        )
            # object dtype: an all-null-payload batch yields empty
            # columns, and pandas' float64 default can't Arrow-cast
            # to the binary frame field
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="object"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return df.mapInPandas(_sample, FRAME_SCHEMA)


def media_summary(df: DataFrame) -> DataFrame:
    """Metadata rollup (no payload bytes touched after the scan —
    column pruning drops them): counts + sizes + distinct content
    hashes per modality."""
    return (
        df.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("media_cnt"),
            F.sum("byte_size").alias("total_bytes"),
            F.countDistinct("content_hash").alias("distinct_payloads"),
        )
        .orderBy("modality")
    )


def audio_spectral_features(
    payload: bytes, frame_size: int = 1024, rolloff: float = 0.85
) -> list[float]:
    """FFT-based spectral descriptors of a decoded WAV clip —
    ``[centroid_hz, bandwidth_hz, rolloff_hz, zcr, flatness]`` — the
    standard audio-fingerprint front-end features (pure numpy rfft,
    mono-mixed, Hann-windowed non-overlapping frames, magnitude
    spectra averaged across frames; DC excluded so silence and
    constant offsets read as zero energy):

    - **centroid**: magnitude-weighted mean frequency;
    - **bandwidth**: magnitude-weighted std around the centroid;
    - **rolloff**: the frequency below which ``rolloff`` of the
      magnitude mass sits;
    - **zcr**: mean zero-crossing rate per sample (time domain);
    - **flatness**: geometric/arithmetic mean ratio of the magnitude
      spectrum (1 ≈ noise, →0 ≈ tonal).

    A pure sine at f Hz scores centroid ≈ f, near-zero bandwidth and
    flatness, rolloff ≈ f — the closed-form facts the tests pin.
    Clips shorter than one frame (or silent) return zeros for the
    spectral terms. Float by nature (libm FFT) — tests-only, never a
    cross-engine oracle surface."""
    frames, rate = decode_wav(payload)
    x = frames.astype(np.float64).mean(axis=1) if frames.size else np.zeros(0)
    n = x.shape[0]
    zcr = (
        float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
        if n > 1
        else 0.0
    )
    nfr = n // frame_size
    if nfr == 0 or rate <= 0:
        return [0.0, 0.0, 0.0, zcr, 0.0]
    w = np.hanning(frame_size)
    mags = np.zeros(frame_size // 2 + 1)
    for i in range(nfr):
        seg = x[i * frame_size : (i + 1) * frame_size] * w
        mags += np.abs(np.fft.rfft(seg))
    mags[0] = 0.0  # DC out: offsets are not "spectral content"
    total = mags.sum()
    if total <= 0:
        return [0.0, 0.0, 0.0, zcr, 0.0]
    freqs = np.fft.rfftfreq(frame_size, d=1.0 / rate)
    centroid = float((freqs * mags).sum() / total)
    bandwidth = float(
        np.sqrt(((freqs - centroid) ** 2 * mags).sum() / total)
    )
    cum = np.cumsum(mags)
    roll = float(freqs[int(np.searchsorted(cum, rolloff * total))])
    nz = mags[1:][mags[1:] > 0]
    flatness = (
        float(np.exp(np.mean(np.log(nz))) / nz.mean()) if nz.size else 0.0
    )
    return [centroid, bandwidth, roll, zcr, flatness]


def extract_audio_spectral_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    frame_size: int = 1024,
) -> DataFrame:
    """Arrow-batched spectral front-end over a WAV payload column:
    one row per clip ``(media_id, centroid_hz, bandwidth_hz,
    rolloff_hz, zcr, flatness)``; undecodable payloads surface as
    all-NULL rows. Same scale posture as every multimodal op: the
    binary column never becomes a shuffle key and is pruned after
    this projection."""
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    import struct

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("centroid_hz", "bandwidth_hz", "rolloff_hz", "zcr",
                "flatness")
        for pdf in batches:
            out = {"media_id": [], **{c: [] for c in cols}}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                try:
                    vals = audio_spectral_features(
                        payload, frame_size=frame_size
                    )
                except (ValueError, struct.error, IndexError):
                    vals = [None] * 5
                for c, v in zip(cols, vals):
                    out[c].append(v)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    **{
                        c: pd.Series(out[c], dtype="object") for c in cols
                    },
                }
            )

    return src.mapInPandas(
        _gen,
        "media_id long, centroid_hz double, bandwidth_hz double, "
        "rolloff_hz double, zcr double, flatness double",
    )
