"""[EXT] Motion-JPEG video: AVI (RIFF) container + per-frame JPEG.

The multimodal contract treats video as an opaque binary column with
typed metadata and a FRAME-SAMPLE decode step. With the pure-numpy
JPEG codec (operators/jpeg.py, baseline + progressive) in the repo,
the Motion-JPEG slice of that contract is implementable for real with
stdlib + numpy: an AVI is a RIFF tree whose ``movi`` LIST carries one
``00dc`` chunk per compressed frame, and an MJPG frame IS a baseline
JPEG. So:

- :func:`probe_avi` — decode-free metadata (dims, fps, frame count)
  from the ``avih``/``strh``/``strf`` headers, the same
  scan-the-headers-not-the-samples posture as
  ``operators/containers.py``;
- :func:`decode_avi_frames` — frame-sample decode: every ``every_n``-th
  ``00dc``/``00db`` chunk through ``decode_jpeg``, with a
  ``max_frames`` cap so a pathological payload cannot balloon one
  Arrow batch;
- :func:`encode_avi_mjpeg` — fixture writer emitting a structurally
  valid single-stream MJPG AVI (even-padded chunks, avih/strl/strf
  headers, idx1 omitted — players tolerate its absence and the
  decoder never needs it);
- :func:`video_frame_features` — the Spark face: ``mapInPandas`` over
  payload batches → one row per SAMPLED frame ``(media_id,
  frame_index, width, height, mean)``. Payloads never become shuffle
  keys; downstream grouping happens on ids (the multimodal scale
  rule).

Codecs beyond MJPEG (H.264 etc.) stay honestly stubbed — inter-frame
decode needs a codec library this container doesn't have. MJPEG is
the one video codec whose decode is exactly the image path.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

__all__ = [
    "encode_avi_mjpeg",
    "probe_avi",
    "decode_avi_frames",
    "video_frame_features",
]


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """RGB frame arrays (equal dims) → single-stream MJPG AVI bytes."""
    from harness_aws_etl_pipeline_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    if fps <= 0:
        raise ValueError(f"fps must be positive: {fps}")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
    payloads = [encode_jpeg(f, quality=100) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,  # dwMicroSecPerFrame
            0, 0, 0,
            len(frames),  # dwTotalFrames
            0, 1,  # one stream
            0, w, h, 0, 0, 0, 0,
        ),
    )
    strh = chunk(
        b"strh",
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h),
    )
    strf = chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
        ),
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _riff_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_len) walking a RIFF chunk span;
    tolerates truncation by stopping, raises on impossible sizes."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > len(data):
            raise ValueError("truncated AVI chunk")
        yield fourcc, body, size
        pos = body + size + (size % 2)


def probe_avi(payload: bytes) -> dict:
    """Decode-free metadata: ``{width, height, fps, frames, codec}``
    from the AVI headers. Raises ``ValueError`` on non-AVI input."""
    d = bytes(payload)
    if len(d) < 12 or d[:4] != b"RIFF" or d[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI signature)")
    out = {"width": None, "height": None, "fps": None, "frames": None,
           "codec": None}
    for fourcc, body, size in _riff_chunks(d, 12, len(d)):
        if fourcc != b"LIST" or d[body : body + 4] != b"hdrl":
            continue
        for f2, b2, s2 in _riff_chunks(d, body + 4, body + size):
            if f2 == b"avih" and s2 >= 40:
                micro, _, _, _, total = struct.unpack_from("<5I", d, b2)
                out["fps"] = round(1_000_000 / micro) if micro else None
                out["frames"] = total
                out["width"], out["height"] = struct.unpack_from(
                    "<2I", d, b2 + 32
                )
            elif f2 == b"LIST" and d[b2 : b2 + 4] == b"strl":
                for f3, b3, s3 in _riff_chunks(d, b2 + 4, b2 + s2):
                    if f3 == b"strh" and s3 >= 8:
                        if d[b3 : b3 + 4] == b"vids":
                            out["codec"] = d[b3 + 4 : b3 + 8].decode(
                                "ascii", "replace"
                            )
    if out["width"] is None:
        raise ValueError("AVI missing avih header")
    return out


def decode_avi_frames(
    payload: bytes,
    every_n: int = 1,
    max_frames: int | None = None,
) -> list[np.ndarray]:
    """Frame-sample decode: every ``every_n``-th video chunk of an
    MJPG AVI → list of (h, w, 3) uint8 RGB arrays (at most
    ``max_frames``). Only JPEG-compressed chunks are supported —
    anything else raises rather than mis-decoding."""
    from harness_aws_etl_pipeline_spark.operators.jpeg import decode_jpeg

    if every_n < 1:
        raise ValueError(f"every_n must be >= 1: {every_n}")
    d = bytes(payload)
    if len(d) < 12 or d[:4] != b"RIFF" or d[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI signature)")
    frames: list[np.ndarray] = []
    idx = 0
    for fourcc, body, size in _riff_chunks(d, 12, len(d)):
        if fourcc != b"LIST" or d[body : body + 4] != b"movi":
            continue
        for f2, b2, s2 in _riff_chunks(d, body + 4, body + size):
            if f2[2:4] not in (b"dc", b"db"):
                continue
            if idx % every_n == 0:
                blob = d[b2 : b2 + s2]
                if blob[:2] != b"\xff\xd8":
                    raise ValueError(
                        "non-JPEG frame chunk — only MJPG AVIs decode here"
                    )
                frames.append(decode_jpeg(blob))
                if max_frames is not None and len(frames) >= max_frames:
                    return frames
            idx += 1
    return frames


def video_frame_features(
    df,
    payload_col: str = "payload",
    id_col: str = "media_id",
    every_n: int = 1,
    max_frames: int | None = 32,
):
    """One row per SAMPLED frame: ``(media_id, frame_index, width,
    height, mean)`` — the frame-sample step of the multimodal
    contract, Arrow-batched (mapInPandas), undecodable payloads
    surfaced as NULL-dim rows with frame_index −1 rather than killing
    the batch."""
    import pandas as pd
    from pyspark.sql import functions as F

    src = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def _gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, fidx, ws, hs, means = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    decoded = decode_avi_frames(
                        payload, every_n=every_n, max_frames=max_frames
                    )
                except (ValueError, IndexError, struct.error):
                    ids.append(mid)
                    fidx.append(-1)
                    ws.append(None)
                    hs.append(None)
                    means.append(None)
                    continue
                for i, arr in enumerate(decoded):
                    ids.append(mid)
                    fidx.append(i * every_n)
                    ws.append(arr.shape[1])
                    hs.append(arr.shape[0])
                    means.append(float(arr.mean()))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(fidx, dtype="int64"),
                    "width": pd.Series(ws, dtype="object"),
                    "height": pd.Series(hs, dtype="object"),
                    "mean": pd.Series(means, dtype="object"),
                }
            )

    return src.mapInPandas(
        _gen,
        "media_id long, frame_index long, width int, height int, mean double",
    )
