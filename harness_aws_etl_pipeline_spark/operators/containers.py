"""Media CONTAINER probing — real metadata extraction without codecs.

The reference treats media blobs as opaque payloads (etl/transform.py
keeps unknown columns as passthrough bytes); a 100-TB training-data
pipeline needs one step more: cheap, decode-free *container* metadata
(duration, dimensions, codec fourcc, sample rate) to route/filter/
bucket media rows before any expensive decode. This module implements
that probe layer from the public container specs alone:

- **MP4 / ISO-BMFF** (ISO/IEC 14496-12, public): a full box walker —
  32/64-bit box sizes, nested container boxes — reading ``ftyp``
  (brand), ``mvhd`` (timescale/duration, v0+v1), ``tkhd``
  (track dims, 16.16 fixed point), ``hdlr`` (vide/soun), ``mdhd``
  (per-track timescale) and ``stsd`` (codec fourcc).
- **MP3 / MPEG audio** (ISO/IEC 11172-3 header layout, public):
  ID3v2 skip (syncsafe size), frame-sync scan, version/layer/
  bitrate-index/samplerate-index tables, exact per-frame sizes, a
  bounded whole-stream frame walk for exact duration, and Xing/Info
  VBR frame-count detection.
- **Everything the engine already encodes** (WAV/PPM/PNG/GIF/BMP/
  JPEG): magic-byte sniffing + header-only dimension/duration reads,
  unified behind one Arrow-batched :func:`probe_media_containers`.

Codec *decode* for mp4/mp3 stays honestly out of scope (no codec
libs in this environment — see multimodal.decode_stub); probing is
complete and real.

Scale design: the probe is mapInPandas over (id, payload) with all
parsing header-bounded — MP4 reads only box headers + moov leaves,
MP3 walks frame headers (seek, not decode). One pass, no shuffle, no
driver collect; output is a narrow typed frame that downstream
group/filter stages use without ever touching payload bytes again.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --------------------------------------------------------------- MP4

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from(">I", b, off)[0]


def _u64(b: bytes, off: int) -> int:
    return struct.unpack_from(">Q", b, off)[0]


def _walk_boxes(payload: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for each box in
    [start, end); handles 64-bit largesize (size==1) and
    to-end-of-enclosure (size==0)."""
    pos = start
    while pos + 8 <= end:
        size = _u32(payload, pos)
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = _u64(payload, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return  # malformed/truncated: stop cleanly
        yield btype, body, pos + size
        pos += size


def encode_mp4(
    duration_ms: int,
    width: int,
    height: int,
    video_codec: bytes = b"mp4v",
    audio_codec: bytes = b"mp4a",
    audio: bool = True,
    brand: bytes = b"isom",
) -> bytes:
    """Minimal VALID ISO-BMFF writer (ftyp + moov + tiny mdat): real
    box structure a spec-conforming prober can walk. Movie timescale
    is 1000 so mvhd duration is exactly ``duration_ms``."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    def fullbox(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
        return box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)

    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand + b"mp41")
    n_tracks = 2 if audio else 1
    mvhd = fullbox(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, 1000, duration_ms)  # created/modified/timescale/duration
        + struct.pack(">IH", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + bytes(10)
        + struct.pack(
            ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
        )  # identity matrix
        + bytes(24)
        + struct.pack(">I", n_tracks + 1),  # next_track_id
    )

    def trak(track_id: int, handler: bytes, codec: bytes, w: int, h: int) -> bytes:
        tkhd = fullbox(
            b"tkhd",
            0,
            7,  # enabled|in-movie|in-preview
            struct.pack(">III", 0, 0, track_id)
            + bytes(4)
            + struct.pack(">I", duration_ms)
            + bytes(8)
            + struct.pack(">hhhh", 0, 0, 0x0100 if handler == b"soun" else 0, 0)
            + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
        )
        mdhd = fullbox(
            b"mdhd",
            0,
            0,
            struct.pack(">IIII", 0, 0, 1000, duration_ms)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        hdlr = fullbox(
            b"hdlr", 0, 0, bytes(4) + handler + bytes(12) + b"probe\x00"
        )
        # minimal sample entry: 8-byte header + 6 reserved + 2 data_ref idx
        entry = box(codec, bytes(6) + struct.pack(">H", 1))
        stsd = fullbox(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
        stbl = box(b"stbl", stsd)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", mdhd + hdlr + minf)
        return box(b"trak", tkhd + mdia)

    traks = trak(1, b"vide", video_codec, width, height)
    if audio:
        traks += trak(2, b"soun", audio_codec, 0, 0)
    moov = box(b"moov", mvhd + traks)
    mdat = box(b"mdat", b"\x00" * 16)
    return ftyp + moov + mdat


def probe_mp4(payload: bytes) -> dict[str, Any]:
    """Walk the box tree; return brand, duration_ms, track count,
    video dims and codec fourccs. Header-bounded: only box headers
    and moov leaf boxes are read, never mdat bytes."""
    out: dict[str, Any] = {
        "container": "mp4",
        "brand": None,
        "duration_ms": None,
        "n_tracks": 0,
        "width": None,
        "height": None,
        "video_codec": None,
        "audio_codec": None,
        "sample_rate": None,
    }
    end = len(payload)

    def walk(start: int, stop: int, ctx: dict[str, Any]) -> None:
        for btype, b0, b1 in _walk_boxes(payload, start, stop):
            if btype == b"ftyp":
                out["brand"] = payload[b0 : b0 + 4].decode("ascii", "replace")
            elif btype == b"mvhd":
                ver = payload[b0]
                if ver == 1:
                    ts, dur = _u32(payload, b0 + 20), _u64(payload, b0 + 24)
                else:
                    ts, dur = _u32(payload, b0 + 12), _u32(payload, b0 + 16)
                if ts:
                    out["duration_ms"] = dur * 1000 // ts
            elif btype == b"trak":
                out["n_tracks"] += 1
                walk(b0, b1, {"w": None, "h": None})
            elif btype == b"tkhd":
                ver = payload[b0]
                # fullbox(4) + times/id/reserved/duration (v1: 32, v0:
                # 20) + reserved(8) + layer/group/volume/res(8) +
                # matrix(36) → width/height, 16.16 fixed
                off = b0 + (4 + 32 + 52 if ver == 1 else 4 + 20 + 52)
                ctx["w"] = _u32(payload, off) >> 16
                ctx["h"] = _u32(payload, off + 4) >> 16
            elif btype == b"hdlr":
                handler = payload[b0 + 8 : b0 + 12]
                if handler == b"vide" and ctx.get("w"):
                    out["width"], out["height"] = ctx["w"], ctx["h"]
                ctx["handler"] = handler
            elif btype == b"stsd":
                if _u32(payload, b0 + 4) >= 1 and b0 + 12 <= b1:
                    fourcc = payload[b0 + 12 : b0 + 16].decode("ascii", "replace")
                    if ctx.get("handler") == b"vide":
                        out["video_codec"] = fourcc
                    elif ctx.get("handler") == b"soun":
                        out["audio_codec"] = fourcc
            elif btype in _MP4_CONTAINERS:
                walk(b0, b1, ctx)

    walk(0, end, {})
    return out


# --------------------------------------------------------------- MP3

# public header tables (ISO 11172-3 / 13818-3): kbps by [version][layer]
_BITRATE_V1 = {
    1: [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    2: [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    3: [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
}
_BITRATE_V2 = {
    1: [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    2: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    3: [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATES = {  # by version key
    3: [44100, 48000, 32000],  # MPEG-1
    2: [22050, 24000, 16000],  # MPEG-2
    0: [11025, 12000, 8000],  # MPEG-2.5
}


def _mp3_frame(payload: bytes, pos: int) -> dict[str, Any] | None:
    """Parse one MPEG audio frame header at pos; None if not a valid
    sync/header combination."""
    if pos + 4 > len(payload):
        return None
    h = struct.unpack_from(">I", payload, pos)[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = (h >> 19) & 3  # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_bits = (h >> 17) & 3  # 01=L3, 10=L2, 11=L1
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    if version == 1 or layer_bits == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None
    layer = 4 - layer_bits  # 1..3
    table = _BITRATE_V1 if version == 3 else _BITRATE_V2
    bitrate = table[layer][br_idx] * 1000
    sample_rate = _SAMPLE_RATES[version][sr_idx]
    if layer == 1:
        samples, size = 384, (12 * bitrate // sample_rate + padding) * 4
    elif layer == 2 or version == 3:
        samples, size = 1152, 144 * bitrate // sample_rate + padding
    else:  # layer 3, MPEG-2/2.5: 576 samples per frame
        samples, size = 576, 72 * bitrate // sample_rate + padding
    return {
        "version": {3: "1", 2: "2", 0: "2.5"}[version],
        "layer": layer,
        "bitrate_kbps": bitrate // 1000,
        "sample_rate": sample_rate,
        "channels": 1 if mode == 3 else 2,
        "samples": samples,
        "size": size,
    }


def _skip_id3v2(payload: bytes) -> int:
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    sz = 0
    for b in payload[6:10]:  # syncsafe: 7 bits per byte
        sz = (sz << 7) | (b & 0x7F)
    return 10 + sz


def encode_mp3(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 32000,
    id3: bytes | None = None,
    xing_frames: int | None = None,
) -> bytes:
    """Construct a VALID MPEG-1 Layer III frame stream (headers +
    zero-fill payload): real sync words, real header fields, real
    frame lengths — probe-able by any conforming parser. Optionally
    prefixed with an ID3v2 tag and/or a Xing VBR header in frame 0."""
    br_idx = _BITRATE_V1[3].index(bitrate_kbps)
    sr_idx = _SAMPLE_RATES[3].index(sample_rate)
    h = (
        (0x7FF << 21)
        | (3 << 19)  # MPEG-1
        | (1 << 17)  # Layer III
        | (1 << 16)  # no CRC
        | (br_idx << 12)
        | (sr_idx << 10)
        | (0 << 9)  # no padding
        | (0 << 6)  # stereo
    )
    header = struct.pack(">I", h)
    size = 144 * bitrate_kbps * 1000 // sample_rate
    frame = header + b"\x00" * (size - 4)
    frames = []
    for i in range(n_frames):
        if i == 0 and xing_frames is not None:
            # Xing lives after the stereo MPEG-1 side info (32 bytes)
            body = bytearray(size - 4)
            body[32:40] = b"Xing" + struct.pack(">I", 1)  # flags: FRAMES
            body[40:44] = struct.pack(">I", xing_frames)
            frames.append(header + bytes(body))
        else:
            frames.append(frame)
    out = b"".join(frames)
    if id3 is not None:
        body = id3
        sz = len(body)
        syncsafe = bytes(
            [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
        )
        out = b"ID3\x04\x00\x00" + syncsafe + body + out
    return out


def probe_mp3(payload: bytes, max_frames: int = 1_000_000) -> dict[str, Any]:
    """Skip ID3v2, find the first sync, then WALK every frame header
    (exact sizes from the header tables) for an exact frame count and
    duration; a Xing/Info header short-circuits the walk with the
    declared frame total (VBR files)."""
    out: dict[str, Any] = {
        "container": "mp3",
        "duration_ms": None,
        "sample_rate": None,
        "bitrate_kbps": None,
        "channels": None,
        "frames": 0,
        "vbr": False,
        "id3v2_bytes": 0,
    }
    pos = _skip_id3v2(payload)
    out["id3v2_bytes"] = pos
    # resync scan (bounded): tolerate junk between tag and first frame
    first = None
    scan_end = min(len(payload), pos + 65536)
    while pos + 4 <= scan_end:
        first = _mp3_frame(payload, pos)
        if first is not None:
            break
        pos += 1
    if first is None:
        return out
    out.update(
        {
            "sample_rate": first["sample_rate"],
            "bitrate_kbps": first["bitrate_kbps"],
            "channels": first["channels"],
            "mpeg_version": first["version"],
            "layer": first["layer"],
        }
    )
    # Xing/Info VBR header: after side info (MPEG-1: 32B stereo/17B
    # mono; MPEG-2: 17B stereo/9B mono), relative to header end
    side = (
        (17 if first["channels"] == 1 else 32)
        if first["version"] == "1"
        else (9 if first["channels"] == 1 else 17)
    )
    tag_off = pos + 4 + side
    tag = payload[tag_off : tag_off + 4]
    if tag in (b"Xing", b"Info"):
        flags = _u32(payload, tag_off + 4)
        if flags & 1:
            n = _u32(payload, tag_off + 8)
            out["frames"] = n
            out["vbr"] = tag == b"Xing"
            out["duration_ms"] = n * first["samples"] * 1000 // first["sample_rate"]
            return out
    # exact walk
    n, sample_sum, br_sum = 0, 0, 0
    rates = set()
    while pos + 4 <= len(payload) and n < max_frames:
        fr = _mp3_frame(payload, pos)
        if fr is None or fr["size"] <= 4:
            break
        n += 1
        sample_sum += fr["samples"] * 1000
        br_sum += fr["bitrate_kbps"]
        rates.add(fr["bitrate_kbps"])
        pos += fr["size"]
    out["frames"] = n
    out["vbr"] = len(rates) > 1
    if n:
        out["bitrate_kbps"] = br_sum // n
        out["duration_ms"] = sample_sum // first["sample_rate"]
    return out


# ------------------------------------------------- unified sniff/probe


def sniff_container(payload: bytes) -> str:
    """Magic-byte container detection for every format the engine
    handles. Cheap (first 12 bytes + mp3 sync check)."""
    if payload is None or len(payload) < 4:
        return "unknown"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:3] == b"ID3":
        return "mp3"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:4] in (b"GIF8",):
        return "gif"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        return "tiff"
    if payload[:5] == b"%PDF-":
        return "pdf"
    if payload[:4] == b"PK\x03\x04":
        from harness_aws_etl_pipeline_spark.operators.office import (
            office_kind,
        )

        return office_kind(payload) or "zip"
    if _mp3_frame(payload, 0) is not None:
        return "mp3"
    return "unknown"


def probe_container(payload: bytes) -> dict[str, Any]:
    """One payload → typed metadata dict (container + whatever the
    format carries: dims, duration, rates, codecs). Never raises on
    malformed bytes — returns what parsed, container='unknown' when
    nothing did."""
    base: dict[str, Any] = {
        "container": "unknown",
        "duration_ms": None,
        "width": None,
        "height": None,
        "n_tracks": None,
        "sample_rate": None,
        "bitrate_kbps": None,
        "codec": None,
    }
    try:
        kind = sniff_container(payload)
        if kind == "mp4":
            m = probe_mp4(payload)
            base.update(
                container="mp4",
                duration_ms=m["duration_ms"],
                width=m["width"],
                height=m["height"],
                n_tracks=m["n_tracks"],
                codec=m["video_codec"] or m["audio_codec"],
            )
        elif kind == "mp3":
            m = probe_mp3(payload)
            base.update(
                container="mp3",
                duration_ms=m["duration_ms"],
                sample_rate=m["sample_rate"],
                bitrate_kbps=m["bitrate_kbps"],
                n_tracks=1 if m["frames"] else 0,
                codec=f"mp3v{m.get('mpeg_version', '?')}" if m["frames"] else None,
            )
        elif kind == "flac":
            from harness_aws_etl_pipeline_spark.operators.flac import (
                flac_meta,
            )

            m = flac_meta(payload)
            base.update(
                container="flac",
                codec="flac",
                n_tracks=1,
                sample_rate=m["sample_rate"],
                duration_ms=(
                    m["total_samples"] * 1000 // m["sample_rate"]
                    if m["sample_rate"]
                    else None
                ),
            )
        elif kind == "wav":
            pos, fmt, dlen = 12, None, None
            while pos + 8 <= len(payload):
                ctype, length = struct.unpack_from("<4sI", payload, pos)
                if ctype == b"fmt ":
                    fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
                elif ctype == b"data":
                    dlen = length
                pos += 8 + length + (length & 1)
            base.update(container="wav", codec="pcm_s16le", n_tracks=1)
            if fmt is not None:
                _, channels, rate, _, align, _ = fmt
                base["sample_rate"] = rate
                if dlen is not None and align:
                    base["duration_ms"] = dlen // align * 1000 // rate
        elif kind == "avi":
            from harness_aws_etl_pipeline_spark.operators.video import (
                probe_avi,
            )

            m = probe_avi(payload)
            dur = (
                m["frames"] * 1000 // m["fps"]
                if m["frames"] and m["fps"]
                else None
            )
            base.update(
                container="avi",
                width=m["width"],
                height=m["height"],
                duration_ms=dur,
                n_tracks=1,
                codec=(m["codec"] or "").lower() or None,
            )
        elif kind == "png":
            base.update(
                container="png",
                width=_u32(payload, 16),
                height=_u32(payload, 20),
                codec="png",
            )
        elif kind == "gif":
            w, h = struct.unpack_from("<HH", payload, 6)
            base.update(container="gif", width=w, height=h, codec="gif-lzw")
        elif kind == "jpeg":
            # scan markers for SOF0/SOF2 dims
            pos = 2
            while pos + 4 <= len(payload):
                if payload[pos] != 0xFF:
                    break
                marker = payload[pos + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
                if marker in (0xC0, 0xC1, 0xC2):
                    h, w = struct.unpack_from(">HH", payload, pos + 5)
                    base.update(
                        container="jpeg", width=w, height=h,
                        codec="jpeg-progressive" if marker == 0xC2
                        else "jpeg-baseline",
                    )
                    break
                pos += 2 + seg_len
            base["container"] = "jpeg"
        elif kind == "ppm":
            from harness_aws_etl_pipeline_spark.operators.multimodal import (
                _parse_ppm_header,
            )

            w, h, _ = _parse_ppm_header(payload, 0)
            base.update(container="ppm", width=w, height=h, codec="ppm-raw")
        elif kind == "bmp":
            w = struct.unpack_from("<i", payload, 18)[0]
            h = struct.unpack_from("<i", payload, 22)[0]
            base.update(container="bmp", width=w, height=abs(h), codec="bmp-rgb")
        elif kind == "tiff":
            from harness_aws_etl_pipeline_spark.operators.tiff import (
                tiff_meta,
            )

            m = tiff_meta(payload)
            base.update(
                container="tiff",
                width=m["width"],
                height=m["height"],
                codec={1: "tiff-raw", 5: "tiff-lzw", 32773: "tiff-packbits"}
                .get(m["compression"], f"tiff-comp{m['compression']}"),
            )
        elif kind == "pdf":
            from harness_aws_etl_pipeline_spark.operators.pdf import pdf_meta

            m = pdf_meta(payload)
            base.update(
                container="pdf",
                n_tracks=m["pages"],  # page count in the track slot
                codec=f"pdf-{m['version']}",
            )
        elif kind in ("docx", "pptx", "xlsx", "epub", "zip"):
            base.update(
                container=kind,
                codec={"zip": "zip", "epub": "epub-ocf"}.get(kind, "ooxml"),
            )
    except (struct.error, ValueError, IndexError):
        pass
    return base


def synthesize_mp4_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL MP4 container per row (valid box structure,
    probe-able by any conforming parser): ``duration_ms = 500 +
    id % 1000``, ``width = 16*(1 + id % 32)``, ``height =
    16*(1 + id % 18)``, video+audio tracks — every probed property
    closed-form in the id, so the probe path is oracle-checkable."""
    import pandas as pd
    from hashlib import md5

    from pyspark.sql import functions as F

    from harness_aws_etl_pipeline_spark.operators.multimodal import MEDIA_SCHEMA

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def _gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = [
                encode_mp4(
                    500 + int(mid) % 1000,
                    16 * (1 + int(mid) % 32),
                    16 * (1 + int(mid) % 18),
                )
                for mid in pdf["media_id"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "video/mp4",
                    "payload": payloads,
                    "byte_size": [len(p) for p in payloads],
                    "content_hash": [md5(p).hexdigest() for p in payloads],
                }
            )

    return ids.mapInPandas(_gen, MEDIA_SCHEMA)


def synthesize_mp3_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL MPEG-1 Layer III frame stream per row:
    ``frames = 10 + id % 20`` at 128 kbps / 32 kHz → ``duration_ms =
    36 * frames`` exactly (1152 samples / 32000 Hz = 36 ms/frame)."""
    import pandas as pd
    from hashlib import md5

    from pyspark.sql import functions as F

    from harness_aws_etl_pipeline_spark.operators.multimodal import MEDIA_SCHEMA

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def _gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = [encode_mp3(10 + int(mid) % 20) for mid in pdf["media_id"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": "audio/mp3",
                    "payload": payloads,
                    "byte_size": [len(p) for p in payloads],
                    "content_hash": [md5(p).hexdigest() for p in payloads],
                }
            )

    return ids.mapInPandas(_gen, MEDIA_SCHEMA)


PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), True),
        StructField("container", StringType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_tracks", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("bitrate_kbps", IntegerType(), True),
        StructField("codec", StringType(), True),
    ]
)


def probe_media_containers(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Arrow-batched container probe: (id, payload) → one typed
    metadata row per input row, payload bytes never leave the stage.
    The narrow result is what downstream filters/groupBys consume, so
    the expensive binary column is pruned everywhere else."""
    import pandas as pd

    cols = [id_col, payload_col]

    def _probe(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                m = probe_container(bytes(payload) if payload is not None else None)
                m["media_id"] = mid
                rows.append(m)
            out = pd.DataFrame(
                rows,
                columns=[f.name for f in PROBE_SCHEMA.fields],
            )
            # object dtype so all-null batches Arrow-cast cleanly
            yield out.astype("object")

    return df.select(*cols).mapInPandas(_probe, PROBE_SCHEMA)
