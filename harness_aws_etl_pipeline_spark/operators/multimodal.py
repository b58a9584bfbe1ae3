"""[EXT] Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct (modality, byte size, content hash). The Spark-side
plumbing — schema, Arrow batch shape, mapInPandas partition flow — is
real and tested; the actual media decode step is STUBBED (the decode
libraries are not in this environment) behind ``decode_stub``:
deterministic fake features by default, ``NotImplementedError`` when
``strict=True``.

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


def extract_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over media rows (mapInPandas).

    One Python worker pass per partition; each pandas batch maps
    payload→feature vector through ``decode_stub``. The output drops
    the payload column — features flow on, blobs don't.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "byte_size": pdf["byte_size"],
                    "feature": [
                        decode_stub(p, m, strict)
                        for p, m in zip(pdf["payload"], pdf["modality"])
                    ],
                }
            )
            yield out

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


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


def resize_media(df: DataFrame, width: int, height: int, strict: bool = False) -> DataFrame:
    """Arrow-batched resize over media rows — same mapInPandas shape a
    real decoder/encoder pair would use; output carries refreshed
    byte_size/content_hash metadata."""
    from hashlib import md5

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
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
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8, strict: bool = False
) -> DataFrame:
    """STUB frame sampling for video-like payloads: emit up to
    ``max_frames`` "frames" (fixed-stride byte windows) per media row —
    the real decoder would seek keyframes; the Spark shape (one input
    row → N output rows via mapInPandas) is identical.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if strict:
            raise NotImplementedError("real frame sampling requires a video decoder")
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(payload[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

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
