"""Mixed-media near-dup (operators/mediahash.py): modality routing by
magic bytes, within-modality pairing, no cross-modality pairs."""

from __future__ import annotations

import numpy as np
import pytest

from harness_aws_etl_pipeline_spark.operators.mediahash import (
    media_hashes,
    media_near_dup_pairs,
)
from harness_aws_etl_pipeline_spark.operators.multimodal import (
    encode_png,
    encode_ppm,
    encode_wav,
)

RATE = 16_000


def _img(shift=0):
    yy, xx = np.mgrid[0:48, 0:48].astype(np.float64)
    g = 100 + 30 * np.sin(xx / 5.0) * np.cos(yy / 7.0) + 0.4 * xx + shift
    g = np.clip(g, 0, 255).astype(np.uint8)
    return np.stack([g] * 3, axis=2)


def _clip(seed, noise=0):
    rng = np.random.RandomState(seed)
    t = np.arange(RATE) / RATE
    sig = sum(
        a * np.sin(2 * np.pi * f * t)
        for f, a in zip(rng.uniform(350, 5500, 6), rng.uniform(0.2, 1.0, 6))
    )
    sig = sig + 0.15 * rng.standard_normal(RATE)
    pcm = (sig / np.abs(sig).max() * 12_000).astype(np.int16)
    if noise:
        pcm = (pcm + np.random.RandomState(0).randint(-noise, noise, pcm.shape)).astype(
            np.int16
        )
    return pcm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, bytearray(encode_ppm(_img()))),
        (2, bytearray(encode_png(_img(shift=8)))),      # image near-dup of 1
        (3, bytearray(encode_wav(_clip(7), RATE))),
        (4, bytearray(encode_wav(_clip(7, noise=100), RATE))),  # audio near-dup of 3
        (5, bytearray(b"neither image nor audio")),
        (6, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


class TestMediaHash:
    def test_modality_routing(self, media):
        got = {r.doc_id: (r.modality, r.simhash) for r in media_hashes(media).collect()}
        assert got[1][0] == "image" and got[2][0] == "image"
        assert got[3][0] == "audio" and got[4][0] == "audio"
        assert got[5] == (None, None) and got[6] == (None, None)

    def test_pairs_within_modality_only(self, media):
        # 8-bit bands: pigeonhole recall guaranteed to Hamming 7,
        # covering the audio pair's <=5-bit noise envelope
        pairs = media_near_dup_pairs(media, max_hamming=5, band_bits=8).collect()
        got = {(p.doc_a, p.doc_b): p.modality for p in pairs}
        assert got == {(1, 2): "image", (3, 4): "audio"}

    def test_string_ids(self, spark):
        """Non-long id types flow through hashing and pairing (the
        Arrow schemas derive the id type instead of hardcoding long)."""
        rows = [
            ("a", bytearray(encode_ppm(_img()))),
            ("b", bytearray(encode_png(_img(shift=8)))),
            ("c", bytearray(encode_wav(_clip(7), RATE))),
        ]
        df = spark.createDataFrame(rows, "doc_id string, payload binary")
        got = {r.doc_id: r.modality for r in media_hashes(df).collect()}
        assert got == {"a": "image", "b": "image", "c": "audio"}
        pairs = media_near_dup_pairs(df, max_hamming=5, band_bits=8).collect()
        assert {(p.doc_a, p.doc_b) for p in pairs} == {("a", "b")}


class TestPerModalityCap:
    def test_bucket_cap_is_per_modality(self, spark):
        """A band-key collision across modalities must not share one
        cap: 3 identical 'image' sketches over the cap are dropped,
        while the 2 'audio' sketches colliding on every (band, key)
        survive and pair."""
        from harness_aws_etl_pipeline_spark.operators.dedup_fuzzy import (
            simhash_banded,
        )

        rows = [(i, "image", 7) for i in range(3)] + [
            (10, "audio", 7),
            (11, "audio", 7),
        ]
        sk = spark.createDataFrame(
            rows, "doc_id long, modality string, simhash long"
        )
        banded = simhash_banded(
            sk, "doc_id", 16, "sh", max_bucket_size=2, extra_key_cols=("modality",)
        )
        kept = {
            (r.modality, r.doc_id) for r in banded.select("modality", "doc_id").distinct().collect()
        }
        # image bucket (3 > cap 2) dropped entirely; audio (2 <= cap) kept
        assert kept == {("audio", 10), ("audio", 11)}


class TestVideoSketch:
    def test_near_clip_pairs_far_clip_does_not(self, spark):
        import numpy as np

        from harness_aws_etl_pipeline_spark.operators.mediahash import (
            media_hashes,
            media_near_dup_pairs,
        )
        from harness_aws_etl_pipeline_spark.operators.video import (
            encode_avi_mjpeg,
        )

        rng = np.random.default_rng(9)
        base = [
            np.clip(rng.integers(0, 255, (32, 32, 3)), 0, 255).astype(
                np.uint8
            )
            for _ in range(6)
        ]
        mod = [f.copy() for f in base]
        mod[2] = np.clip(mod[2].astype(int) + 12, 0, 255).astype(np.uint8)
        other = [
            np.clip(rng.integers(0, 255, (32, 32, 3)), 0, 255).astype(
                np.uint8
            )
            for _ in range(6)
        ]
        rows = [
            (1, bytearray(encode_avi_mjpeg(base))),
            (2, bytearray(encode_avi_mjpeg(mod))),
            (3, bytearray(encode_avi_mjpeg(other))),
            (4, bytearray(b"not media at all")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        hashes = {
            r["doc_id"]: (r["modality"], r["simhash"])
            for r in media_hashes(df).collect()
        }
        assert hashes[1][0] == hashes[2][0] == hashes[3][0] == "video"
        assert hashes[4] == (None, None)
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in media_near_dup_pairs(df, max_hamming=3).collect()
        }
        assert (1, 2) in pairs and pairs[(1, 2)] <= 3
        assert (1, 3) not in pairs and (2, 3) not in pairs
