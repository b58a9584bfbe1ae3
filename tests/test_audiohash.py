"""Audio fingerprinting (operators/audiohash.py): invariances
(volume, mild noise), discrimination (different spectra), and planted
near-dup recovery through the real WAV codec + banded join."""

from __future__ import annotations

import numpy as np
import pytest

from harness_aws_etl_pipeline_spark.operators.audiohash import (
    afp64,
    audio_hashes,
    audio_near_dup_pairs,
)
from harness_aws_etl_pipeline_spark.operators.multimodal import encode_wav

RATE = 16_000


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _tone_mix(seed: int, n=RATE):
    """Deterministic multi-tone clip with a distinct spectral shape.

    A fixed broadband noise floor is PART of the clip — real audio has
    energy in every band; without it, empty log-bands sit at ~zero
    energy and their difference signs are decided by whatever
    perturbation arrives (the same degenerate-input effect as the
    pure-ramp pHash case in test_imagehash)."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / RATE
    freqs = rng.uniform(350, 5500, size=6)
    amps = rng.uniform(0.2, 1.0, size=6)
    sig = sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps))
    sig = sig + 0.15 * rng.standard_normal(n)  # broadband floor
    # slow envelope so band energies vary across time frames
    sig = sig * (0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 1.5 * t)))
    return (sig / np.abs(sig).max() * 12_000).astype(np.int16)


class TestFingerprint:
    def test_deterministic(self):
        a, b = _tone_mix(1), _tone_mix(1)
        assert afp64(a, RATE) == afp64(b, RATE)

    def test_volume_invariance(self):
        # even samples so halving is EXACT — int16 quantization noise
        # would otherwise be a (tiny) spectral edit, not a pure gain
        a = (_tone_mix(2) // 2) * 2
        half = a // 2
        assert afp64(a, RATE) == afp64(half, RATE)

    def test_mild_noise_stays_near(self):
        a = _tone_mix(3)
        noisy = (a + np.random.RandomState(0).randint(-150, 150, a.shape)).astype(
            np.int16
        )
        assert _hamming(afp64(a, RATE), afp64(noisy, RATE)) <= 5

    def test_different_clips_far_apart(self):
        assert _hamming(afp64(_tone_mix(4), RATE), afp64(_tone_mix(5), RATE)) > 10

    def test_stereo_mixdown(self):
        mono = _tone_mix(6)
        stereo = np.stack([mono, mono], axis=1)
        assert afp64(stereo, RATE) == afp64(mono, RATE)

    def test_too_short_raises(self):
        with pytest.raises(ValueError, match="too short"):
            afp64(np.zeros(4, dtype=np.int16), RATE)


class TestSparkPlumbing:
    @pytest.fixture(scope="class")
    def media(self, spark):
        base = _tone_mix(7)
        noisy = (base + np.random.RandomState(1).randint(-120, 120, base.shape)).astype(
            np.int16
        )
        other = _tone_mix(8)
        rows = [
            (1, bytearray(encode_wav(base, RATE))),
            (2, bytearray(encode_wav(noisy, RATE))),
            (3, bytearray(encode_wav(other, RATE))),
            (4, bytearray(b"not audio")),
            (5, None),
        ]
        return spark.createDataFrame(rows, "doc_id long, payload binary")

    def test_hashes_and_null_tolerance(self, media):
        got = {r.doc_id: r.simhash for r in audio_hashes(media).collect()}
        assert got[1] is not None and got[3] is not None
        assert got[4] is None and got[5] is None
        assert _hamming(got[1], got[2]) <= 5
        assert _hamming(got[1], got[3]) > 10

    def test_near_dup_pairs_planted(self, media):
        # band_bits=8 → 8 bands: pigeonhole guarantees recall up to
        # Hamming 7, covering the ≤5 noise envelope
        pairs = audio_near_dup_pairs(media, max_hamming=5, band_bits=8).collect()
        assert [(p.doc_a, p.doc_b) for p in pairs] == [(1, 2)]


def _wav(samples, rate=8000):
    import struct

    data = b"".join(struct.pack("<h", int(s)) for s in samples)
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


class TestSpectralFeatures:
    def test_pure_sine_closed_forms(self):
        import numpy as np

        from harness_aws_etl_pipeline_spark.operators.multimodal import (
            audio_spectral_features,
        )

        t = np.arange(4096)
        sine = 10000 * np.sin(2 * np.pi * 1000 * t / 8000)
        c, b, r, z, f = audio_spectral_features(_wav(sine))
        assert abs(c - 1000.0) < 2.0       # centroid at the tone
        assert b < 25.0                    # near-zero spread
        assert abs(r - 1000.0) < 20.0      # rolloff at the tone bin
        assert abs(z - 0.25) < 0.01        # zcr = 2f/rate
        assert f < 0.01                    # tonal → flatness ~ 0

    def test_noise_vs_tone_flatness_orders(self):
        import numpy as np

        from harness_aws_etl_pipeline_spark.operators.multimodal import (
            audio_spectral_features,
        )

        rng = np.random.default_rng(1)
        noise = rng.integers(-8000, 8000, 4096)
        cn, _, _, _, fn = audio_spectral_features(_wav(noise))
        assert fn > 0.8                    # white noise → flat
        assert abs(cn - 2000.0) < 200.0    # centroid ~ rate/4

    def test_silence_and_short_clips_zero(self):
        import numpy as np

        from harness_aws_etl_pipeline_spark.operators.multimodal import (
            audio_spectral_features,
        )

        assert audio_spectral_features(_wav(np.zeros(4096))) == [0.0] * 5
        c, b, r, z, f = audio_spectral_features(_wav([100, -100] * 8))
        assert (c, b, r, f) == (0.0, 0.0, 0.0, 0.0)  # < one frame
        assert z > 0.9                     # but time-domain zcr real

    def test_spark_face_and_bad_payload(self, spark):
        import numpy as np

        from harness_aws_etl_pipeline_spark.operators.multimodal import (
            extract_audio_spectral_features,
        )

        t = np.arange(2048)
        good = _wav(10000 * np.sin(2 * np.pi * 500 * t / 8000))
        rows = [(1, bytearray(good)), (2, bytearray(b"not audio"))]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {
            r["media_id"]: (r["centroid_hz"], r["zcr"])
            for r in extract_audio_spectral_features(df).collect()
        }
        assert abs(got[1][0] - 500.0) < 2.0
        assert abs(got[1][1] - 0.125) < 0.01
        assert got[2] == (None, None)
