"""Perceptual image hashing (operators/imagehash.py).

Structured synthetic images (gradients, checkerboards) through the
REAL codecs (PPM/PNG/JPEG from operators/multimodal) — invariances,
discrimination, and planted near-dup recovery via the banded join.
"""

from __future__ import annotations

import numpy as np
import pytest

from harness_aws_etl_pipeline_spark.operators.imagehash import (
    ahash64,
    dhash64,
    image_hashes,
    image_near_dup_pairs,
    phash64,
)
from harness_aws_etl_pipeline_spark.operators.multimodal import (
    encode_png,
    encode_ppm,
)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _gradient(h=48, w=48, lo=0, hi=255):
    """Smooth horizontal luminance ramp."""
    x = np.linspace(lo, hi, w, dtype=np.float64)
    img = np.repeat(x[None, :], h, axis=0)
    return np.stack([img, img, img], axis=2).astype(np.uint8)


def _smooth(h=48, w=48):
    """Spectrally generic smooth image: separable waves + a product
    term so no low-frequency DCT coefficient is exactly zero.  (A pure
    ramp leaves most AC coefficients at 0.0, putting the pHash median
    at ~0 where epsilon noise flips bits — degenerate by construction,
    not representative.)"""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = (
        100.0
        + 35.0 * np.sin(xx / 5.0)
        + 25.0 * np.cos(yy / 7.0)
        + 15.0 * np.sin(xx / 6.0) * np.sin(yy / 9.0)
        + 0.3 * xx
        + 0.2 * yy
    )
    img = np.clip(img, 0, 225).astype(np.uint8)
    return np.stack([img, img, img], axis=2)


def _checker(h=48, w=48, cell=6):
    yy, xx = np.mgrid[0:h, 0:w]
    img = (((yy // cell) + (xx // cell)) % 2 * 255).astype(np.uint8)
    return np.stack([img, img, img], axis=2)


class TestHashFunctions:
    def test_identical_arrays_identical_hashes(self):
        a, b = _gradient(), _gradient()
        for fn in (ahash64, dhash64, phash64):
            assert fn(a) == fn(b)

    def test_hashes_fit_in_signed_64(self):
        for fn in (ahash64, dhash64, phash64):
            v = fn(_checker())
            assert -(1 << 63) <= v < (1 << 63)

    def test_nn_upscale_is_near_invariant(self):
        # 2x nearest-neighbor upscale resamples to the same 32x32 grid
        base = _gradient(32, 32)
        up = base.repeat(2, axis=0).repeat(2, axis=1)
        for fn in (ahash64, dhash64, phash64):
            assert _hamming(fn(base), fn(up)) <= 2

    def test_brightness_shift_invariance_dhash_phash(self):
        # _smooth tops out at 225 so +30 never clips — clipping would
        # flatten the signal (a real structural change), not shift it
        base = _smooth()
        brighter = (base.astype(np.int16) + 30).astype(np.uint8)
        # gradient-based and AC-based hashes ignore a constant offset
        assert _hamming(dhash64(base), dhash64(brighter)) <= 2
        assert _hamming(phash64(base), phash64(brighter)) <= 2

    def test_different_structures_are_far_apart(self):
        g, c = _gradient(), _checker()
        for fn in (dhash64, phash64):
            assert _hamming(fn(g), fn(c)) > 10

    def test_small_local_edit_stays_near(self):
        base = _smooth()
        edited = base.copy()
        # modest local edit: +25 over a 4x4 corner (a watermark-scale
        # change, not a structural one)
        patch = edited[0:4, 0:4].astype(np.int16) + 25
        edited[0:4, 0:4] = np.clip(patch, 0, 255).astype(np.uint8)
        assert _hamming(phash64(base), phash64(edited)) <= 6


class TestSparkPlumbing:
    @pytest.fixture(scope="class")
    def media(self, spark):
        base = _smooth()
        near = (base.astype(np.int16) + 12).astype(np.uint8)  # no clip: max 225
        far = _checker()
        rows = [
            (1, bytearray(encode_ppm(base))),
            (2, bytearray(encode_png(near))),   # near-dup of 1, other codec
            (3, bytearray(encode_ppm(far))),
            (4, bytearray(b"not an image")),
            (5, None),
        ]
        return spark.createDataFrame(rows, "doc_id long, payload binary")

    def test_hashes_column_and_null_tolerance(self, media):
        got = {r.doc_id: r.simhash for r in image_hashes(media).collect()}
        assert got[1] is not None and got[3] is not None
        assert got[4] is None and got[5] is None
        assert _hamming(got[1], got[2]) <= 3  # cross-codec near-dup
        assert _hamming(got[1], got[3]) > 10

    def test_near_dup_pairs_planted(self, media):
        pairs = image_near_dup_pairs(media, max_hamming=3).collect()
        assert [(p.doc_a, p.doc_b) for p in pairs] == [(1, 2)]
        assert pairs[0].hamming <= 3

    def test_method_validation(self, media):
        with pytest.raises(ValueError, match="method"):
            image_hashes(media, method="md5")

    def test_ahash_method_selectable(self, media):
        got = {r.doc_id: r.simhash for r in image_hashes(media, method="ahash").collect()}
        assert got[1] is not None
