"""Baseline TIFF codec (operators/tiff.py): encoder↔decoder round
trips across compressions/predictor/byte orders/strip sizes, LZW
width-growth ladder, hand-built gray/palette/bilevel fixtures, the
structural probe, and guards. Also pins decode_image dispatch."""

from __future__ import annotations

import struct
import zlib  # noqa: F401 - parity with sibling codec tests

import numpy as np
import pytest

from harness_aws_etl_pipeline_spark.operators.multimodal import decode_image
from harness_aws_etl_pipeline_spark.operators.tiff import (
    _lzw_decode,
    _lzw_encode_literal,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
    tiff_meta,
)


def _ifd_tiff(w, h, depth, photo, spp, data, extra_tags=(), big=False):
    """Hand-built single-strip uncompressed TIFF for decode-only
    photometrics (gray / palette / bilevel)."""
    e = ">" if big else "<"
    tags = [
        (256, 4, 1, w, None),
        (257, 4, 1, h, None),
        (258, 3, 1, depth, None),
        (259, 3, 1, 1, None),
        (262, 3, 1, photo, None),
        (277, 3, 1, spp, None),
        (278, 4, 1, h, None),
        (279, 4, 1, len(data), None),
        *extra_tags,
    ]
    n = len(tags) + 1  # + strip offsets
    ifd_off = 8
    after = ifd_off + 2 + 12 * n + 4
    overflow = bytearray()

    def place(payload):
        off = after + len(overflow)
        overflow.extend(payload)
        if len(payload) & 1:
            overflow.append(0)
        return off

    entries = []
    for tag, typ, cnt, inline, payload in tags:
        if payload is not None:
            entries.append((tag, typ, cnt, place(payload), False))
        else:
            entries.append((tag, typ, cnt, inline, typ == 3))
    data_off = after + len(overflow)
    entries.append((273, 4, 1, data_off, False))
    entries.sort(key=lambda t: t[0])
    out = bytearray()
    out += b"MM\x00\x2a" if big else b"II\x2a\x00"
    out += struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", n)
    for tag, typ, cnt, val, short in entries:
        out += struct.pack(e + "HHI", tag, typ, cnt)
        if short and cnt == 1:
            out += struct.pack(e + "H", val) + b"\x00\x00"
        else:
            out += struct.pack(e + "I", val)
    out += struct.pack(e + "I", 0)
    out += overflow
    out += data
    return bytes(out)


class TestRoundTrips:
    def test_all_paths_bit_identical(self):
        rng = np.random.RandomState(1)
        for h, w in [(1, 1), (5, 7), (23, 9)]:
            img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            for comp in ("none", "packbits", "lzw"):
                for pred in (False, True):
                    for big in (False, True):
                        b = encode_tiff(
                            img, compression=comp, predictor=pred,
                            big_endian=big, rows_per_strip=4,
                        )
                        assert np.array_equal(decode_tiff(b), img), (
                            h, w, comp, pred, big,
                        )
                        assert np.array_equal(decode_image(b), img)

    def test_lzw_width_ladder(self):
        """Enough literals to walk 9→10→11→12 bits AND hit the
        12-bit CLEAR reset (table cap 4094 → reset after ~3836
        literals)."""
        rng = np.random.RandomState(2)
        img = rng.randint(0, 256, (40, 60, 3), dtype=np.uint8)  # 7200 B
        b = encode_tiff(img, compression="lzw")
        assert np.array_equal(decode_tiff(b), img)
        m = tiff_meta(b)
        assert m["compression"] == 5

    def test_packbits_compresses_runs(self):
        flat = np.full((32, 32, 3), 7, dtype=np.uint8)
        pb = encode_tiff(flat, compression="packbits")
        assert len(pb) < len(encode_tiff(flat)) // 10
        assert np.array_equal(decode_tiff(pb), flat)

    def test_packbits_primitives(self):
        # spec example shapes: run, literal, mixed
        row = bytes([1] * 5 + [2, 3, 4] + [9] * 3)
        enc = _packbits_encode(row)
        assert _packbits_decode(enc, len(row)) == row
        rng = np.random.RandomState(3)
        for _ in range(20):
            r = bytes(rng.randint(0, 4, rng.randint(1, 300)).astype(np.uint8))
            assert _packbits_decode(_packbits_encode(r), len(r)) == r

    def test_lzw_primitives(self):
        rng = np.random.RandomState(4)
        for size in (1, 100, 5000, 9000):
            data = bytes(rng.randint(0, 256, size).astype(np.uint8))
            assert _lzw_decode(_lzw_encode_literal(data), size) == data


class TestPhotometrics:
    def test_gray_and_whiteiszero(self):
        rng = np.random.RandomState(5)
        g = rng.randint(0, 256, (4, 6), dtype=np.uint8)
        b1 = _ifd_tiff(6, 4, 8, 1, 1, g.tobytes())  # BlackIsZero
        assert np.array_equal(decode_tiff(b1), np.repeat(g[..., None], 3, 2))
        b0 = _ifd_tiff(6, 4, 8, 0, 1, g.tobytes())  # WhiteIsZero
        assert np.array_equal(
            decode_tiff(b0), np.repeat((255 - g)[..., None], 3, 2)
        )

    def test_palette(self):
        rng = np.random.RandomState(6)
        idx = rng.randint(0, 256, (3, 5), dtype=np.uint8)
        pal8 = rng.randint(0, 256, (256, 3), dtype=np.uint8)
        # ColorMap: three 16-bit ramps R..G..B, value = high byte << 8
        cmap = np.concatenate(
            [pal8[:, 0], pal8[:, 1], pal8[:, 2]]
        ).astype(">u2") * 256
        b = _ifd_tiff(
            5, 3, 8, 3, 1, idx.tobytes(),
            extra_tags=[(320, 3, 768, None, cmap.astype("<u2").tobytes())],
        )
        assert np.array_equal(decode_tiff(b), pal8[idx])

    def test_bilevel(self):
        bits = np.array(
            [[1, 0, 1, 0, 1, 1, 0, 0, 1, 1], [0] * 10, [1] * 10],
            dtype=np.uint8,
        )
        packed = np.packbits(bits, axis=1).tobytes()
        b = _ifd_tiff(10, 3, 1, 1, 1, packed)
        want = np.repeat((bits * 255)[..., None], 3, 2)
        assert np.array_equal(decode_tiff(b), want)
        # WhiteIsZero flips
        b0 = _ifd_tiff(10, 3, 1, 0, 1, packed)
        assert np.array_equal(decode_tiff(b0), 255 - want)

    def test_big_endian_hand_built(self):
        g = np.arange(12, dtype=np.uint8).reshape(3, 4)
        b = _ifd_tiff(4, 3, 8, 1, 1, g.tobytes(), big=True)
        assert tiff_meta(b)["endian"] == "big"
        assert np.array_equal(decode_tiff(b), np.repeat(g[..., None], 3, 2))


class TestMetaAndGuards:
    def test_meta_shape(self):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        m = tiff_meta(encode_tiff(img, compression="packbits",
                                  predictor=True, rows_per_strip=3))
        assert m == {
            "container": "tiff", "endian": "little", "width": 8,
            "height": 8, "bits_per_sample": 8, "compression": 32773,
            "photometric": 2, "samples_per_pixel": 3, "strips": 3,
            "predictor": 2,
        }

    def test_guards(self):
        with pytest.raises(ValueError, match="byte-order"):
            decode_tiff(b"XX\x00\x00" + b"\x00" * 16)
        img = np.zeros((2, 2, 3), dtype=np.uint8)
        b = bytearray(encode_tiff(img))
        # corrupt the compression SHORT (find tag 259 in the IFD)
        n = struct.unpack_from("<H", b, 8)[0]
        for i in range(n):
            base = 10 + 12 * i
            if struct.unpack_from("<H", b, base)[0] == 259:
                struct.pack_into("<H", b, base + 8, 999)
        with pytest.raises(ValueError, match="compression"):
            decode_tiff(bytes(b))
        with pytest.raises(ValueError, match="unknown compression"):
            encode_tiff(img, compression="zip")
        with pytest.raises(ValueError, match="expected"):
            encode_tiff(np.zeros((2, 2), dtype=np.uint8))


class TestContainerProbe:
    def test_probe_reports_tiff(self):
        from harness_aws_etl_pipeline_spark.operators.containers import (
            probe_container,
            sniff_container,
        )

        img = np.zeros((6, 9, 3), dtype=np.uint8)
        for comp, codec in (
            ("none", "tiff-raw"),
            ("lzw", "tiff-lzw"),
            ("packbits", "tiff-packbits"),
        ):
            b = encode_tiff(img, compression=comp)
            assert sniff_container(b) == "tiff"
            m = probe_container(b)
            assert (m["container"], m["width"], m["height"], m["codec"]) == (
                "tiff", 9, 6, codec,
            )
