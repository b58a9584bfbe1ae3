"""FLAC codec (operators/flac.py): CRC spec anchors, encoder/decoder
round trips across subframe kinds and channel modes, STREAMINFO MD5
self-check, and hand-built bitstreams for the paths the fixture
encoder never emits (LPC, rice escape partitions, wasted bits)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from harness_aws_etl_pipeline_spark.operators.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _write_coded_number,
    decode_flac,
    encode_flac,
    flac_meta,
)


class TestCrcAnchors:
    def test_crc8_standard_check_value(self):
        # CRC-8 poly 0x07, init 0: the canonical "123456789" check
        assert _crc8(b"123456789") == 0xF4

    def test_crc16_standard_check_value(self):
        # CRC-16/BUYPASS (poly 0x8005, init 0, no reflection) check
        assert _crc16(b"123456789") == 0xFEE8


class TestRoundTrips:
    def test_mono_fixed_orders(self):
        rng = np.random.default_rng(0)
        s = np.clip(np.cumsum(rng.integers(-50, 50, 5000)), -30000, 30000)
        data = encode_flac(s, 44100, 16, blocksize=1024)
        dec, rate, bps = decode_flac(data)
        assert rate == 44100 and bps == 16
        assert np.array_equal(dec[:, 0], s)
        assert len(data) < len(s) * 2  # actually compresses a ramp

    def test_stereo_independent_and_mid_side(self):
        rng = np.random.default_rng(1)
        l = np.clip(np.cumsum(rng.integers(-30, 30, 3000)), -20000, 20000)
        r = l + rng.integers(-5, 5, 3000)
        st = np.stack([l, r], axis=1)
        plain = encode_flac(st, 22050, 16, blocksize=512)
        ms = encode_flac(st, 22050, 16, blocksize=512, mid_side=True)
        assert np.array_equal(decode_flac(plain)[0], st)
        assert np.array_equal(decode_flac(ms)[0], st)
        # correlated stereo: mid/side strictly smaller
        assert len(ms) < len(plain)

    def test_constant_noise_odd_sizes_and_8bit(self):
        rng = np.random.default_rng(2)
        cases = [
            (np.full(1000, 123), 16),
            (rng.integers(-32000, 32000, 2000), 16),   # verbatim path
            (rng.integers(-128, 128, 777), 8),          # 8-bit, ragged tail
            (np.zeros(1, dtype=np.int64), 16),          # single sample
        ]
        for s, bps in cases:
            got, _, gbps = decode_flac(
                encode_flac(s, 8000, bps, blocksize=256)
            )
            assert gbps == bps
            assert np.array_equal(got[:, 0], s)

    def test_md5_digest_catches_corruption(self):
        s = np.clip(
            np.cumsum(np.random.default_rng(3).integers(-9, 9, 600)),
            -100, 100,
        )
        data = bytearray(encode_flac(s, 8000, 16, blocksize=200))
        with pytest.raises(ValueError, match="CRC|MD5"):
            # flip one audio byte: either a frame CRC or the stream
            # MD5 must catch it — silence is the only wrong answer
            data[-3] ^= 0x40
            decode_flac(bytes(data))

    def test_meta_probe(self):
        s = np.arange(500) % 100
        m = flac_meta(encode_flac(s, 32000, 16, blocksize=128))
        assert m["sample_rate"] == 32000
        assert m["channels"] == 1
        assert m["bits_per_sample"] == 16
        assert m["total_samples"] == 500
        assert m["max_blocksize"] == 128
        with pytest.raises(ValueError, match="fLaC"):
            flac_meta(b"RIFF....")

    def test_range_guard(self):
        with pytest.raises(ValueError, match="range"):
            encode_flac(np.array([200]), bits_per_sample=8)


class TestProperties:
    def test_encode_decode_round_trip_property(self):
        """Any int16 signal round-trips bit-exactly through the codec
        (the STREAMINFO MD5 check runs inside decode, so every example
        also re-verifies the spec's audio digest layout)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=25, deadline=None)
        @given(
            st.lists(
                st.integers(-(2**15), 2**15 - 1), min_size=1, max_size=700
            ),
            st.sampled_from([64, 192, 256]),
        )
        def check(samples, blocksize):
            s = np.array(samples, dtype=np.int64)
            got, _, _ = decode_flac(
                encode_flac(s, 8000, 16, blocksize=blocksize)
            )
            assert np.array_equal(got[:, 0], s)

        check()


class TestAudioDispatch:
    def test_decode_audio_wav_flac_equivalence(self):
        """The same 16-bit samples through WAV and FLAC containers
        decode to IDENTICAL frames via decode_audio — so every
        downstream consumer (audio_features, afp64 fingerprints,
        spectral front-end) treats the two containers as one format."""
        from harness_aws_etl_pipeline_spark.operators.multimodal import (
            decode_audio,
            encode_wav,
        )

        rng = np.random.default_rng(5)
        s = np.clip(
            np.cumsum(rng.integers(-200, 200, 4000)), -30000, 30000
        ).astype(np.int16)
        stereo = np.stack([s, (s // 2).astype(np.int16)], axis=1)
        wav = encode_wav(stereo, 16000)
        flac = encode_flac(
            stereo.astype(np.int64), 16000, 16, blocksize=1024, mid_side=True
        )
        fw, rw = decode_audio(wav)
        ff, rf = decode_audio(flac)
        assert rw == rf == 16000
        assert np.array_equal(fw, ff)

    def test_container_probe(self):
        from harness_aws_etl_pipeline_spark.operators.containers import (
            probe_container,
            sniff_container,
        )

        s = np.arange(8000) % 500
        data = encode_flac(s, 8000, 16)
        assert sniff_container(data) == "flac"
        m = probe_container(data)
        assert m["container"] == "flac" and m["codec"] == "flac"
        assert m["sample_rate"] == 8000 and m["duration_ms"] == 1000


def _handmade_stream(subframe_bits, blocksize, bps=8, rate=8000):
    """Minimal single-frame FLAC file around hand-written subframe
    bits — exercises decoder paths the fixture encoder never emits."""
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(0, 3)          # 1 channel
    si.write(bps - 1, 5)
    si.write(blocksize, 36)
    body = si.bytes() + b"\x00" * 16  # zero MD5 → digest check skipped
    out = bytearray(b"fLaC")
    out.append(0x80)
    out += len(body).to_bytes(3, "big")
    out += body

    bw = _BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(7, 4)   # 16-bit blocksize field
    bw.write(0, 4)   # rate from STREAMINFO
    bw.write(0, 4)   # 1 channel
    bw.write(0, 3)   # size from STREAMINFO
    bw.write(0, 1)
    for b in _write_coded_number(0):
        bw.write(b, 8)
    bw.write(blocksize - 1, 16)
    bw.align()
    header = bw.bytes()
    header += bytes([_crc8(header)])

    sub = _BitWriter()
    subframe_bits(sub)
    sub.align()
    frame = header + sub.bytes()
    frame += struct.pack(">H", _crc16(frame))
    return bytes(out + frame)


class TestHandmadeBitstreams:
    def test_lpc_subframe(self):
        """LPC order 1, coefficient 2, shift 1: s[i] = (2*s[i-1] >> 1)
        + e[i] — warmup 10, residuals +1,-2,+3 → 10, 11, 9, 12."""

        def bits(bw):
            bw.write(0, 1)
            bw.write(32 + 0, 6)   # LPC order 1 (100000 | order-1)
            bw.write(0, 1)        # no wasted bits
            bw.write(10, 8)       # warmup sample
            bw.write(4 - 1, 4)    # precision 4
            bw.write(1, 5)        # shift 1
            bw.write(2, 4)        # coefficient +2 (4-bit signed)
            bw.write(0, 2)        # rice method 0
            bw.write(0, 4)        # one partition
            bw.write(0, 4)        # rice param 0 → pure unary
            for e in (1, -2, 3):
                z = (e << 1) if e >= 0 else ((-e << 1) - 1)
                bw.write_unary(z)

        data = _handmade_stream(bits, blocksize=4)
        got, _, _ = decode_flac(data)
        assert got[:, 0].tolist() == [10, 11, 9, 12]

    def test_rice_escape_partition(self):
        """Escaped partition: 5-bit raw residuals instead of rice."""

        def bits(bw):
            bw.write(0, 1)
            bw.write(8, 6)        # FIXED order 0
            bw.write(0, 1)
            bw.write(0, 2)        # rice method 0
            bw.write(0, 4)        # one partition
            bw.write(0xF, 4)      # ESCAPE
            bw.write(5, 5)        # 5 raw bits per residual
            for v in (7, -8, 0, 15):
                bw.write(v & 0x1F, 5)

        data = _handmade_stream(bits, blocksize=4)
        got, _, _ = decode_flac(data)
        assert got[:, 0].tolist() == [7, -8, 0, 15]

    def test_wasted_bits(self):
        """wasted-bits=1 on a CONSTANT subframe: stored value is
        pre-shift, decoder restores the shift."""

        def bits(bw):
            bw.write(0, 1)
            bw.write(0, 6)        # CONSTANT
            bw.write(1, 1)        # wasted bits flag
            bw.write(1, 1)        # unary 0 → wasted = 1
            bw.write(21, 7)       # 8 - 1 effective bits

        data = _handmade_stream(bits, blocksize=3)
        got, _, _ = decode_flac(data)
        assert got[:, 0].tolist() == [42, 42, 42]

    def test_two_partition_residual(self):
        """Partition order 1: first partition excludes warmup."""

        def bits(bw):
            bw.write(0, 1)
            bw.write(9, 6)        # FIXED order 1
            bw.write(0, 1)
            bw.write(5, 8)        # warmup = 5
            bw.write(0, 2)
            bw.write(1, 4)        # partition order 1 → 2 partitions
            bw.write(0, 4)        # p0 rice param 0 (1 residual: 4/2-1)
            z = 2  # e=+1
            bw.write_unary(z)
            bw.write(0, 4)        # p1 rice param 0 (2 residuals)
            bw.write_unary(0)     # e=0
            bw.write_unary(1)     # e=-1... zigzag 1 → -1
        # samples: warmup 5; order-1 pred = prev: 5+1=6, 6+0=6, 6-1=5
        data = _handmade_stream(bits, blocksize=4)
        got, _, _ = decode_flac(data)
        assert got[:, 0].tolist() == [5, 6, 6, 5]

    def test_frame_crc_detects_bitflip(self):
        def bits(bw):
            bw.write(0, 1)
            bw.write(0, 6)
            bw.write(0, 1)
            bw.write(77, 8)

        data = bytearray(_handmade_stream(bits, blocksize=2))
        data[-3] ^= 0x01  # flip inside the subframe payload
        with pytest.raises(ValueError, match="CRC"):
            decode_flac(bytes(data))
