"""MJPG AVI video (operators/video.py): container round-trip, probe,
frame sampling, error contracts, and the Spark frame-feature face."""

from __future__ import annotations

import numpy as np
import pytest

from harness_aws_etl_pipeline_spark.operators.video import (
    decode_avi_frames,
    encode_avi_mjpeg,
    probe_avi,
    video_frame_features,
)


def _frames(levels, h=8, w=16):
    return [np.full((h, w, 3), v, np.uint8) for v in levels]


class TestContainer:
    def test_roundtrip_exact(self):
        frames = _frames([10, 200, 99])
        avi = encode_avi_mjpeg(frames, fps=5)
        out = decode_avi_frames(avi)
        assert len(out) == 3
        assert all(np.array_equal(a, b) for a, b in zip(out, frames))

    def test_probe(self):
        avi = encode_avi_mjpeg(_frames([1, 2], h=6, w=10), fps=25)
        got = probe_avi(avi)
        assert got == {
            "width": 10, "height": 6, "fps": 25, "frames": 2,
            "codec": "MJPG",
        }

    def test_sampling_and_cap(self):
        avi = encode_avi_mjpeg(_frames([0, 50, 100, 150, 200]))
        every2 = decode_avi_frames(avi, every_n=2)
        assert [int(a[0, 0, 0]) for a in every2] == [0, 100, 200]
        assert len(decode_avi_frames(avi, max_frames=2)) == 2

    def test_error_contracts(self):
        with pytest.raises(ValueError, match="RIFF"):
            probe_avi(b"not a container at all")
        with pytest.raises(ValueError, match="RIFF"):
            decode_avi_frames(b"junk")
        avi = encode_avi_mjpeg(_frames([7]))
        with pytest.raises(ValueError, match="truncated"):
            decode_avi_frames(avi[:-40] )
        with pytest.raises(ValueError):
            encode_avi_mjpeg([])
        with pytest.raises(ValueError):
            encode_avi_mjpeg(_frames([1]) + _frames([2], h=4), fps=10)
        with pytest.raises(ValueError):
            decode_avi_frames(avi, every_n=0)

    def test_progressive_frames_also_decode(self):
        """MJPG chunks are just JPEGs — a progressive frame rides the
        same path through the SOF2 decoder."""
        import struct

        from harness_aws_etl_pipeline_spark.operators.jpeg import (
            encode_jpeg_progressive,
        )

        prog = encode_jpeg_progressive(
            np.full((8, 16, 3), 33, np.uint8), quality=100
        )

        def chunk(fourcc, body):
            pad = b"\x00" if len(body) % 2 else b""
            return fourcc + struct.pack("<I", len(body)) + body + pad

        # splice the progressive payload into a fresh movi LIST,
        # keeping the original header LIST
        avi = encode_avi_mjpeg(_frames([33]))
        movi = chunk(b"LIST", b"movi" + chunk(b"00dc", prog))
        movi_at = avi.index(b"movi") - 8
        body = avi[12:movi_at] + movi
        riff = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
        out = decode_avi_frames(riff)
        assert len(out) == 1
        assert np.array_equal(out[0], np.full((8, 16, 3), 33, np.uint8))


class TestSparkFace:
    def test_frame_features_and_bad_payload(self, spark):
        rows = [
            (1, bytearray(encode_avi_mjpeg(_frames([10, 20])))),
            (2, bytearray(b"definitely not video")),
        ]
        df = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {
            (r["media_id"], r["frame_index"]): (
                r["width"], r["height"], r["mean"]
            )
            for r in video_frame_features(df).collect()
        }
        assert got[(1, 0)] == (16, 8, 10.0)
        assert got[(1, 1)] == (16, 8, 20.0)
        assert got[(2, -1)] == (None, None, None)

    def test_every_n_indexing(self, spark):
        avi = encode_avi_mjpeg(_frames([0, 50, 100, 150]))
        df = spark.createDataFrame(
            [(9, bytearray(avi))], "media_id long, payload binary"
        )
        got = sorted(
            (r["frame_index"], r["mean"])
            for r in video_frame_features(df, every_n=2).collect()
        )
        assert got == [(0, 0.0), (2, 100.0)]
