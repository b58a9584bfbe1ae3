"""Container probing: MP4 box walking, MP3 frame-header parsing,
unified magic-byte sniff + Arrow-batched probe_media_containers."""

import numpy as np
import pytest

from harness_aws_etl_pipeline_spark.operators.containers import (
    encode_mp3,
    encode_mp4,
    probe_container,
    probe_media_containers,
    probe_mp3,
    probe_mp4,
    sniff_container,
    synthesize_mp3_media,
    synthesize_mp4_media,
)
from harness_aws_etl_pipeline_spark.operators.gif import encode_gif
from harness_aws_etl_pipeline_spark.operators.jpeg import encode_jpeg
from harness_aws_etl_pipeline_spark.operators.multimodal import (
    encode_bmp,
    encode_png,
    encode_ppm,
    encode_wav,
)


class TestMp4:
    def test_round_trip_metadata(self):
        m = probe_mp4(encode_mp4(3500, 640, 360))
        assert m["duration_ms"] == 3500
        assert (m["width"], m["height"]) == (640, 360)
        assert m["n_tracks"] == 2
        assert m["brand"] == "isom"
        assert m["video_codec"] == "mp4v"
        assert m["audio_codec"] == "mp4a"

    def test_video_only_and_custom_codecs(self):
        m = probe_mp4(
            encode_mp4(90, 128, 96, video_codec=b"avc1", audio=False, brand=b"mp42")
        )
        assert m["n_tracks"] == 1
        assert m["video_codec"] == "avc1"
        assert m["audio_codec"] is None
        assert m["brand"] == "mp42"

    def test_truncated_payload_does_not_raise(self):
        full = encode_mp4(1000, 64, 48)
        for cut in (0, 4, 7, 20, len(full) // 2):
            probe_mp4(full[:cut])  # must parse what it can, no raise

    def test_largesize_box(self):
        # rewrite ftyp as a 64-bit-size box: walker must still find moov
        import struct

        full = encode_mp4(777, 32, 32)
        ftyp_size = struct.unpack_from(">I", full, 0)[0]
        body = full[8:ftyp_size]
        big = (
            struct.pack(">I", 1)
            + b"ftyp"
            + struct.pack(">Q", 16 + len(body))
            + body
            + full[ftyp_size:]
        )
        m = probe_mp4(big)
        assert m["duration_ms"] == 777 and m["brand"] == "isom"


class TestMp3:
    def test_cbr_exact_walk(self):
        # 10 frames MPEG-1 L3 @ 32 kHz: 1152/32000 = 36 ms per frame
        m = probe_mp3(encode_mp3(10))
        assert m["frames"] == 10
        assert m["duration_ms"] == 360
        assert m["sample_rate"] == 32000
        assert m["bitrate_kbps"] == 128
        assert m["channels"] == 2
        assert not m["vbr"]

    def test_id3v2_skip_and_xing(self):
        m = probe_mp3(encode_mp3(5, id3=b"x" * 300, xing_frames=250))
        assert m["id3v2_bytes"] == 310  # 10-byte header + 300 body
        assert m["frames"] == 250  # Xing total wins over the walk
        assert m["vbr"]
        assert m["duration_ms"] == 250 * 1152 * 1000 // 32000

    def test_44100_duration_floor(self):
        m = probe_mp3(encode_mp3(38, bitrate_kbps=192, sample_rate=44100))
        assert m["frames"] == 38
        assert m["duration_ms"] == 38 * 1152 * 1000 // 44100

    def test_garbage_before_first_sync_resyncs(self):
        m = probe_mp3(b"\x00" * 17 + encode_mp3(3))
        assert m["frames"] == 3

    def test_no_frames(self):
        m = probe_mp3(b"ID3" + bytes(7))
        assert m["frames"] == 0 and m["duration_ms"] is None


class TestSniffProbe:
    def test_sniffs_every_engine_format(self):
        arr = np.zeros((5, 7, 3), dtype=np.uint8)
        cases = {
            "mp4": encode_mp4(100, 16, 16),
            "mp3": encode_mp3(2),
            "wav": encode_wav(np.zeros(100, dtype=np.int16), 8000),
            "ppm": encode_ppm(arr),
            "png": encode_png(arr),
            "bmp": encode_bmp(arr),
            "gif": encode_gif([arr]),
            "jpeg": encode_jpeg(arr),
        }
        for want, payload in cases.items():
            assert sniff_container(payload) == want

    def test_probe_dims_and_durations(self):
        arr = np.zeros((5, 7, 3), dtype=np.uint8)
        for enc, name in [(encode_ppm, "ppm"), (encode_bmp, "bmp"), (encode_png, "png")]:
            r = probe_container(enc(arr))
            assert (r["container"], r["width"], r["height"]) == (name, 7, 5)
        r = probe_container(encode_jpeg(np.full((8, 16, 3), 128, dtype=np.uint8)))
        assert (r["width"], r["height"]) == (16, 8)
        r = probe_container(encode_gif([np.zeros((4, 6, 3), dtype=np.uint8)]))
        assert (r["width"], r["height"]) == (6, 4)
        r = probe_container(encode_wav(np.zeros(16000, dtype=np.int16), 16000))
        assert (r["duration_ms"], r["sample_rate"]) == (1000, 16000)

    def test_unknown_and_null_payloads(self):
        for payload in (b"garbage-bytes-here", b"", None, b"\x00\x01"):
            assert probe_container(payload)["container"] == "unknown"


class TestSparkProbe:
    @pytest.fixture()
    def docs(self, spark):
        return spark.range(1, 21).withColumnRenamed("id", "doc_id")

    def test_probe_media_containers_closed_forms(self, spark, docs):
        rows = {
            r["media_id"]: r
            for r in probe_media_containers(synthesize_mp4_media(docs)).collect()
        }
        assert len(rows) == 20
        for mid, r in rows.items():
            assert r["container"] == "mp4"
            assert r["duration_ms"] == 500 + mid % 1000
            assert r["width"] == 16 * (1 + mid % 32)
            assert r["height"] == 16 * (1 + mid % 18)
            assert r["n_tracks"] == 2
            assert r["codec"] == "mp4v"

    def test_probe_mixed_modalities_one_pass(self, spark, docs):
        mixed = synthesize_mp3_media(docs.limit(5)).unionByName(
            synthesize_mp4_media(docs.limit(5))
        )
        got = probe_media_containers(mixed).groupBy("container").count().collect()
        assert {r["container"]: r["count"] for r in got} == {"mp3": 5, "mp4": 5}

    def test_probe_prunes_payload_from_plan_tail(self, spark, docs):
        # the probe output is narrow: grouping it must not re-read payloads
        out = probe_media_containers(synthesize_mp3_media(docs))
        agg = out.groupBy("container").agg({"duration_ms": "sum"})
        rows = agg.collect()
        assert rows[0]["sum(duration_ms)"] == sum(
            36 * (10 + mid % 20) for mid in range(1, 21)
        )


class TestAviProbe:
    def test_sniff_and_probe_avi(self):
        import numpy as np

        from harness_aws_etl_pipeline_spark.operators.containers import (
            probe_container,
            sniff_container,
        )
        from harness_aws_etl_pipeline_spark.operators.video import (
            encode_avi_mjpeg,
        )

        avi = encode_avi_mjpeg(
            [np.full((6, 10, 3), 5, np.uint8)] * 4, fps=2
        )
        assert sniff_container(avi) == "avi"
        got = probe_container(avi)
        assert got["container"] == "avi"
        assert (got["width"], got["height"]) == (10, 6)
        assert got["duration_ms"] == 2000  # 4 frames at 2 fps
        assert got["codec"] == "mjpg"

    def test_jpeg_codec_distinguishes_progressive(self):
        import numpy as np

        from harness_aws_etl_pipeline_spark.operators.containers import (
            probe_container,
        )
        from harness_aws_etl_pipeline_spark.operators.jpeg import (
            encode_jpeg,
            encode_jpeg_progressive,
        )

        img = np.full((6, 10, 3), 5, np.uint8)
        assert probe_container(encode_jpeg(img))["codec"] == "jpeg-baseline"
        assert (
            probe_container(encode_jpeg_progressive(img))["codec"]
            == "jpeg-progressive"
        )
