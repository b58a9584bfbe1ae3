"""Deletion-vector codec (sources/dvcodec.py): Z85 spec vectors,
roaring container kinds (array / bitmap / run, both cookies), 64-bit
bucket split, .bin file framing + checksum."""

from __future__ import annotations

import struct

import pytest

from harness_aws_etl_pipeline_spark.sources.dvcodec import (
    DV_MAGIC,
    decode_dv_blob,
    encode_dv_blob,
    frame_dv_file,
    read_dv_from_file_bytes,
    z85_decode,
    z85_encode,
)


class TestZ85:
    def test_spec_vector(self):
        # the ZeroMQ spec32 reference vector
        raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
        assert z85_encode(raw) == "HelloWorld"
        assert z85_decode("HelloWorld") == raw

    def test_round_trip_all_byte_values(self):
        data = bytes(range(256)) * 2  # 512 bytes, multiple of 4
        assert z85_decode(z85_encode(data)) == data

    def test_rejects_bad_lengths_and_chars(self):
        with pytest.raises(ValueError, match="multiple of 4"):
            z85_encode(b"abc")
        with pytest.raises(ValueError, match="multiple of 5"):
            z85_decode("abcd")
        with pytest.raises(ValueError, match="invalid z85"):
            z85_decode('"""""')


class TestRoaringRoundTrip:
    @pytest.mark.parametrize(
        "indexes",
        [
            [],
            [0],
            [0, 1, 2, 65535, 65536, 131071],        # two 16-bit containers
            list(range(0, 20000, 3)),                # array containers
            list(range(5000)),                       # bitmap container (>4096)
            [2**32 - 1, 2**32, 2**33 + 7],           # multiple 64-bit buckets
            [5, 2**40, 2**40 + 1],
        ],
    )
    def test_encode_decode_identity(self, indexes):
        assert decode_dv_blob(encode_dv_blob(indexes)) == sorted(set(indexes))

    def test_magic_checked(self):
        blob = bytearray(encode_dv_blob([1, 2, 3]))
        blob[0] ^= 0xFF
        with pytest.raises(ValueError, match="magic"):
            decode_dv_blob(bytes(blob))

    def test_trailing_bytes(self):
        # up to 3 trailing ZERO bytes are z85 padding — accepted
        assert decode_dv_blob(encode_dv_blob([1]) + b"\x00" * 3) == [1]
        # 4+ bytes, or non-zero tails, are corruption
        with pytest.raises(ValueError, match="trailing"):
            decode_dv_blob(encode_dv_blob([1]) + b"\x00" * 4)
        with pytest.raises(ValueError, match="trailing"):
            decode_dv_blob(encode_dv_blob([1]) + b"\x07")

    def test_run_container_decodes(self):
        """Hand-crafted RUN container (SERIAL_COOKIE layout) — runs
        [3..6] and [10..10] in bucket 0 → {3,4,5,6,10}. The encoder
        never emits runs; real JVM writers can, so the decoder must."""
        # 32-bit bitmap: cookie 12347 | (n_containers-1)<<16, run
        # bitset 0b1 (container 0 is run), descriptive header
        # (key=0, card-1=4), then runs: n_runs=2, (3,3), (10,0)
        rb = struct.pack("<i", 12347 | (0 << 16))
        rb += bytes([0b1])
        rb += struct.pack("<HH", 0, 4)
        # < NO_OFFSET_THRESHOLD containers with run cookie → no offsets
        rb += struct.pack("<H", 2) + struct.pack("<HH", 3, 3) + struct.pack("<HH", 10, 0)
        blob = struct.pack("<iq", DV_MAGIC, 1) + struct.pack("<i", 0) + rb
        assert decode_dv_blob(blob) == [3, 4, 5, 6, 10]


class TestProperties:
    def test_roaring_round_trip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=60, deadline=None)
        @given(
            st.lists(
                st.one_of(
                    st.integers(0, 2**16),          # dense low range
                    st.integers(0, 2**33),          # crosses buckets
                ),
                max_size=300,
            )
        )
        def check(indexes):
            assert decode_dv_blob(encode_dv_blob(indexes)) == sorted(
                set(indexes)
            )

        check()

    def test_z85_round_trip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=60, deadline=None)
        @given(st.binary(max_size=64).map(lambda b: b + b"\x00" * ((-len(b)) % 4)))
        def check(data):
            assert z85_decode(z85_encode(data)) == data

        check()


class TestFileFraming:
    def test_frame_and_read_back_multiple(self):
        b1 = encode_dv_blob([1, 5, 9])
        b2 = encode_dv_blob(list(range(100)))
        data, offsets = frame_dv_file([b1, b2])
        assert data[0] == 1  # format version byte
        assert read_dv_from_file_bytes(data, offsets[0], len(b1)) == [1, 5, 9]
        assert read_dv_from_file_bytes(data, offsets[1], len(b2)) == list(range(100))

    def test_checksum_and_size_verified(self):
        b1 = encode_dv_blob([7])
        data, offsets = frame_dv_file([b1])
        corrupted = bytearray(data)
        corrupted[-5] ^= 0xFF  # flip a blob byte, keep the stored CRC
        with pytest.raises(ValueError, match="checksum"):
            read_dv_from_file_bytes(bytes(corrupted), offsets[0], len(b1))
        with pytest.raises(ValueError, match="size mismatch"):
            read_dv_from_file_bytes(data, offsets[0], len(b1) + 4)
        with pytest.raises(ValueError, match="version"):
            read_dv_from_file_bytes(b"\x02" + data[1:], offsets[0], len(b1))
