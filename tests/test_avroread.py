"""Avro OCF source (sources/avroread.py): binary-layer round trips,
container framing (blocks, sync markers, deflate), schema mapping to
Spark types, nullable unions, permissive corruption isolation, and
guard behavior for general unions / foreign codecs."""

from __future__ import annotations

import json

import pytest

from harness_aws_etl_pipeline_spark.sources.avroread import (
    avro_spark_schema,
    read_avro,
    write_avro_bytes,
)

SCHEMA = json.dumps({
    "type": "record", "name": "Doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "flags", "type": {"type": "array", "items": "int"}},
        {"name": "props", "type": {"type": "map", "values": "string"}},
        {"name": "kind", "type": {"type": "enum", "name": "K",
                                  "symbols": ["A", "B", "C"]}},
        {"name": "sig", "type": {"type": "fixed", "name": "Sig", "size": 4}},
        {"name": "ok", "type": "boolean"},
    ],
})

RECORDS = [
    {"id": 1, "text": "hello", "score": 1.5, "flags": [1, 2, 3],
     "props": {"a": "x"}, "kind": "A", "sig": b"\x01\x02\x03\x04",
     "ok": True},
    {"id": 2, "text": None, "score": -0.25, "flags": [],
     "props": {}, "kind": "C", "sig": b"\xff\x00\xff\x00", "ok": False},
    {"id": 3, "text": "third", "score": 2.0, "flags": [7],
     "props": {"k1": "v1", "k2": "v2"}, "kind": "B",
     "sig": b"abcd", "ok": True},
]


class TestSchemaMapping:
    def test_spark_schema(self):
        s = avro_spark_schema(SCHEMA)
        d = {f.name: (f.dataType.simpleString(), f.nullable) for f in s.fields}
        assert d["id"][0] == "bigint"
        assert d["text"] == ("string", True)
        assert d["flags"][0] == "array<int>"
        assert d["props"][0] == "map<string,string>"
        assert d["kind"][0] == "string"
        assert d["sig"][0] == "binary"

    def test_general_union_mappings(self):
        """Round-10: general unions map per the spark-avro policy —
        numeric widening, struct-of-branches otherwise."""
        sch = json.dumps({
            "type": "record", "name": "R",
            "fields": [
                {"name": "il", "type": ["int", "long"]},
                {"name": "fd", "type": ["null", "float", "double"]},
                {"name": "u", "type": ["int", "string"]},
                {"name": "nu", "type": ["null", "string", "boolean"]},
            ],
        })
        s = avro_spark_schema(sch)
        d = {f.name: (f.dataType.simpleString(), f.nullable) for f in s.fields}
        assert d["il"][0] == "bigint"
        assert d["fd"] == ("double", True)
        assert d["u"][0] == "struct<member0:int,member1:string>"
        assert d["nu"] == ("struct<member0:string,member1:boolean>", True)


class TestReadRoundTrip:
    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_codecs_and_blocks(self, spark, tmp_path, codec):
        # block_size=2 over 3 records → two blocks + sync walks
        blob = write_avro_bytes(SCHEMA, RECORDS, codec=codec, block_size=2)
        (tmp_path / "part-0.avro").write_bytes(blob)
        df = read_avro(spark, str(tmp_path))
        rows = {r.id: r for r in df.collect()}
        assert set(rows) == {1, 2, 3}
        assert rows[1].text == "hello" and rows[2].text is None
        assert rows[3].props == {"k1": "v1", "k2": "v2"}
        assert list(rows[1].flags) == [1, 2, 3]
        assert rows[2].kind == "C"
        assert bytes(rows[3].sig) == b"abcd"
        assert rows[2].ok is False
        assert abs(rows[2].score + 0.25) < 1e-12

    def test_multiple_files(self, spark, tmp_path):
        (tmp_path / "a.avro").write_bytes(
            write_avro_bytes(SCHEMA, RECORDS[:2])
        )
        (tmp_path / "b.avro").write_bytes(
            write_avro_bytes(SCHEMA, RECORDS[2:])
        )
        assert read_avro(spark, str(tmp_path)).count() == 3

    def test_permissive_isolates_corrupt_file(self, spark, tmp_path):
        (tmp_path / "good.avro").write_bytes(
            write_avro_bytes(SCHEMA, RECORDS[:1])
        )
        (tmp_path / "bad.avro").write_bytes(b"Obj\x01" + b"\x99" * 20)
        df = read_avro(spark, str(tmp_path), permissive=True)
        good = df.filter("_corrupt_avro_file IS NULL").collect()
        bad = df.filter("_corrupt_avro_file IS NOT NULL").collect()
        assert len(good) == 1 and good[0].id == 1
        assert len(bad) == 1 and "bad.avro" in bad[0]._corrupt_avro_file
        # strict mode raises instead
        with pytest.raises(Exception, match="Avro"):
            read_avro(spark, str(tmp_path)).count()

    def test_general_union_read(self, spark, tmp_path):
        """End-to-end general-union decode: int-vs-string branch rows
        land in the right struct member; numeric unions widen."""
        sch = json.dumps({
            "type": "record", "name": "R",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "u", "type": ["null", "int", "string"]},
                {"name": "n", "type": ["int", "long"]},
            ],
        })
        recs = [
            {"id": 1, "u": 5, "n": 7},
            {"id": 2, "u": "five", "n": 2**40},
            {"id": 3, "u": None, "n": 0},
        ]
        (tmp_path / "u.avro").write_bytes(write_avro_bytes(sch, recs))
        df = read_avro(spark, str(tmp_path))
        rows = {r.id: r for r in df.collect()}
        assert rows[1].u.member0 == 5 and rows[1].u.member1 is None
        assert rows[2].u.member1 == "five" and rows[2].u.member0 is None
        assert rows[3].u is None
        assert rows[2].n == 2**40 and rows[1].n == 7
        assert dict(df.dtypes)["n"] == "bigint"

    def test_permissive_isolates_truncated_double(self, spark, tmp_path):
        """Round-10: a block whose stated size is consistent but whose
        content leaves fewer than 8 bytes for a double raises
        struct.error (not a ValueError subclass) — permissive mode
        must isolate it to a NULL row, not fail the whole scan."""
        schema = json.dumps({
            "type": "record", "name": "r",
            "fields": [{"name": "s", "type": "string"},
                       {"name": "d", "type": "double"}],
        })
        header = write_avro_bytes(schema, [])
        sync = header[-16:]
        # count=1, size=4, then a 1-char string + only 2 bytes where
        # the 8-byte double should be
        lying = header + b"\x02\x08" + b"\x02a\x00\x00" + sync
        good = write_avro_bytes(schema, [{"s": "ok", "d": 1.5}])
        (tmp_path / "good.avro").write_bytes(good)
        (tmp_path / "bad.avro").write_bytes(lying)
        df = read_avro(spark, str(tmp_path), permissive=True)
        rows = df.collect()
        assert len(rows) == 2
        bad = [r for r in rows if r._corrupt_avro_file is not None]
        assert len(bad) == 1 and "bad.avro" in bad[0]._corrupt_avro_file

    def test_timestamps_are_utc_instants_in_any_session_zone(
        self, spark, tmp_path
    ):
        """Round-10: Avro timestamps are UTC instants; the stored
        instant must survive a non-UTC spark.sql.session.timeZone
        (naive datetimes would shift by the UTC offset)."""
        from pyspark.sql import functions as F

        schema = json.dumps({
            "type": "record", "name": "e",
            "fields": [{"name": "ts", "type": {
                "type": "long", "logicalType": "timestamp-micros"}}],
        })
        raw = 1_700_000_000_000_000
        (tmp_path / "t.avro").write_bytes(
            write_avro_bytes(schema, [{"ts": raw}])
        )
        prev = spark.conf.get("spark.sql.session.timeZone")
        try:
            for zone in ("UTC", "America/New_York", "Asia/Tokyo"):
                spark.conf.set("spark.sql.session.timeZone", zone)
                got = (
                    read_avro(spark, str(tmp_path))
                    .select(F.unix_micros("ts").alias("m"))
                    .collect()[0]
                    .m
                )
                assert got == raw, zone
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)

    def test_guards(self, spark, tmp_path):
        with pytest.raises(ValueError, match="no Avro files"):
            read_avro(spark, str(tmp_path))
        blob = write_avro_bytes(SCHEMA, RECORDS[:1], codec="null")
        # foreign codec in metadata (key + zigzag len 4 + value)
        assert b"avro.codec\x08null" in blob
        bad = blob.replace(b"avro.codec\x08null", b"avro.codec\x08zstd")
        (tmp_path / "z.avro").write_bytes(bad)
        with pytest.raises(Exception, match="codec"):
            read_avro(spark, str(tmp_path)).count()


class TestReadersIntegration:
    def test_read_file_dispatch(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.readers import (
            detect_format,
            read_file,
        )

        p = tmp_path / "data.avro"
        p.write_bytes(write_avro_bytes(SCHEMA, RECORDS))
        assert detect_format(str(p)) == "avro"
        df = read_file(spark, str(p))
        assert df.count() == 3
        assert {r.id for r in df.collect()} == {1, 2, 3}


class TestLogicalTypes:
    def test_date_timestamp_decimal_uuid(self, spark, tmp_path):
        import datetime as dt
        from decimal import Decimal

        schema = json.dumps({
            "type": "record", "name": "Evt",
            "fields": [
                {"name": "d", "type": {"type": "int",
                                       "logicalType": "date"}},
                {"name": "ts", "type": {"type": "long",
                                        "logicalType": "timestamp-micros"}},
                {"name": "tsm", "type": {"type": "long",
                                         "logicalType": "timestamp-millis"}},
                {"name": "amt", "type": {"type": "bytes",
                                         "logicalType": "decimal",
                                         "precision": 10, "scale": 2}},
                {"name": "afx", "type": {"type": "fixed", "name": "D8",
                                         "size": 3,
                                         "logicalType": "decimal",
                                         "precision": 6, "scale": 3}},
                {"name": "u", "type": {"type": "string",
                                       "logicalType": "uuid"}},
            ],
        })
        # writer takes the UNDERLYING primitives; reader converts
        recs = [{
            "d": 19723,                        # 2024-01-01
            "ts": 1_700_000_000_000_000,       # 2023-11-14T22:13:20
            "tsm": 86_400_000,                 # 1970-01-02
            "amt": (12345).to_bytes(3, "big", signed=True),   # 123.45
            "afx": (-1500).to_bytes(3, "big", signed=True),   # -1.500
            "u": "0000-1111",
        }]
        (tmp_path / "e.avro").write_bytes(write_avro_bytes(schema, recs))
        df = read_avro(spark, str(tmp_path))
        d = {f[0]: f[1] for f in df.dtypes}
        assert d == {
            "d": "date", "ts": "timestamp", "tsm": "timestamp",
            "amt": "decimal(10,2)", "afx": "decimal(6,3)", "u": "string",
        }
        r = df.collect()[0]
        assert r.d == dt.date(2024, 1, 1)
        assert r.ts == dt.datetime(2023, 11, 14, 22, 13, 20)
        assert r.tsm == dt.datetime(1970, 1, 2)
        assert r.amt == Decimal("123.45")
        assert r.afx == Decimal("-1.500")
        assert r.u == "0000-1111"


class TestLogicalEncode:
    """Round 13: the binary encoder's logical-type write path — the
    mirror of _logical's read conversions."""

    def test_encode_decode_round_trip(self):
        import datetime
        import decimal
        import io
        import json

        from harness_aws_etl_pipeline_spark.sources.avroread import (
            _collect_names,
            _decode,
            _encode,
        )

        schema = {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "d", "type": ["null", {"type": "int", "logicalType": "date"}]},
                {"name": "ts", "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}]},
                {"name": "tm", "type": ["null", {"type": "long", "logicalType": "timestamp-millis"}]},
                {"name": "amt", "type": ["null", {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 3}]},
            ],
        }
        names: dict = {}
        _collect_names(schema, names)
        rec = {
            "d": datetime.date(2024, 2, 29),
            "ts": datetime.datetime(
                2024, 3, 1, 1, 2, 3, 456789, tzinfo=datetime.timezone.utc
            ),
            "tm": datetime.datetime(1969, 12, 31, 23, 59, 59, 999000),
            "amt": decimal.Decimal("-123.456"),
        }
        out = bytearray()
        _encode(schema, rec, out, names)
        back = _decode(schema, io.BytesIO(bytes(out)), names)
        assert back["d"] == rec["d"]
        assert back["ts"] == rec["ts"]
        # naive input is treated as UTC wall time; decode returns aware
        assert back["tm"] == rec["tm"].replace(
            tzinfo=datetime.timezone.utc
        )
        assert back["amt"] == rec["amt"]
        # nulls pass through every branch
        out2 = bytearray()
        _encode(schema, {"d": None, "ts": None, "tm": None, "amt": None}, out2, names)
        back2 = _decode(schema, io.BytesIO(bytes(out2)), names)
        assert back2 == {"d": None, "ts": None, "tm": None, "amt": None}
