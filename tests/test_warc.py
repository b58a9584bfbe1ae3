"""WARC source: record parsing, gzip members, HTTP envelope split,
Spark read path, end-to-end chain into html/urlops."""

import gzip

import pytest

from harness_aws_etl_pipeline_spark.sources.warc import (
    build_warc,
    http_response,
    parse_warc,
    read_warc,
)

HTML_A = b"<html><head><title>A</title></head><body><p>alpha page</p></body></html>"
HTML_B = b"<html><body><p>beta page</p></body></html>"


def _records():
    return [
        {"type": "warcinfo", "payload": b"software: test-harness\r\n"},
        {
            "type": "request",
            "uri": "https://a.com/x",
            "payload": b"GET /x HTTP/1.1\r\nHost: a.com\r\n\r\n",
        },
        {
            "type": "response",
            "uri": "https://a.com/x",
            "payload": http_response(HTML_A),
        },
        {
            "type": "response",
            "uri": "https://WWW.B.com/y?utm_source=z",
            "payload": http_response(HTML_B, status=404),
        },
    ]


class TestParse:
    def test_plain_and_per_record_gzip_roundtrip(self):
        for gz in (False, True):
            recs = list(parse_warc(build_warc(_records(), per_record_gzip=gz)))
            assert [r["headers"]["warc-type"] for r in recs] == [
                "warcinfo", "request", "response", "response",
            ]
            assert recs[2]["headers"]["warc-target-uri"] == "https://a.com/x"
            assert recs[2]["payload"] == http_response(HTML_A)

    def test_whole_file_gzip(self):
        data = gzip.compress(build_warc(_records()))
        assert len(list(parse_warc(data))) == 4

    def test_truncated_tail_stops_cleanly(self):
        data = build_warc(_records())
        assert len(list(parse_warc(data[: len(data) - 40]))) == 3

    def test_binary_payload_with_crlf_survives(self):
        # Content-Length framing, not delimiter scanning: a payload
        # containing \r\n\r\n must not split the record
        body = b"AB\r\n\r\nCD" * 10
        recs = list(
            parse_warc(
                build_warc([{"type": "resource", "uri": "u", "payload": body}])
            )
        )
        assert recs[0]["payload"] == body


class TestSparkRead:
    @pytest.fixture()
    def warc_dir(self, tmp_path):
        (tmp_path / "a.warc").write_bytes(build_warc(_records()))
        (tmp_path / "b.warc.gz").write_bytes(
            build_warc(_records(), per_record_gzip=True)
        )
        return str(tmp_path)

    def test_responses_with_http_split(self, spark, warc_dir):
        df = read_warc(spark, warc_dir)
        rows = df.collect()
        assert len(rows) == 4  # 2 responses per file × 2 files
        by_uri = {}
        for r in rows:
            by_uri.setdefault(r["target_uri"], []).append(r)
        a = by_uri["https://a.com/x"][0]
        assert a["http_status"] == 200
        assert a["content_type"] == "text/html"
        assert bytes(a["payload"]) == HTML_A
        assert a["payload_length"] == len(HTML_A)
        b = by_uri["https://WWW.B.com/y?utm_source=z"][0]
        assert b["http_status"] == 404

    def test_all_record_types(self, spark, warc_dir):
        df = read_warc(spark, warc_dir, record_types=())
        got = {
            r["record_type"]: r["count"]
            for r in df.groupBy("record_type").count().collect()
        }
        assert got == {"warcinfo": 2, "request": 2, "response": 4}

    def test_chain_into_html_and_urlops(self, spark, warc_dir):
        # the end-to-end web path: WARC -> html_to_text -> URL keying
        from pyspark.sql import functions as F

        from harness_aws_etl_pipeline_spark.operators.html import html_to_text
        from harness_aws_etl_pipeline_spark.operators.urlops import (
            add_url_columns,
        )

        docs = (
            read_warc(spark, warc_dir)
            .filter(F.col("http_status") == 200)
            .select(
                F.col("target_uri").alias("url"),
                html_to_text(F.col("payload").cast("string")).alias("text"),
            )
        )
        out = add_url_columns(docs).collect()
        assert all(r["url_host"] == "a.com" for r in out)
        # title text stays inline ahead of the body text
        assert all(r["text"] == "A alpha page" for r in out)


class TestStreaming:
    def test_filelike_input_streams_lazily(self):
        import io

        # a file-like input is consumed incrementally: after yielding
        # the first record, the reader must not have slurped the rest
        data = build_warc(_records())

        class Meter(io.BytesIO):
            def __init__(self, b):
                super().__init__(b)
                self.reads = 0

            def read(self, n=-1):
                self.reads += 1
                return super().read(n)

        m = Meter(data)
        gen = parse_warc(m)
        first = next(gen)
        assert first["headers"]["warc-type"] == "warcinfo"
        rest = list(gen)
        assert len(rest) == 3

    def test_gzip_member_stream_equivalent(self):
        plain = list(parse_warc(build_warc(_records())))
        gz = list(parse_warc(build_warc(_records(), per_record_gzip=True)))
        assert [(r["headers"]["warc-type"], r["payload"]) for r in plain] == [
            (r["headers"]["warc-type"], r["payload"]) for r in gz
        ]

    def test_header_block_limit_stops_scan(self):
        # a "record" whose header block never terminates (no CRLFCRLF
        # within the 1 MiB lookahead) must stop cleanly
        junk = b"WARC/1.0\r\n" + b"X: y\r\n" * 300_000
        assert list(parse_warc(junk)) == []


class TestWet:
    def test_read_wet_conversion_records(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.sources.warc import build_warc, read_wet

        recs = [
            {"type": "warcinfo", "payload": b"software: x\r\n"},
            {"type": "conversion", "uri": "https://a.com/1",
             "payload": "extracted text one — unicode".encode()},
            {"type": "conversion", "uri": "https://a.com/2",
             "payload": b"extracted text two"},
            {"type": "response", "uri": "https://a.com/raw",
             "payload": b"HTTP/1.1 200 OK\r\n\r\n<html></html>"},
        ]
        p = tmp_path / "f.warc.wet.gz"
        p.write_bytes(build_warc(recs, per_record_gzip=True))
        got = {r["target_uri"]: r["text"]
               for r in read_wet(spark, str(tmp_path)).collect()}
        # conversion records only — warcinfo and the raw response dropped
        assert got == {"https://a.com/1": "extracted text one — unicode",
                       "https://a.com/2": "extracted text two"}
