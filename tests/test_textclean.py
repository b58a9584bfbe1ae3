"""Text normalization (operators/textclean.py).  All non-ASCII test
characters are written as explicit escapes — invisible codepoints in
source literals are exactly the ambiguity this operator removes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.textclean import (
    clean_text,
    normalize_unicode,
)


class TestCleanText:
    def test_strips_controls_and_folds_whitespace(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a\x00b\x01c"),
                (2, "tabs\tand\nnewlines\r\nfolded"),
                (3, " nbsp and em-space "),
                (4, "zero\u200bwidth\ufeffgone\u00ad"),
                (5, None),
            ],
            "id long, text string",
        )
        got = {r.id: r.c for r in df.select("id", clean_text("text").alias("c")).collect()}
        assert got[1] == "abc"
        assert got[2] == "tabs and newlines folded"
        assert got[3] == "nbsp and em-space"
        assert got[4] == "zerowidthgone"
        assert got[5] is None

    def test_lowercase_option(self, spark):
        df = spark.createDataFrame([(1, "  MiXeD  CaSe ")], "id long, text string")
        row = df.select(clean_text("text", lowercase=True).alias("c")).collect()[0]
        assert row.c == "mixed case"


class TestNormalizeUnicode:
    def test_nfkc_composes_and_folds_compat(self, spark):
        df = spark.createDataFrame(
            [
                (1, "café"),       # e + combining acute -> \xe9
                (2, "\ufb01le"),    # fi ligature -> fi
                (3, "half space"),  # NBSP -> space under NFKC
                (4, None),
            ],
            "id long, text string",
        )
        got = {r.id: r.text for r in normalize_unicode(df).collect()}
        assert got[1] == "caf\xe9"
        assert got[2] == "file"
        assert got[3] == "half space"
        assert got[4] is None

    def test_out_col_keeps_original(self, spark):
        df = spark.createDataFrame([(1, "\ufb01x")], "id long, text string")
        out = normalize_unicode(df, out_col="norm").collect()[0]
        assert out.text == "\ufb01x" and out.norm == "fix"

    def test_form_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "id long, text string")
        with pytest.raises(ValueError, match="form"):
            normalize_unicode(df, form="NFZ")

    def test_composition_order_nfkc_then_clean(self, spark):
        # NFKC maps NBSP to a plain space; clean_text then folds the
        # resulting run to one separator
        df = spark.createDataFrame(
            [(1, "a  b")], "id long, text string"
        )
        out = normalize_unicode(df).select(clean_text("text").alias("c")).collect()[0]
        assert out.c == "a b"

    def test_identical_after_normalization_dedup(self, spark):
        # the reason this pass exists: composed vs decomposed text must
        # hash identically after normalization
        df = spark.createDataFrame(
            [(1, "caf\xe9"), (2, "café")], "id long, text string"
        )
        n = normalize_unicode(df)
        assert n.select(F.md5("text")).distinct().count() == 1


class TestDecodeText:
    def _decode(self, spark, rows):
        from harness_aws_etl_pipeline_spark.operators.textclean import decode_text

        df = spark.createDataFrame(rows, "rid int, payload binary, content_type string")
        return {r["rid"]: r["text"] for r in decode_text(df).collect()}

    def test_priority_chain(self, spark):
        got = self._decode(spark, [
            # BOM wins even over a lying header
            (1, b"\xef\xbb\xbfh\xc3\xa9llo", "text/html; charset=latin-1"),
            # header charset decodes windows-1252 é (0xe9)
            (2, b"caf\xe9", "text/plain; charset=windows-1252"),
            # meta-tag sniff: koi8-r bytes for русское "да"
            (3, b'<meta charset="koi8-r"><p>\xc4\xc1</p>', "text/html"),
            # plain valid utf-8, no hints
            (4, "héllo".encode(), None),
            # invalid utf-8 without hints -> latin-1 byte-transparent
            (5, b"caf\xe9", None),
            # unknown charset name falls through to utf-8/latin-1
            (6, b"abc", "text/html; charset=no-such-enc"),
            (7, None, "text/html"),
        ])
        assert got[1] == "héllo"
        assert got[2] == "café"
        assert "да" in got[3]
        assert got[4] == "héllo"
        assert got[5] == "café"
        assert got[6] == "abc"
        assert got[7] is None

    def test_chains_from_warc(self, spark, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.textclean import decode_text
        from harness_aws_etl_pipeline_spark.sources.warc import (
            build_warc, http_response, read_warc,
        )

        p = tmp_path / "x.warc"
        p.write_bytes(build_warc([{
            "type": "response", "uri": "https://a.com/",
            "payload": http_response(
                "zoné".encode("latin-1"), content_type="text/html; charset=latin-1"
            ),
        }]))
        row = decode_text(read_warc(spark, str(tmp_path))).first()
        assert row["text"] == "zoné"
