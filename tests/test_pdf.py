"""PDF text extraction (operators/pdf.py): writer↔extractor round
trips through real object/stream/xref machinery, a hand-built MODERN
layout (xref stream + ObjStm + PNG predictor), string/escape edge
cases, damaged-file fallback, guards, and the Spark face."""

from __future__ import annotations

import re
import struct  # noqa: F401 - parity with sibling codec tests
import zlib

import pytest

from harness_aws_etl_pipeline_spark.operators.pdf import (
    encode_pdf,
    pdf_extract_text,
    pdf_meta,
    pdf_to_documents,
)


def _modern_pdf(text: str, predictor: bool) -> bytes:
    """Hand-built PDF 1.5 layout: catalog/pages/page/font live in an
    OBJECT STREAM; the cross-reference is an XREF STREAM (W [1 2 1]),
    optionally through PNG predictor 12 (Up)."""
    content = b"BT /F1 11 Tf 50 750 Td (" + text.encode("latin-1") + b") Tj ET"

    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Count 1 /Kids [4 0 R] >>"),
        (3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
        (
            4,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>",
        ),
    ]
    body = bytearray()
    head_parts = []
    for num, data in inner:
        head_parts.append(b"%d %d" % (num, len(body)))
        body += data + b" "
    header = b" ".join(head_parts) + b" "
    objstm_payload = header + bytes(body)
    first = len(header)

    out = bytearray(b"%PDF-1.5\n")
    offsets = {}

    def put(num: int, raw: bytes) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + raw + b"\nendobj\n")

    put(5, b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream")
    stm = zlib.compress(objstm_payload)
    put(
        6,
        b"<< /Type /ObjStm /N 4 /First %d /Filter /FlateDecode /Length %d >>"
        b"\nstream\n" % (first, len(stm)) + stm + b"\nendstream",
    )

    # xref stream rows for objects 0..7 (W = [1 2 1])
    xref_at_placeholder = len(out)  # object 7 begins here
    rows = []
    rows.append(bytes([0]) + (0).to_bytes(2, "big") + bytes([255]))
    for i in range(4):  # 1..4 live in ObjStm 6 at index i
        rows.append(bytes([2]) + (6).to_bytes(2, "big") + bytes([i]))
    rows.append(bytes([1]) + offsets[5].to_bytes(2, "big") + bytes([0]))
    rows.append(bytes([1]) + offsets[6].to_bytes(2, "big") + bytes([0]))
    rows.append(bytes([1]) + xref_at_placeholder.to_bytes(2, "big") + bytes([0]))
    if predictor:
        # PNG Up filter rows (ft=2): row_i stored as delta vs row_{i-1}
        enc = bytearray()
        prev = bytes(4)
        for r in rows:
            enc.append(2)
            enc.extend((r[j] - prev[j]) & 0xFF for j in range(4))
            prev = r
        data = zlib.compress(bytes(enc))
        parms = b" /DecodeParms << /Predictor 12 /Columns 4 >>"
    else:
        data = zlib.compress(b"".join(rows))
        parms = b""
    put(
        7,
        b"<< /Type /XRef /Size 8 /W [1 2 1] /Root 1 0 R"
        + parms
        + b" /Filter /FlateDecode /Length %d >>\nstream\n" % len(data)
        + data
        + b"\nendstream",
    )
    assert offsets[7] == xref_at_placeholder
    out += b"startxref\n%d\n%%%%EOF\n" % offsets[7]
    return bytes(out)


class TestRoundTrips:
    PAGES = [
        "Hello world\nSecond line with (parens) and \\ backslash",
        "Page two text",
        "Latin-1: caf\xe9 r\xe9sum\xe9",
    ]

    def test_writer_extractor_roundtrip(self):
        for compress in (True, False):
            b = encode_pdf(self.PAGES, compress=compress)
            assert pdf_extract_text(b) == self.PAGES
            m = pdf_meta(b)
            assert m["pages"] == 3 and m["container"] == "pdf"
            assert m["compressed_objects"] == 0

    def test_many_pages_and_empty(self):
        pages = [f"page {i}" for i in range(20)] + [""]
        assert pdf_extract_text(encode_pdf(pages)) == pages

    def test_modern_layout_objstm_xrefstream(self):
        for predictor in (False, True):
            b = _modern_pdf("modern layout text", predictor)
            assert pdf_extract_text(b) == ["modern layout text"], predictor
            m = pdf_meta(b)
            assert m["pages"] == 1
            assert m["compressed_objects"] == 4  # catalog/pages/font/page


class TestStringsAndOps:
    def test_hex_strings_and_tj_array(self):
        content = (
            b"BT [<48656C6C6F> -120 (, ) 5 <776F726C64>] TJ ET"
        )
        raw = encode_pdf(["placeholder"], compress=False)
        # splice our content in place of the writer's
        m = re.search(rb"stream\n(.*?)\nendstream", raw, re.S)
        b = raw.replace(m.group(1), content).replace(
            b"/Length %d" % len(m.group(1)), b"/Length %d" % len(content)
        )
        assert pdf_extract_text(b) == ["Hello, world"]

    def test_octal_and_utf16(self):
        content = (
            b"BT (\\101\\102\\103) Tj T* "
            b"(\xfe\xff\x00H\x00i) Tj ET"
        )
        raw = encode_pdf(["x"], compress=False)
        m = re.search(rb"stream\n(.*?)\nendstream", raw, re.S)
        b = raw.replace(m.group(1), content).replace(
            b"/Length %d" % len(m.group(1)), b"/Length %d" % len(content)
        )
        assert pdf_extract_text(b) == ["ABC\nHi"]

    def test_quote_ops_newline(self):
        content = b"BT (a) Tj (b) ' (c) \" ET"
        raw = encode_pdf(["x"], compress=False)
        m = re.search(rb"stream\n(.*?)\nendstream", raw, re.S)
        b = raw.replace(m.group(1), content).replace(
            b"/Length %d" % len(m.group(1)), b"/Length %d" % len(content)
        )
        assert pdf_extract_text(b) == ["a\nb\nc"]


class TestRobustness:
    def test_damaged_xref_falls_back_to_scan(self):
        b = bytearray(encode_pdf(["salvage me"]))
        i = b.rfind(b"startxref")
        b[i : i + 9] = b"sturtxref"  # break the pointer, keep length
        assert pdf_extract_text(bytes(b)) == ["salvage me"]

    def test_not_a_pdf_and_encrypted(self):
        with pytest.raises(ValueError, match="PDF"):
            pdf_extract_text(b"GIF89a not a pdf")
        b = encode_pdf(["secret"])
        b = b.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
        with pytest.raises(ValueError, match="encrypted"):
            pdf_extract_text(b)

    def test_meta_shape(self):
        m = pdf_meta(encode_pdf(["a", "b"]))
        assert m == {
            "container": "pdf", "version": "1.4", "pages": 2,
            "objects": 7, "compressed_objects": 0, "encrypted": False,
        }


class TestSparkFace:
    def test_pdf_to_documents(self, spark):
        rows = [
            (1, bytearray(encode_pdf(["one page"]))),
            (2, bytearray(encode_pdf(["first", "second"]))),
            (3, bytearray(b"not a pdf at all")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {
            (r.doc_id, r.page): r.text
            for r in pdf_to_documents(df).collect()
        }
        assert got == {
            (1, 1): "one page",
            (2, 1): "first",
            (2, 2): "second",
            (3, 0): None,  # malformed → NULL row, batch survives
        }


class TestProbeAndCli:
    def test_container_probe_reports_pdf(self):
        from harness_aws_etl_pipeline_spark.operators.containers import (
            probe_container,
            sniff_container,
        )

        b = encode_pdf(["p1", "p2"])
        assert sniff_container(b) == "pdf"
        m = probe_container(b)
        assert (m["container"], m["n_tracks"], m["codec"]) == (
            "pdf", 2, "pdf-1.4",
        )

    def test_cli_pdf(self, spark, tmp_path, capsys):
        import json

        from harness_aws_etl_pipeline_spark.cli import main

        src = tmp_path / "pdfs.parquet"
        spark.createDataFrame(
            [
                (1, bytearray(encode_pdf(["alpha"]))),
                (2, bytearray(b"junk")),
            ],
            "doc_id long, payload binary",
        ).coalesce(1).write.parquet(str(src))
        out = tmp_path / "docs.parquet"
        rc = main([
            "pdf", "--input", str(src), "--output", str(out), "--show", "2",
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["pages"] == 1 and rep["failed_docs"] == 1
        assert spark.read.parquet(str(out)).count() == 2


class TestCorpusPrep:
    def test_prepare_corpus_pdf_front_end(self, spark):
        from harness_aws_etl_pipeline_spark.operators.corpus_pipeline import (
            prepare_corpus,
        )
        from harness_aws_etl_pipeline_spark.operators.pdf import (
            pdf_extract_column,
        )

        rows = [
            (1, bytearray(encode_pdf(["real text content here"]))),
            (2, bytearray(b"broken payload")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        # the 1:1 front-end alone: text + page count, NULL on junk
        got = {
            r.doc_id: (r.text, r.pdf_pages)
            for r in pdf_extract_column(df, "payload").collect()
        }
        assert got[1] == ("real text content here", 1)
        assert got[2] == (None, 0)
        # through prepare_corpus: pdf_extract runs FIRST and the
        # downstream stages score the extracted text — the junk row's
        # NULL text is dropped by the normalize stage's contract
        prepared, report = prepare_corpus(
            df,
            pdf_col="payload",
            normalize="NFKC",
        )
        stages = [r["stage"] for r in report]
        assert stages[0] == "pdf_extract"
        rows = {r.doc_id: r.text for r in prepared.collect()}
        assert rows[1] == "real text content here"
        # the malformed payload surfaced as NULL text, not a crash
        assert rows.get(2, None) in (None, "")


def _cid_pdf() -> bytes:
    """Hand-built PDF whose page font carries a ToUnicode CMap with
    2-byte codes (bfchar + both bfrange forms) — the subset-embedded
    font layout of real-world PDFs."""
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar\n"
        b"<0001> <0048>\n"          # H
        b"<0002> <0065>\n"          # e
        b"endbfchar\n"
        b"2 beginbfrange\n"
        b"<0010> <0012> <006C>\n"   # l l m  (increment form: l,m,n → use l..)
        b"<0020> <0021> [<00F6> <0021>]\n"  # ö !
        b"endbfrange\n"
        b"endcmap end\n"
    )
    content = b"BT /F1 11 Tf <00010002001000100020 0021> Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Count 1 /Kids [3 0 R] >>",
        3: (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 4 0 R >> >> /Contents 6 0 R >>"
        ),
        4: (
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Sub+Font "
            b"/ToUnicode 5 0 R >>"
        ),
        5: b"<< /Length %d >>\nstream\n" % len(cmap) + cmap + b"\nendstream",
        6: b"<< /Length %d >>\nstream\n" % len(content)
        + content
        + b"\nendstream",
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 7\n0000000000 65535 f \n"
    for num in range(1, 7):
        out += b"%010d 00000 n \n" % offsets[num]
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(out)


class TestToUnicode:
    def test_cid_font_cmap_decoding(self):
        # codes: 0001→H, 0002→e, 0010/0010→l l (bfrange increment),
        # 0020→ö (array form), 0021→!
        assert pdf_extract_text(_cid_pdf()) == ["Hellö!"]

    def test_cmap_parser_units(self):
        from harness_aws_etl_pipeline_spark.operators.pdf import _parse_cmap

        cmap, clen = _parse_cmap(
            b"1 beginbfchar <41> <0041> endbfchar\n"
            b"1 beginbfrange <61> <63> <0078> endbfrange\n"
        )
        assert clen == 1
        assert cmap[0x41] == "A"
        assert (cmap[0x61], cmap[0x62], cmap[0x63]) == ("x", "y", "z")
        # surrogate-pair destination (4-byte UTF-16BE)
        cmap2, clen2 = _parse_cmap(
            b"1 beginbfchar <0005> <D83DDE00> endbfchar"
        )
        assert clen2 == 2
        assert cmap2[5] == "\U0001f600"
