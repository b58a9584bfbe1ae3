"""OOXML extraction (operators/office.py): hand-built docx/pptx/xlsx
containers, namespace-agnostic parsing, cell/slide ordering, kind
sniffing, NULL isolation on the Spark face."""

from __future__ import annotations

import io
import zipfile

import pytest

from harness_aws_etl_pipeline_spark.operators.office import (
    docx_extract_text,
    office_extract_column,
    office_extract_text,
    office_kind,
    pptx_extract_text,
    xlsx_extract_text,
)

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"


def _mkzip(parts: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in parts.items():
            zf.writestr(name, data)
    return buf.getvalue()


def _docx(body_xml: str, extra: dict[str, bytes] | None = None) -> bytes:
    parts = {
        "[Content_Types].xml": b"<Types/>",
        "word/document.xml": (
            f'<w:document xmlns:w="{_W}"><w:body>{body_xml}</w:body>'
            "</w:document>"
        ).encode(),
    }
    parts.update(extra or {})
    return _mkzip(parts)


def _slide(lines: list[str]) -> bytes:
    paras = "".join(
        f"<a:p><a:r><a:t>{ln}</a:t></a:r></a:p>" for ln in lines
    )
    return (
        f'<p:sld xmlns:a="{_A}" '
        'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main">'
        f"<p:cSld>{paras}</p:cSld></p:sld>"
    ).encode()


class TestDocx:
    def test_paragraphs_runs_tabs_breaks(self):
        body = (
            "<w:p><w:r><w:t>Hello </w:t></w:r><w:r><w:t>world</w:t></w:r></w:p>"
            "<w:p><w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p>"
        )
        assert docx_extract_text(_docx(body)) == "Hello world\na\tb\nc"

    def test_all_parts_appends_headers(self):
        hdr = (
            f'<w:hdr xmlns:w="{_W}"><w:p><w:r><w:t>HEADER</w:t></w:r></w:p></w:hdr>'
        ).encode()
        b = _docx(
            "<w:p><w:r><w:t>body</w:t></w:r></w:p>",
            extra={"word/header1.xml": hdr},
        )
        assert docx_extract_text(b) == "body"
        assert docx_extract_text(b, all_parts=True) == "body\nHEADER"

    def test_foreign_namespace_prefix_still_parses(self):
        # namespace-agnostic: any prefix bound to any URI works
        b = _mkzip({
            "word/document.xml": (
                '<x:document xmlns:x="urn:whatever"><x:body>'
                "<x:p><x:r><x:t>odd producer</x:t></x:r></x:p>"
                "</x:body></x:document>"
            ).encode(),
        })
        assert docx_extract_text(b) == "odd producer"


class TestPptx:
    def test_slides_numeric_order(self):
        b = _mkzip({
            "ppt/slides/slide1.xml": _slide(["one"]),
            "ppt/slides/slide2.xml": _slide(["two", "lines"]),
            "ppt/slides/slide10.xml": _slide(["ten"]),
        })
        assert pptx_extract_text(b) == ["one", "two\nlines", "ten"]

    def test_missing_slides_raises(self):
        with pytest.raises(ValueError, match="pptx"):
            pptx_extract_text(_mkzip({"ppt/other.xml": b"<x/>"}))


class TestXlsx:
    def _xlsx(self) -> bytes:
        shared = (
            f'<sst xmlns="{_S}"><si><t>alpha</t></si>'
            "<si><t>be</t><t>ta</t></si></sst>"
        ).encode()
        sheet = (
            f'<worksheet xmlns="{_S}"><sheetData>'
            '<row r="1">'
            '<c r="B1" t="s"><v>1</v></c>'  # out-of-order: B before A
            '<c r="A1" t="s"><v>0</v></c>'
            "</row>"
            '<row r="2"><c r="A2"><v>42</v></c>'
            '<c r="B2" t="inlineStr"><is><t>inline!</t></is></c></row>'
            "</sheetData></worksheet>"
        ).encode()
        return _mkzip({
            "xl/workbook.xml": f'<workbook xmlns="{_S}"/>'.encode(),
            "xl/sharedStrings.xml": shared,
            "xl/worksheets/sheet1.xml": sheet,
        })

    def test_cells_ordered_and_resolved(self):
        assert xlsx_extract_text(self._xlsx()) == [
            "alpha\tbeta\n42\tinline!"
        ]

    def test_dispatch(self):
        assert office_extract_text(self._xlsx()) == "alpha\tbeta\n42\tinline!"


class TestSniffAndGuards:
    def test_office_kind(self):
        assert office_kind(_docx("<w:p/>")) == "docx"
        assert office_kind(
            _mkzip({"ppt/slides/slide1.xml": _slide(["x"])})
        ) == "pptx"
        assert office_kind(_mkzip({"random.txt": b"hi"})) == "zip"
        assert office_kind(b"\x89PNG not zip") is None
        with pytest.raises(ValueError, match="OOXML"):
            office_extract_text(_mkzip({"random.txt": b"hi"}))


class TestSparkFace:
    def test_office_extract_column(self, spark):
        rows = [
            (1, bytearray(_docx("<w:p><w:r><w:t>doc one</w:t></w:r></w:p>"))),
            (2, bytearray(_mkzip({"ppt/slides/slide1.xml": _slide(["deck"])}))),
            (3, bytearray(b"junk bytes")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {
            r.doc_id: (r.text, r.office_kind)
            for r in office_extract_column(df, "payload").collect()
        }
        assert got[1] == ("doc one", "docx")
        assert got[2] == ("deck", "pptx")
        assert got[3] == (None, None)


class TestIntegration:
    def test_probe_reports_ooxml_kinds(self):
        from harness_aws_etl_pipeline_spark.operators.containers import (
            probe_container,
            sniff_container,
        )

        d = _docx("<w:p><w:r><w:t>x</w:t></w:r></w:p>")
        assert sniff_container(d) == "docx"
        assert probe_container(d)["container"] == "docx"
        z = _mkzip({"a.txt": b"x"})
        assert sniff_container(z) == "zip"
        assert probe_container(z)["codec"] == "zip"

    def test_prepare_corpus_office_front_end(self, spark):
        from harness_aws_etl_pipeline_spark.operators.corpus_pipeline import (
            prepare_corpus,
        )

        df = spark.createDataFrame(
            [
                (1, bytearray(_docx(
                    "<w:p><w:r><w:t>office corpus text</w:t></w:r></w:p>"
                ))),
                (2, bytearray(b"junk")),
            ],
            "doc_id long, payload binary",
        )
        prepared, report = prepare_corpus(
            df, office_col="payload", normalize="NFKC"
        )
        assert report[0]["stage"] == "office_extract"
        rows = {r.doc_id: r.text for r in prepared.collect()}
        assert rows[1] == "office corpus text"


def _epub(chapters: list[str], damaged: bool = False) -> bytes:
    """Minimal OCF: container.xml → OPF → spine. Chapter FILE names
    are in REVERSE order of the spine so spine order is what's
    tested."""
    n = len(chapters)
    items = "".join(
        f'<item id="c{i}" href="text/part{n - i}.xhtml" '
        'media-type="application/xhtml+xml"/>'
        for i in range(n)
    )
    spine = "".join(f'<itemref idref="c{i}"/>' for i in range(n))
    opf = (
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
        f"<manifest>{items}</manifest><spine>{spine}</spine></package>"
    ).encode()
    parts = {
        "mimetype": b"application/epub+zip",
        "OEBPS/content.opf": opf,
    }
    if not damaged:
        parts["META-INF/container.xml"] = (
            '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
            '<rootfiles><rootfile full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/></rootfiles>'
            "</container>"
        ).encode()
    for i, ch in enumerate(chapters):
        parts[f"OEBPS/text/part{n - i}.xhtml"] = (
            "<html><head><style>p{}</style></head>"
            f"<body><p>{ch}</p></body></html>"
        ).encode()
    return _mkzip(parts)


class TestEpub:
    def test_spine_order_and_html_chain(self):
        from harness_aws_etl_pipeline_spark.operators.office import (
            epub_extract_text,
        )

        got = epub_extract_text(_epub(["chapter one", "chapter two &amp; more"]))
        assert got == ["chapter one", "chapter two & more"]
        assert office_kind(_epub(["x"])) == "epub"
        assert office_extract_text(_epub(["a", "b"])) == "a\n\nb"

    def test_damaged_ocf_falls_back_to_xhtml_scan(self):
        from harness_aws_etl_pipeline_spark.operators.office import (
            epub_extract_text,
        )

        # no container.xml → name-order salvage of the xhtml parts
        got = epub_extract_text(_epub(["one", "two"], damaged=True))
        assert sorted(got) == ["one", "two"]

    def test_python_twin_matches_column_chain(self, spark):
        from pyspark.sql import functions as F

        from harness_aws_etl_pipeline_spark.operators.html import html_to_text
        from harness_aws_etl_pipeline_spark.operators.office import (
            _py_html_to_text,
        )

        fixtures = [
            "<p>plain</p>",
            "<script>drop()</script><div>kept</div>",
            "<style>p{}</style>text &amp;lt; stays",
            "a<br/>b<BR>c</li>d",
            "<!-- gone -->x &nbsp;&lt;tag&gt; &quot;q&apos;",
            "  lots \t of\n\n\n\nspace  ",
        ]
        df = spark.createDataFrame([(s,) for s in fixtures], "h string")
        col = [
            r.t for r in df.select(html_to_text("h").alias("t")).collect()
        ]
        assert col == [_py_html_to_text(s) for s in fixtures]
