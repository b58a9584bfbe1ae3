"""OOXML text extraction (docx / pptx / xlsx) — stdlib only.

Office documents are the second pillar of a document corpus after
PDF: reports, decks, and spreadsheets arrive as OOXML (ECMA-376) —
ZIP containers of XML parts — which the stdlib fully covers
(``zipfile`` + ``xml.etree``). No codec gap to stub here.

* ``docx_extract_text``: ``word/document.xml`` — paragraphs (``w:p``)
  become lines; text runs (``w:t``), tabs (``w:tab``) and breaks
  (``w:br``) are honored; everything else (formatting, images) is
  structure to skip. Headers/footers/footnotes are additional parts,
  included when ``all_parts=True``.
* ``pptx_extract_text``: per-slide text (``ppt/slides/slideN.xml`` in
  numeric order) — ``a:p`` paragraphs of ``a:t`` runs.
* ``xlsx_extract_text``: per-sheet rows as tab-joined lines —
  ``xl/sharedStrings.xml`` resolves ``t="s"`` cells, inline strings
  and numeric ``v`` values pass through; cells are emitted in
  column-reference order.
* ``epub_extract_text``: OCF container → OPF package → SPINE-ordered
  chapters, each through the html_to_text chain (via a Python twin
  parity-pinned against the Column version); damaged-OCF xhtml scan
  salvage.
* ``office_extract_text``: sniff by part names and dispatch
  (docx/pptx/xlsx/epub); plain ZIPs that are none of them raise
  (they are archives, not documents).

All parsing is namespace-agnostic (matches on local tag names) so
documents from any OOXML producer — not just one vendor's namespace
prefixes — extract identically.

Spark face: ``office_extract_column`` mirrors
``pdf.pdf_extract_column`` — 1:1 binary → text with NULL isolation,
slotting into prepare_corpus-style chains.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree

__all__ = [
    "docx_extract_text",
    "epub_extract_text",
    "office_extract_column",
    "office_extract_text",
    "office_kind",
    "pptx_extract_text",
    "xlsx_extract_text",
]


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _zip(payload: bytes) -> zipfile.ZipFile:
    try:
        return zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"not a ZIP container: {exc}") from exc


def office_kind(payload: bytes) -> str | None:
    """'docx' / 'pptx' / 'xlsx' by main-part presence, 'zip' for any
    other archive, None for non-ZIP bytes."""
    if payload is None or payload[:4] != b"PK\x03\x04":
        return None
    try:
        names = set(_zip(bytes(payload)).namelist())
    except ValueError:
        return None
    if "word/document.xml" in names:
        return "docx"
    if any(n.startswith("ppt/slides/slide") for n in names):
        return "pptx"
    if "xl/workbook.xml" in names:
        return "xlsx"
    if "META-INF/container.xml" in names or "mimetype" in names:
        return "epub"
    return "zip"


# ------------------------------------------------------------- docx


def _wml_text(root) -> str:
    """WordprocessingML body → text: w:p = line, w:t = run,
    w:tab = tab, w:br/w:cr = newline."""
    lines: list[str] = []
    for p in root.iter():
        if _local(p.tag) != "p":
            continue
        parts: list[str] = []
        for el in p.iter():
            t = _local(el.tag)
            if t == "t":
                parts.append(el.text or "")
            elif t == "tab":
                parts.append("\t")
            elif t in ("br", "cr"):
                parts.append("\n")
        lines.append("".join(parts))
    return "\n".join(lines)


def docx_extract_text(payload: bytes, all_parts: bool = False) -> str:
    """Document text; ``all_parts=True`` appends headers, footers,
    foot/endnotes (each its own XML part)."""
    zf = _zip(bytes(payload))
    names = set(zf.namelist())
    if "word/document.xml" not in names:
        raise ValueError("not a docx (word/document.xml missing)")
    out = [_wml_text(ElementTree.fromstring(zf.read("word/document.xml")))]
    if all_parts:
        extra = sorted(
            n
            for n in names
            if re.fullmatch(
                r"word/(header\d+|footer\d+|footnotes|endnotes)\.xml", n
            )
        )
        for n in extra:
            txt = _wml_text(ElementTree.fromstring(zf.read(n)))
            if txt.strip():
                out.append(txt)
    return "\n".join(out).strip("\n")


# ------------------------------------------------------------- pptx


def pptx_extract_text(payload: bytes) -> list[str]:
    """Per-slide text, slides in numeric order."""
    zf = _zip(bytes(payload))
    slides = []
    for n in zf.namelist():
        m = re.fullmatch(r"ppt/slides/slide(\d+)\.xml", n)
        if m:
            slides.append((int(m.group(1)), n))
    if not slides:
        raise ValueError("not a pptx (no ppt/slides/slideN.xml parts)")
    out = []
    for _, name in sorted(slides):
        root = ElementTree.fromstring(zf.read(name))
        lines: list[str] = []
        for p in root.iter():
            if _local(p.tag) != "p" or not p.tag.startswith("{"):
                continue
            runs = [
                el.text or ""
                for el in p.iter()
                if _local(el.tag) == "t"
            ]
            if runs:
                lines.append("".join(runs))
        out.append("\n".join(lines))
    return out


# ------------------------------------------------------------- xlsx

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def xlsx_extract_text(payload: bytes) -> list[str]:
    """Per-sheet text: one tab-joined line per row, sheets in part
    order. Shared strings resolved; inline strings and raw values
    pass through."""
    zf = _zip(bytes(payload))
    names = zf.namelist()
    if "xl/workbook.xml" not in names:
        raise ValueError("not an xlsx (xl/workbook.xml missing)")
    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        root = ElementTree.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in root:
            if _local(si.tag) != "si":
                continue
            shared.append(
                "".join(
                    el.text or "" for el in si.iter() if _local(el.tag) == "t"
                )
            )
    sheets = sorted(
        n
        for n in names
        if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
    )
    out = []
    for name in sheets:
        root = ElementTree.fromstring(zf.read(name))
        lines: list[str] = []
        for row in root.iter():
            if _local(row.tag) != "row":
                continue
            cells: list[tuple[int, str]] = []
            for c in row:
                if _local(c.tag) != "c":
                    continue
                ref = c.attrib.get("r", "")
                m = _CELL_REF.fullmatch(ref)
                idx = _col_index(m.group(1)) if m else len(cells)
                ctype = c.attrib.get("t", "n")
                val = ""
                for el in c.iter():
                    t = _local(el.tag)
                    if t == "v":
                        val = el.text or ""
                    elif t == "t" and ctype == "inlineStr":
                        val = el.text or ""
                if ctype == "s":
                    try:
                        val = shared[int(val)]
                    except (ValueError, IndexError):
                        pass
                cells.append((idx, val))
            cells.sort()
            lines.append("\t".join(v for _, v in cells))
        out.append("\n".join(lines))
    return out


# --------------------------------------------------------- dispatch


def office_extract_text(payload: bytes) -> str:
    """Sniff + extract: docx body, pptx slides joined by blank lines,
    xlsx sheets joined by blank lines. Raises on non-OOXML input."""
    kind = office_kind(payload)
    if kind == "docx":
        return docx_extract_text(payload)
    if kind == "pptx":
        return "\n\n".join(pptx_extract_text(payload))
    if kind == "xlsx":
        return "\n\n".join(xlsx_extract_text(payload))
    if kind == "epub":
        return "\n\n".join(epub_extract_text(payload))
    raise ValueError(f"not an OOXML document (sniffed {kind!r})")


def office_extract_column(
    df, office_col: str, text_col: str = "text", kind_col: str | None = "office_kind"
):
    """1:1 corpus-prep front-end (the pdf_extract_column pattern):
    binary OOXML column → extracted text, NULL for malformed/non-OOXML
    payloads, optional detected-kind column. Arrow-batched map, no
    shuffle."""
    from collections.abc import Iterator as _Iter

    import pandas as pd

    fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    out_schema = f"{fields}, `{text_col}` string" + (
        f", `{kind_col}` string" if kind_col else ""
    )

    def _run(batches: "_Iter[pd.DataFrame]") -> "_Iter[pd.DataFrame]":
        for b in batches:
            texts, kinds = [], []
            for payload in b[office_col]:
                try:
                    p = bytes(payload)
                    k = office_kind(p)
                    texts.append(office_extract_text(p))
                    kinds.append(k)
                except (ValueError, KeyError, ElementTree.ParseError, TypeError):
                    texts.append(None)
                    kinds.append(None)
            out = b.assign(
                **{text_col: pd.Series(texts, index=b.index, dtype="object")}
            )
            if kind_col:
                out[kind_col] = pd.Series(kinds, index=b.index, dtype="object")
            yield out

    return df.mapInPandas(_run, out_schema)


# -------------------------------------------------------------- epub


def _py_html_to_text(s: str) -> str:
    """Python twin of ``html.html_to_text`` (the Column chain) for
    in-worker use — SAME patterns, SAME entity order; a parity test
    pins the two against each other on planted fixtures."""
    from harness_aws_etl_pipeline_spark.operators.html import (
        _ANY_TAG,
        _COMMENT,
        _NEWLINE_TAGS,
        _SCRIPT_DROP,
        _STYLE_DROP,
    )

    s = re.sub(_SCRIPT_DROP, " ", s)
    s = re.sub(_STYLE_DROP, " ", s)
    s = re.sub(_COMMENT, " ", s)
    s = re.sub(_NEWLINE_TAGS, "\n", s)
    s = re.sub(_ANY_TAG, " ", s)
    for ent, rep in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        s = s.replace(ent, rep)
    s = re.sub(r"[ \t\x0B\f\r]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n{3,}", "\n\n", s)
    return re.sub(r"^[ \n]+|[ \n]+$", "", s)


def epub_extract_text(payload: bytes) -> list[str]:
    """Per-chapter text in SPINE order (EPUB OCF: META-INF/
    container.xml → OPF package → manifest hrefs, spine idrefs),
    each chapter through the html_to_text chain. Falls back to all
    (x)html parts in name order when the OCF plumbing is damaged —
    salvage over failure, like the PDF xref fallback."""
    import posixpath

    zf = _zip(bytes(payload))
    names = zf.namelist()
    docs: list[str] = []
    try:
        container = ElementTree.fromstring(zf.read("META-INF/container.xml"))
        opf_path = next(
            el.attrib["full-path"]
            for el in container.iter()
            if _local(el.tag) == "rootfile" and "full-path" in el.attrib
        )
        opf = ElementTree.fromstring(zf.read(opf_path))
        base = posixpath.dirname(opf_path)
        items = {
            el.attrib["id"]: el.attrib["href"]
            for el in opf.iter()
            if _local(el.tag) == "item" and "id" in el.attrib
        }
        for el in opf.iter():
            if _local(el.tag) == "itemref" and el.attrib.get("idref") in items:
                href = items[el.attrib["idref"]]
                path = posixpath.normpath(posixpath.join(base, href))
                if path in names:
                    docs.append(path)
    except (KeyError, StopIteration, ElementTree.ParseError, ValueError):
        docs = []
    if not docs:
        docs = sorted(
            n for n in names if re.search(r"\.x?html?$", n, re.I)
        )
    if not docs:
        raise ValueError("not an epub (no spine and no xhtml parts)")
    return [
        _py_html_to_text(zf.read(d).decode("utf-8", "replace")) for d in docs
    ]
