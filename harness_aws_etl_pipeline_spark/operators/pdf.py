"""Pure stdlib PDF text extraction (+ minimal test writer).

PDF is the document-corpus format: scans, papers, reports — a
training-data pipeline that ingests documents meets it before
anything else. No PDF library exists in this container, so the
extractor is implemented against the published specification
(PDF 1.7, ISO 32000-1): object parsing, classic cross-reference
TABLES and 1.5+ cross-reference STREAMS, object streams (ObjStm —
where most modern writers put page dictionaries), page-tree walk,
FlateDecode (stdlib zlib) with the PNG predictors, and the text
operators of content streams (Tj, ', ", TJ with kerning splits, BT/ET
blocks, Td/TD/T*/Tm line tracking).

Scope (honest): unencrypted PDFs; FlateDecode / uncompressed
streams (DCT/JBIG2/CCITT image XObjects are irrelevant to text);
literal ``(...)`` strings with escapes and hex ``<...>`` strings;
single-byte encodings passed through latin-1 (no ToUnicode CMap
walk — code points beyond latin-1 come out as their byte values;
UTF-16BE literals are detected by BOM). That covers the classic
"digitally-born simple PDF" — the kind our writer and most report
generators emit; scanned-image PDFs by definition carry no text
layer (OCR is out of scope for a no-ML container).

The writer emits spec-valid single-font PDFs (one content stream per
page, optional Flate compression, classic xref) so tests round-trip
arbitrary text through REAL object/stream/xref machinery.

Spark face: ``pdf_to_documents`` maps a binary-payload frame to
``(doc_id, page, text)`` rows via mapInPandas — the same
Arrow-batched contract as every other decoder in the multimodal
family; malformed payloads yield NULL text rather than failing the
batch (per-file error isolation, sources/readers.py convention).
"""

from __future__ import annotations

import re
import zlib

__all__ = [
    "encode_pdf",
    "pdf_extract_column",
    "pdf_extract_text",
    "pdf_meta",
    "pdf_to_documents",
]

_WS = rb"[\x00\t\n\x0c\r ]"
_OBJ_RE = re.compile(rb"(\d+)" + _WS + rb"+(\d+)" + _WS + rb"+obj\b")
_NAME_RE = re.compile(rb"/([A-Za-z0-9._#+-]+)")  # + for subset fonts (AAAAAA+Name)


# ------------------------------------------------------------ lexing


def _skip_ws(buf: bytes, pos: int) -> int:
    while pos < len(buf):
        c = buf[pos : pos + 1]
        if c in b"\x00\t\n\x0c\r ":
            pos += 1
        elif c == b"%":  # comment to EOL
            while pos < len(buf) and buf[pos : pos + 1] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


def _parse_object(buf: bytes, pos: int):
    """Parse one PDF object at ``pos`` → (value, new_pos). Dicts →
    dict, arrays → list, names → str ('/Name'), numbers → int/float,
    strings → bytes, refs → ('ref', num)."""
    pos = _skip_ws(buf, pos)
    if pos >= len(buf):
        raise ValueError("unexpected end of PDF data")
    c = buf[pos : pos + 1]
    if buf[pos : pos + 2] == b"<<":
        pos += 2
        out: dict = {}
        while True:
            pos = _skip_ws(buf, pos)
            if buf[pos : pos + 2] == b">>":
                return out, pos + 2
            m = _NAME_RE.match(buf, pos)
            if not m or buf[pos : pos + 1] != b"/":
                raise ValueError(f"bad dict key at offset {pos}")
            key = m.group(1).decode("latin-1")
            val, pos = _parse_object(buf, m.end())
            out[key] = val
    if c == b"[":
        pos += 1
        arr = []
        while True:
            pos = _skip_ws(buf, pos)
            if buf[pos : pos + 1] == b"]":
                return arr, pos + 1
            v, pos = _parse_object(buf, pos)
            arr.append(v)
    if c == b"/":
        m = _NAME_RE.match(buf, pos)
        if not m:
            raise ValueError(f"bad name at offset {pos}")
        return "/" + m.group(1).decode("latin-1"), m.end()
    if c == b"(":
        return _parse_literal_string(buf, pos)
    if buf[pos : pos + 2] == b"<<":  # unreachable, kept for clarity
        raise AssertionError
    if c == b"<":
        end = buf.index(b">", pos)
        hexs = re.sub(_WS, b"", buf[pos + 1 : end])
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("ascii")), end + 1
    m = re.match(
        rb"(\d+)" + _WS + rb"+(\d+)" + _WS + rb"+R\b", buf[pos : pos + 32]
    )
    if m:
        return ("ref", int(m.group(1))), pos + m.end()
    m = re.match(rb"[-+]?(\d+\.\d*|\.\d+|\d+)", buf[pos:])
    if m:
        s = m.group(0)
        return (float(s) if b"." in s else int(s)), pos + m.end()
    for lit, val in ((b"true", True), (b"false", False), (b"null", None)):
        if buf.startswith(lit, pos):
            return val, pos + len(lit)
    raise ValueError(f"unparseable PDF token at offset {pos}")


def _parse_literal_string(buf: bytes, pos: int):
    assert buf[pos : pos + 1] == b"("
    pos += 1
    depth = 1
    out = bytearray()
    esc = {
        b"n": 10, b"r": 13, b"t": 9, b"b": 8, b"f": 12,
        b"(": 40, b")": 41, b"\\": 92,
    }
    while pos < len(buf):
        c = buf[pos : pos + 1]
        if c == b"\\":
            nxt = buf[pos + 1 : pos + 2]
            if nxt in esc:
                out.append(esc[nxt])
                pos += 2
            elif nxt.isdigit():  # up to 3 octal digits
                j = pos + 1
                while j < pos + 4 and buf[j : j + 1].isdigit():
                    j += 1
                out.append(int(buf[pos + 1 : j], 8) & 0xFF)
                pos = j
            elif nxt in b"\r\n":  # line continuation
                pos += 2
                if nxt == b"\r" and buf[pos : pos + 1] == b"\n":
                    pos += 1
            else:
                out += nxt
                pos += 2
        elif c == b"(":
            depth += 1
            out += c
            pos += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out += c
            pos += 1
        else:
            out += c
            pos += 1
    raise ValueError("unterminated PDF string")


# ------------------------------------------------------ object store


def _png_unpredict(data: bytes, predictor: int, columns: int) -> bytes:
    """PNG-style predictors on decoded xref-stream bytes (spec
    7.4.4.4) — row filter byte + Up/Sub/Paeth like PNG bpp=1."""
    if predictor < 10:
        return data
    stride = columns
    out = bytearray()
    prev = bytes(stride)
    pos = 0
    while pos < len(data):
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + stride])
        if len(row) < stride:
            break
        if ft == 1:
            for i in range(1, stride):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:
            left = 0
            for i in range(stride):
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
                left = row[i]
        elif ft == 4:
            left = up_left = 0
            for i in range(stride):
                up = prev[i]
                p = left + up - up_left
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - up_left)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else up_left)
                row[i] = (row[i] + pred) & 0xFF
                left, up_left = row[i], up
        elif ft != 0:
            raise ValueError(f"unknown PNG predictor filter {ft}")
        out += row
        prev = bytes(row)
        pos += 1 + stride
    return bytes(out)


class _Pdf:
    """Lazy object store over one PDF payload: object offsets from
    every classic xref table AND xref stream, ObjStm extraction, and
    a brute-force ``N 0 obj`` scan as the damaged-file fallback."""

    def __init__(self, payload: bytes):
        self.buf = payload
        self.offsets: dict[int, int] = {}
        self.in_stream: dict[int, tuple[int, int]] = {}  # num -> (objstm, idx)
        self._objstm_cache: dict[int, list] = {}
        self._cache: dict[int, object] = {}
        self.trailer: dict = {}
        if not payload.startswith(b"%PDF-"):
            raise ValueError("not a PDF (missing %PDF header)")
        self._load_xrefs()
        if not self.offsets and not self.in_stream:
            self._scan_objects()
        if "Encrypt" in self.trailer:
            raise ValueError("encrypted PDF not supported")

    # -- xref chain ---------------------------------------------------

    def _load_xrefs(self) -> None:
        tail = self.buf.rfind(b"startxref")
        seen: set[int] = set()
        if tail < 0:
            return
        m = re.search(rb"startxref" + _WS + rb"+(\d+)", self.buf[tail:])
        if not m:
            return
        pos = int(m.group(1))
        while pos not in seen and 0 <= pos < len(self.buf):
            seen.add(pos)
            pos_ws = _skip_ws(self.buf, pos)
            if self.buf.startswith(b"xref", pos_ws):
                nxt = self._load_xref_table(pos_ws + 4)
            else:
                nxt = self._load_xref_stream(pos_ws)
            if nxt is None:
                break
            pos = nxt

    def _load_xref_table(self, pos: int):
        while True:
            pos = _skip_ws(self.buf, pos)
            if self.buf.startswith(b"trailer", pos):
                tr, _ = _parse_object(self.buf, pos + 7)
                for k, v in tr.items():
                    self.trailer.setdefault(k, v)
                prev = tr.get("Prev")
                return int(prev) if prev is not None else None
            m = re.match(rb"(\d+)" + _WS + rb"+(\d+)", self.buf[pos:])
            if not m:
                return None
            start, cnt = int(m.group(1)), int(m.group(2))
            pos = _skip_ws(self.buf, pos + m.end())
            for i in range(cnt):
                ent = self.buf[pos : pos + 20]
                if ent[17:18] == b"n":
                    self.offsets.setdefault(start + i, int(ent[:10]))
                pos += 20

    def _load_xref_stream(self, pos: int):
        m = _OBJ_RE.match(self.buf, pos)
        if not m:
            return None
        d, dpos = _parse_object(self.buf, m.end())
        data = self._stream_bytes(d, dpos)
        ws = d.get("W")
        if not isinstance(ws, list) or len(ws) < 3:
            return None
        w1, w2, w3 = (int(x) for x in ws[:3])
        size = int(d.get("Size", 0))
        index = d.get("Index") or [0, size]
        rw = w1 + w2 + w3

        def _f(chunk: bytes) -> int:
            return int.from_bytes(chunk, "big") if chunk else 1

        rows = [data[i : i + rw] for i in range(0, len(data) - rw + 1, rw)]
        ri = 0
        for k in range(0, len(index), 2):
            start, cnt = int(index[k]), int(index[k + 1])
            for j in range(cnt):
                if ri >= len(rows):
                    break
                row = rows[ri]
                ri += 1
                typ = _f(row[:w1]) if w1 else 1
                f2 = int.from_bytes(row[w1 : w1 + w2], "big")
                f3 = int.from_bytes(row[w1 + w2 :], "big")
                num = start + j
                if typ == 1:
                    self.offsets.setdefault(num, f2)
                elif typ == 2:
                    self.in_stream.setdefault(num, (f2, f3))
        for k, v in d.items():
            if k in ("Root", "Info", "Size", "Encrypt", "ID"):
                self.trailer.setdefault(k, v)
        prev = d.get("Prev")
        return int(prev) if prev is not None else None

    def _scan_objects(self) -> None:
        for m in _OBJ_RE.finditer(self.buf):
            self.offsets.setdefault(int(m.group(1)), m.start())
        t = self.buf.rfind(b"trailer")
        if t >= 0:
            try:
                tr, _ = _parse_object(self.buf, t + 7)
                self.trailer.update(tr)
            except ValueError:
                pass

    # -- object access ------------------------------------------------

    def resolve(self, v):
        while isinstance(v, tuple) and v and v[0] == "ref":
            v = self.get(v[1])
        return v

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        val = None
        if num in self.offsets:
            m = _OBJ_RE.match(self.buf, _skip_ws(self.buf, self.offsets[num]))
            if m is None:
                # damaged offset: fall back to a scan for this object
                pat = re.compile(
                    (str(num).encode() + rb"\s+\d+\s+obj\b")
                )
                m = pat.search(self.buf)
                m = _OBJ_RE.match(self.buf, m.start()) if m else None
            if m is not None:
                val, _ = _parse_object(self.buf, m.end())
        elif num in self.in_stream:
            stm_num, idx = self.in_stream[num]
            objs = self._objstm(stm_num)
            if idx < len(objs):
                val = objs[idx]
        self._cache[num] = val
        return val

    def _objstm(self, num: int) -> list:
        if num in self._objstm_cache:
            return self._objstm_cache[num]
        objs: list = []
        d = self.get(num)
        if isinstance(d, dict):
            m = _OBJ_RE.match(self.buf, _skip_ws(self.buf, self.offsets[num]))
            data = self._stream_bytes(d, m.end())
            n = int(self.resolve(d.get("N", 0)))
            first = int(self.resolve(d.get("First", 0)))
            head = data[:first]
            nums = [int(x) for x in head.split()]
            for k in range(n):
                off = nums[2 * k + 1]
                v, _ = _parse_object(data, first + off)
                objs.append(v)
        self._objstm_cache[num] = objs
        return objs

    def _stream_bytes(self, d: dict, dict_end: int) -> bytes:
        """Decode the stream that follows a dict parsed up to
        ``dict_end`` (Flate + optional PNG predictor)."""
        m = re.compile(rb"stream(\r\n|\n|\r)").search(self.buf, dict_end)
        if not m:
            raise ValueError("stream keyword not found")
        start = m.end()
        length = self.resolve(d.get("Length"))
        if isinstance(length, (int, float)):
            raw = self.buf[start : start + int(length)]
        else:
            end = self.buf.find(b"endstream", start)
            raw = self.buf[start : end if end >= 0 else len(self.buf)]
        filt = self.resolve(d.get("Filter"))
        filters = filt if isinstance(filt, list) else ([filt] if filt else [])
        data = raw
        for f in filters:
            f = self.resolve(f)
            if f == "/FlateDecode":
                data = zlib.decompress(data)
            elif f is None:
                continue
            else:
                raise ValueError(f"unsupported PDF filter {f}")
        parms = self.resolve(d.get("DecodeParms")) or {}
        if isinstance(parms, list):
            parms = self.resolve(parms[0]) or {} if parms else {}
        pred = int(self.resolve(parms.get("Predictor", 1)) or 1)
        if pred > 1:
            cols = int(self.resolve(parms.get("Columns", 1)) or 1)
            data = _png_unpredict(data, pred, cols)
        return data

    def stream_of(self, num: int) -> bytes:
        d = self.get(num)
        if not isinstance(d, dict):
            raise ValueError(f"object {num} is not a stream")
        m = _OBJ_RE.match(self.buf, _skip_ws(self.buf, self.offsets[num]))
        return self._stream_bytes(d, m.end())

    # -- page tree ----------------------------------------------------

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        out: list[dict] = []
        if isinstance(root, dict):
            self._walk(self.resolve(root.get("Pages")), out, 0)
        if not out:
            # damaged/absent tree: every dict object of /Type /Page
            nums = set(self.offsets) | set(self.in_stream)
            for num in sorted(nums):
                v = self.get(num)
                if isinstance(v, dict) and v.get("Type") == "/Page":
                    out.append(v)
        return out

    def _walk(self, node, out: list, depth: int) -> None:
        if not isinstance(node, dict) or depth > 64:
            return
        if node.get("Type") == "/Page":
            out.append(node)
            return
        for kid in self.resolve(node.get("Kids")) or []:
            self._walk(self.resolve(kid), out, depth + 1)


# ------------------------------------------------------ text extract

_TEXT_OPS = re.compile(
    rb"|".join(
        [
            rb"\((?:\\.|[^\\()])*\)",  # literal string
            rb"<[0-9A-Fa-f\s]*>",  # hex string
            rb"\[|\]",
            rb"/[A-Za-z0-9._#-]+",
            rb"[-+]?(?:\d+\.\d*|\.\d+|\d+)",
            rb"[A-Za-z'\"*]+",
        ]
    )
)


def _decode_pdf_string(
    b: bytes, font: tuple[dict, int] | None = None
) -> str:
    if font is not None:
        cmap, clen = font
        out = []
        for i in range(0, len(b) - clen + 1, clen):
            code = int.from_bytes(b[i : i + clen], "big")
            mapped = cmap.get(code)
            out.append(
                mapped
                if mapped is not None
                else b[i : i + clen].decode("latin-1")
            )
        return "".join(out)
    if b[:2] == b"\xfe\xff":
        try:
            return b[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            return b[2:].decode("latin-1")
    return b.decode("latin-1")


def _extract_page_text(
    content: bytes, fonts: dict[str, tuple[dict, int]] | None = None
) -> str:
    """Walk content-stream tokens; emit shown strings, newline on
    text-line operators (Td/TD/T*/Tm and the ' / " forms). ``fonts``
    maps resource names to ToUnicode CMaps; ``Tf`` switches the
    active one."""
    fonts = fonts or {}
    parts: list[str] = []
    stack: list[bytes] = []
    cur_font: tuple[dict, int] | None = None
    last_name: str | None = None
    in_array = 0
    for m in _TEXT_OPS.finditer(content):
        tok = m.group(0)
        c = tok[:1]
        if c == b"(":
            s, _ = _parse_literal_string(tok, 0)
            stack.append(s)
        elif c == b"<":
            hexs = re.sub(_WS, b"", tok[1:-1])
            if len(hexs) % 2:
                hexs += b"0"
            stack.append(bytes.fromhex(hexs.decode("ascii")))
        elif tok == b"[":
            in_array += 1
        elif tok == b"]":
            in_array = max(0, in_array - 1)
        elif c == b"/":
            last_name = tok[1:].decode("latin-1")
        elif tok[:1].isdigit() or c in b"-+.":
            continue
        else:
            op = tok
            if op == b"Tf":
                cur_font = fonts.get(last_name or "")
            elif op == b"Tj":
                if stack:
                    parts.append(_decode_pdf_string(stack[-1], cur_font))
            elif op == b"TJ":
                parts.extend(_decode_pdf_string(s, cur_font) for s in stack)
            elif op in (b"'", b'"'):
                parts.append("\n")
                if stack:
                    parts.append(_decode_pdf_string(stack[-1], cur_font))
            elif op in (b"Td", b"TD", b"T*", b"Tm"):
                if parts and not parts[-1].endswith("\n"):
                    parts.append("\n")
            elif op == b"ET":
                if parts and not parts[-1].endswith("\n"):
                    parts.append("\n")
            stack.clear()
    return "".join(parts).strip("\n")


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _parse_cmap(data: bytes) -> tuple[dict[int, str], int]:
    """ToUnicode CMap → ({code: unicode string}, code byte length).
    Handles bfchar pairs and bfrange (both increment and array
    destination forms); destinations are UTF-16BE hex."""

    def _dst(hexs: bytes) -> str:
        b = bytes.fromhex(hexs.decode("ascii"))
        try:
            return b.decode("utf-16-be")
        except UnicodeDecodeError:
            return b.decode("latin-1")

    cmap: dict[int, str] = {}
    code_len = 1
    for m in _BFCHAR_RE.finditer(data):
        toks = _HEX_RE.findall(m.group(1))
        for i in range(0, len(toks) - 1, 2):
            code_len = max(code_len, len(toks[i]) // 2)
            cmap[int(toks[i], 16)] = _dst(toks[i + 1])
    for m in _BFRANGE_RE.finditer(data):
        body = m.group(1)
        # split into lines; each is <lo> <hi> (<dst> | [<d1> <d2> ...])
        pos = 0
        while True:
            hm = _HEX_RE.search(body, pos)
            if not hm:
                break
            lo_hex = hm.group(1)
            hm2 = _HEX_RE.search(body, hm.end())
            if not hm2:
                break
            lo, hi = int(lo_hex, 16), int(hm2.group(1), 16)
            code_len = max(code_len, len(lo_hex) // 2)
            rest = _skip_ws(body, hm2.end())
            if body[rest : rest + 1] == b"[":
                end = body.index(b"]", rest)
                dsts = _HEX_RE.findall(body[rest:end])
                for k, d in enumerate(dsts):
                    if lo + k <= hi:
                        cmap[lo + k] = _dst(d)
                pos = end + 1
            else:
                hm3 = _HEX_RE.search(body, rest)
                if not hm3:
                    break
                base_hex = hm3.group(1)
                base = bytes.fromhex(base_hex.decode("ascii"))
                for k in range(hi - lo + 1):
                    # increment the LAST code unit per spec
                    inc = int.from_bytes(base, "big") + k
                    cmap[lo + k] = _dst(
                        b"%0*x" % (len(base_hex), inc)
                    )
                pos = hm3.end()
    return cmap, code_len


def _page_fonts(pdf: "_Pdf", pg: dict) -> dict[str, tuple[dict, int]]:
    """Page /Resources /Font → {name: (ToUnicode cmap, code bytes)}
    for fonts that carry a ToUnicode stream (subset-embedded fonts);
    simple-encoded fonts stay absent and fall back to latin-1."""
    out: dict[str, tuple[dict, int]] = {}
    res = pdf.resolve(pg.get("Resources")) or {}
    fonts = pdf.resolve(res.get("Font")) or {}
    if not isinstance(fonts, dict):
        return out
    for name, fref in fonts.items():
        fd = pdf.resolve(fref)
        if not isinstance(fd, dict):
            continue
        tu = fd.get("ToUnicode")
        if isinstance(tu, tuple) and tu and tu[0] == "ref":
            try:
                cmap, clen = _parse_cmap(pdf.stream_of(tu[1]))
            except (ValueError, KeyError):
                continue
            if cmap:
                out[name] = (cmap, clen)
    return out


def pdf_extract_text(payload: bytes) -> list[str]:
    """Per-page extracted text for an unencrypted PDF. Fonts carrying
    a ToUnicode CMap (subset-embedded fonts — most real-world PDFs)
    are decoded through it, tracked per ``Tf`` font selection;
    everything else falls back to latin-1 byte passthrough."""
    pdf = _Pdf(bytes(payload))
    pages = []
    for pg in pdf.pages():
        raw = pg.get("Contents")
        if isinstance(raw, tuple):  # direct ref to one stream
            refs = [raw]
        else:  # array (possibly behind a ref) of stream refs
            resolved = pdf.resolve(raw)
            refs = resolved if isinstance(resolved, list) else []
        blob = bytearray()
        for r in refs:
            if isinstance(r, tuple) and r and r[0] == "ref":
                try:
                    blob += pdf.stream_of(r[1])
                    blob += b"\n"
                except ValueError:
                    continue
        pages.append(_extract_page_text(bytes(blob), _page_fonts(pdf, pg)))
    return pages


def pdf_meta(payload: bytes) -> dict:
    """Structural probe: version, page count, object counts, whether
    modern xref-stream/ObjStm layout is in use."""
    buf = bytes(payload)
    pdf = _Pdf(buf)
    ver = buf[5:8].decode("latin-1", "replace")
    return {
        "container": "pdf",
        "version": ver,
        "pages": len(pdf.pages()),
        "objects": len(pdf.offsets) + len(pdf.in_stream),
        "compressed_objects": len(pdf.in_stream),
        "encrypted": False,  # _Pdf raises on Encrypt
    }


# ------------------------------------------------------ test writer


def encode_pdf(
    pages: list[str], compress: bool = True, producer: str = "spark-graft"
) -> bytes:
    """Minimal spec-valid PDF writer: one Helvetica font, one content
    stream per page (optionally FlateDecode), classic xref table.
    Exists so tests round-trip arbitrary text through REAL object /
    stream / xref machinery."""

    def esc(s: str) -> bytes:
        b = s.encode("latin-1", "replace")
        return b.replace(b"\\", rb"\\").replace(b"(", rb"\(").replace(b")", rb"\)")

    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        b"<< /Type /Pages /Count %d /Kids [%s] >>" % (n_pages, kids)
    )
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for i, text in enumerate(pages):
        pid = page_ids[i]
        sid = pid + 1
        lines = text.split("\n")
        body = bytearray(b"BT /F1 11 Tf 50 750 Td 14 TL\n")
        for j, ln in enumerate(lines):
            if j:
                body += b"T*\n"
            body += b"(" + esc(ln) + b") Tj\n"
        body += b"ET"
        data = bytes(body)
        extra = b""
        if compress:
            data = zlib.compress(data)
            extra = b" /Filter /FlateDecode"
        objs[sid] = (
            b"<< /Length %d%s >>\nstream\n" % (len(data), extra)
            + data
            + b"\nendstream"
        )
        objs[pid] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % sid
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n, xref_at)
    )
    return bytes(out)


# ------------------------------------------------------- Spark face


def pdf_to_documents(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Binary PDF payloads → ``(doc_id, page, text)`` rows,
    Arrow-batched; malformed payloads yield one row with NULL text
    (per-file error isolation). Large-corpus shape: pure map — no
    shuffle; page explosion happens inside the Python worker."""
    from collections.abc import Iterator as _Iter

    import pandas as pd

    from pyspark.sql import functions as F  # noqa: F401 - parity import

    src = df.select(id_col, payload_col)

    def _run(batches: "_Iter[pd.DataFrame]") -> "_Iter[pd.DataFrame]":
        for pdf_batch in batches:
            ids, pgs, txts = [], [], []
            for i, payload in zip(pdf_batch[id_col], pdf_batch[payload_col]):
                try:
                    pages = pdf_extract_text(bytes(payload))
                except (ValueError, KeyError, IndexError, zlib.error):
                    pages = None
                if not pages:
                    ids.append(i)
                    pgs.append(0)
                    txts.append(None)
                    continue
                for p, t in enumerate(pages, start=1):
                    ids.append(i)
                    pgs.append(p)
                    txts.append(t)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "page": pd.Series(pgs, dtype="int64"),
                    "text": pd.Series(txts, dtype="object"),
                }
            )

    return src.mapInPandas(_run, f"{id_col} long, page long, text string")


def pdf_extract_column(
    df, pdf_col: str, text_col: str = "text", pages_col: str | None = "pdf_pages"
):
    """1:1 corpus-prep front-end: a binary PDF column → one extracted
    ``text_col`` per row (pages joined by blank lines), NULL for
    malformed/encrypted payloads, optional page-count column. Keeps
    row identity so it can slot in as the first prepare_corpus stage
    (the html_col pattern). Arrow-batched map, no shuffle."""
    from collections.abc import Iterator as _Iter

    import pandas as pd

    fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    out_schema = f"{fields}, `{text_col}` string" + (
        f", `{pages_col}` bigint" if pages_col else ""
    )

    def _run(batches: "_Iter[pd.DataFrame]") -> "_Iter[pd.DataFrame]":
        for pdf_batch in batches:
            texts, npages = [], []
            for payload in pdf_batch[pdf_col]:
                try:
                    pages = pdf_extract_text(bytes(payload))
                    texts.append("\n\n".join(pages))
                    npages.append(len(pages))
                except (ValueError, KeyError, IndexError, zlib.error, TypeError):
                    texts.append(None)
                    npages.append(0)
            out = pdf_batch.assign(
                **{text_col: pd.Series(texts, index=pdf_batch.index, dtype="object")}
            )
            if pages_col:
                out[pages_col] = pd.Series(
                    npages, index=pdf_batch.index, dtype="int64"
                )
            yield out

    return df.mapInPandas(_run, out_schema)
