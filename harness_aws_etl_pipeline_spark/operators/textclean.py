"""[EXT] Corpus text normalization (the pre-tokenization cleanup pass).

Web-scraped text arrives with control characters, BOM/zero-width
marks, inconsistent unicode composition (é as one codepoint or two),
and whitespace soup.  Every published corpus pipeline normalizes
before anything hashes or tokenizes — otherwise visually-identical
documents dedup as distinct and the tokenizer learns phantom symbols.

Two tiers, chosen by what each transform needs:

- :func:`clean_text` — pure column expression (JVM, codegen): strip
  control/zero-width characters, normalize all whitespace runs to
  single spaces, trim, optional lowercase.  This covers the transforms
  expressible as regex over codepoints, stays in whole-stage codegen,
  and is SQL-oracle-able.
- :func:`normalize_unicode` — Arrow ``mapInPandas`` applying real
  ``unicodedata.normalize`` (NFC/NFKC/NFD/NFKD): canonical/compat
  composition is a stateful table-driven transform no regex expresses.
  Python, but vectorized per batch and usually run once per document
  lifetime.

Recommended order: ``normalize_unicode`` → ``clean_text`` (NFKC can
PRODUCE spaces — e.g. U+00A0 — that the whitespace pass then folds).

Scale: both are per-row map work, no shuffle; ``clean_text`` costs
what a regexp_replace costs, the NFKC pass is the one Python stage
and should be fused with other Arrow work where possible.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["clean_text", "decode_text", "normalize_unicode"]

# C0/C1 control blocks (minus \t\n\r which are whitespace, folded by
# the whitespace pass), zero-width chars, BOM, soft hyphen
_STRIP_CLASS = (
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f-\\x9f"
    "\\u200b-\\u200d\\u2060\\ufeff\\u00ad]"
)


def clean_text(col: Column | str, *, lowercase: bool = False) -> Column:
    """Expression-tier cleanup: control/zero-width strip → whitespace
    runs (incl. NBSP and unicode spaces) to single space → trim.
    NULL in, NULL out."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _STRIP_CLASS, "")
    # \s alone misses the unicode space separators (NBSP, em-space …):
    # Java regex \s is ASCII-only without UNICODE flags, so the class
    # unions it with \p{Z}
    c = F.regexp_replace(c, r"[\s\p{Z}]+", " ")
    # trim() strips ASCII whitespace only — after the fold the string
    # can still START with the single space a leading NBSP became
    c = F.regexp_replace(c, r"^ | $", "")
    if lowercase:
        c = F.lower(c)
    return c


def normalize_unicode(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFKC",
    out_col: str | None = None,
) -> DataFrame:
    """Real unicode normalization via ``unicodedata.normalize``.

    ``out_col`` defaults to replacing ``text_col`` in place.  NULLs
    pass through.  Arrow-batched; the per-batch loop is the stdlib
    C-implemented normalizer, not per-character Python.
    """
    import unicodedata

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"form must be NFC/NFKC/NFD/NFKD, got {form!r}")
    from collections.abc import Iterator as _Iter

    import pandas as pd

    target = out_col or text_col
    if out_col is None:
        out_schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    else:
        out_schema = (
            ", ".join(f"`{c}` {t}" for c, t in df.dtypes) + f", `{target}` string"
        )

    def _norm(batches: "_Iter[pd.DataFrame]") -> "_Iter[pd.DataFrame]":
        for pdf in batches:
            vals = [
                unicodedata.normalize(form, t) if isinstance(t, str) else None
                for t in pdf[text_col]
            ]
            yield pdf.assign(**{target: pd.Series(vals, index=pdf.index, dtype="object")})

    return df.mapInPandas(_norm, out_schema)


_META_CHARSET = re.compile(
    rb"""(?is)<meta[^>]+charset\s*=\s*["']?\s*([a-z0-9._\-]+)"""
)
_CT_CHARSET = re.compile(r"(?i)charset\s*=\s*[\"']?\s*([a-z0-9._\-]+)")


def _pick_codec(name: "str | None") -> "str | None":
    import codecs

    if not name:
        return None
    try:
        return codecs.lookup(name.strip()).name
    except (LookupError, ValueError):
        return None


def _decode_one(payload: "bytes | None", ctype: "str | None") -> "str | None":
    if payload is None:
        return None
    b = bytes(payload)
    # 1) BOMs are authoritative
    if b.startswith(b"\xef\xbb\xbf"):
        return b[3:].decode("utf-8", "replace")
    if b.startswith(b"\xff\xfe") or b.startswith(b"\xfe\xff"):
        return b.decode("utf-16", "replace")
    # 2) HTTP header charset, 3) meta-tag sniff in the first 2 KiB
    codec = _pick_codec(
        _CT_CHARSET.search(ctype).group(1) if ctype and _CT_CHARSET.search(ctype) else None
    )
    if codec is None:
        m = _META_CHARSET.search(b[:2048])
        codec = _pick_codec(m.group(1).decode("ascii", "replace") if m else None)
    if codec is not None:
        return b.decode(codec, "replace")
    # 4) strict UTF-8 (the common case), else 5) latin-1 (never fails,
    # byte-transparent — the standard crawl-pipeline last resort)
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def decode_text(
    df: DataFrame,
    payload_col: str = "payload",
    content_type_col: "str | None" = "content_type",
    out_col: str = "text",
) -> DataFrame:
    """Charset-aware ``binary`` → ``string`` decoding for crawl
    payloads — a real web corpus is NOT all UTF-8 (legacy latin-1 /
    windows-125x / koi8 pages survive in every crawl), and a blind
    ``cast("string")`` mangles them irreversibly BEFORE the quality
    gates can see the text.

    Priority (the practical consensus order): byte-order mark →
    ``Content-Type`` header charset → ``<meta charset>`` sniff in the
    first 2 KiB → strict UTF-8 → latin-1 (byte-transparent fallback;
    ``errors="replace"`` everywhere, so the output never throws and
    replacement characters become a quality-gate signal downstream).

    Arrow-batched ``mapInPandas`` (the decode itself is the stdlib's C
    codec machinery); NULL payloads pass through as NULL. Chain:
    ``read_warc`` → ``decode_text`` → ``html_to_text`` → gates.
    """
    from collections.abc import Iterator as _Iter

    import pandas as pd

    out_schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes) + f", `{out_col}` string"

    def _dec(batches: "_Iter[pd.DataFrame]") -> "_Iter[pd.DataFrame]":
        for pdf in batches:
            ct = (
                pdf[content_type_col]
                if content_type_col and content_type_col in pdf.columns
                else [None] * len(pdf)
            )
            vals = [
                _decode_one(p, c if isinstance(c, str) else None)
                for p, c in zip(pdf[payload_col], ct)
            ]
            yield pdf.assign(
                **{out_col: pd.Series(vals, index=pdf.index, dtype="object")}
            )

    return df.mapInPandas(_dec, out_schema)
