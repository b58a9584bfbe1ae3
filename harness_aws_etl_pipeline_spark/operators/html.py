"""HTML → text extraction for web corpora — pure column expressions.

Web-scale training corpora start as markup; the prep chain needs a
cheap, deterministic first pass that turns HTML into scoreable text
and harvests the links that feed the URL family
(:mod:`operators.urlops`). Heavyweight DOM extraction (readability /
boilerplate models) needs an HTML parser library; this operator is
the scalable 80%: a fixed chain of JVM ``regexp_replace`` steps that
runs inside whole-stage codegen — no Python in the path, no UDF.

Pipeline per document (:func:`html_to_text`):
1. drop ``<script>`` / ``<style>`` / ``<!-- -->`` blocks (non-greedy
   dotall — content inside them is code, not text),
2. convert ``<br>`` and block-element *closers* to newlines so
   paragraph structure survives tag removal,
3. strip every remaining tag,
4. decode the common entities (``&amp; &lt; &gt; &quot; &#39;
   &nbsp;`` + decimal numerics),
5. collapse runs of spaces/tabs and 3+ newlines.

Every regex stays in the RE2-safe subset (no lookahead/backrefs) so an
external SQL engine can re-derive the chain verbatim — that is what
the ``doc_fingerprint`` oracle leg does.

Harvesters: :func:`extract_links` (href values, protocol-relative and
relative links included — canonicalize downstream), :func:`extract_title`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_anchors",
    "extract_links",
    "extract_sitemap_urls",
    "extract_title",
    "html_to_text",
    "markdown_anchors",
    "markdown_links",
    "markdown_to_text",
    "strip_html_columns",
]

# Tag chains shared by the oracle (plans/catalog_ext.py re-derives
# them in DuckDB): every pattern stays RE2-compatible — no lookahead,
# no backreferences (script/style are two sequential patterns instead
# of one `</\1>` alternation for exactly this reason).
_SCRIPT_DROP = r"(?is)<script\b[^>]*>.*?</script\s*>"
_STYLE_DROP = r"(?is)<style\b[^>]*>.*?</style\s*>"
_COMMENT = r"(?s)<!--.*?-->"
_NEWLINE_TAGS = r"(?i)<br\s*/?>|</(p|div|li|h[1-6]|tr|table|ul|ol|blockquote)\s*>"
_ANY_TAG = r"(?s)<[^>]*>"


def html_to_text(col: Column | str) -> Column:
    """The extraction chain as one nested column expression."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _SCRIPT_DROP, " ")
    c = F.regexp_replace(c, _STYLE_DROP, " ")
    c = F.regexp_replace(c, _COMMENT, " ")
    c = F.regexp_replace(c, _NEWLINE_TAGS, "\n")
    c = F.regexp_replace(c, _ANY_TAG, " ")
    # entities: only the handful below are common enough to matter;
    # the long tail stays literal (visible to quality filters,
    # harmless). `&amp;` decodes LAST — decoding it earlier would
    # double-decode literals like `&amp;lt;` into `<`.
    for ent, rep in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"[ \t\x0B\f\r]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    # edge trim including newlines (F.trim strips spaces only)
    return F.regexp_replace(c, r"^[ \n]+|[ \n]+$", "")


def extract_title(col: Column | str) -> Column:
    """``<title>`` text (first occurrence), entity-decoded + trimmed;
    empty string when absent (NULL only for NULL input)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.regexp_extract(c, r"(?is)<title[^>]*>(.*?)</title\s*>", 1)
    return html_to_text(t)


def extract_links(col: Column | str) -> Column:
    """``href`` values of anchor tags as an array<string> (order of
    appearance, duplicates kept — dedup belongs to the URL family).
    Both quote styles; relative and protocol-relative links included."""
    c = F.col(col) if isinstance(col, str) else col
    double = F.regexp_extract_all(c, F.lit(r'(?is)<a\b[^>]*\bhref="([^"]*)"'), F.lit(1))
    single = F.regexp_extract_all(c, F.lit(r"(?is)<a\b[^>]*\bhref='([^']*)'"), F.lit(1))
    return F.concat(double, single)


# anchor patterns: ONE pattern per quote style captures href (group 1)
# and inner text (group 2) from the same match, so two
# regexp_extract_all calls with different group indexes stay
# positionally aligned — that's what lets the oracle re-derive the
# (href, text) pairing with plain list indexing, no zip semantics.
_ANCHOR_D = r'(?is)<a\b[^>]*\bhref="([^"]*)"[^>]*>(.*?)</a\s*>'
_ANCHOR_S = r"(?is)<a\b[^>]*\bhref='([^']*)'[^>]*>(.*?)</a\s*>"
# explicit whitespace class (NOT \s): Java \s includes \x0B, RE2 \s
# does not — spelling it out keeps Spark and the DuckDB oracle
# bit-identical on every input
_WS_RUN = r"[ \t\n\x0B\f\r]+"


def _anchor_text_clean(t: Column) -> Column:
    """Inner markup stripped, whitespace collapsed, edges trimmed —
    anchor text may wrap <b>/<img>/newlines."""
    t = F.regexp_replace(t, _ANY_TAG, " ")
    t = F.regexp_replace(t, _WS_RUN, " ")
    return F.regexp_replace(t, r"^ | $", "")


def extract_anchors(col: Column | str) -> Column:
    """Anchor tags as ``array<struct<href string, text string>>`` —
    the anchor TEXT is the classic web relevance signal (what other
    pages call this URL); aggregate per target with
    :func:`~harness_aws_etl_pipeline_spark.operators.linkgraph.anchor_text_index`.
    Order of appearance within each quote style, duplicates kept."""
    c = F.col(col) if isinstance(col, str) else col

    def pairs(pat: str) -> Column:
        hrefs = F.regexp_extract_all(c, F.lit(pat), F.lit(1))
        texts = F.regexp_extract_all(c, F.lit(pat), F.lit(2))
        return F.zip_with(
            hrefs,
            texts,
            lambda h, t: F.struct(
                h.alias("href"), _anchor_text_clean(t).alias("text")
            ),
        )

    return F.concat(pairs(_ANCHOR_D), pairs(_ANCHOR_S))


def markdown_to_text(col: Column | str, keep_code: bool = True) -> Column:
    """Markdown → plain text, the code-corpus sibling of
    :func:`html_to_text` (GitHub/docs corpora ship as .md). Same
    architecture: a fixed RE2-safe ``regexp_replace`` chain in
    whole-stage codegen.

    Steps: fenced code blocks (kept verbatim minus the fences by
    default — code is usually wanted text in a training corpus;
    ``keep_code=False`` drops them), inline-code backticks, ATX
    heading markers, bold/italic/strikethrough markers, images (alt
    text survives), links (anchor text survives — harvest targets
    with :func:`markdown_links`), blockquote markers, list bullets,
    horizontal rules, table pipes, whitespace collapse."""
    c = F.col(col) if isinstance(col, str) else col
    if keep_code:
        c = F.regexp_replace(c, r"(?m)^```[^\n]*$", "")
    else:
        c = F.regexp_replace(c, r"(?s)```.*?```", " ")
    c = F.regexp_replace(c, r"`([^`\n]*)`", r"$1")
    c = F.regexp_replace(c, r"(?m)^#{1,6}[ \t]+", "")
    c = F.regexp_replace(c, r"!\[([^\]]*)\]\(([^)]*)\)", r"$1")
    c = F.regexp_replace(c, r"\[([^\]]*)\]\(([^)]*)\)", r"$1")
    c = F.regexp_replace(c, r"(\*\*|__)([^*_\n]+)(\*\*|__)", r"$2")
    c = F.regexp_replace(c, r"(\*|\b_)([^*_\n]+)(\*|_\b)", r"$2")
    c = F.regexp_replace(c, r"~~([^~\n]+)~~", r"$1")
    c = F.regexp_replace(c, r"(?m)^>[ \t]?", "")
    c = F.regexp_replace(c, r"(?m)^[ \t]*([-*+]|\d+\.)[ \t]+", "")
    c = F.regexp_replace(c, r"(?m)^[ \t]*([-*_][ \t]*){3,}$", "")
    c = F.regexp_replace(c, r"(?m)^\|", "")
    c = F.regexp_replace(c, r"\|", " ")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    return F.regexp_replace(c, r"^[ \n]+|[ \n]+$", "")


def markdown_links(col: Column | str) -> Column:
    """Link + image targets of ``[text](url)`` / ``![alt](url)`` as an
    array<string> in order of appearance — feed them to the URL
    family like :func:`extract_links` output."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"!?\[[^\]]*\]\(([^)]*)\)"), F.lit(1))


# markdown anchor pattern: one pattern, two groups (text, href) — same
# positional-alignment trick as the HTML anchors. Images are stripped
# FIRST (RE2 has no lookbehind to exclude the leading '!') — alt text
# is a caption, not an endorsement anchor.
_MD_IMAGE = r"!\[[^\]]*\]\([^)]*\)"
_MD_ANCHOR = r"\[([^\]]*)\]\(([^)]*)\)"


def markdown_anchors(col: Column | str) -> Column:
    """Markdown links as ``array<struct<href string, text string>>`` —
    the code-corpus sibling of :func:`extract_anchors` (anchor text is
    the same relevance signal in README/docs corpora). Images
    (``![alt](url)``) are excluded; whitespace in the text collapsed."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _MD_IMAGE, "")
    texts = F.regexp_extract_all(c, F.lit(_MD_ANCHOR), F.lit(1))
    hrefs = F.regexp_extract_all(c, F.lit(_MD_ANCHOR), F.lit(2))
    return F.zip_with(
        hrefs,
        texts,
        lambda h, t: F.struct(
            h.alias("href"), _anchor_text_clean(t).alias("text")
        ),
    )


def extract_sitemap_urls(col: Column | str) -> Column:
    """``<loc>`` entries of a sitemap.xml document as an
    array<string> — crawl frontier discovery (sitemaps are the
    publisher-declared URL inventory robots.txt points at). Tolerates
    whitespace inside the element; urlset/sitemapindex both work (a
    sitemap-index's ``<loc>`` entries are child sitemap URLs)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(
        c, F.lit(r"(?is)<loc\s*>\s*([^<]*?)\s*</loc\s*>"), F.lit(1)
    )


def strip_html_columns(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "text",
    title_col: str | None = "title",
    links_col: str | None = "links",
) -> DataFrame:
    """One-pass projection: extracted text (+ optional title / links
    columns) alongside the input. Pure narrow transformation — no
    shuffle, whole-stage codegen end to end; at 100 TB this is
    scan-bound, exactly as a first-pass extractor should be."""
    out = df.withColumn(text_col, html_to_text(html_col))
    if title_col:
        out = out.withColumn(title_col, extract_title(html_col))
    if links_col:
        out = out.withColumn(links_col, extract_links(html_col))
    return out
