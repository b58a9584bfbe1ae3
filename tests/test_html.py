"""HTML→text extraction: tag/script stripping, entities, structure
newlines, title + link harvesting."""

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.html import (
    extract_links,
    extract_title,
    html_to_text,
    strip_html_columns,
)

DOC = (
    "<html><head><title> My &amp; Your <b>Page</b> </title>"
    "<style>body { color: red }</style>"
    '<script type="text/javascript">var x = "<p>not text</p>";</script>'
    "</head><body>"
    "<!-- a comment <p>also not text</p> -->"
    "<h1>Header</h1>"
    "<p>First &lt;paragraph&gt; with &quot;quotes&quot; &#39;here&#39;.</p>"
    "<div>Second&nbsp;block</div>"
    '<a href="https://a.com/x">link one</a>'
    "<a href='/relative/path'>link two</a>"
    "<ul><li>item 1</li><li>item 2</li></ul>"
    "line<br>break"
    "</body></html>"
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame([(1, DOC), (2, None), (3, "plain, no tags")],
                                 "doc_id long, html string")


class TestHtmlToText:
    def test_extraction_chain(self, spark, df):
        rows = {r["doc_id"]: r for r in strip_html_columns(df).collect()}
        text = rows[1]["text"]
        # script/style/comment content must be gone entirely
        assert "color: red" not in text and "not text" not in text
        # entities decoded
        assert '"quotes"' in text and "'here'" in text
        assert "First <paragraph>" in text
        assert "Second block" in text  # &nbsp; → space
        # block closers → newlines keep structure
        assert "Header\n" in text
        assert "item 1\nitem 2" in text
        assert "line\nbreak" in text
        # null passthrough, tag-free passthrough
        assert rows[2]["text"] is None
        assert rows[3]["text"] == "plain, no tags"

    def test_title_and_links(self, spark, df):
        rows = {r["doc_id"]: r for r in strip_html_columns(df).collect()}
        assert rows[1]["title"] == "My & Your Page"
        assert rows[1]["links"] == ["https://a.com/x", "/relative/path"]
        assert rows[3]["title"] == "" and rows[3]["links"] == []

    def test_no_shuffle_in_plan(self, spark, df):
        plan = (
            strip_html_columns(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # pure narrow projection

    def test_amp_decodes_last_no_double_decode(self, spark):
        df = spark.createDataFrame(
            [(1, "<p>literal &amp;lt; stays, real &lt; decodes</p>")],
            "id long, html string",
        )
        text = df.select(html_to_text("html").alias("t")).collect()[0]["t"]
        assert text == "literal &lt; stays, real < decodes"

    def test_unclosed_script_does_not_eat_document(self, spark):
        # a script block with no closer: the non-greedy block regex
        # cannot match, the tag stripper still removes the <script> tag
        # itself, and the rest of the document survives
        df = spark.createDataFrame(
            [(1, "<p>before</p><script>var x = 1;")], "id long, html string"
        )
        text = df.select(html_to_text("html").alias("t")).collect()[0]["t"]
        assert "before" in text


MD = """# Title

Some **bold** and *italic* and ~~gone~~ text with `inline code`.

> a quote line

- item one
- item two

1. numbered

[anchor text](https://md.example.com/page) and ![alt words](https://img.example.com/i.png)

```python
def f():
    return 1
```

| a | b |
|---|---|
| 1 | 2 |

---
"""


class TestMarkdown:
    def test_markdown_to_text_keeps_content_drops_syntax(self, spark):
        from harness_aws_etl_pipeline_spark.operators.html import (
            markdown_links,
            markdown_to_text,
        )

        df = spark.createDataFrame([(1, MD)], "id long, md string")
        row = df.select(
            markdown_to_text("md").alias("t"),
            markdown_links("md").alias("links"),
        ).collect()[0]
        t = row["t"]
        assert t.startswith("Title")
        assert "Some bold and italic and gone text with inline code." in t
        assert "a quote line" in t
        assert "item one\nitem two" in t
        assert "numbered" in t
        assert "anchor text and alt words" in t
        assert "def f():" in t and "```" not in t
        assert "|" not in t and "**" not in t and "~~" not in t
        assert row["links"] == [
            "https://md.example.com/page",
            "https://img.example.com/i.png",
        ]

    def test_drop_code_mode(self, spark):
        from harness_aws_etl_pipeline_spark.operators.html import (
            markdown_to_text,
        )

        df = spark.createDataFrame([(1, MD)], "id long, md string")
        t = df.select(
            markdown_to_text("md", keep_code=False).alias("t")
        ).collect()[0]["t"]
        assert "def f():" not in t
        assert "Some bold and italic" in t


class TestAnchors:
    def test_extract_anchors_pairs_and_cleanup(self, spark):
        html = ('<a href="https://a.com/x"> Click <b>here</b>\n now </a>'
                "<a href='/rel'>rel</a>"
                '<a href="https://a.com/y"><img src="i.png"></a>'
                "plain text no anchors")
        from harness_aws_etl_pipeline_spark.operators.html import extract_anchors

        row = spark.createDataFrame([(html,)], "h string").select(
            extract_anchors("h").alias("a")
        ).first()
        got = [(a["href"], a["text"]) for a in row["a"]]
        assert ("https://a.com/x", "Click here now") in got
        assert ("/rel", "rel") in got
        # image-only anchor: markup stripped to empty text
        assert ("https://a.com/y", "") in got
        assert len(got) == 3

    def test_anchor_text_index_topk_and_counts(self, spark):
        from harness_aws_etl_pipeline_spark.operators.linkgraph import (
            anchor_text_index,
        )

        def page(*anchors):
            return "".join(f'<a href="{h}">{t}</a>' for h, t in anchors)

        docs = spark.createDataFrame(
            [
                (page(("https://t.com/", "best site"), ("https://t.com/", "best site"),
                      ("https://t.com/", "spam"), ("https://o.com/", "other")),),
                (page(("https://t.com/", "best site"), ("https://t.com/", "great"),
                      ("https://t.com/", "spam")),),
            ],
            "html string",
        )
        idx = {r["href"]: r for r in anchor_text_index(docs, k=2).collect()}
        t = idx["https://t.com/"]
        assert t["anchor_cnt"] == 6
        # top-2 by frequency: "best site" (3), "spam" (2); "great" cut
        assert t["top_texts"] == ["best site", "spam"]
        assert idx["https://o.com/"]["anchor_cnt"] == 1

    def test_markdown_anchors_excludes_images(self, spark):
        from harness_aws_etl_pipeline_spark.operators.html import markdown_anchors

        md = ("See [the  docs](https://d.com/x) and ![alt](https://img.com/i.png) "
              "plus [a\nb](/rel).")
        row = spark.createDataFrame([(md,)], "m string").select(
            markdown_anchors("m").alias("a")
        ).first()
        got = [(a["href"], a["text"]) for a in row["a"]]
        assert got == [("https://d.com/x", "the docs"), ("/rel", "a b")]

    def test_extract_sitemap_urls(self, spark):
        from harness_aws_etl_pipeline_spark.operators.html import (
            extract_sitemap_urls,
        )

        sm = ('<?xml version="1.0"?><urlset><url><loc> https://s.com/a </loc>'
              "<lastmod>2024-01-01</lastmod></url><url><LOC>https://s.com/b"
              "</LOC></url></urlset>")
        row = spark.createDataFrame([(sm,)], "x string").select(
            extract_sitemap_urls("x").alias("u")
        ).first()
        assert row["u"] == ["https://s.com/a", "https://s.com/b"]
