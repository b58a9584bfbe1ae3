"""URL operators (operators/urlops.py): canonicalization spec by
case, host/domain extraction, URL dedup, per-host caps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.urlops import (
    add_url_columns,
    cap_per_host,
    dedup_by_url,
    normalize_url,
    registered_domain,
    url_host,
)


def _norm(spark, url):
    return (
        spark.createDataFrame([(url,)], "u string")
        .select(normalize_url("u").alias("n"))
        .collect()[0]
        .n
    )


class TestNormalizeUrl:
    @pytest.mark.parametrize(
        "raw,expected",
        [
            # scheme/host case, path case preserved
            ("HTTPS://Example.COM/Path/File", "https://example.com/Path/File"),
            # fragment stripped
            ("https://a.com/x#section-2", "https://a.com/x"),
            # default ports
            ("http://a.com:80/x", "http://a.com/x"),
            ("https://a.com:443/x", "https://a.com/x"),
            ("https://a.com:8443/x", "https://a.com:8443/x"),  # non-default kept
            # www
            ("https://www.a.com/x", "https://a.com/x"),
            # tracking params dropped, rest sorted
            (
                "https://a.com/x?utm_source=tw&b=2&a=1&fbclid=zz",
                "https://a.com/x?a=1&b=2",
            ),
            ("https://a.com/x?gclid=1&utm_campaign=c", "https://a.com/x"),
            ("https://a.com/x?ref=hn&keep=1", "https://a.com/x?keep=1"),
            # a param NAMED like a keeper stays ("refresh" != "ref")
            ("https://a.com/x?refresh=1", "https://a.com/x?refresh=1"),
            # literal '?' inside the query (RFC 3986): the query is
            # everything after the FIRST '?', nothing is dropped
            ("https://a.com/x?a=1?b=2", "https://a.com/x?a=1?b=2"),
            ("https://a.com/x?b=2&a=1?z", "https://a.com/x?a=1?z&b=2"),
            # bare-path trailing slash; deeper slashes preserved
            ("https://a.com/", "https://a.com"),
            ("https://a.com/x/", "https://a.com/x/"),
        ],
    )
    def test_spec_cases(self, spark, raw, expected):
        assert _norm(spark, raw) == expected

    def test_variants_converge(self, spark):
        variants = [
            "HTTP://WWW.Example.com:80/page?b=2&a=1#top",
            "http://example.com/page?a=1&b=2",
            "http://www.example.com/page?b=2&utm_medium=email&a=1",
        ]
        normed = {
            r.n
            for r in spark.createDataFrame([(v,) for v in variants], "u string")
            .select(normalize_url("u").alias("n"))
            .collect()
        }
        assert normed == {"http://example.com/page?a=1&b=2"}

    def test_null_and_non_url(self, spark):
        df = spark.createDataFrame([(None,), ("not a url",)], "u string")
        got = [r.n for r in df.select(normalize_url("u").alias("n")).collect()]
        assert got == [None, "not a url"]


class TestHostDomain:
    def test_host_and_domain(self, spark):
        rows = [
            ("https://www.news.example.co.uk:443/a", "news.example.co.uk", "example.co.uk"),
            ("http://blog.example.com/x", "blog.example.com", "example.com"),
            ("https://example.com", "example.com", "example.com"),
            ("nonsense", None, None),
        ]
        df = spark.createDataFrame([(r[0],) for r in rows], "u string")
        got = df.select(
            url_host("u").alias("h"), registered_domain("u").alias("d")
        ).collect()
        for (u, eh, ed), r in zip(rows, got):
            assert (r.h, r.d) == (eh, ed), u

    def test_add_url_columns(self, spark):
        df = spark.createDataFrame(
            [(1, "https://www.a.com/x/y/z?q=1"), (2, None)],
            "doc_id long, url string",
        )
        out = {r.doc_id: r for r in add_url_columns(df).collect()}
        assert out[1].url_host == "a.com"
        assert out[1].url_path_depth == 3
        assert out[1].url_norm == "https://a.com/x/y/z?q=1"
        assert out[2].url_norm is None and out[2].url_path_depth is None


_PSL_FIXTURE = """\
// ===BEGIN ICANN DOMAINS===
com
uk
co.uk
ac.uk
au
com.au
ck
*.ck
!reg.ck
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
github.io
s3.amazonaws.com
// ===END PRIVATE DOMAINS===
"""


class TestPublicSuffixList:
    def test_parse_format(self):
        from harness_aws_etl_pipeline_spark.operators.urlops import (
            parse_suffix_list,
        )

        rules = parse_suffix_list(_PSL_FIXTURE)
        assert "github.io" in rules["normal"]
        assert "s3.amazonaws.com" in rules["normal"]
        assert rules["wildcard"] == ["ck"]
        assert rules["exception"] == ["reg.ck"]
        assert "com" in rules["normal"] and "*" not in rules["normal"]

    def test_load_from_file(self, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.urlops import (
            load_suffix_list,
            parse_suffix_list,
        )

        p = tmp_path / "psl.dat"
        p.write_text(_PSL_FIXTURE)
        assert load_suffix_list(str(p)) == parse_suffix_list(_PSL_FIXTURE)

    @pytest.mark.parametrize(
        "url,expected",
        [
            # private-registry suffix beyond the old 18-entry heuristic
            ("https://foo.github.io/x", "foo.github.io"),
            ("https://a.b.github.io/x", "b.github.io"),
            ("https://github.io/", "github.io"),  # host IS a suffix
            # 3-label private suffix
            ("https://bucket.s3.amazonaws.com/k", "bucket.s3.amazonaws.com"),
            # multi-level ICANN beyond the heuristic's co.uk
            ("https://www.dept.univ.ac.uk/p", "univ.ac.uk"),
            # wildcard *.ck: any x.ck is a suffix
            ("https://shop.stuff.ck/x", "shop.stuff.ck"),
            ("https://deep.shop.stuff.ck/x", "shop.stuff.ck"),
            # exception !reg.ck cancels the wildcard
            ("https://reg.ck/x", "reg.ck"),
            ("https://sub.reg.ck/x", "reg.ck"),
            # url_host strips a leading www. (canonicalization), so a
            # www.-prefixed host degrades to its parent BEFORE the
            # PSL runs — documented interaction, pinned here
            ("https://www.ck/x", "ck"),
            # plain rules + implicit default
            ("https://a.example.com/x", "example.com"),
            ("https://x.unknown-tld/x", "x.unknown-tld"),
            (None, None),
        ],
    )
    def test_psl_semantics(self, spark, url, expected):
        from harness_aws_etl_pipeline_spark.operators.urlops import (
            parse_suffix_list,
        )

        rules = parse_suffix_list(_PSL_FIXTURE)
        got = (
            spark.createDataFrame([(url,)], "u string")
            .select(registered_domain("u", rules).alias("d"))
            .collect()[0]
            .d
        )
        assert got == expected, url

    def test_default_rules_unchanged(self, spark):
        """No rules passed -> the bundled heuristic subset through the
        same engine — byte-identical to the round-5 behavior."""
        rows = [
            ("https://www.news.example.co.uk:443/a", "example.co.uk"),
            ("http://blog.example.com/x", "example.com"),
            ("https://example.com", "example.com"),
            ("https://a.co.jp/x", "a.co.jp"),
        ]
        df = spark.createDataFrame([(r[0],) for r in rows], "u string")
        got = df.select(registered_domain("u").alias("d")).collect()
        for (u, want), r in zip(rows, got):
            assert r.d == want, u

    def test_add_url_columns_takes_rules(self, spark):
        from harness_aws_etl_pipeline_spark.operators.urlops import (
            parse_suffix_list,
        )

        df = spark.createDataFrame(
            [(1, "https://foo.github.io/x")], "doc_id long, url string"
        )
        out = add_url_columns(
            df, suffix_rules=parse_suffix_list(_PSL_FIXTURE)
        ).collect()[0]
        assert out.url_domain == "foo.github.io"

    def test_staged_path_compiles_under_codegen_no_fallback(self, spark):
        """Round-10 pin for the janino 64 KB blowup: the one-expression
        registered_domain form re-inlines the host regex chain into
        every PSL branch, fails codegen, and silently runs interpreted.
        The staged path (with_registered_domain) must (a) COMPILE with
        fallback disabled — this test errors loudly if codegen fails —
        (b) keep whole-stage codegen in the executed plan, and
        (c) produce values identical to the one-expression form."""
        from harness_aws_etl_pipeline_spark.operators.urlops import (
            parse_suffix_list,
            with_registered_domain,
        )

        rules = parse_suffix_list(_PSL_FIXTURE)
        urls = [
            "https://foo.github.io/x", "https://a.b.github.io/x",
            "https://github.io/", "https://bucket.s3.amazonaws.com/k",
            "https://www.dept.univ.ac.uk/p", "https://deep.shop.stuff.ck/x",
            "https://sub.reg.ck/x", "https://a.example.com/x",
            "https://x.unknown-tld/x", None,
        ]
        df = spark.createDataFrame([(u,) for u in urls], "u string")
        staged = with_registered_domain(
            df, url_col="u", out_col="d", rules=rules
        )
        prev = spark.conf.get("spark.sql.codegen.fallback")
        spark.conf.set("spark.sql.codegen.fallback", "false")
        try:
            got = [r.d for r in staged.collect()]
        finally:
            spark.conf.set("spark.sql.codegen.fallback", prev)
        want = [
            r.d
            for r in df.select(
                registered_domain("u", rules).alias("d")
            ).collect()
        ]
        assert got == want
        # the staged projection stays inside a whole-stage-codegen span
        # (the '*(n)' prefix) and references the staged attributes
        ep = staged._jdf.queryExecution().executedPlan().toString()
        assert "*(" in ep  # at least one WholeStageCodegen span
        assert "__rd_p" in ep  # PSL decision reads the staged attribute


class TestUrlDedupAndCaps:
    def test_dedup_by_url_min_id_survives(self, spark):
        df = spark.createDataFrame(
            [
                (3, "http://www.a.com/p?utm_source=x"),
                (1, "HTTP://A.com/p"),
                (2, "http://a.com/q"),
                (4, None),
                (5, None),
            ],
            "doc_id long, url string",
        )
        out = dedup_by_url(df)
        ids = {r.doc_id for r in out.collect()}
        assert ids == {1, 2, 4, 5}  # 3 is a canonical-dup of 1; NULLs kept

    def test_cap_per_host_deterministic(self, spark):
        rows = [(i, f"https://busy.com/p{i}") for i in range(20)] + [
            (100, "https://quiet.com/only"),
            (101, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out1 = cap_per_host(df, max_docs=5)
        out2 = cap_per_host(df, max_docs=5)
        got1 = sorted(r.doc_id for r in out1.collect())
        assert got1 == sorted(r.doc_id for r in out2.collect())
        busy = [i for i in got1 if i < 100]
        assert len(busy) == 5
        assert {100, 101} <= set(got1)  # quiet host + NULL row unaffected

    def test_two_phase_cap_identical_to_naive_on_planted_hot_host(
        self, spark
    ):
        """One host with 500 rows among tiny hosts: the two-phase
        salted-bucket cap must return EXACTLY the naive single-window
        answer (the superset argument in _two_phase_cap), while never
        ranking the hot host in one task."""
        from pyspark.sql import Window

        from harness_aws_etl_pipeline_spark.operators.urlops import url_host

        rows = (
            [(i, "https://hot.com/p%d" % i) for i in range(500)]
            + [(1000 + i, "https://cold%d.com/x" % i) for i in range(10)]
            + [(2000, None), (2001, "junk")]
        )
        df = spark.createDataFrame(rows, "doc_id long, url string")
        got = sorted(r.doc_id for r in cap_per_host(df, 7, buckets=8).collect())

        keyed = df.withColumn("__h", url_host(F.col("url")))
        w = Window.partitionBy("__h").orderBy(
            F.xxhash64(F.col("doc_id")), F.col("doc_id")
        )
        naive = (
            keyed.withColumn(
                "__rn",
                F.when(F.col("__h").isNull(), F.lit(1)).otherwise(
                    F.row_number().over(w)
                ),
            )
            .filter(F.col("__rn") <= 7)
        )
        want = sorted(r.doc_id for r in naive.collect())
        assert got == want
        assert len([d for d in got if d < 500]) == 7  # hot host capped
        assert {2000, 2001} <= set(got)  # NULL-host rows exempt

    def test_cap_stats_counters_fire(self, spark):
        from harness_aws_etl_pipeline_spark.operators.urlops import (
            cap_per_host_stats,
        )

        rows = (
            [(i, "https://hot.com/p%d" % i) for i in range(20)]
            + [(100, "https://quiet.com/only")]
            + [(200, None), (201, "junk-no-host")]
        )
        df = spark.createDataFrame(rows, "doc_id long, url string")
        s = cap_per_host_stats(df, 5).collect()[0]
        assert s.cap == 5 and s.hosts_total == 2
        assert s.hosts_capped == 1 and s.rows_dropped == 15
        assert s.rows_total == 21 and s.max_host == 20
        assert s.null_host_rows == 2

    def test_two_phase_plan_has_no_whole_host_partition(self, spark):
        """Phase 1's window partitions on (host, bucket) — the plan
        must show the salted key in the first window's partition
        spec (no single-task hot host)."""
        df = spark.createDataFrame(
            [(i, "https://h.com/x") for i in range(10)],
            "doc_id long, url string",
        )
        plan = cap_per_host(df, 2, buckets=8)._jdf.queryExecution().toString()
        assert "pmod" in plan

    def test_cap_append_stability(self, spark):
        """Docs surviving the cap keep surviving when the host grows
        (hash-rank displacement only)."""
        small = spark.createDataFrame(
            [(i, "https://h.com/p") for i in range(10)], "doc_id long, url string"
        )
        big = spark.createDataFrame(
            [(i, "https://h.com/p") for i in range(20)], "doc_id long, url string"
        )
        s1 = {r.doc_id for r in cap_per_host(small, 5).collect()}
        s2 = {r.doc_id for r in cap_per_host(big, 5).collect()}
        # survivors of the bigger corpus that existed in the smaller
        # corpus must be a subset of the smaller corpus's survivors
        assert {i for i in s2 if i < 10} <= s1
