"""robots.txt parsing + corpus-scale politeness filtering."""

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.robots import (
    parse_robots,
    parse_robots_txt,
    robots_filter,
)

ROBOTS_A = """
# comment line
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp*$
Disallow: /cgi

User-agent: megabot
Disallow: /
"""

ROBOTS_B = """
User-agent: otherbot
User-agent: *
Disallow:
"""


class TestParse:
    def test_group_selection_and_rules(self):
        rules = parse_robots_txt(ROBOTS_A)
        assert ("disallow", "/private/") in rules
        assert ("allow", "/private/ok/") in rules
        assert ("disallow", "/") not in rules  # megabot group not ours

    def test_specific_agent_overrides_star(self):
        rules = parse_robots_txt(ROBOTS_A, user_agent="MegaBot/1.0")
        assert rules == [("disallow", "/")]

    def test_stacked_agent_lines_share_rules_and_empty_disallow_noop(self):
        # the empty Disallow is a spec no-op: both agents get NO rules
        assert parse_robots_txt(ROBOTS_B, user_agent="otherbot") == []
        assert parse_robots_txt(ROBOTS_B) == []

    def test_no_groups(self):
        assert parse_robots_txt("just text, not robots") == []
        assert parse_robots_txt(None) == []


class TestFilter:
    @pytest.fixture()
    def rules(self, spark):
        src = spark.createDataFrame(
            [("a.com", ROBOTS_A), ("b.com", ROBOTS_B), ("c.com", None)],
            "host string, robots_txt string",
        )
        return parse_robots(src)

    @pytest.fixture()
    def docs(self, spark):
        urls = [
            (1, "https://a.com/public/x"),        # no matching rule -> allow
            (2, "https://a.com/private/secret"),  # disallow /private/
            (3, "https://a.com/private/ok/y"),    # longer allow wins
            (4, "https://a.com/tmp"),             # /tmp*$ matches /tmp
            (5, "https://a.com/tmpfile"),         # ...and /tmpfile ($ after *)
            (6, "https://a.com/tmp/x"),           # still matched by /tmp*$? no: $ anchors end -> matches because .* spans
            (7, "https://a.com/cgi-bin/z"),       # prefix /cgi
            (8, "https://b.com/anything"),        # empty disallow -> allow
            (9, "https://nosuch.com/x"),          # host without rules
            (10, "not a url at all"),             # no host
            (11, "https://www.a.com/private/z"),  # www-normalized host
        ]
        return spark.createDataFrame(urls, "doc_id long, url string")

    def test_resolution_semantics(self, spark, docs, rules):
        flags = {
            r["doc_id"]: r["robots_allowed"]
            for r in robots_filter(docs, rules, mode="flag").collect()
        }
        assert flags[1] is True
        assert flags[2] is False
        assert flags[3] is True    # allow /private/ok/ is longer
        assert flags[4] is False   # /tmp*$ -> ^/tmp.*$
        assert flags[5] is False
        assert flags[6] is False   # .* spans the slash
        assert flags[7] is False   # literal prefix /cgi
        assert flags[8] is True    # empty disallow allows all
        assert flags[9] is True
        assert flags[10] is True
        assert flags[11] is False  # www. folded into the host key

    def test_filter_mode_and_row_preservation(self, spark, docs, rules):
        kept = robots_filter(docs, rules)
        assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 8, 9, 10]
        assert kept.columns == docs.columns
        # flag mode keeps every row exactly once (agg can't duplicate)
        assert robots_filter(docs, rules, mode="flag").count() == docs.count()

    def test_regex_metacharacters_in_prefix_are_literal(self, spark):
        rules = spark.createDataFrame(
            [("x.com", "disallow", "/a.b(c)/", 8)],
            "host string, rule string, prefix string, prefix_len int",
        )
        docs = spark.createDataFrame(
            [(1, "https://x.com/a.b(c)/z"), (2, "https://x.com/aXb(c)/z")],
            "doc_id long, url string",
        )
        flags = {
            r["doc_id"]: r["robots_allowed"]
            for r in robots_filter(docs, rules, mode="flag").collect()
        }
        assert flags[1] is False
        assert flags[2] is True  # '.' must not match 'X'

    def test_doc_side_never_shuffles(self, spark, docs, rules):
        plan = (
            robots_filter(docs, rules, mode="flag")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        # the only aggregation is the host-cardinality rules collapse
        # (small side); the doc side is join + projection
        assert plan.count("ObjectHashAggregate") <= 2
