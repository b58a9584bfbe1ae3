"""robots.txt politeness filtering — crawl-corpus curation.

Respecting robots directives is a standard curation step for web
training corpora (C4 and its descendants filter disallowed URLs).
The engine models it corpus-scale:

- :func:`parse_robots` — (host, robots_txt) rows → (host, rule,
  prefix) rules via an Arrow batch parse (robots files are small,
  one per host; the stateful user-agent-group scan is per-file
  Python, the distribution is by host).
- :func:`robots_filter` — rules grouped into ONE array per host,
  broadcast, left-joined (no row multiplication), and resolved per
  doc with higher-order array expressions: ``array_max(transform(
  filter(rules, matches), r -> struct(prefix_len, allow_bit)))``
  implements the Google-documented resolution — the longest matching
  rule wins, ties go to allow — because struct comparison orders by
  length first, then allow. ZERO shuffle on the doc side, zero
  aggregation: the whole verdict is a projection. Hosts with no rules
  (or docs with no host) are allowed.

Matching supports the literal-prefix core plus the ``*`` wildcard and
``$`` end-anchor extensions (compiled to an anchored RE2-safe regex —
all metacharacters escaped, so an external SQL engine reproduces the
match verbatim; the oracle leg does).

Scale: rules are host-cardinality (≤ millions of rows, a few rules
each) — broadcast when small, shuffled host join otherwise; docs are
touched once; no window over the doc side (the agg is map-side
combinable on (doc key)).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["parse_robots", "parse_robots_txt", "robots_filter"]


def parse_robots_txt(
    content: str, user_agent: str = "*"
) -> list[tuple[str, str]]:
    """One robots.txt → [(rule, prefix)] for the best-matching
    user-agent group: the group naming ``user_agent`` (longest
    substring match, per the spec's most-specific-group rule) if any,
    else the ``*`` group. Empty-value Allow/Disallow lines are
    no-ops per the spec (an empty Disallow restricts nothing) and are
    dropped — keeping a length-0 deny would wrongly win when nothing
    else matches."""
    groups: dict[str, list[tuple[str, str]]] = {}
    current_agents: list[str] = []
    last_was_agent = False
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not last_was_agent:
                current_agents = []
            current_agents.append(value.lower())
            groups.setdefault(value.lower(), [])
            last_was_agent = True
        elif field in ("allow", "disallow"):
            last_was_agent = False
            if value:
                for agent in current_agents:
                    groups.setdefault(agent, []).append((field, value))
        else:
            last_was_agent = False
    ua = user_agent.lower()
    best = None
    for agent in groups:
        if agent != "*" and agent in ua:
            if best is None or len(agent) > len(best):
                best = agent
    if best is None and "*" in groups:
        best = "*"
    return groups.get(best, []) if best is not None else []


RULES_SCHEMA = StructType(
    [
        StructField("host", StringType(), True),
        StructField("rule", StringType(), True),
        StructField("prefix", StringType(), True),
        StructField("prefix_len", IntegerType(), True),
    ]
)


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    content_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """(host, robots_txt) rows → (host, rule, prefix, prefix_len)
    rules. Arrow-batched; hosts with no applicable rules emit
    nothing (absence = allowed)."""
    import pandas as pd

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.name for f in RULES_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for host, content in zip(pdf[host_col], pdf[content_col]):
                if content is None:
                    continue
                for rule, prefix in parse_robots_txt(str(content), user_agent):
                    rows.append(
                        {
                            "host": host,
                            "rule": rule,
                            "prefix": prefix,
                            "prefix_len": len(prefix),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols).astype("object")

    return df.select(host_col, content_col).mapInPandas(_parse, RULES_SCHEMA)


def _prefix_regex(prefix_col: Column) -> Column:
    """Compile a robots path pattern (literal + ``*`` wildcard +
    ``$`` end anchor) to an anchored RE2-safe regex, as a column
    expression: escape every regex metacharacter, then translate the
    two robots metas. The '$' anchor is only special in last
    position (the spec's reading)."""
    escaped = F.regexp_replace(
        prefix_col, r"([.^$+?()\[\]{}|\\])", r"\\$1"
    )
    # '*' → '.*' (escaping left '*' untouched above on purpose)
    wildcarded = F.regexp_replace(escaped, r"\*", ".*")
    # trailing escaped '$' → end anchor ('\$' in the Java replacement:
    # a bare '$' is a group reference there; RE2 rewrites differ —
    # the oracle uses a plain '$')
    anchored = F.regexp_replace(wildcarded, r"\\\$$", "\\$")
    return F.concat(F.lit("^"), anchored)


def robots_filter(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    mode: str = "filter",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Docs → allowed docs (``mode="filter"``) or docs +
    ``robots_allowed`` flag (``mode="flag"``).

    Rules collapse to one precompiled array per host (host-cardinality
    groupBy on the SMALL side), broadcast, and left-join onto docs
    with no row multiplication; the verdict is then a pure projection:
    ``array_max`` over ``struct(prefix_len, allow_bit)`` of the
    matching rules picks the longest rule with allow winning ties.
    The doc side never shuffles or aggregates. Docs whose host has no
    matching rule — or no rules at all, or no parseable host — are
    allowed."""
    if mode not in ("filter", "flag"):
        raise ValueError(f"mode must be filter|flag, got {mode!r}")
    from harness_aws_etl_pipeline_spark.operators.urlops import url_host

    docs = df.withColumn("__host", url_host(url_col)).withColumn(
        "__path",
        F.coalesce(
            F.regexp_extract(
                F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([/?][^#]*)?", 1
            ),
            F.lit(""),
        ),
    )
    # empty path matches prefix '/' semantics: requests for the root
    docs = docs.withColumn(
        "__path", F.when(F.col("__path") == "", "/").otherwise(F.col("__path"))
    )
    per_host = rules.groupBy(F.col("host").alias("__host")).agg(
        F.collect_list(
            F.struct(
                _prefix_regex(F.col("prefix")).alias("rx"),
                F.col("prefix_len").cast("int").alias("l"),
                (F.col("rule") == "allow").cast("int").alias("a"),
            )
        ).alias("__rules")
    )
    if broadcast_rules:
        per_host = F.broadcast(per_host)
    best = F.array_max(
        F.transform(
            F.filter(
                F.col("__rules"),
                lambda r: F.regexp_like(F.col("__path"), r["rx"]),
            ),
            lambda r: F.struct(r["l"].alias("l"), r["a"].alias("a")),
        )
    )
    matched = (
        docs.join(per_host, "__host", "left")
        .withColumn(
            "__best", F.when(F.col("__rules").isNotNull(), best)
        )
        .withColumn(
            "robots_allowed",
            F.col("__best").isNull() | (F.col("__best.a") == 1),
        )
        .drop("__best", "__rules", "__host", "__path")
    )
    if mode == "flag":
        return matched
    return matched.filter(F.col("robots_allowed")).drop("robots_allowed")
