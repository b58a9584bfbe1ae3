"""[EXT] URL normalization and host/domain operators for web corpora.

Web-scale training corpora key almost everything on URLs: dedup by
canonical URL, per-host crawl caps, domain-weighted mixing, blocklist
filtering.  Raw URLs are noisy keys — scheme/case/fragment/tracking-
param variants of the same page would survive exact dedup — so every
published pipeline canonicalizes first.

All operators here are pure column expressions (regexp + array
functions, whole-stage codegen, no Python), and every transform is
re-derivable in SQL, so the family is oracle-checkable end-to-end.

Canonicalization spec (:func:`normalize_url`):

1. lowercase scheme and host (path/query case is preserved — it is
   significant on most servers)
2. strip the fragment (``#…`` never reaches the server)
3. strip default ports (``:80`` for http, ``:443`` for https)
4. drop a leading ``www.``
5. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``,
   ``msclkid``, ``ref``)
6. sort surviving query parameters byte-wise (param order is almost
   never significant; sorting makes equal pages equal strings)
7. drop the trailing ``/`` of a bare path

Host/domain (:func:`url_host`, :func:`registered_domain`): the full
public-suffix ALGORITHM (normal / ``*.`` wildcard / ``!`` exception
rules, longest match, implicit ``*`` default) runs as pure column
expressions; feed it the real publicsuffix.org data file via
:func:`load_suffix_list` / :func:`parse_suffix_list`, or let it fall
back to the bundled common-two-level-suffix subset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_url",
    "url_host",
    "registered_domain",
    "registered_domain_from_parts",
    "with_registered_domain",
    "parse_suffix_list",
    "load_suffix_list",
    "add_url_columns",
    "dedup_by_url",
    "cap_per_host",
    "cap_per_host_stats",
]

#: query params dropped by normalize_url (tracking / referrer noise)
TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "ref")

#: common two-level public suffixes (heuristic subset)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "co.nz", "com.sg", "com.tr", "co.za",
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_url(col: Column | str) -> Column:
    """Canonical URL string per the module spec; NULL in, NULL out."""
    u = _c(col)
    # 1. lowercase scheme://host[:port] (the authority prefix only;
    # path/query case is significant and preserved)
    head = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    remainder = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    u = F.concat(head, remainder)
    # 2. strip fragment
    u = F.regexp_replace(u, r"#.*$", "")
    # 3. default ports
    u = F.regexp_replace(u, r"^(http://[^/?#]*):80(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"^(https://[^/?#]*):443(?=[/?#]|$)", r"$1")
    # 4. leading www.
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://)www\.", r"$1")
    # 5+6. query params: split, drop tracking, sort, rejoin.  The
    # query is everything after the FIRST '?' (RFC 3986 — later '?'
    # are literal query characters, e.g. "/x?a=1?b=2" has one param)
    base = F.substring_index(u, "?", 1)
    has_q = u.contains("?")
    params = F.filter(
        F.split(F.regexp_extract(u, r"^[^?]*\?(.*)$", 1), "&"),
        lambda p: (p != "")
        & ~F.exists(
            F.array(*[F.lit(t) for t in TRACKING_PARAMS]),
            lambda t: F.when(
                t.endswith("_"), p.startswith(t)
            ).otherwise(p.startswith(F.concat(t, F.lit("=")))  # noqa: PLC2801
                        | (p == t)),
        ),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    u = F.when(
        has_q & (F.size(params) > 0), F.concat(base, F.lit("?"), sorted_q)
    ).otherwise(base)
    # 7. trailing slash on a bare path ("https://x.com/" == "https://x.com";
    # deeper trailing slashes are left alone — their equivalence is
    # server-dependent)
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://[^/?#]+)/$", r"$1")
    return u


def url_host(col: Column | str) -> Column:
    """Lowercased host (no port, no www prefix); NULL for non-URLs."""
    u = _c(col)
    h = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    h = F.regexp_replace(h, r"^www\.", "")
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)


def parse_suffix_list(text: str) -> dict:
    """Parse the publicsuffix.org list format (public knowledge —
    https://publicsuffix.org/list/): one rule per line, ``//``
    comments, ``*.`` wildcard rules (stored by their PARENT, the '*'
    matches exactly one label), ``!`` exception rules.  Returns
    ``{"normal": [...], "wildcard": [parents], "exception": [...]}``
    for :func:`registered_domain`."""
    normal: list[str] = []
    wildcard: list[str] = []
    exception: list[str] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        token = line.split()[0].lower().lstrip(".")
        if token.startswith("!"):
            exception.append(token[1:])
        elif token.startswith("*."):
            wildcard.append(token[2:])
        elif token != "*":  # bare '*' is the implicit default rule
            normal.append(token)
    return {"normal": normal, "wildcard": wildcard, "exception": exception}


def load_suffix_list(path: str, spark=None) -> dict:
    """Read + parse a public-suffix list file through the FS adapter
    (same artifact convention as load_pq / load_merges)."""
    from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

    return parse_suffix_list(
        get_fs(path, spark).read_bytes(path).decode("utf-8")
    )


def registered_domain_from_parts(
    h: Column, parts: Column, rules: dict | None = None
) -> Column:
    """The public-suffix DECISION given the host and its label array
    as already-projected columns — the codegen-safe core of
    :func:`registered_domain`.

    ``h``/``parts`` must be plain column ATTRIBUTES (projected in a
    previous ``withColumn``), not expression trees: when the host's
    regexp-extraction chain is re-inlined into every candidate/level/
    take branch (as the one-shot :func:`registered_domain` wrapper
    does), the generated Java for the projection exceeds janino's
    64 KB method limit and Spark silently falls back to interpreted,
    row-at-a-time evaluation with the host regexes re-evaluated
    dozens of times per row — the classic silent constant-factor
    scale-killer on the corpus-prep hot path.  Catalyst's
    CollapseProject keeps staged projections separate when the
    produced alias is non-cheap and multiply-referenced, so routing
    through :func:`with_registered_domain` keeps whole-stage codegen
    (verified: ``spark.sql.codegen.fallback=false`` compiles, and the
    executed plan shows ``*(…) Project`` over the staged attributes).

    Rule membership still compiles to hash-set ``IN`` lookups
    (Catalyst InSet), so even the full ~10k-rule list stays one
    broadcast-free, shuffle-free projection."""
    n = F.size(parts)
    if rules is None:
        rules = {"normal": list(TWO_LEVEL_SUFFIXES)}

    by_level_n: dict[int, list[str]] = {}
    for s in rules.get("normal", ()):
        by_level_n.setdefault(s.count(".") + 1, []).append(s)
    # wildcard parents: rule '*.ck' (parent 'ck', parent_levels+1 total)
    by_level_w: dict[int, list[str]] = {}
    for s in rules.get("wildcard", ()):
        by_level_w.setdefault(s.count(".") + 2, []).append(s)
    by_level_e: dict[int, list[str]] = {}
    for s in rules.get("exception", ()):
        by_level_e.setdefault(s.count(".") + 1, []).append(s)

    def cand(k: int) -> Column:
        return F.when(n >= k, F.array_join(F.slice(parts, -k, k), "."))

    level_exprs = [F.lit(1)]
    for k, lst in by_level_n.items():
        level_exprs.append(
            F.when(cand(k).isin(lst), F.lit(k)).otherwise(F.lit(0))
        )
    for k, parents in by_level_w.items():
        level_exprs.append(
            F.when((n >= k) & cand(k - 1).isin(parents), F.lit(k)).otherwise(
                F.lit(0)
            )
        )
    suffix_level = (
        F.greatest(*level_exprs) if len(level_exprs) > 1 else F.lit(1)
    )
    exc_level = F.lit(0)
    for k, lst in sorted(by_level_e.items()):
        exc_level = F.when(cand(k).isin(lst), F.lit(k)).otherwise(exc_level)

    # exception rule: the exception itself IS the registered domain
    take = F.when(exc_level > 0, exc_level).otherwise(suffix_level + 1)
    max_take = 1 + max(
        [1, *by_level_n.keys(), *by_level_w.keys(), *by_level_e.keys()]
    )
    cand_take = F.lit(None).cast("string")
    for k in range(1, max_take + 1):
        cand_take = F.when(
            take == k, F.array_join(F.slice(parts, -k, k), ".")
        ).otherwise(cand_take)
    return F.when(h.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(n <= take, h).otherwise(cand_take)
    )


def registered_domain(col: Column | str, rules: dict | None = None) -> Column:
    """eTLD+1 of the URL's host under the public-suffix algorithm
    (https://publicsuffix.org/list/ — public knowledge):

    - prevailing rule = the matching rule with the most labels;
      exception rules beat everything; no match → the implicit ``*``
      rule (suffix = the last label)
    - registered domain = public suffix + one label; a host that IS a
      public suffix is returned as-is (the most useful grouping key
      for corpus work — the PSL itself leaves it undefined)

    ``rules`` is the dict from :func:`parse_suffix_list` /
    :func:`load_suffix_list`; without it the bundled heuristic subset
    (``TWO_LEVEL_SUFFIXES``) runs through the SAME engine.

    SCALE CAVEAT: as a single Column expression this re-inlines the
    host regexp chain into every branch, which blows janino's 64 KB
    method limit and drops the projection to interpreted execution
    (correct but row-at-a-time).  On anything bigger than a literal
    fixture use :func:`with_registered_domain` /
    :func:`add_url_columns`, which stage host+parts as real columns
    first and keep whole-stage codegen (see
    :func:`registered_domain_from_parts`)."""
    h = url_host(col)
    parts = F.split(h, r"\.")
    return registered_domain_from_parts(h, parts, rules)


def with_registered_domain(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "url_domain",
    rules: dict | None = None,
    host_col: str | None = None,
) -> DataFrame:
    """Codegen-safe eTLD+1: stage the host and its label array as real
    columns in one projection, then run the PSL decision over those
    ATTRIBUTES in the next (see :func:`registered_domain_from_parts`
    for why the one-expression form cannot compile).  Pass
    ``host_col`` when a host column already exists to skip the
    extraction entirely.  Both projections live in one whole-stage-
    codegen span — no shuffle, no Python."""
    h = F.col(host_col) if host_col is not None else url_host(F.col(url_col))
    staged = df.withColumn("__rd_h", h).withColumn(
        "__rd_p", F.split(F.col("__rd_h"), r"\.")
    )
    out = staged.withColumn(
        out_col,
        registered_domain_from_parts(
            F.col("__rd_h"), F.col("__rd_p"), rules
        ),
    )
    return out.drop("__rd_h", "__rd_p")


def add_url_columns(
    df: DataFrame,
    url_col: str = "url",
    prefix: str = "url_",
    suffix_rules: dict | None = None,
) -> DataFrame:
    """Adds ``{prefix}norm``, ``{prefix}host``, ``{prefix}domain``,
    ``{prefix}path_depth`` (count of non-empty path segments).

    The domain column rides the staged codegen-safe PSL path
    (:func:`with_registered_domain`), reusing ``{prefix}host`` as the
    pre-projected host so the extraction regexes run once per row."""
    u = F.col(url_col)
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    hosted = df.withColumn(f"{prefix}norm", normalize_url(u)).withColumn(
        f"{prefix}host", url_host(u)
    )
    return with_registered_domain(
        hosted,
        url_col=url_col,
        out_col=f"{prefix}domain",
        rules=suffix_rules,
        host_col=f"{prefix}host",
    ).withColumn(
        f"{prefix}path_depth",
        F.when(u.isNull(), F.lit(None).cast("int")).otherwise(depth),
    )


def dedup_by_url(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    buckets: int = 32,
) -> DataFrame:
    """One row per canonical URL — the smallest ``id_col`` survives
    (deterministic, matching the near-dup families' min-id policy).
    Rows with NULL urls all survive (nothing to key on).

    Scale: the min-id pick is a cap-1 instance of the two-phase
    salted-bucket ranking — a crawl with millions of copies of one
    canonical URL never concentrates on one task (round 6; output
    identical to the naive per-key window)."""
    keyed = df.withColumn("__uk", normalize_url(F.col(url_col)))
    out = _two_phase_cap(
        keyed,
        "__uk",
        1,
        [F.col(id_col)],
        F.xxhash64(F.col(id_col)),
        buckets,
    )
    return out.drop("__uk")


def _two_phase_cap(
    df: DataFrame,
    key_col: str,
    max_docs: int,
    ordering: list[Column],
    salt: Column,
    buckets: int,
) -> DataFrame:
    """Exact per-``key_col`` top-``max_docs`` by ``ordering`` with NO
    hot single task — the automated bound the engine's other capped
    blockings (LSH bucket caps, semdedup sub-split) already follow.

    Two windows instead of one:

    1. rank within ``(key, salt % buckets)`` — a pathologically hot
       key is spread over ``buckets`` tasks; keep rank ≤ max_docs.
       Any row in the TRUE per-key top-``max_docs`` has < max_docs
       rows ahead of it globally, hence < max_docs ahead of it inside
       its own bucket, so it always survives — phase 1 is a lossless
       (w.r.t. the final answer) pre-thin, no probabilistic cutoff.
    2. exact rank over the survivors (≤ buckets·max_docs per key —
       bounded, so the per-key task is bounded) — identical output to
       the naive single window, proven by the superset argument above.

    NULL keys bypass both windows (never capped) — split out BEFORE
    the window execs, not gated inside them: a ``when(null).otherwise(
    row_number())`` still partitions every NULL row into ONE window
    task (``partitionBy(key)`` hashes all NULLs together), which is
    exactly the hot single task this design exists to kill.  Crawl
    data makes NULL keys common (unparseable URLs), so the NULL side
    rides a plain filter + union and never touches an exchange."""
    from pyspark.sql import Window

    null_rows = df.filter(F.col(key_col).isNull())
    keyed = df.filter(F.col(key_col).isNotNull())
    bucket = F.pmod(salt, F.lit(buckets))
    w1 = Window.partitionBy(F.col(key_col), bucket).orderBy(*ordering)
    w2 = Window.partitionBy(key_col).orderBy(*ordering)
    phase1 = keyed.withColumn("__rn1", F.row_number().over(w1)).filter(
        F.col("__rn1") <= max_docs
    )
    capped = (
        phase1.withColumn("__rn2", F.row_number().over(w2))
        .filter(F.col("__rn2") <= max_docs)
        .drop("__rn1", "__rn2")
    )
    return capped.unionByName(null_rows)


def cap_per_host(
    df: DataFrame,
    max_docs: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    buckets: int = 32,
) -> DataFrame:
    """At most ``max_docs`` rows per host, chosen by smallest
    ``xxhash64(id)`` — deterministic, append-stable sampling (a doc
    that survives keeps surviving as the host grows, until its hash
    rank is displaced).  NULL-host rows are never capped.

    Scale: the cap is a two-phase salted-bucket ranking (see
    :func:`_two_phase_cap`) — a pathologically hot host (hundreds of
    millions of pages) is spread over ``buckets`` tasks in phase 1
    and bounded to ``buckets·max_docs`` rows in phase 2, with output
    IDENTICAL to the naive per-host window.  No caller-side pre-thin
    needed.  Pair with :func:`cap_per_host_stats` for the cap-hit
    counters (the ``bucket_cap_stats`` observability convention)."""
    keyed = df.withColumn("__host", url_host(F.col(url_col)))
    out = _two_phase_cap(
        keyed,
        "__host",
        max_docs,
        [F.xxhash64(F.col(id_col)), F.col(id_col)],
        F.xxhash64(F.col(id_col)),
        buckets,
    )
    return out.drop("__host")


def cap_per_host_stats(
    df: DataFrame,
    max_docs: int,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """1-row cap-hit panel for :func:`cap_per_host` — the silent-drop
    observability twin (``bucket_cap_stats`` convention): ``(cap,
    hosts_total, hosts_capped, rows_total, rows_dropped, max_host,
    null_host_rows)``.  NULL-host rows are exempt from the cap and
    reported separately.  Cost: one groupBy-count, no window."""
    sizes = (
        df.withColumn("__host", url_host(F.col(url_col)))
        .groupBy("__host")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    hosts = sizes.filter(F.col("__host").isNotNull())
    return (
        hosts.agg(
            F.lit(max_docs).cast("long").alias("cap"),
            F.count(F.lit(1)).cast("long").alias("hosts_total"),
            F.coalesce(
                F.sum((F.col("n") > max_docs).cast("long")), F.lit(0)
            ).cast("long").alias("hosts_capped"),
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("rows_total"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("n") > max_docs, F.col("n") - max_docs
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            ).cast("long").alias("rows_dropped"),
            F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("max_host"),
        )
        .crossJoin(
            sizes.filter(F.col("__host").isNull()).agg(
                F.coalesce(F.sum("n"), F.lit(0))
                .cast("long")
                .alias("null_host_rows")
            )
        )
    )
