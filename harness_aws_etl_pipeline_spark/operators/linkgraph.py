"""Link-graph construction + PageRank for corpus-level quality ranking.

A web training corpus wants more than per-document gates: the link
structure between hosts carries a global quality signal (the original
use of PageRank). The chain here completes the engine's web-corpus
path: WARC (`sources/warc.py`) → `html.extract_links` →
:func:`host_graph` (page links rolled up to a host→host edge multiset)
→ :func:`pagerank` → rank joined back as a mixing weight
(`operators/mixing.py` domain weights) or a quality gate.

Why FIXED-POINT arithmetic (``rank_scaled`` = rank × ``scale`` as
BIGINT) instead of doubles: distributed float aggregation is
non-reproducible — ``SUM(double)`` depends on partition merge order,
so two runs of the same job on the same data can rank borderline hosts
differently, and a Spark result can never be bit-compared to another
engine. Integer sums are associative/commutative exactly, so ranks are
byte-stable across runs, partitionings, AND engines (the DuckDB oracle
re-derives them bit-for-bit). The floor-division mass loss per
iteration is bounded by 1/scale per edge share — at the default
``scale`` = 1e12 that is noise, and it is deterministic noise.

Scale design (the 100 TB story):
- one iteration = one shuffle join (edges ⋈ ranks on src) + one
  groupBy(dst) partial-aggregated shuffle; edges + out-degrees are
  repartitioned by src ONCE and persisted, so the static side's
  exchange is reused every iteration;
- the dangling-node mass is a 1-row aggregate broadcast back in
  (crossJoin of a single row — no driver round trip in the plan);
- lineage is cut with ``localCheckpoint`` every ``checkpoint_every``
  iterations — without it the plan depth grows linearly and the
  optimizer re-analyzes an O(iterations)-deep tree;
- no ``collect`` except the node count (one scalar; ``tol`` adds one
  bounded scalar per iteration for the convergence delta).

Reference scope note: the reference pipeline (etl/src/transform/
transformer.py) has no graph operator — this extends the engine for
the web-corpus workload, same class as the dedup/ANN families.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "anchor_text_index",
    "bfs_distances",
    "clustering_coefficient",
    "hits",
    "host_graph",
    "pagerank",
    "rank_weights",
    "triangles",
]


def rank_weights(
    ranks: DataFrame,
    top_n: int = 10_000,
    weight_scale: int = 1_000_000,
) -> dict[str, int]:
    """Bridge from a PageRank vector to the integer weight dict the
    mixing machinery consumes (``mixing.mix_thresholds`` /
    ``temperature_weights``): the ``top_n`` nodes by rank, scaled so
    the best node weighs ``weight_scale`` (minimum 1 — a selected node
    never rounds to excluded). Driver-side by contract — ``top_n``
    bounds the collect the same way query/centroid frames are bounded
    elsewhere in the engine."""
    rows = (
        ranks.orderBy(F.desc("rank_scaled"), "node")
        .limit(top_n)
        .select("node", "rank_scaled")
        .collect()
    )
    if not rows:
        return {}
    top = rows[0]["rank_scaled"]
    if top <= 0:
        return {r["node"]: 1 for r in rows}
    return {
        r["node"]: max(1, r["rank_scaled"] * weight_scale // top) for r in rows
    }


def anchor_text_index(
    docs: DataFrame,
    html_col: str = "html",
    k: int = 5,
) -> DataFrame:
    """Incoming anchor texts per link target — the relevance signal
    search engines (and corpus quality models) attach to a URL: what
    OTHER pages call it. Output: ``(href, anchor_cnt, top_texts)``
    with the ``k`` most frequent distinct texts, most-frequent first
    (ties by text).

    Scale shape: hot targets (a popular URL gathers millions of
    anchors) never concentrate in one task — the first aggregation
    keys on (href, text) so partial aggregation combines map-side,
    and only the per-href top-k rank window sees one row per DISTINCT
    text. No unbounded collect_list over raw anchors.
    """
    from pyspark.sql import Window

    from harness_aws_etl_pipeline_spark.operators.html import extract_anchors

    anchors = (
        docs.select(F.explode(extract_anchors(html_col)).alias("_a"))
        .select(F.col("_a.href").alias("href"), F.col("_a.text").alias("text"))
        .where((F.col("href") != "") & (F.col("text") != ""))
    )
    counted = anchors.groupBy("href", "text").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.partitionBy("href").orderBy(F.desc("cnt"), "text")
    return (
        counted.withColumn("_rk", F.row_number().over(w))
        .groupBy("href")
        .agg(
            F.sum("cnt").cast("long").alias("anchor_cnt"),
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_rk") <= k,
                            F.struct("_rk", "text"),
                        )
                    )
                ),
                lambda s: s["text"],
            ).alias("top_texts"),
        )
    )


def host_graph(
    docs: DataFrame,
    url_col: str = "url",
    links_col: str = "links",
    keep_self_loops: bool = False,
    by: str = "host",
    psl_rules: dict | None = None,
) -> DataFrame:
    """Harvested page links → host→host edge list with multiplicities.

    ``docs`` carries one row per page: its own URL (``url_col``) and
    the array of outgoing link URLs (``links_col``, the output of
    ``html.extract_links``). Relative links (no scheme/host) are
    dropped — they stay on the same host and become self-loops, which
    say nothing about cross-host endorsement. Output:
    ``(src, dst, weight)`` with weight = number of links from pages on
    ``src`` to pages on ``dst``.

    ``by="domain"`` rolls nodes up to eTLD+1 (``urlops.
    registered_domain``, optionally with a loaded public-suffix list
    via ``psl_rules``) — the granularity domain-weighted mixing uses,
    so the rank vector joins straight onto ``cap_per_domain`` /
    ``domain_stats`` keys. ``by="host"`` (default) keeps full hosts.

    Pure column expressions (explode + two host/domain extractions +
    one aggregation) — one shuffle on (src, dst).
    """
    from harness_aws_etl_pipeline_spark.operators.urlops import (
        url_host,
        with_registered_domain,
    )

    if by not in ("host", "domain"):
        raise ValueError("by must be 'host' or 'domain'")

    # src is keyed BEFORE the explode (one extraction per page, not
    # per link); domain keys ride the staged codegen-safe PSL path
    # (urlops.with_registered_domain) — the one-expression
    # registered_domain form re-inlines the host regex chain per
    # branch and drops to interpreted eval
    if by == "domain":
        src_keyed = with_registered_domain(
            docs, url_col=url_col, out_col="__src", rules=psl_rules
        )
    else:
        src_keyed = docs.withColumn("__src", url_host(F.col(url_col)))
    exploded = src_keyed.select(
        F.col("__src").alias("src"), F.explode(links_col).alias("_link")
    )
    if by == "domain":
        keyed = with_registered_domain(
            exploded, url_col="_link", out_col="dst", rules=psl_rules
        )
    else:
        keyed = exploded.withColumn("dst", url_host(F.col("_link")))
    edges = keyed.select("src", "dst").where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    if not keep_self_loops:
        edges = edges.where(F.col("src") != F.col("dst"))
    return edges.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("weight")
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 10,
    scale: int | None = None,
    checkpoint_every: int = 2,
    partitions: int | None = None,
    lazy: bool = False,
    tol: float | None = None,
    init_hubs: DataFrame | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) in exact fixed-point
    arithmetic — the complement to :func:`pagerank` on the same host
    graph: a good HUB links to many good authorities (directories,
    link lists, sitemaps), a good AUTHORITY is linked from many good
    hubs (canonical content pages). For corpus curation the authority
    vector is the quality weight (mirror/aggregator hosts rank as hubs,
    not authorities, so they stop inflating their own mixing weight the
    way raw in-degree would).

    Per iteration: ``auth(j) = Σ_{i→j} hub(i)·w`` then L1-normalized
    back to total ``scale``; ``hub(i) = Σ_{i→j} auth(j)·w`` then
    normalized likewise. Normalization is the integer
    ``x·scale div total`` — every step is add/multiply/floor-divide,
    so the vectors are bit-reproducible across runs, partitionings,
    and engines (the catalog oracle re-derives three unrolled
    iterations in DuckDB).

    Returns ``(node, hub_scaled BIGINT, auth_scaled BIGINT,
    hub DOUBLE, auth DOUBLE)`` with hub = hub_scaled / scale; nodes
    with no out-edges have hub 0, no in-edges auth 0.

    Overflow headroom: the largest intermediate is
    ``raw·scale ≤ scale² × Σw`` — ``scale`` defaults to the largest
    power of 10 with ``scale² × Σw < 9e18`` (and the same
    ``scale ≥ 1000 × n`` precision floor pagerank enforces); an
    explicit ``scale`` outside that bound raises rather than silently
    overflowing.

    Scale shape matches pagerank's: per iteration two edge⋈vector
    shuffles with the edge side repartitioned+persisted ONCE, totals
    as broadcast 1-row aggregates, generations persisted (each is
    referenced twice) and released at ``checkpoint_every`` lineage
    cuts. ``lazy=True`` compiles everything into one nested plan for
    planted fixtures.

    ``checkpoint_every`` defaults TIGHTER than pagerank's (2 vs 5):
    each HITS iteration runs TWO propagates and each propagate
    references its raw frame twice (total + join), so the un-cut plan
    tree grows ~4× per iteration (vs pagerank's 2×) — persists bound
    the EXECUTION to one compute per generation, but the nested
    logical/cached-plan TREE still doubles per propagate, and plan
    stringification at the final ``localCheckpoint`` goes exponential
    past a handful of un-cut iterations.

    ``tol`` (eager mode only) stops early once the L1 delta of the HUB
    vector between consecutive iterations — an integer sum, so the
    check is deterministic — drops under ``tol × scale``;
    ``iterations`` becomes the cap and the frame carries the count as
    ``_hits_iterations`` (pagerank's ``_pr_iterations`` convention).

    ``init_hubs`` warm-starts the hub vector from a previous run
    (``(node, hub_scaled)``): exactly L1-renormalized to ``scale``
    over the CURRENT node set, absent nodes at the uniform cold-start
    mass. Because HITS converges to the principal singular vectors
    from any non-degenerate start, a warm start on a slightly-grown
    graph reaches ``tol`` in fewer iterations; with fixed
    ``iterations`` the floor-noise bits differ from a cold run.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if tol is not None and lazy:
        raise ValueError("tol requires eager mode (per-iteration delta jobs)")

    e = edges.select(
        F.col(src).cast("string").alias("_h_src"),
        F.col(dst).cast("string").alias("_h_dst"),
        (
            F.col(weight).cast("long") if weight else F.lit(1).cast("long")
        ).alias("_w"),
    )
    if weight:
        e = e.where(F.col("_w") >= 1)
    e = e.repartition(partitions, "_h_src") if partitions else e.repartition("_h_src")
    if not lazy:
        e = e.persist()
    nodes = (
        e.select(F.col("_h_src").alias("node"))
        .union(e.select("_h_dst"))
        .distinct()
    )
    if not lazy:
        nodes = nodes.persist()
    held = () if lazy else (e, nodes)

    out_schema = (
        "node string, hub_scaled long, auth_scaled long, hub double, auth double"
    )
    n = nodes.count()
    if n == 0:
        for df in held:
            df.unpersist()
        return edges.sparkSession.createDataFrame([], out_schema)
    total_w = e.agg(F.sum("_w")).first()[0] or 0
    if total_w == 0:
        for df in held:
            df.unpersist()
        return edges.sparkSession.createDataFrame([], out_schema)
    # scale² · Σw must stay inside int64 — auto-pick the largest
    # power of 10 under the bound, floor at the precision guard
    max_scale = int((9 * 10**18 // total_w) ** 0.5)
    if scale is None:
        scale = 10 ** max(3, len(str(max_scale)) - 1)
    if scale > max_scale:
        for df in held:
            df.unpersist()
        raise ValueError(
            f"scale={scale} overflows int64 for total edge weight {total_w} "
            f"(max safe scale {max_scale})"
        )
    if scale < 1000 * n:
        for df in held:
            df.unpersist()
        raise ValueError(
            f"scale={scale} too small for {n} nodes — scores would lose all "
            f"precision; use scale >= {1000 * n} (max safe {max_scale})"
        )

    hub = nodes.select("node", F.lit(scale // n).cast("long").alias("s"))
    if init_hubs is not None:
        ih = init_hubs.select(
            F.col("node").cast("string").alias("_wnode"),
            F.col("hub_scaled").cast("long").alias("_whub"),
        )
        raw0 = nodes.join(ih, nodes["node"] == F.col("_wnode"), "left").select(
            "node",
            F.coalesce(
                F.when(F.col("_whub") >= 1, F.col("_whub")),
                F.lit(scale // n).cast("long"),
            ).alias("_h0"),
        )
        if not lazy:
            raw0 = raw0.localCheckpoint(eager=True)
        tot0 = int(
            raw0.agg(F.coalesce(F.sum("_h0"), F.lit(0)).cast("long")).first()[0]
        )
        if tot0 > 0:
            hub = raw0.select(
                "node",
                F.expr(f"(CAST(_h0 AS DECIMAL(38,0)) * {scale}) div {tot0}")
                .cast("long")
                .alias("s"),
            )
    gens: list[DataFrame] = []

    def _propagate(vec: DataFrame, key_in: str, key_out: str) -> DataFrame:
        """raw(key_out) = Σ vec(key_in)·w, L1-renormalized to scale."""
        raw = (
            e.join(vec, e[key_in] == vec["node"])
            .groupBy(key_out)
            .agg(F.sum(F.col("s") * F.col("_w")).cast("long").alias("_raw"))
        )
        if not lazy:
            raw = raw.persist()
            gens.append(raw)
        total = raw.agg(
            F.coalesce(F.sum("_raw"), F.lit(0)).cast("long").alias("_tot")
        )
        normed = (
            nodes.join(raw, nodes["node"] == raw[key_out], "left")
            .crossJoin(F.broadcast(total))
            .select(
                "node",
                F.when(
                    F.col("_tot") > 0,
                    F.expr(f"(coalesce(_raw, 0L) * {scale}) div _tot"),
                )
                .otherwise(F.lit(0))
                .cast("long")
                .alias("s"),
            )
        )
        if not lazy:
            normed = normed.persist()
            gens.append(normed)
        return normed

    for i in range(iterations):
        prev_hub = hub
        auth = _propagate(hub, "_h_src", "_h_dst")
        hub = _propagate(auth, "_h_dst", "_h_src")
        if tol is not None:
            # integer L1 delta of the hub vector — deterministic stop
            delta = int(
                hub.join(
                    prev_hub.withColumnsRenamed({"node": "_pn", "s": "_ps"}),
                    hub["node"] == F.col("_pn"),
                )
                .agg(
                    F.coalesce(
                        F.sum(F.abs(F.col("s") - F.col("_ps"))), F.lit(0)
                    )
                )
                .first()[0]
            )
            if delta < tol * scale:
                break
        if (
            not lazy
            and checkpoint_every
            # under tol the delta job materializes each generation —
            # cut lineage every iteration (same plan-string-growth
            # rationale as pagerank's tol cut; HITS grows ~4x per
            # PROPAGATE, twice per iteration)
            and (tol is not None or (i + 1) % checkpoint_every == 0)
            and i + 1 < iterations
        ):
            auth = auth.localCheckpoint(eager=True)
            hub = hub.localCheckpoint(eager=True)
            for df in gens:
                df.unpersist()
            gens = []

    out = (
        hub.withColumnRenamed("s", "hub_scaled")
        .join(
            auth.withColumnRenamed("s", "auth_scaled"),
            "node",
        )
        .select(
            "node",
            "hub_scaled",
            "auth_scaled",
            (F.col("hub_scaled") / F.lit(float(scale))).alias("hub"),
            (F.col("auth_scaled") / F.lit(float(scale))).alias("auth"),
        )
    )
    if lazy:
        return out
    out = out.localCheckpoint(eager=True)
    for df in (*held, *gens):
        df.unpersist()
    out._hits_iterations = i + 1  # noqa: SLF001 - deliberate metadata attr
    return out


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 10,
    damping_pct: int = 85,
    scale: int = 10**12,
    checkpoint_every: int = 5,
    partitions: int | None = None,
    lazy: bool = False,
    tol: float | None = None,
    seeds: DataFrame | list[str] | None = None,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Power-iteration PageRank in exact fixed-point arithmetic.

    ``edges`` is a multiset: parallel (src, dst) rows act as edge
    weight. Per iteration, every node splits its scaled rank evenly
    over its out-edges (integer division), each node gathers
    ``damping_pct/100`` of its in-shares plus the teleport base, and
    the total mass of dangling nodes (no out-edges) is redistributed
    uniformly.

    ``weight`` names an integer edge-weight column (what
    :func:`host_graph` emits): one weighted row is defined as — and
    is bit-identical to — that many parallel unit rows (the per-node
    unit share ``rank // Σw`` is computed once and multiplied by the
    edge weight), so a rolled-up graph and its expansion produce the
    SAME rank vector. Rows with weight < 1 are dropped.

    Returns ``(node, rank_scaled BIGINT, rank DOUBLE)`` where
    ``rank = rank_scaled / scale``; the frame is eagerly
    ``localCheckpoint``-ed so callers get a bounded plan and the
    internal caches are already released. In-flight cache is bounded
    too: generations are released at every checkpoint boundary, and
    under ``tol`` only the latest two stay cached.

    Determinism: every arithmetic step is integer add / multiply /
    floor-divide — associative, so bit-identical regardless of
    partitioning, AQE decisions, or engine (the catalog oracle
    re-derives three iterations in DuckDB and matches the md5 of the
    full rank vector).

    Overflow headroom: all sums are bounded by ``scale`` (total mass
    never grows), and the largest intermediate is ``scale * 100``
    — keep ``scale ≤ 9e16`` (with weighted edges the unit-share ×
    weight product must also fit: keep ``scale × max_weight < 9e18``). For very large graphs pick
    ``scale ≥ 1000 × node count`` so the initial per-node mass
    ``scale // n`` keeps ~3 digits of precision; the guard below
    raises rather than silently degrading to all-zero ranks.

    ``lazy=True`` is the small-graph mode (planted fixtures, host
    graphs that fit a handful of tasks): no persists, no checkpoints,
    no eager materialization — the whole iteration compiles into ONE
    nested plan and the only job run at call time is the node count.
    Don't use it for deep iteration counts on big graphs: the plan
    depth grows linearly and the static sides get recomputed each
    iteration instead of read from cache.

    ``tol`` (eager mode only) enables early stopping: after each
    iteration the L1 delta ``Σ|r_i − r_{i−1}|`` is measured — an
    integer sum, so the check itself is deterministic — and the loop
    stops once ``delta < tol × scale``. ``iterations`` becomes the
    cap. Cost: one extra (cached-input) aggregation job per
    iteration; worth it whenever the iteration cap is generous.

    ``seeds`` makes it PERSONALIZED PageRank: teleport and dangling
    mass go uniformly to the seed set only (a 1-column DataFrame of
    node values, or a small list), so ranks measure proximity to the
    seeds — the standard trick for "rank hosts by closeness to a
    known-good allowlist" corpus weighting. With every node seeded the
    result is bit-identical to the unseeded run; nodes with no inbound
    path from the seeds get rank exactly 0.

    ``init_ranks`` is the WARM START: a ``(node, rank_scaled)`` frame
    (a previous run's output, e.g. from
    :class:`~harness_aws_etl_pipeline_spark.operators.incremental.IncrementalLinkGraph`)
    used as iteration 0 instead of the uniform vector. Ranks are
    exactly L1-renormalized to ``scale`` over the CURRENT node set
    (``r·scale div Σr`` in decimal — no overflow, Σ ≤ scale holds);
    nodes absent from ``init_ranks`` start at the cold-start mass.
    Power iteration has a unique fixed point, so with ``tol`` the warm
    run converges to the same ranks (within floor noise) in fewer
    iterations when the graph changed little; with a fixed
    ``iterations`` budget the trajectory — and therefore the exact
    floor-noise bits — differs from a cold run by design.
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if tol is not None and lazy:
        raise ValueError("tol requires eager mode (per-iteration delta jobs)")

    e = edges.select(
        F.col(src).cast("string").alias("_pr_src"),
        F.col(dst).cast("string").alias("_pr_dst"),
        (
            F.col(weight).cast("long") if weight else F.lit(1).cast("long")
        ).alias("_w"),
    )
    if weight:
        e = e.where(F.col("_w") >= 1)
    # static per-iteration sides: repartition by the join key ONCE and
    # persist — every iteration's edges ⋈ ranks reuses this exchange.
    # ``partitions`` sizes the whole iteration (small planted graphs
    # don't need the session-wide shuffle width; huge graphs need more)
    e = (
        e.repartition(partitions, "_pr_src") if partitions else e.repartition("_pr_src")
    )
    if not lazy:
        e = e.persist()
    nodes = (
        e.select(F.col("_pr_src").alias("node"))
        .union(e.select("_pr_dst"))
        .distinct()
    )
    outdeg = e.groupBy("_pr_src").agg(F.sum("_w").alias("_out_deg"))
    if not lazy:
        nodes = nodes.persist()
        outdeg = outdeg.persist()
    held = () if lazy else (e, nodes, outdeg)

    n = nodes.count()
    if n == 0:
        for df in held:
            df.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "node string, rank_scaled long, rank double"
        )
    if scale < 1000 * n:
        for df in held:
            df.unpersist()
        raise ValueError(
            f"scale={scale} too small for {n} nodes — ranks would lose all "
            f"precision; use scale >= {1000 * n}"
        )
    d = int(damping_pct)

    if seeds is not None:
        spark_ = edges.sparkSession
        seed_df = (
            spark_.createDataFrame([(s,) for s in seeds], "node string")
            if isinstance(seeds, list)
            else seeds.select(F.col(seeds.columns[0]).cast("string").alias("node"))
        ).distinct()
        nodes = nodes.join(
            seed_df.withColumn("_seed", F.lit(True)), "node", "left"
        ).select("node", F.coalesce("_seed", F.lit(False)).alias("_seed"))
        if not lazy:
            nodes = nodes.persist()
            held = (*held, nodes)
        n_tp = nodes.where("_seed").count()
        if n_tp == 0:
            for df in held:
                df.unpersist()
            raise ValueError("seeds match no node in the graph")
    else:
        nodes = nodes.select("node", F.lit(True).alias("_seed"))
        n_tp = n
    base = (scale * (100 - d) // 100) // n_tp
    seed_base = F.when(F.col("_seed"), F.lit(base)).otherwise(F.lit(0))

    cold0 = (
        F.when(F.col("_seed"), F.lit(scale // n_tp))
        .otherwise(F.lit(0))
        .cast("long")
    )
    ranks = nodes.select("node", cold0.alias("rank_scaled"))
    if init_ranks is not None:
        ir = init_ranks.select(
            F.col("node").cast("string").alias("_wnode"),
            F.col("rank_scaled").cast("long").alias("_wrank"),
        )
        raw0 = nodes.join(ir, nodes["node"] == F.col("_wnode"), "left").select(
            "node",
            F.coalesce(
                F.when(F.col("_wrank") >= 1, F.col("_wrank")), cold0
            ).alias("_r0"),
        )
        if not lazy:
            # referenced twice (total + renorm) — materialize once
            raw0 = raw0.localCheckpoint(eager=True)
        tot0 = int(
            raw0.agg(F.coalesce(F.sum("_r0"), F.lit(0)).cast("long")).first()[0]
        )
        if tot0 > 0:
            # exact L1 renorm to scale: decimal multiply then integral
            # divide — Σ rank_scaled ≤ scale, preserving the overflow
            # headroom invariant of the iteration itself
            ranks = raw0.select(
                "node",
                F.expr(
                    f"(CAST(_r0 AS DECIMAL(38,0)) * {scale}) div {tot0}"
                )
                .cast("long")
                .alias("rank_scaled"),
            )
    rank_gens: list[DataFrame] = []
    for i in range(iterations):
        r = ranks.join(outdeg, ranks["node"] == outdeg["_pr_src"], "left")
        dang = (
            r.where(F.col("_out_deg").isNull())
            .agg(F.coalesce(F.sum("rank_scaled"), F.lit(0)).cast("long").alias("_dang"))
        )
        shares = r.where(F.col("_out_deg").isNotNull()).select(
            F.col("node").alias("_snode"),
            F.expr("rank_scaled div _out_deg").alias("_share"),
        )
        contrib = (
            e.join(shares, e["_pr_src"] == shares["_snode"])
            .groupBy("_pr_dst")
            .agg(
                F.sum(F.col("_share") * F.col("_w")).cast("long").alias("_in_sum")
            )
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["_pr_dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    seed_base
                    + F.expr(f"(coalesce(_in_sum, 0L) * {d}) div 100")
                    + F.when(
                        F.col("_seed"),
                        F.expr(f"((_dang * {d}) div 100) div {n_tp}"),
                    ).otherwise(F.lit(0))
                ).cast("long").alias("rank_scaled"),
            )
        )
        if not lazy:
            # each new rank vector is referenced TWICE by the next
            # iteration (dangling mass + shares) — without a persist
            # the plan tree doubles per iteration and execution cost
            # grows 2^iterations; with it every generation computes
            # once (the standard iterative-algorithm pattern)
            ranks = ranks.persist()
            converged = False
            if tol is not None and rank_gens:
                prev = rank_gens[-1]
                delta = (
                    ranks.join(
                        prev.withColumnsRenamed(
                            {"node": "_pnode", "rank_scaled": "_prev"}
                        ),
                        ranks["node"] == F.col("_pnode"),
                    )
                    .agg(F.sum(F.abs(F.col("rank_scaled") - F.col("_prev"))))
                    .first()[0]
                )
                converged = int(delta) < tol * scale
            rank_gens.append(ranks)
            if tol is not None:
                # the delta job materialized current + prev, so older
                # generations can't be re-demanded — release them
                while len(rank_gens) > 2:
                    rank_gens.pop(0).unpersist()
            if converged:
                break
        if (
            not lazy
            and checkpoint_every
            # under tol every generation is ALREADY materialized by
            # the delta job, so cutting lineage each iteration is
            # near-free — and necessary: each generation references
            # the previous one twice (dang + shares), so the plan —
            # and the multi-MB plan STRINGS Spark's SQL listener
            # retains per job — grows ~4x per un-cut iteration
            # (measured: 16 MB at window depth 4; driver OOM by ~26
            # tol iterations before this cut)
            and (tol is not None or (i + 1) % checkpoint_every == 0)
            and i + 1 < iterations
        ):
            # the eager checkpoint materializes the cut — every prior
            # generation is now unreachable from future lineage
            ranks = ranks.localCheckpoint(eager=True)
            for df in rank_gens:
                df.unpersist()
            # keep the checkpointed frame as the tol baseline (its
            # later unpersist is a no-op — it's RDD-backed, not cached)
            rank_gens = [ranks]

    out = ranks.withColumn("rank", F.col("rank_scaled") / F.lit(float(scale)))
    if lazy:
        return out
    out = out.localCheckpoint(eager=True)
    for df in (*held, *rank_gens):
        df.unpersist()
    # iterations actually run (early stop makes it < the cap) — rides
    # the frame the way shards.py exposes _shard_cache
    out._pr_iterations = i + 1  # noqa: SLF001 - deliberate metadata attr
    return out


# --------------------------------------------- triangles / clustering


def _oriented(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """The undirected simple graph, each edge stored ONCE, oriented
    from the lower-(degree, id) endpoint to the higher — the standard
    degree-ordering that caps every node's oriented out-degree at
    O(√m), which is what keeps the wedge join from exploding on hub
    nodes (a 10⁶-degree hub enumerates 10¹² wedges un-oriented; its
    oriented out-degree is bounded by the count of HIGHER-degree
    neighbors). Columns: (s, t, dt) with dt = degree of t, carried so
    downstream wedge pairs can be ordered by the same total order."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b"))
    )
    und = e.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    j = und.join(du, "u").join(dv, "v")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return j.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dt"),
    )


def triangles(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact per-node triangle counts over the UNDIRECTED simple
    graph of ``edges`` (direction, weight, and parallel edges are
    collapsed; self-loops dropped). Output: ``(node, deg, tri_cnt)``
    — one row per node of the simple graph, ``tri_cnt`` the number
    of triangles the node belongs to, ``deg`` its undirected degree.

    Compact-forward / node-iterator algorithm: orient edges by
    (degree, id), self-join on the wedge apex, close each wedge with
    one more equi-join. Each triangle materializes exactly once
    (its three vertices appear in orientation order), then explodes
    to its three corners for the per-node rollup. Three shuffles on
    node keys; total wedge work is O(m^{3/2}) regardless of skew —
    the bound the degree ordering buys.
    """
    o = _oriented(edges, src, dst)
    e1, e2 = o.alias("e1"), o.alias("e2")
    wedge_order = (F.col("e1.dt") < F.col("e2.dt")) | (
        (F.col("e1.dt") == F.col("e2.dt")) & (F.col("e1.t") < F.col("e2.t"))
    )
    wedges = e1.join(
        e2, (F.col("e1.s") == F.col("e2.s")) & wedge_order
    ).select(
        F.col("e1.s").alias("a"),
        F.col("e1.t").alias("b"),
        F.col("e2.t").alias("c"),
    )
    closing = o.select(F.col("s").alias("b"), F.col("t").alias("c"))
    tri = wedges.join(closing, ["b", "c"])
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("tri_cnt"))
    )
    deg = (
        o.select(F.col("s").alias("node"))
        .unionAll(o.select(F.col("t").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    return deg.join(per_node, "node", "left").select(
        "node",
        "deg",
        F.coalesce("tri_cnt", F.lit(0).cast("long")).alias("tri_cnt"),
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node:
    ``lcc = 2·tri / (deg·(deg−1))`` — the fraction of a node's
    neighbor pairs that are themselves connected (NULL for deg < 2,
    where the ratio is undefined). Adds ``lcc`` (double) to the
    :func:`triangles` output; the (deg, tri_cnt) integers stay exact
    for engines that want to re-derive or hash the ratio."""
    t = triangles(edges, src, dst)
    denom = F.col("deg") * (F.col("deg") - 1)
    return t.withColumn(
        "lcc",
        F.when(
            F.col("deg") >= 2,
            F.col("tri_cnt") * 2 / denom.cast("double"),
        ),
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_hops: int = 6,
    directed: bool = True,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Minimum hop count from a SEED SET to every reachable node
    within ``max_hops`` — crawl-depth features, link-distance-to-
    trusted-hosts quality signals, blast-radius queries. Output:
    ``(node, hop)``, one row per reached node (seeds at hop 0);
    unreachable nodes are absent.

    Frontier expansion: each hop is one join (frontier ⋈ edges on the
    source key) + one left-anti against the visited set — nodes enter
    at their FIRST (minimal) hop, so re-expansion of visited nodes
    never happens and the per-hop work is O(edges out of the
    frontier). Edges are repartitioned on the source key once and
    persisted — every hop reuses that one exchange. Each frontier is
    eagerly ``localCheckpoint``-ed: it cuts the O(hops)-deep lineage
    AND doubles as the (bounded, frontier-sized) early-stop check —
    the loop ends as soon as a frontier is empty. No driver-side data
    beyond the per-hop count scalar.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0: {max_hops}")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
        )
    e = (
        e.where(F.col("s").isNotNull() & F.col("d").isNotNull())
        .distinct()
        .repartition("s")
        .persist()
    )
    dist = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    try:
        for hop in range(1, max_hops + 1):
            neigh = (
                frontier.join(e, frontier["node"] == e["s"])
                .select(F.col("d").alias("node"))
                .distinct()
                .withColumn("hop", F.lit(hop))
            )
            new = neigh.join(
                dist.select("node"), "node", "left_anti"
            ).localCheckpoint(eager=True)
            if new.isEmpty():
                break
            dist = dist.unionByName(new)
            if hop % checkpoint_every == 0:
                dist = dist.localCheckpoint(eager=True)
            frontier = new
        return dist
    finally:
        e.unpersist()
