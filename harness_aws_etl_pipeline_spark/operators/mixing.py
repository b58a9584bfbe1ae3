"""[EXT] Corpus mixing — domain-weighted sampling toward a target mix.

A training run specifies its data mix as per-source weights ("70%
web, 20% code, 10% books" — by tokens, not documents).  Given the
actual per-source token inventory, this module computes the largest
achievable mix honoring those weights without upsampling, and applies
it as a deterministic hash-sample per source.

Reference parity note: the reference has no mixing/sampling surface
(single-source S3 prefix, ``etl/src/extract/extractor.py:42-102``);
this is part of the [EXT] training-data layer.

Determinism contract (same as ``sampling.py``): membership is a pure
function of (key, salt) — appends never reshuffle previously kept
documents, reruns are bit-identical, and the md5 hash path is
reproducible by any engine, which is how the differential oracle
verifies the whole operator including the threshold arithmetic.

Threshold arithmetic is EXACT INTEGER math end-to-end: weights are
integers, per-source keep-thresholds are ``(budget · w_s · 2^32) //
(W · T_s)`` computed with arbitrary-precision ints on the driver and
HUGEINT in the oracle — no float boundary for a document's md5 draw to
straddle.

Scale design (100 TB): the only driver-side state is the per-source
token totals — one row per source (tens, not millions; same bounded
collect class as IVF centroids).  The sample filter itself is a pure
column predicate (predicate-pushdown-friendly, no join, no shuffle);
``cap_per_domain`` is a two-phase salted-bucket ranking — no single
task ever sees a whole hot domain (round 6; NULL domains are exempt
from the cap, matching ``cap_per_host``'s convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.functions.text import word_count
from harness_aws_etl_pipeline_spark.operators.sampling import md5_split_key

__all__ = [
    "domain_stats",
    "mix_thresholds",
    "sample_to_mix",
    "cap_per_domain",
    "cap_per_domain_stats",
    "shuffle_corpus",
    "plan_epochs",
    "repeat_to_budget",
]

_HASH_SPACE = 1 << 32  # md5 8-hex-char prefix space


def domain_stats(
    df: DataFrame,
    domain_col: str = "source",
    token_expr: Column | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Per-domain inventory: ``(domain, docs, tokens)``.  One partial-
    aggregated groupBy; output is one row per source."""
    tok = token_expr if token_expr is not None else word_count(text_col)
    return (
        df.withColumn("_tok", tok)
        .groupBy(F.col(domain_col).alias("domain"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("_tok").cast("long").alias("tokens"),
        )
    )


def temperature_weights(
    totals: dict[str, int],
    temperature: float,
    scale: int = 1_000_000,
) -> dict[str, int]:
    """Temperature-scaled source weights: ``w_s ∝ T_s^(1/τ)``, the
    standard multilingual/multi-source rebalancing rule (τ=1 keeps
    natural proportions, τ→∞ approaches uniform, τ<1 sharpens toward
    the biggest sources).

    Returns INTEGER weights (largest source scaled to ``scale``) so
    the result plugs straight into the exact-integer md5-threshold
    machinery of :func:`mix_thresholds` / :func:`sample_to_mix` —
    the float pow happens once, driver-side, and everything
    downstream stays exactly reproducible.
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    active = {s: t for s, t in totals.items() if t > 0}
    if not active:
        raise ValueError("no source with positive tokens")
    raw = {s: float(t) ** (1.0 / temperature) for s, t in active.items()}
    top = max(raw.values())
    out = {s: max(1, round(v / top * scale)) for s, v in raw.items()}
    return out


def mix_thresholds(
    totals: dict[str, int],
    weights: dict[str, int],
    budget_tokens: int | None = None,
) -> dict[str, str]:
    """Per-source md5 keep-thresholds for the largest mix honoring
    integer ``weights`` without upsampling any source.

    The achievable budget is ``B = min_s floor(T_s · W / w_s)`` (the
    total token count at which the scarcest source is fully consumed),
    further capped by ``budget_tokens``.  Source *s* then keeps
    ``B · w_s / (W · T_s)`` of its tokens, applied as an 8-hex-char
    md5 threshold (exact integer arithmetic; see module docstring).
    Sources absent from ``weights`` keep nothing.
    """
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative integers")
    active = {s: w for s, w in weights.items() if w > 0}
    total_w = sum(active.values())
    if total_w == 0:
        raise ValueError("at least one weight must be positive")
    missing = [s for s in active if totals.get(s, 0) <= 0]
    if missing:
        raise ValueError(f"weighted sources with no tokens: {missing}")
    budget = min(totals[s] * total_w // active[s] for s in active)
    if budget_tokens is not None:
        budget = min(budget, budget_tokens)
    out: dict[str, str] = {}
    for s, w in active.items():
        t = budget * w * _HASH_SPACE // (total_w * totals[s])
        out[s] = "g" if t >= _HASH_SPACE else format(t, "08x")
    return out


def _threshold_col(domain_col: str, thresholds: dict[str, str]) -> Column:
    thr = F.lit("00000000")  # unlisted domains keep nothing
    for domain, hexcut in thresholds.items():
        thr = F.when(F.col(domain_col) == domain, F.lit(hexcut)).otherwise(thr)
    return thr


def sample_to_mix(
    df: DataFrame,
    weights: dict[str, int],
    budget_tokens: int | None = None,
    key: str = "doc_id",
    domain_col: str = "source",
    token_expr: Column | None = None,
    text_col: str = "text",
    salt: int = 0,
) -> DataFrame:
    """Filter ``df`` down to the target mix.

    Two passes: (1) aggregate per-source token totals (collected to
    the driver — one row per source), (2) filter on the per-source md5
    threshold.  Document-level hash sampling attains the token share
    in expectation; at corpus scale the realized share concentrates
    tightly (documented approximation, same as every hash-sampled
    mix).  Deterministic: a kept document stays kept across reruns and
    appends (until its source's threshold changes).
    """
    stats = domain_stats(df, domain_col, token_expr, text_col)
    totals = {r["domain"]: r["tokens"] for r in stats.collect()}
    thresholds = mix_thresholds(totals, weights, budget_tokens)
    draw = md5_split_key(key, salt)
    return df.filter(draw < _threshold_col(domain_col, thresholds))


def cap_per_domain(
    df: DataFrame,
    n: int,
    domain_col: str = "source",
    order_by: list[Column] | None = None,
    id_col: str = "doc_id",
    buckets: int = 32,
) -> DataFrame:
    """Keep at most ``n`` documents per domain — the over-represented-
    host guard.  Deterministic ranking (``order_by`` with ``id_col``
    tiebreak).

    Scale: two-phase salted-bucket ranking (``urlops._two_phase_cap``)
    — a pathologically hot domain is spread over ``buckets`` tasks in
    phase 1 and bounded to ``buckets·n`` rows per domain in phase 2;
    output is IDENTICAL to the naive single per-domain window (any
    true top-``n`` row has < n rows ahead of it in its own bucket).
    No caller-side pre-thin needed; counters via
    :func:`cap_per_domain_stats`."""
    from harness_aws_etl_pipeline_spark.operators.urlops import _two_phase_cap

    ordering = (order_by or []) + [F.col(id_col)]
    return _two_phase_cap(
        df, domain_col, n, ordering, F.xxhash64(F.col(id_col)), buckets
    )


def cap_per_domain_stats(
    df: DataFrame,
    n: int,
    domain_col: str = "source",
) -> DataFrame:
    """1-row cap-hit panel for :func:`cap_per_domain` (the
    ``bucket_cap_stats`` observability convention): ``(cap,
    domains_total, domains_capped, rows_total, rows_dropped,
    max_domain, null_domain_rows)``.  One groupBy-count, no window."""
    sizes = df.groupBy(F.col(domain_col).alias("__dom")).agg(
        F.count(F.lit(1)).alias("n")
    )
    doms = sizes.filter(F.col("__dom").isNotNull())
    return doms.agg(
        F.lit(n).cast("long").alias("cap"),
        F.count(F.lit(1)).cast("long").alias("domains_total"),
        F.coalesce(F.sum((F.col("n") > n).cast("long")), F.lit(0))
        .cast("long")
        .alias("domains_capped"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("rows_total"),
        F.coalesce(
            F.sum(
                F.when(F.col("n") > n, F.col("n") - n).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).cast("long").alias("rows_dropped"),
        F.coalesce(F.max("n"), F.lit(0)).cast("long").alias("max_domain"),
    ).crossJoin(
        sizes.filter(F.col("__dom").isNull()).agg(
            F.coalesce(F.sum("n"), F.lit(0))
            .cast("long")
            .alias("null_domain_rows")
        )
    )


def shuffle_corpus(
    df: DataFrame, key: str = "doc_id", salt: int = 0, hash_fn: str = "xxhash64"
) -> DataFrame:
    """Deterministic global shuffle for training output: total order by
    a keyed hash (range-partitioned sort — no single-task bottleneck).
    Same order on every run and engine (md5 path), unlike
    ``df.orderBy(rand(seed))`` whose draw is partition-layout-
    dependent.  ``hash_fn="md5"`` is the engine-agnostic/oracle path.
    """
    if hash_fn == "md5":
        return df.orderBy(md5_split_key(key, salt), F.col(key))
    if hash_fn != "xxhash64":
        raise ValueError('hash_fn must be "xxhash64" or "md5"')
    return df.orderBy(F.xxhash64(F.col(key), F.lit(salt)), F.col(key))


def plan_epochs(
    totals: dict[str, int],
    weights: dict[str, int],
    budget_tokens: int,
    max_epochs: int = 4,
) -> dict:
    """Data-constrained mix planning: unlike :func:`mix_thresholds`
    (downsample-only — the scarcest source caps the whole budget),
    scarce sources may be REPEATED up to ``max_epochs`` so the target
    weights hold at a larger budget (the regime of data-constrained
    scaling: a few epochs of a scarce high-weight source beat shrinking
    the run to it).

    The feasible budget is ``B = min(budget_tokens,
    min_s floor(max_epochs · T_s · W / w_s))`` — the total at which the
    scarcest source would exceed ``max_epochs``.  Source *s* then
    contributes ``target_s = B · w_s // W`` tokens as ``target_s //
    T_s`` full epochs plus one partial epoch hash-sampled at an exact
    8-hex md5 threshold (same integer arithmetic as
    :func:`mix_thresholds`, so the whole plan is oracle-reproducible).

    Returns ``{"budget": B, "total_weight": W, "domains": {s:
    {"tokens": T_s, "weight": w_s, "target_tokens", "full_epochs",
    "partial_threshold": 8-hex-or-'g'}}}``.
    """
    if max_epochs < 1:
        raise ValueError("max_epochs must be >= 1")
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative integers")
    active = {s: w for s, w in weights.items() if w > 0}
    total_w = sum(active.values())
    if total_w == 0:
        raise ValueError("at least one weight must be positive")
    missing = [s for s in active if totals.get(s, 0) <= 0]
    if missing:
        raise ValueError(f"weighted sources with no tokens: {missing}")
    budget = min(
        [budget_tokens]
        + [max_epochs * totals[s] * total_w // active[s] for s in active]
    )
    domains: dict[str, dict] = {}
    for s, w in active.items():
        target = budget * w // total_w
        full = target // totals[s]
        rem = target - full * totals[s]
        t = rem * _HASH_SPACE // totals[s]
        domains[s] = {
            "tokens": totals[s],
            "weight": w,
            "target_tokens": target,
            "full_epochs": int(full),
            "partial_threshold": "g" if t >= _HASH_SPACE else format(t, "08x"),
        }
    return {"budget": int(budget), "total_weight": total_w, "domains": domains}


def repeat_to_budget(
    df: DataFrame,
    weights: dict[str, int],
    budget_tokens: int,
    max_epochs: int = 4,
    key: str = "doc_id",
    domain_col: str = "source",
    token_expr: Column | None = None,
    text_col: str = "text",
    salt: int = 0,
    epoch_col: str = "_epoch",
) -> DataFrame:
    """Materialize the :func:`plan_epochs` mix: every kept row appears
    once per full epoch plus (hash-sampled) once in the partial epoch,
    tagged with ``epoch_col`` (0-based) so downstream shuffling/packing
    can interleave repeats.  Pure column work after the one bounded
    stats collect: explode over a per-domain epoch sequence, partial-
    epoch membership by the same deterministic md5 draw the mix
    sampler uses — appends and reruns are stable.  Unlisted domains
    contribute nothing.
    """
    stats = domain_stats(df, domain_col, token_expr, text_col)
    totals = {r["domain"]: r["tokens"] for r in stats.collect()}
    plan = plan_epochs(totals, weights, budget_tokens, max_epochs)

    full_col = F.lit(-1)
    thr_col = F.lit("00000000")
    for s, d in plan["domains"].items():
        full_col = F.when(F.col(domain_col) == s, F.lit(d["full_epochs"])).otherwise(
            full_col
        )
        thr_col = F.when(
            F.col(domain_col) == s, F.lit(d["partial_threshold"])
        ).otherwise(thr_col)
    draw = md5_split_key(key, salt)
    # epochs 0..full-1 are unconditional; epoch `full` is the partial
    # (kept iff the doc's draw clears the per-domain threshold)
    out = (
        df.withColumn("__full", full_col)
        .filter(F.col("__full") >= 0)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0), F.col("__full"))),
        )
        .filter(
            (F.col(epoch_col) < F.col("__full"))
            | (draw < thr_col)
        )
        .drop("__full")
    )
    return out
