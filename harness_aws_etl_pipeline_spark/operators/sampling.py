"""[EXT] Deterministic dataset splitting & sampling for training data.

Train/val/test splits at 100 TB must be (a) deterministic across
reruns and cluster layouts, (b) stable under data appends (a document
never migrates between splits), and (c) free of driver-side state.
Hash-based assignment gives all three: ``bucket = xxhash64(key, salt)
mod 100``; a row's split depends only on its key.

``sample_fraction`` is the same mechanism as a WHERE clause —
predicate-pushdown-friendly, unlike ``df.sample`` whose
partition-seeded RNG reshuffles membership whenever partitioning
changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def split_bucket(key: Column | str, salt: int = 0, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from a key column."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(c, F.lit(salt)), F.lit(buckets))


def md5_split_threshold(frac: float) -> str:
    """8-hex-char threshold for :func:`md5_split_key`: a key is in the
    ~``frac`` side iff its md5 prefix sorts below this string.
    ``frac >= 1`` returns ``"g"`` (sorts after every hex string →
    keep-all); ``frac <= 0`` returns ``"00000000"`` (keep-none)."""
    if frac >= 1.0:
        return "g"
    if frac <= 0.0:
        return "00000000"
    return format(int(frac * (1 << 32)), "08x")


def md5_split_key(key: Column | str, salt: int = 0) -> Column:
    """First 8 hex chars of ``md5(key || '|' || salt)`` — an
    engine-agnostic uniform draw. md5 is identical in Spark, DuckDB,
    Python's hashlib, etc., and fixed-width hex strings compare in
    numeric order, so split membership is reproducible OUTSIDE this
    engine (the oracle path; xxhash64 stays the cheap default)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(
        F.md5(F.concat(c.cast("string"), F.lit(f"|{salt}"))), 1, 8
    )


def split_train_test(
    df: DataFrame,
    key: str,
    train_frac: float = 0.8,
    salt: int = 0,
    hash_fn: str = "xxhash64",
) -> tuple[DataFrame, DataFrame]:
    """(train, test) split on a stable key hash. A key's assignment
    never changes with appends, repartitioning, or rerun.

    ``hash_fn="md5"`` draws the bucket from the md5 hex prefix instead
    of xxhash64 — same determinism/stability guarantees, ~2^-32 split
    granularity instead of 1/100, and reproducible by any engine with
    md5 (the differential-oracle path)."""
    if hash_fn == "md5":
        cut_hex = md5_split_threshold(train_frac)
        h = md5_split_key(key, salt)
        return df.filter(h < cut_hex), df.filter(h >= cut_hex)
    if hash_fn != "xxhash64":
        raise ValueError('hash_fn must be "xxhash64" or "md5"')
    cut = int(round(train_frac * 100))
    bucket = split_bucket(key, salt)
    return df.filter(bucket < cut), df.filter(bucket >= cut)


def sample_fraction(
    df: DataFrame,
    key: str,
    fraction: float,
    salt: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic ~fraction sample keyed on the hash bucket.
    ``hash_fn="md5"`` draws from the md5 hex prefix (engine-agnostic,
    ~2^-32 granularity — the oracle path, same as the split/stratified
    samplers)."""
    if hash_fn == "md5":
        return df.filter(md5_split_key(key, salt) < md5_split_threshold(fraction))
    if hash_fn != "xxhash64":
        raise ValueError('hash_fn must be "xxhash64" or "md5"')
    cut = int(round(fraction * 10_000))
    c = F.pmod(F.xxhash64(F.col(key), F.lit(salt)), F.lit(10_000))
    return df.filter(c < cut)


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict,
    salt: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling (class rebalancing for
    training mixes): each stratum keeps its own hash-bucket fraction;
    strata absent from ``fractions`` are dropped. Same determinism
    guarantees as :func:`sample_fraction` — membership is a pure
    function of (key, salt), so rebuilding the mix with new weights
    reuses overlapping rows instead of reshuffling everything.

    ``hash_fn="md5"`` draws from the md5 hex prefix (engine-agnostic,
    ~2^-32 granularity) — the differential-oracle path."""
    if hash_fn == "md5":
        draw = md5_split_key(key, salt)
        threshold = F.lit("00000000")  # unlisted strata keep nothing
        for stratum, frac in fractions.items():
            threshold = F.when(
                F.col(strata_col) == stratum,
                F.lit(md5_split_threshold(frac)),
            ).otherwise(threshold)
        return df.filter(draw < threshold)
    if hash_fn != "xxhash64":
        raise ValueError('hash_fn must be "xxhash64" or "md5"')
    bucket = F.pmod(F.xxhash64(F.col(key), F.lit(salt)), F.lit(10_000))
    # per-stratum threshold: chained when() over the strata, else 0
    threshold = F.lit(0)
    for stratum, frac in fractions.items():
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(frac * 10_000)))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def sample_exact_n(
    df: DataFrame,
    n: int,
    key: Column | str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """EXACTLY ``n`` rows (or all, if fewer), deterministically.

    Fraction sampling (:func:`sample_fraction`) attains its rate in
    expectation; evaluation sets and seeding samples need an exact
    count.  The draw is "smallest ``xxhash64(key, salt)`` first" with
    the key itself as tie-break — a uniform permutation of the corpus,
    independent of partition layout, reproducible across reruns, and
    stable under appends in the top-k sense (a new document displaces
    at most one previous member).

    Plan shape: ``TakeOrderedAndProject`` — each partition keeps its
    local top-n, the driver merges; no full sort, no full shuffle.
    """
    if n < 0:
        raise ValueError("n must be >= 0")
    k = F.col(key) if isinstance(key, str) else key
    draw = F.xxhash64(k.cast("string"), F.lit(salt))
    return df.orderBy(draw, k).limit(n)


def sample_weighted_n(
    df: DataFrame,
    n: int,
    weight_col: str,
    key: str,
    salt: int = 0,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """EXACTLY ``n`` rows sampled WITHOUT replacement with probability
    proportional to ``weight_col`` (per group, if ``group_cols``) —
    Efraimidis–Spirakis A-Res: each row draws a deterministic uniform
    ``u`` from its md5 prefix and is ranked by the exponential jump
    ``e = -ln(u) / w``; the n SMALLEST win. Length-weighted corpus
    seeding, importance-weighted eval sets, per-domain quotas.

    Determinism: ``u`` is a pure function of (key, salt) — the md5
    machinery :func:`md5_split_key` uses — so membership survives
    reruns, appends (a new row displaces at most one member), and any
    partition layout. ``e`` is reproducible by any engine whose
    ``ln`` is correctly rounded for the 2³² possible ``u`` values
    (ulp-level ties between two rows' draws are ~2⁻⁴⁰ improbable).

    Rows with NULL or non-positive weight are excluded (zero weight =
    never sampled; A-Res has no meaning for w ≤ 0).

    Plan shape: ungrouped — ``TakeOrderedAndProject`` (per-partition
    top-n, driver merge, no full sort); grouped — one window on the
    group key.
    """
    if n < 0:
        raise ValueError("n must be >= 0")
    w = F.col(weight_col).cast("double")
    u_int = F.conv(md5_split_key(key, salt), 16, 10).cast("long")
    u = (u_int.cast("double") + F.lit(1.0)) / F.lit(4294967296.0)
    e = -F.log(u) / w
    kept = df.filter(w.isNotNull() & (w > 0))
    if not group_cols:
        return kept.orderBy(e.alias("_e"), key).limit(n)
    from pyspark.sql import Window

    win = Window.partitionBy(*group_cols).orderBy(e, F.col(key))
    return (
        kept.withColumn("_rn", F.row_number().over(win))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
