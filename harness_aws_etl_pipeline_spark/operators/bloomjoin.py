"""Bloom-filter join pruning — cut the big side's shuffle before it happens.

The classic 100-TB join problem: ``fact ⋈ dim`` where the dim side is
too big to broadcast as a hash relation but still far smaller than the
fact side. A plain sort-merge/shuffled-hash join shuffles EVERY fact
row, including the (often vast) majority whose key never appears on
the dim side. A Bloom filter built from the dim keys is a few MB —
broadcastable even when the dim rows are not — and filtering the fact
side through it removes most non-matching rows BEFORE the exchange,
so the shuffle pays only for rows that (probably) match.

Safety: a Bloom filter has NO false negatives, so pruning never drops
a matching row; false positives survive the pre-filter but are
removed by the actual join that still runs afterwards — the final
result is PROVABLY identical to the unpruned join (the property the
catalog oracle pins: bloom-pruned counts vs DuckDB's plain joins).

Spark-first shape (everything JVM-side, no UDFs, no driver bitmap):

- build: per dim key, ``num_hashes`` positions via seeded ``xxhash64``
  → (word, bit-mask) pairs → ``groupBy(word).agg(bit_or)`` — the
  bitmap is assembled DISTRIBUTED with a map-side-combinable integer
  aggregate, then collapsed to a single-row ``map<long,long>`` (sparse:
  only words with set bits, ≤ num_bits/64 entries);
- probe: ``crossJoin(broadcast(words))`` + an unrolled AND of k
  bit-test expressions inside whole-stage codegen. The fact side sees
  one broadcast and a filter — no exchange, no aggregation.

Spark's own AQE runtime filters (``spark.sql.optimizer.runtime.
bloomFilter.enabled``) inject this automatically for some plans; this
operator makes the technique explicit, composable (the filter is a
value you can persist and reuse across queries/batches), and
observable (the prune's row counts are plain DataFrame counts — the
bench leg records ``shuffle_reduction`` from them).

Operating regime: the sparse map materializes in ONE row (one task,
then a broadcast), so it must fit comfortably in an executor/driver —
at the default 10 bits/key that is ~1 GB per ~800M distinct dim keys;
the practical envelope is dims up to the low hundreds of millions of
keys, i.e. "too big to broadcast as ROWS, small enough to broadcast
as a BITMAP". Beyond that, lower ``num_bits`` (higher fp rate still
prunes usefully) or split the dim and prune through per-split filters.

Reference scope note: the reference pipeline joins nothing larger
than its own staging tables (etl/src/transform/transformer.py); this
extends the engine's join family (broadcast, skew-salted, asof,
interval) with the semi-join-reduction strategy every warehouse uses
at fact-table scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BloomFilter",
    "bloom_anti_join",
    "bloom_build",
    "bloom_join",
    "bloom_prune",
]

_WORDS_COL = "_bloom_words"

# xxhash64 is TYPE-sensitive: int 5 and long 5 hash differently, while
# the equi-join they feed would happily coerce and match them. Hash a
# canonical widened type so a filter built from an int column prunes a
# long probe column correctly (and vice versa).
_CANON_CASTS = {
    "tinyint": "bigint",
    "smallint": "bigint",
    "int": "bigint",
    "float": "double",
}


def _canon_type(df: DataFrame, col: str) -> str:
    t = df.schema[col].dataType.simpleString()
    return _CANON_CASTS.get(t, t)


def _canon(df: DataFrame, col: str) -> Column:
    t = df.schema[col].dataType.simpleString()
    c = F.col(col)
    return c.cast(_CANON_CASTS[t]) if t in _CANON_CASTS else c


def _check_probe_type(bloom: "BloomFilter", df: DataFrame, col: str) -> None:
    """The prune is only sound when build and probe keys hash the same
    bytes. ``_CANON_CASTS`` reconciles int widths and float/double, but
    a decimal / date / string key meeting a long key would EQUI-JOIN
    after Spark's implicit coercion while ``xxhash64`` hashes them
    differently — Bloom false NEGATIVES, i.e. silently dropped matches.
    Refuse loudly instead of pruning wrong."""
    probe_t = _canon_type(df, col)
    if bloom.key_type and probe_t != bloom.key_type:
        raise ValueError(
            f"bloom probe key {col!r} has canonical type {probe_t!r} but the "
            f"filter was built over {bloom.key_type!r}; xxhash64 is type-"
            "sensitive, so pruning across this pair would drop matching rows "
            "— cast both keys to one type explicitly first"
        )


@dataclass(frozen=True)
class BloomFilter:
    """A distributed Bloom filter over one key column.

    ``words`` is a 1-row DataFrame holding the sparse bitmap as
    ``map<long, long>`` (word index → 64-bit word); ``num_bits`` and
    ``num_hashes`` stay driver-side because the probe expression is
    UNROLLED (k bit tests in codegen) — they shape the plan, not the
    data. The whole object is plan-only: nothing is collected until a
    probe executes."""

    words: DataFrame
    num_bits: int
    num_hashes: int
    # canonical simpleString of the build key's type — probes against a
    # different canonical type are rejected (xxhash64 is type-sensitive;
    # see _check_probe_type). Empty = unchecked (pre-r8 pickles/tests).
    key_type: str = ""

    def might_contain(self, col: Column | str) -> Column:
        """Membership predicate for a row already joined with
        ``words`` (see :func:`bloom_prune`, which does the broadcast
        crossJoin for you). NULL keys test False — a NULL never
        equi-joins, so pruning it preserves join equality."""
        c = F.col(col) if isinstance(col, str) else col
        pred = c.isNotNull()
        for i in range(self.num_hashes):
            p = F.pmod(F.xxhash64(c, F.lit(i)), F.lit(self.num_bits))
            word = F.element_at(F.col(_WORDS_COL), F.shiftright(p, 6))
            mask = F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                p.bitwiseAND(F.lit(63)).cast("int"),
            )
            pred = pred & F.coalesce(
                word.bitwiseAND(mask) != F.lit(0), F.lit(False)
            )
        return pred


def bloom_build(
    df: DataFrame,
    col: str,
    num_hashes: int = 5,
    num_bits: int | None = None,
    expected: int | None = None,
) -> BloomFilter:
    """Build a :class:`BloomFilter` from ``df[col]``'s non-NULL values.

    ``num_bits`` defaults to ``10 × expected`` rounded up to a word
    boundary (~0.9% false positives at the default 5 hashes);
    ``expected`` defaults to an ``approx_count_distinct`` over the key
    — a single aggregate whose shuffle carries HLL sketches, not rows,
    and which sizes on DISTINCT keys (bit-OR is idempotent, so dup-
    heavy dims don't oversize the bitmap the way a row count would).
    Pass ``expected`` explicitly to skip that job entirely when the
    build side's cardinality is already known. The estimate's ~2% rsd
    means the bitmap can be slightly under-sized: the fp rate drifts
    from ~0.9% toward ~1.1% in the worst case — join RESULTS are
    unaffected (false positives are re-checked by the real join; false
    negatives cannot happen regardless of sizing)."""
    if num_hashes < 1:
        raise ValueError("num_hashes must be >= 1")
    if num_bits is None:
        n = (
            expected
            if expected is not None
            else df.agg(
                F.approx_count_distinct(_canon(df, col), rsd=0.02).alias("n")
            ).first()["n"]
        )
        num_bits = max(64, ((10 * max(n, 1) + 63) // 64) * 64)
    if num_bits % 64 != 0 or num_bits < 64:
        raise ValueError("num_bits must be a positive multiple of 64")
    key = _canon(df, col)
    positions = df.where(key.isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
                    for i in range(num_hashes)
                ]
            )
        ).alias("_p")
    )
    words = (
        positions.select(
            F.shiftright("_p", 6).alias("_w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.col("_p").bitwiseAND(F.lit(63)).cast("int"),
            ).alias("_b"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_b").alias("_bits"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_w", "_bits"))
            ).alias(_WORDS_COL)
        )
    )
    return BloomFilter(
        words=words,
        num_bits=num_bits,
        num_hashes=num_hashes,
        key_type=_canon_type(df, col),
    )


def bloom_prune(df: DataFrame, col: str, bloom: BloomFilter) -> DataFrame:
    """``df`` minus rows whose ``col`` is definitely absent from the
    filter's key set (NULL keys prune too — they cannot equi-join).
    One broadcast + a codegen'd filter; no shuffle, no aggregation on
    ``df``'s side."""
    _check_probe_type(bloom, df, col)
    return (
        df.crossJoin(F.broadcast(bloom.words))
        .filter(bloom.might_contain(_canon(df, col)))
        .drop(_WORDS_COL)
    )


def bloom_join(
    big: DataFrame,
    small: DataFrame,
    on: str | tuple[str, str],
    how: str = "inner",
    num_hashes: int = 5,
    num_bits: int | None = None,
    expected: int | None = None,
) -> DataFrame:
    """``big ⋈ small`` with the big side Bloom-pruned first — result
    identical to the plain join, shuffle sized by (probable) matches.

    ``on`` is one column name shared by both sides or a
    ``(big_col, small_col)`` pair. ``how`` must preserve equality
    under pruning non-matching BIG rows: ``inner``, ``left_semi``, or
    ``right`` (big side is the left operand throughout) — an outer
    join that keeps unmatched big rows would see them vanish, so it
    is rejected."""
    if how not in ("inner", "left_semi", "right"):
        raise ValueError(
            f"how={how!r} would drop unmatched big-side rows that an "
            "equality-preserving prune must keep; use inner/left_semi/right"
        )
    big_col, small_col = (on, on) if isinstance(on, str) else on
    bloom = bloom_build(
        small, small_col, num_hashes=num_hashes, num_bits=num_bits,
        expected=expected,
    )
    pruned = bloom_prune(big, big_col, bloom)
    if big_col == small_col:
        return pruned.join(small, on=big_col, how=how)
    return pruned.join(
        small, on=pruned[big_col] == small[small_col], how=how
    )


def bloom_anti_join(
    big: DataFrame,
    small: DataFrame,
    on: str | tuple[str, str],
    num_hashes: int = 5,
    num_bits: int | None = None,
    expected: int | None = None,
    persist: bool = False,
) -> DataFrame:
    """``big`` minus rows whose key appears in ``small`` (left-anti),
    with the opposite routing from :func:`bloom_join`: a Bloom
    NEGATIVE is definitive, so rows the filter rejects are KEPT
    without ever touching the join — only the (small) bloom-positive
    candidate set rides the real anti-join, which then removes the
    true matches and readmits the false positives. NULL keys never
    equi-match, so they take the definite-keep path too.

    Result is provably identical to ``big.join(small, on,
    "left_anti")``; the anti-join's shuffle is sized by matches + fp
    instead of by ``big``.  Operating note — the split SCANS the big
    side twice: the keep branch and the candidate branch each
    re-evaluate scan → broadcast → filter (two passes of read I/O, one
    filter each, zero shuffle on the keep branch). That trade is right
    when shuffle bytes dominate scan bytes — the usual case for a
    selective blocklist over columnar files with pushdown, where the
    avoided exchange (sort + spill + network on ALL of ``big``) costs
    far more than a second pushdown-pruned scan. When the big side is
    expensive to produce (an upstream join/agg, a non-reusable stream)
    pass ``persist=True`` to pin the tagged frame with an eager
    ``localCheckpoint`` so both branches read one materialization —
    checkpoint, not ``.persist()``, keeps the engine's cache-hygiene
    contract (no CacheManager entry to leak from a lazily-returned
    frame; blocks free on GC). At true 100 TB inputs prefer the
    double scan; materializing the whole fact table costs more than
    it saves. The blocklist-scale takedown shape
    (``apply_takedown_ids``) at dims too big to broadcast as rows."""
    big_col, small_col = (on, on) if isinstance(on, str) else on
    bloom = bloom_build(
        small, small_col, num_hashes=num_hashes, num_bits=num_bits,
        expected=expected,
    )
    _check_probe_type(bloom, big, big_col)
    pred = bloom.might_contain(_canon(big, big_col))
    tagged = big.crossJoin(F.broadcast(bloom.words))
    if persist:
        tagged = tagged.localCheckpoint(eager=True)
    definite_keep = tagged.filter(~pred).drop(_WORDS_COL)
    candidates = tagged.filter(pred).drop(_WORDS_COL)
    if big_col == small_col:
        survivors = candidates.join(small, on=big_col, how="left_anti")
    else:
        survivors = candidates.join(
            small, on=candidates[big_col] == small[small_col], how="left_anti"
        )
    return definite_keep.unionByName(survivors)
