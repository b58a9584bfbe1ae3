"""[EXT] Fuzzy / near-duplicate deduplication at training-data scale.

Four strategies over a document table, in increasing
cost-per-candidate order:

1. exact content hash (md5 / xxhash64) — one shuffle on an 8-16 byte
   key (see operators/dedup.py:deduplicate_by_hash)
2. n-gram Jaccard with inverted-index blocking — explode distinct
   shingles, self-join on shingle, exact Jaccard on candidates only
3. MinHash + LSH banding — constant-size signature per doc, candidates
   from band-bucket collisions; the O(n²) pair space never materializes
4. SimHash — one 64-bit sketch per doc; near-dups collide on bands of
   bits / small Hamming distance

Scale design: every strategy is shuffle-bounded on *short keys*
(shingle hash, band hash, sketch), never on document text. The
pair-generation joins are self-equi-joins that AQE skew-handles when a
hot shingle/band appears (a stopword shingle at 100 TB can bucket
millions of docs — ``max_bucket_size`` caps that explicitly, the same
frequent-bucket cutoff used in production near-dup pipelines).

All hashing is ``xxhash64`` with integer seeds — deterministic across
runs and executors, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.functions.text import shingles, tokens


def shingle_sets(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """(id, shingles array, set size) — distinct shingles per doc."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        shingles(text_col, n).alias("shingles"),
    ).withColumn("set_size", F.size("shingles"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard, blocked on shared
    shingles (inverted index).

    Plan: per-doc distinct shingles → explode → drop shingles shared by
    more than ``max_bucket_size`` docs (frequent-shingle cutoff: they
    generate quadratic candidates and carry no signal) → self-join on
    shingle (the inverted-index lookup) → per-pair intersection count
    via groupBy → Jaccard = |∩| / (|A|+|B|−|∩|) → threshold filter.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    sets = shingle_sets(df, id_col, text_col, n).filter(F.col("set_size") > 0)
    posting = sets.select("doc_id", "set_size", F.explode("shingles").alias("shingle"))

    bucket_sizes = posting.groupBy("shingle").agg(F.count(F.lit(1)).alias("bucket_n"))
    posting = posting.join(
        bucket_sizes.filter(F.col("bucket_n") <= max_bucket_size).select("shingle"),
        "shingle",
    )

    a = posting.select(
        F.col("shingle"),
        F.col("doc_id").alias("doc_a"),
        F.col("set_size").alias("size_a"),
    )
    b = posting.select(
        F.col("shingle"),
        F.col("doc_id").alias("doc_b"),
        F.col("set_size").alias("size_b"),
    )
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("inter"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return pairs


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 64,
) -> DataFrame:
    """(doc_id, signature array<long>) — MinHash signature from k seeded
    xxhash64 passes over the distinct shingle set. Narrow projection;
    cost is O(shingles × k) JVM-side hash evaluations, no shuffle."""
    sets = shingle_sets(df, id_col, text_col, n).filter(F.col("set_size") > 0)
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shingles"), lambda s, i=i: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )
    return sets.select("doc_id", sig.alias("signature"))


def minhash_lsh_candidates(
    signatures: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """LSH banding: hash each band of the signature to a bucket;
    docs sharing any (band, bucket) are candidate pairs.

    Shuffle key is (band_idx, band_hash) — 16 bytes — and the join
    output is bounded by bucket sizes, which ``max_bucket_size`` caps
    against degenerate buckets. Returns (doc_a, doc_b) distinct.
    """
    exploded = signatures.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            *[F.col("signature")[i * rows_per_band + r] for r in range(rows_per_band)]
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    sizes = exploded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("bucket_n"))
    exploded = exploded.join(
        sizes.filter(
            (F.col("bucket_n") > 1) & (F.col("bucket_n") <= max_bucket_size)
        ).select("band", "bucket"),
        ["band", "bucket"],
    )

    a = exploded.select("band", "bucket", F.col("doc_id").alias("doc_a"))
    b = exploded.select("band", "bucket", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → band candidates
    → candidate verification with estimated Jaccard (fraction of
    matching signature positions). Returns (doc_a, doc_b, est_jaccard).
    """
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    cands = minhash_lsh_candidates(sigs, bands, num_hashes // bands)
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("signature").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("signature").alias("sig_b"))
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "est_jaccard",
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda m: m,
                )
            ).cast("double")
            / F.lit(num_hashes),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """(doc_id, simhash long) — 64-bit SimHash over token hashes.

    For each bit position, majority vote of token-hash bits (+1/−1),
    folded into one long. Pure array expressions — codegen'd, no UDF,
    no shuffle.
    """
    token_hashes = F.transform(F.array_distinct(tokens(text_col)), lambda t: F.xxhash64(t))
    # Shift amounts must be compile-time ints, so the 64 bit-vote
    # aggregates are unrolled in Python — still one projection, all
    # sharing the token_hashes subtree via CSE.
    def vote(i: int):
        return (
            F.when(
                F.aggregate(
                    token_hashes,
                    F.lit(0).cast("long"),
                    lambda acc, h: acc
                    + (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1),
                )
                > 0,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )

    # shiftleft|bitwiseOR instead of *2+bit: bit ops don't trip ANSI
    # overflow checks when the sign bit fills
    sim = F.lit(0).cast("long")
    for i in range(bits):
        sim = F.shiftleft(sim, 1).bitwiseOR(vote(i))
    return df.select(F.col(id_col).alias("doc_id"), sim.alias("simhash"))


def simhash_near_pairs(
    sketches: DataFrame, max_hamming: int = 3, band_bits: int = 16
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``,
    blocked on 16-bit bands (a pair within Hamming 3 of a 64-bit sketch
    must agree exactly on at least one of the 4 bands — pigeonhole).
    Returns (doc_a, doc_b, hamming)."""
    nbands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = sketches.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(nbands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.key").alias("key"))

    a = banded.select("band", "key", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    b = banded.select("band", "key", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
