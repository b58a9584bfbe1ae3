"""Fast-stress tier — bounded, DEFAULT-ON versions of the scale
claims in tests/test_scale_stress.py (which stays opt-in via
SPARK_GRAFT_STRESS=1 at 10-100x these sizes).  Every test here runs in
seconds so the distributed paths — pointer-doubling components, FFD
packing, broadcast decontam, hot-cluster sub-split, moment-partial
PCA — are exercised in every CI run, not only when someone remembers
to flip the stress flag."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from tests.tiers import deep


@deep


def test_components_chains_50k(spark):
    """500 chains of 100 nodes under the forced DISTRIBUTED loop
    (driver_threshold=0): pointer doubling must converge with exact
    min labels — the same worst-shape claim as the 1M stress test."""
    from harness_aws_etl_pipeline_spark.operators.dedup_fuzzy import (
        near_dup_clusters,
    )

    pairs = (
        spark.range(50_000)
        .filter(F.col("id") % 100 != 99)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    labels = near_dup_clusters(pairs, driver_threshold=0)
    assert labels.count() == 50_000
    wrong = labels.filter(
        F.col("cluster_id") != F.col("doc_id") - F.col("doc_id") % 100
    ).count()
    assert wrong == 0
    assert labels.select("cluster_id").distinct().count() == 500


def test_components_string_ids_10k(spark):
    """String ids force the exact changed-row convergence check every
    doubling round; the loop must still converge correctly."""
    from harness_aws_etl_pipeline_spark.operators.dedup_fuzzy import (
        near_dup_clusters,
    )

    pairs = (
        spark.range(10_000)
        .filter(F.col("id") % 100 != 99)
        .select(
            F.format_string("doc-%05d", F.col("id")).alias("doc_a"),
            F.format_string("doc-%05d", F.col("id") + 1).alias("doc_b"),
        )
    )
    labels = near_dup_clusters(pairs, driver_threshold=0)
    assert labels.count() == 10_000
    wrong = labels.filter(
        F.col("cluster_id")
        != F.format_string(
            "doc-%05d",
            (F.regexp_extract("doc_id", r"(\d+)", 1).cast("long") / 100).cast(
                "long"
            )
            * 100,
        )
    ).count()
    assert wrong == 0


@deep


def test_packing_100k_docs(spark):
    """FFD packing at 100k docs from an injected token expression:
    no overfull bin, <5% slack, doc conservation."""
    from harness_aws_etl_pipeline_spark.operators.packing import pack_sequences

    docs = spark.range(100_000).select(F.col("id").alias("doc_id"))
    packed = pack_sequences(
        docs, capacity=256, token_expr=(F.col("doc_id") % 97 + 8), buckets=16
    )
    bins = packed.groupBy("bin_id").agg(F.sum("n_tokens").alias("fill"))
    row = bins.agg(
        F.count(F.lit(1)).alias("bins"),
        F.max("fill").alias("maxfill"),
        F.sum("fill").alias("total"),
    ).collect()[0]
    assert row["maxfill"] <= 256
    assert row["bins"] * 256 < row["total"] * 1.05
    assert packed.count() == 100_000


def test_decontam_planted_exact_50k(spark):
    """Broadcast-blocklist decontamination at 50k docs: hit counts are
    exact by construction (every 200th doc embeds a benchmark 8-gram)."""
    from harness_aws_etl_pipeline_spark.operators.decontam import (
        contamination_hits,
    )

    bench = spark.range(50).select(
        F.col("id").alias("qid"),
        F.concat_ws(
            " ",
            F.lit("planted benchmark sequence token"),
            F.col("id").cast("string"),
            F.lit("alpha beta gamma delta"),
        ).alias("text"),
    )
    corpus = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 200 == 0,
            F.concat_ws(
                " ",
                F.lit("prefix words planted benchmark sequence token"),
                ((F.col("id") / 200) % 50).cast("long").cast("string"),
                F.lit("alpha beta gamma delta suffix words"),
            ),
        )
        .otherwise(
            F.concat_ws(
                " ",
                F.lit("clean document body"),
                F.col("id").cast("string"),
                F.lit("with enough tokens to form many eight grams"),
            )
        )
        .alias("text"),
    )
    hits = contamination_hits(corpus, bench, n=8, bench_text_col="text")
    assert hits.count() == 50_000 // 200


def test_semantic_dedup_hot_cluster_capped(spark):
    """8k same-direction vectors in ONE cluster with cap 1024: the
    sub-split bounds the gram matrix and keeps exactly one survivor
    per cell (8192/1024 = 8 cells)."""
    from harness_aws_etl_pipeline_spark.operators.semdedup import (
        semantic_dedup_flags,
    )

    dim = 16
    cents = spark.createDataFrame(
        [(0, [1.0] + [0.0] * (dim - 1)), (1, [0.0, 1.0] + [0.0] * (dim - 2))],
        "centroid_id long, centroid array<double>",
    )
    vecs = spark.range(8_192).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.when(i == 0, (F.col("id") % 7 + 1).cast("double")).otherwise(
                F.lit(0.0)
            ),
        ).alias("embedding"),
    )
    flags = semantic_dedup_flags(
        vecs, centroids=cents, threshold=0.95, dim=dim,
        policy="greedy", order="min_id", max_cluster_size=1024,
    )
    assert flags.filter("keep").count() == 8


def test_pca_moments_100k(spark):
    """PCA at 100k x 16-dim from column expressions: planted dominant
    direction recovered; the fit stays comfortably in-bounds because
    the driver only ever sees task-count moment partials."""
    import numpy as np

    from harness_aws_etl_pipeline_spark.operators.pca import pca_fit

    dim = 16
    vecs = spark.range(100_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.when(
                i == 0, ((F.xxhash64(F.col("id")) % 1000) / 50.0).cast("double")
            ).otherwise(((F.xxhash64(F.col("id"), i) % 1000) / 500.0).cast("double")),
        ).alias("embedding"),
    )
    t0 = time.monotonic()
    model = pca_fit(vecs, k=4, dim=dim)
    wall = time.monotonic() - t0
    assert model["n"] == 100_000
    comp0 = np.asarray(model["components"][0])
    assert abs(comp0[0]) > 0.99, "planted dominant direction not found"
    assert wall < 90, f"PCA fit too slow at 100k: {wall:.1f}s"


def test_web_extraction_chain_20k(spark):
    """20k synthetic HTML documents through html_to_text +
    extract_links as pure column expressions: exact extracted text per
    doc (closed-form in the id), one link each, no Python in the path."""
    from harness_aws_etl_pipeline_spark.operators.html import (
        extract_links,
        html_to_text,
    )

    docs = spark.range(20_000).select(
        F.col("id"),
        F.concat(
            F.lit("<html><head><title>t</title><style>p{x}</style></head>"
                  "<body><p>body "),
            F.col("id").cast("string"),
            F.lit(' text</p><a href="https://h.com/'),
            F.col("id").cast("string"),
            F.lit('">l</a></body></html>'),
        ).alias("html"),
    )
    out = docs.select(
        "id",
        html_to_text("html").alias("text"),
        F.size(extract_links("html")).alias("nl"),
    )
    bad = out.filter(
        (F.col("text") != F.concat(
            F.lit("t body "), F.col("id").cast("string"), F.lit(" text\nl")
        ))
        | (F.col("nl") != 1)
    ).count()
    assert bad == 0


def test_robots_verdicts_50k_docs_5k_hosts(spark):
    """50k URLs across 5k hosts against 1k disallow rules: verdicts
    stay exact (closed-form expected denials) with the doc side never
    shuffling (broadcast per-host rule arrays)."""
    from harness_aws_etl_pipeline_spark.operators.robots import robots_filter

    docs = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("https://h"),
            (F.col("id") % 5000).cast("string"),
            F.lit(".com/p/"),
            F.col("id").cast("string"),
        ).alias("url"),
    )
    rules = spark.createDataFrame(
        [(f"h{h}.com", "disallow", "/p/", 3) for h in range(0, 5000, 5)],
        "host string, rule string, prefix string, prefix_len int",
    )
    denied = (
        robots_filter(docs, rules, mode="flag")
        .filter(~F.col("robots_allowed"))
        .count()
    )
    assert denied == 10_000  # hosts ≡ 0 (mod 5) → ids ≡ 0 (mod 5)


def test_container_probe_4k_media(spark):
    """4k synthesized MP4/MP3 payloads probed in one Arrow pass:
    closed-form duration sums both modalities."""
    from harness_aws_etl_pipeline_spark.operators.containers import (
        probe_media_containers,
        synthesize_mp3_media,
        synthesize_mp4_media,
    )

    docs = spark.range(1, 2001).withColumnRenamed("id", "doc_id")
    media = synthesize_mp4_media(docs).unionByName(synthesize_mp3_media(docs))
    got = {
        r["container"]: r["s"]
        for r in probe_media_containers(media)
        .groupBy("container")
        .agg(F.sum("duration_ms").alias("s"))
        .collect()
    }
    ids = range(1, 2001)
    assert got["mp4"] == sum(500 + i % 1000 for i in ids)
    assert got["mp3"] == sum(36 * (10 + i % 20) for i in ids)


def test_pagerank_ring_plus_hub_20k(spark):
    """20k-node graph (ring + every node also links to a hub) through
    the eager production path: exact structural facts survive scale —
    ring symmetry means every non-hub node has the SAME fixed-point
    rank (integer determinism, not approximate equality), the hub
    dominates, and total mass is conserved up to floor loss."""
    from harness_aws_etl_pipeline_spark.operators.linkgraph import pagerank

    n = 20_000
    ring = spark.range(n).select(
        F.col("id").cast("string").alias("src"),
        ((F.col("id") + 1) % n).cast("string").alias("dst"),
    )
    to_hub = spark.range(n).select(
        F.col("id").cast("string").alias("src"), F.lit("hub").alias("dst")
    )
    scale = 10**12
    t0 = time.time()
    ranks = pagerank(ring.union(to_hub), iterations=4, scale=scale,
                     checkpoint_every=2)
    agg = ranks.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.sum("rank_scaled").alias("mass"),
        F.countDistinct(
            F.when(F.col("node") != "hub", F.col("rank_scaled"))
        ).alias("distinct_nonhub"),
        F.max(F.struct("rank_scaled", "node"))["node"].alias("top"),
    ).first()
    elapsed = time.time() - t0
    assert agg["nodes"] == n + 1
    assert agg["distinct_nonhub"] == 1  # exact symmetry, bit-for-bit
    assert agg["top"] == "hub"
    assert scale - int(agg["mass"]) < 4 * (2 * n + n + 1) * 10
    assert elapsed < 60, f"pagerank 20k took {elapsed:.1f}s"


def test_bloom_join_1m_fact_equality_and_prune(spark):
    """1M-row fact against a 1k-key dim through the Bloom-pruned join:
    result EXACTLY equals the plain join (no false negatives at
    scale), and the prune removes ≥95% of the non-matching fact rows
    before the exchange — the semi-join-reduction claim measured at a
    size where eviction of it would be visible."""
    from harness_aws_etl_pipeline_spark.operators.bloomjoin import (
        bloom_build,
        bloom_join,
        bloom_prune,
    )

    fact = spark.range(1_000_000).select(
        (F.col("id") % 100_000).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(1_000).select((F.col("id") * 97 + 13).alias("k"))
    start = time.time()
    got = bloom_join(fact, dim, "k").agg(
        F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")
    ).first()
    exp = fact.join(dim, "k").agg(
        F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")
    ).first()
    assert (got["c"], got["s"]) == (exp["c"], exp["s"])
    kept = bloom_prune(fact, "k", bloom_build(dim, "k")).count()
    matching = exp["c"]
    assert kept >= matching  # no false negatives
    assert kept - matching <= 0.05 * 1_000_000  # fp mass bounded
    assert time.time() - start < 60


@deep


def test_evolve_footer_scan_200_files(spark, tmp_path_factory):
    """200 files across two schema generations: the footer scan stays
    a single short metadata job (no data read), grouping finds exactly
    2 distinct schemas, and the evolved read returns every row with
    the widened type."""
    from harness_aws_etl_pipeline_spark.sources.evolve import (
        read_parquet_evolved,
        scan_parquet_schemas,
    )

    root = str(tmp_path_factory.mktemp("evolve_scale") / "tbl")
    spark.range(0, 1000).selectExpr("CAST(id AS INT) AS id").repartition(
        100
    ).write.mode("append").parquet(root)
    spark.range(1000, 2000).selectExpr("id AS id").repartition(100).write.mode(
        "append"
    ).parquet(root)
    import glob
    import time

    files = glob.glob(f"{root}/*.parquet")
    assert len(files) >= 150
    start = time.time()
    schemas = scan_parquet_schemas(spark, files)
    assert time.time() - start < 30
    assert len(schemas) == len(files)
    assert len({sch.simpleString() for _p, sch in schemas}) == 2
    df = read_parquet_evolved(spark, root)
    assert dict(df.dtypes) == {"id": "bigint"}
    assert df.count() == 2000 and df.agg({"id": "sum"}).first()[0] == sum(
        range(2000)
    )
