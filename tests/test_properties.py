"""Property-based tests (hypothesis) — invariants the example-based
suite can't sweep: normalization idempotence, fingerprint determinism,
salted-aggregation equivalence under arbitrary key skew, jaccard
bounds. (The reference has no property tests at all — SURVEY §5.)"""

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from harness_aws_etl_pipeline_spark.operators.normalize import normalize_name

from tests.tiers import deep

# Spark-backed properties: every example is a few full Spark jobs
# (~1.5-2 s each), so the example budget IS the suite-runtime budget.
# 12 examples keeps each invariant exercised across the generator's
# structure (hypothesis still shrinks any failure) at ~60% of the
# round-5 wall-clock — the suite-runtime guardrail is <= 900 s.
slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


class TestNormalizeNameProperties:
    @given(st.text(max_size=60))
    @settings(max_examples=300, deadline=None)
    def test_idempotent(self, name):
        once = normalize_name(name)
        assert normalize_name(once) == once

    @given(st.text(max_size=60))
    @settings(max_examples=300, deadline=None)
    def test_output_charset(self, name):
        out = normalize_name(name)
        assert re.fullmatch(r"\w*", out) is not None  # word chars only
        assert out == out.lower()

    @given(st.text(alphabet=st.characters(codec="ascii"), max_size=60))
    @settings(max_examples=300, deadline=None)
    def test_ascii_output_shape(self, name):
        out = normalize_name(name)
        assert " " not in out
        assert not out.startswith("_") and not out.endswith("_")
        assert "__" not in out


class TestCodecProperties:
    """Round-trip invariants of the pure-numpy media codecs — these
    run Spark-free (plain numpy), so hypothesis can sweep hundreds of
    shapes cheaply."""

    @given(
        st.integers(1, 40),
        st.integers(1, 40),
        st.integers(0, 4) | st.just("mixed"),
        st.integers(0, 2**32 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_png_roundtrip_lossless(self, h, w, filter_type, seed):
        import numpy as np

        from harness_aws_etl_pipeline_spark.operators.multimodal import (
            decode_image,
            encode_png,
        )

        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_image(encode_png(arr, filter_type)), arr)

    @given(st.integers(1, 30), st.integers(1, 30), st.integers(0, 255))
    @settings(max_examples=60, deadline=None)
    def test_jpeg_gray_q100_exact(self, h, w, v):
        import numpy as np

        from harness_aws_etl_pipeline_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        arr = np.full((h, w, 3), v, dtype=np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(arr, quality=100)), arr)

    @given(
        st.integers(1, 500),
        st.integers(1, 2),
        st.sampled_from([8000, 16000, 44100]),
        st.integers(0, 2**32 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def test_wav_roundtrip_lossless(self, n, channels, rate, seed):
        import numpy as np

        from harness_aws_etl_pipeline_spark.operators.multimodal import (
            decode_wav,
            encode_wav,
        )

        rng = np.random.default_rng(seed)
        s = rng.integers(-32768, 32767, size=(n, channels), dtype=np.int16)
        frames, got_rate = decode_wav(encode_wav(s, rate))
        assert got_rate == rate and np.array_equal(frames, s)


@deep
class TestSparkProperties:
    @given(
        st.lists(
            st.tuples(st.integers(0, 3), st.floats(-1e6, 1e6)),
            min_size=1,
            max_size=30,
        )
    )
    @slow
    def test_salted_agg_equals_plain(self, spark, rows):
        from pyspark.sql import functions as F

        from harness_aws_etl_pipeline_spark.operators.skew import salted_aggregate

        df = spark.createDataFrame(
            [(k, round(v, 3)) for k, v in rows], "k int, v double"
        )
        got = {
            r["k"]: round(r["sum_v"], 6)
            for r in salted_aggregate(df, ["k"], {"v": "sum"}, buckets=4).collect()
        }
        want = {
            r["k"]: round(r["s"], 6)
            for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
        }
        assert got == want

    @given(
        st.lists(st.floats(-1e5, 1e5), min_size=1, max_size=40),
        st.integers(1, 13),
    )
    @slow
    def test_dsum_partition_invariant(self, spark, values, nparts):
        """The determinism contract: dsum must give the BIT-identical
        double no matter how rows are partitioned (a plain double sum
        would not)."""
        from harness_aws_etl_pipeline_spark.plans.catalog import dsum

        df = spark.createDataFrame([(round(v, 4),) for v in values], "v double")
        a = df.repartition(1).agg(dsum("v", "s")).first()["s"]
        b = df.repartition(nparts).agg(dsum("v", "s")).first()["s"]
        assert a == b  # exact equality, not approx

    @given(
        st.lists(
            st.text(alphabet="ab ", min_size=0, max_size=40), min_size=2, max_size=6
        )
    )
    @slow
    def test_jaccard_bounds_and_symmetry_invariance(self, spark, texts):
        from harness_aws_etl_pipeline_spark.operators.dedup_fuzzy import (
            ngram_jaccard_pairs,
        )

        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        pairs = ngram_jaccard_pairs(df, n=2, threshold=0.0).collect()
        for r in pairs:
            assert 0.0 <= r["jaccard"] <= 1.0
            assert r["doc_a"] < r["doc_b"]

    @given(st.lists(st.text(alphabet="xy \n", max_size=30), min_size=1, max_size=8))
    @slow
    def test_dup_fractions_bounds(self, spark, texts):
        """Repetition fractions are always in [0, 1) and a text of all
        distinct tokens scores 0 — for arbitrary whitespace/newline
        soup (empty docs, whitespace-only docs, single tokens)."""
        from pyspark.sql import functions as F

        from harness_aws_etl_pipeline_spark.functions.text import (
            dup_line_fraction,
            dup_word_fraction,
        )

        df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
        rows = df.select(
            dup_line_fraction("text").alias("dl"),
            dup_word_fraction("text").alias("dw"),
        ).collect()
        for r in rows:
            assert 0.0 <= r["dl"] < 1.0
            assert 0.0 <= r["dw"] < 1.0

    @given(
        st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 2), st.integers(-100, 100)),
            min_size=1,
            max_size=15,
        ),
        st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 2), st.integers(-100, 100)),
            min_size=1,
            max_size=15,
        ),
    )
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_upsert_equals_dict_merge(self, spark, tmp_path_factory, base, batch):
        """Upsert must behave exactly like dict.update keyed on id:
        for ANY base table and batch (including key collisions inside
        either input, new partitions, overlapping partitions)."""
        from harness_aws_etl_pipeline_spark.sinks import upsert_partitioned

        # de-dup inputs by key (upsert contract: one row per key)
        base_d = {k: (p, v) for k, p, v in base}
        batch_d = {k: (p, v) for k, p, v in batch}
        path = str(tmp_path_factory.mktemp("upsert") / "tbl")
        mk = lambda d: spark.createDataFrame(
            [(k, f"p{p}", float(v)) for k, (p, v) in d.items()],
            "id long, part string, v double",
        )
        upsert_partitioned(mk(base_d), path, ["id"], ["part"])
        upsert_partitioned(mk(batch_d), path, ["id"], ["part"])
        want = {**base_d, **batch_d}
        got = {
            r["id"]: (int(r["part"][1:]), r["v"])
            for r in spark.read.parquet(path).collect()
        }
        assert got == {k: (p, float(v)) for k, (p, v) in want.items()}


class TestBpeProperties:
    @given(
        st.lists(
            st.text(
                alphabet=st.characters(blacklist_categories=("Zs", "Cc", "Cs")),
                min_size=1,
                max_size=12,
            ),
            min_size=1,
            max_size=30,
        ),
        st.integers(0, 30),
    )
    @slow
    def test_encode_is_lossless_for_any_word(self, words, num_merges):
        """Detokenization (concat + strip the end marker) reproduces
        every input word exactly, for arbitrary unicode words and ANY
        merge table learned from them — the invariant that makes BPE a
        tokenization, not a hash."""
        from collections import Counter

        from harness_aws_etl_pipeline_spark.operators.bpe import (
            _EOW,
            _word_symbols,
            bpe_encode_word,
        )

        # train driver-side on the word histogram (no Spark needed for
        # the property — train_bpe's collect feeds the same dict)
        freqs = Counter(words)
        # minimal in-process trainer parity: rank by the real trainer's
        # choice order is irrelevant to the losslessness property, so
        # ANY rank table over adjacent pairs must round-trip; derive
        # one from the observed adjacent pairs deterministically
        pairs = Counter()
        for w, f in freqs.items():
            sym = _word_symbols(w)
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        ranks = {
            p: i
            for i, (p, _) in enumerate(
                sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:num_merges]
            )
        }
        for w in words:
            toks = bpe_encode_word(w, ranks)
            assert "".join(toks) == w + _EOW
            assert all(t for t in toks)


@deep
class TestDecontamProperties:
    @given(
        st.lists(
            st.text(alphabet="abcd ", min_size=0, max_size=40),
            min_size=1,
            max_size=10,
        ),
        st.lists(
            st.text(alphabet="abcd ", min_size=0, max_size=40),
            min_size=0,
            max_size=3,
        ),
        st.integers(2, 4),
    )
    @slow
    def test_flag_and_clean_partition_the_corpus(self, spark, texts, bench_texts, n):
        """decontaminate() ∪ flagged-contaminated == corpus, disjoint —
        for arbitrary tiny-alphabet soups where n-gram collisions are
        common; and the clean side shares NO n-gram with the benchmark
        (verified against an independent python n-gram set)."""
        from harness_aws_etl_pipeline_spark.operators.decontam import (
            decontaminate,
            flag_contaminated,
        )

        corpus = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        bench = spark.createDataFrame(
            list(enumerate(bench_texts)), "qid long, text string"
        )
        clean = {r.doc_id for r in decontaminate(corpus, bench, n=n).collect()}
        flags = {
            r.doc_id: r._contaminated
            for r in flag_contaminated(corpus, bench, n=n).collect()
        }
        assert clean == {i for i, c in flags.items() if not c}

        def grams(s):
            toks = [t for t in s.lower().split() if t]
            return {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }

        bench_grams = set().union(*(grams(t) for t in bench_texts)) if bench_texts else set()
        for i, t in enumerate(texts):
            expect_clean = not (grams(t) & bench_grams)
            assert (i in clean) == expect_clean


_URL_SEG = st.text(alphabet="abcXYZ019-._~", max_size=8)
_URL_HOST = st.lists(
    st.text(alphabet="abcXYZ09", min_size=1, max_size=6),
    min_size=1,
    max_size=4,
).map(".".join)
_URL = st.builds(
    lambda sch, www, host, port, segs, q, frag: (
        sch
        + "://"
        + ("www." if www else "")
        + host
        + (f":{port}" if port else "")
        + ("/" + "/".join(segs) if segs else "")
        + (("?" + "&".join(q)) if q else "")
        + (("#" + frag) if frag else "")
    ),
    st.sampled_from(["http", "https", "HTTP", "HttpS"]),
    st.booleans(),
    _URL_HOST,
    st.sampled_from([None, 80, 443, 8080]),
    st.lists(_URL_SEG, max_size=3),
    st.lists(
        st.one_of(
            st.text(alphabet="abz019=_", min_size=1, max_size=8),
            st.sampled_from(["utm_source=x", "ref=hn", "gclid", "fbclid=1"]),
        ),
        max_size=4,
    ),
    st.text(alphabet="abz", max_size=5),
)


class TestUrlProperties:
    @given(st.lists(_URL, min_size=1, max_size=25))
    @slow
    def test_normalize_idempotent(self, spark, urls):
        """Canonicalization is a projection: normalize(normalize(u))
        == normalize(u) for arbitrary scheme/www/port/path/tracking-
        param/fragment combinations."""
        from pyspark.sql import functions as F

        from harness_aws_etl_pipeline_spark.operators.urlops import normalize_url

        df = spark.createDataFrame([(u,) for u in urls], "u string")
        rows = df.select(
            normalize_url("u").alias("once"),
        ).select(
            "once", normalize_url("once").alias("twice")
        ).collect()
        for r in rows:
            assert r.once == r.twice, r

    @given(st.lists(_URL, min_size=1, max_size=25))
    @slow
    def test_host_survives_normalization(self, spark, urls):
        """url_host(normalize_url(u)) == url_host(u) — canonicalizing
        never changes which host a URL belongs to."""
        from harness_aws_etl_pipeline_spark.operators.urlops import (
            normalize_url,
            url_host,
        )

        df = spark.createDataFrame([(u,) for u in urls], "u string")
        rows = df.select(
            url_host("u").alias("h1"),
            url_host(normalize_url("u")).alias("h2"),
        ).collect()
        for r in rows:
            assert r.h1 == r.h2, r


@deep
class TestBloomJoinProperties:
    @given(
        st.lists(
            st.one_of(st.integers(-50, 50), st.none()), min_size=0, max_size=40
        ),
        st.lists(
            st.one_of(st.integers(-50, 50), st.none()), min_size=0, max_size=12
        ),
    )
    @settings(
        max_examples=3,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_bloom_join_and_anti_equal_plain(self, spark, big_keys, small_keys):
        """For ANY key multisets (dups, NULLs, negatives, empty sides):
        bloom_join ≡ join and bloom_anti_join ≡ left_anti — the
        no-false-negative / definite-negative routing guarantees."""
        from harness_aws_etl_pipeline_spark.operators.bloomjoin import (
            bloom_anti_join,
            bloom_join,
        )

        big = spark.createDataFrame(
            [(k, i) for i, k in enumerate(big_keys)] or [(None, -1)],
            "k int, v int",
        )
        small = spark.createDataFrame(
            [(k,) for k in small_keys] or [(None,)], "k int"
        )
        key = lambda t: tuple((x is None, x if x is not None else 0) for x in t)
        for fn, how in ((bloom_join, "inner"), (bloom_anti_join, None)):
            got = fn(big, small, "k")
            exp = (
                big.join(small, "k")
                if how == "inner"
                else big.join(small, "k", "left_anti")
            )
            g = sorted((tuple(r) for r in got.collect()), key=key)
            e = sorted((tuple(r) for r in exp.collect()), key=key)
            assert g == e, (big_keys, small_keys, how)
