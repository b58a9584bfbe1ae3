"""Round-5 corpus operators: line-level dedup (CCNet-style), corpus
mixing, sequence packing.  Unit semantics on tiny frames plus
determinism/invariant properties; the value-level differential oracle
lives in the catalog panels (``line_dedup``, ``corpus_mix``,
``seq_packing``)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.linededup import (
    frequent_lines,
    line_dedup_stats,
    remove_frequent_lines,
)
from harness_aws_etl_pipeline_spark.operators.mixing import (
    cap_per_domain,
    domain_stats,
    mix_thresholds,
    plan_epochs,
    repeat_to_budget,
    sample_to_mix,
    shuffle_corpus,
)
from harness_aws_etl_pipeline_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)


@pytest.fixture
def docs(spark):
    rows = [
        (1, "cookie banner\nreal content one\nfooter text", "web"),
        (2, "Cookie Banner\nunique second doc\nfooter text", "web"),
        (3, "totally original\nnothing shared here", "books"),
        (4, "cookie banner\n\nfooter text", "web"),
        (5, "short", "code"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


class TestLineDedup:
    def test_frequent_lines_normalized_and_blank_excluded(self, docs):
        freq = {r["key"]: r["line_cnt"] for r in frequent_lines(docs, 2).collect()}
        # case-folded: "cookie banner" matches "Cookie Banner"
        assert freq == {"cookie banner": 3, "footer text": 3}
        # doc 4's blank line occurs alongside every other doc's implicit
        # structure but blank keys are never reported

    def test_removal_preserves_order_and_casing(self, docs):
        out = {
            r["doc_id"]: (r["text"], r["_lines_removed"])
            for r in remove_frequent_lines(docs, 2).collect()
        }
        assert out[1] == ("real content one", 2)
        assert out[2] == ("unique second doc", 2)
        assert out[3] == ("totally original\nnothing shared here", 0)
        assert out[4] == ("", 2)  # blank line survives? no: text empty
        assert out[5] == ("short", 0)

    def test_blank_lines_survive_between_kept_lines(self, spark):
        df = spark.createDataFrame(
            [(1, "keep a\n\nkeep b\nboiler"), (2, "boiler"), (3, "boiler")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["text"] for r in remove_frequent_lines(df, 2).collect()}
        assert out[1] == "keep a\n\nkeep b"

    def test_hash_key_variant_identical(self, docs):
        a = remove_frequent_lines(docs, 2, use_hash_key=False)
        b = remove_frequent_lines(docs, 2, use_hash_key=True)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_stats_panel_consistency(self, docs):
        row = line_dedup_stats(docs, 2).collect()[0]
        assert row["lines_total"] == 12
        assert row["dup_line_keys"] == 2
        assert row["lines_removed"] == 6
        assert row["docs_changed"] == 3
        cleaned = remove_frequent_lines(docs, 2)
        chars = cleaned.agg(F.sum(F.length("text"))).collect()[0][0]
        assert row["chars_after"] == chars


class TestParagraphDedup:
    def test_paragraph_unit(self, spark):
        """sep='\\n\\n' runs the same family at paragraph granularity:
        a repeated quote block is removed, multi-line unique paragraphs
        survive intact (inner newlines untouched)."""
        quote = "famous quote line one\nfamous quote line two"
        rows = [
            (1, "unique intro\n\n" + quote + "\n\nunique outro"),
            (2, "other text\nwith lines\n\n" + quote),
            (3, "totally original\n\nparagraphs only"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: (r.text, r._lines_removed)
            for r in remove_frequent_lines(
                df, min_count=2, sep="\n\n"
            ).collect()
        }
        assert out[1] == ("unique intro\n\nunique outro", 1)
        assert out[2] == ("other text\nwith lines", 1)
        assert out[3] == ("totally original\n\nparagraphs only", 0)

    def test_line_default_unchanged(self, spark):
        df = spark.createDataFrame(
            [(1, "a\nb"), (2, "a\nc")], "doc_id long, text string"
        )
        out = {r.doc_id: r.text for r in remove_frequent_lines(df).collect()}
        assert out == {1: "b", 2: "c"}


class TestMixing:
    def test_mix_thresholds_integer_exact(self):
        totals = {"web": 1000, "code": 100}
        # equal weights: code is scarce -> budget = 200, web keeps 10%
        thr = mix_thresholds(totals, {"web": 1, "code": 1})
        assert thr["code"] == "g"  # full keep
        assert thr["web"] == format((1 << 32) // 10, "08x")

    def test_temperature_weights(self):
        from harness_aws_etl_pipeline_spark.operators.mixing import (
            temperature_weights,
        )

        totals = {"web": 1_000_000, "code": 10_000, "books": 0}
        # tau=1: natural proportions (largest scaled to 1e6)
        w1 = temperature_weights(totals, 1.0)
        assert w1 == {"web": 1_000_000, "code": 10_000}
        # tau=2: sqrt rebalance -> code rises from 1% to 10% of web
        w2 = temperature_weights(totals, 2.0)
        assert w2["web"] == 1_000_000 and w2["code"] == 100_000
        # tau -> inf: approaches uniform
        winf = temperature_weights(totals, 1e9)
        assert winf["web"] == winf["code"] == 1_000_000
        # plugs into the exact-threshold machinery unchanged
        thr = mix_thresholds({"web": 1_000_000, "code": 10_000}, w2)
        assert set(thr) == {"web", "code"}
        # floor weight: a tiny source never rounds to zero
        assert temperature_weights({"a": 10**12, "b": 1}, 1.0)["b"] == 1
        import pytest as _pytest

        with _pytest.raises(ValueError):
            temperature_weights(totals, 0)
        with _pytest.raises(ValueError):
            temperature_weights({"a": 0}, 1.0)

    def test_mix_thresholds_budget_cap(self):
        totals = {"web": 1000}
        thr = mix_thresholds(totals, {"web": 1}, budget_tokens=500)
        assert thr["web"] == format((1 << 32) // 2, "08x")

    def test_mix_thresholds_validation(self):
        with pytest.raises(ValueError):
            mix_thresholds({"web": 10}, {})
        with pytest.raises(ValueError):
            mix_thresholds({"web": 0}, {"web": 1})
        with pytest.raises(ValueError):
            mix_thresholds({"web": 10}, {"web": -1})

    def test_plan_epochs_repeats_scarce_source(self):
        totals = {"web": 1000, "code": 100}
        # equal weights, budget 600: each side targets 300 tokens;
        # code (100) needs 3 full epochs; web keeps 30% of one epoch
        plan = plan_epochs(totals, {"web": 1, "code": 1},
                           budget_tokens=600, max_epochs=4)
        assert plan["budget"] == 600
        code = plan["domains"]["code"]
        assert code["target_tokens"] == 300
        assert code["full_epochs"] == 3
        assert code["partial_threshold"] == "00000000"
        web = plan["domains"]["web"]
        assert web["full_epochs"] == 0
        assert web["partial_threshold"] == format(
            300 * (1 << 32) // 1000, "08x")

    def test_plan_epochs_caps_at_max_epochs(self):
        totals = {"web": 1000, "code": 100}
        # budget 10_000 infeasible: code would need 25 epochs; the
        # feasible budget is max_epochs * 100 * 2 / 1 = 800
        plan = plan_epochs(totals, {"web": 1, "code": 1},
                           budget_tokens=10_000, max_epochs=4)
        assert plan["budget"] == 800
        assert plan["domains"]["code"]["full_epochs"] == 4
        assert plan["domains"]["code"]["partial_threshold"] == "00000000"

    def test_plan_epochs_validation(self):
        with pytest.raises(ValueError):
            plan_epochs({"web": 10}, {"web": 1}, 100, max_epochs=0)
        with pytest.raises(ValueError):
            plan_epochs({}, {"web": 1}, 100)

    def test_repeat_to_budget_materializes_epochs(self, spark):
        # web: 4 docs x 10 tokens = 40; code: 1 doc x 10 tokens = 10
        rows = [(i, " ".join(f"w{i}x{j}" for j in range(10)), "web")
                for i in range(4)]
        rows.append((9, " ".join(f"c{j}" for j in range(10)), "code"))
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        # equal weights, budget 60 -> each targets 30: code = 3 full
        # epochs exactly; web keeps 75% of one epoch by hash draw
        out = repeat_to_budget(df, {"web": 1, "code": 1},
                               budget_tokens=60, max_epochs=4)
        got = out.groupBy("source").agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("_epoch").alias("ep"),
        ).collect()
        by = {r.source: r for r in got}
        assert by["code"].n == 3 and by["code"].ep == 3
        assert 1 <= by["web"].n <= 4 and by["web"].ep == 1   # partial only
        # epoch tags are 0-based and dense for the full epochs
        eps = {r._epoch for r in out.filter("source = 'code'").collect()}
        assert eps == {0, 1, 2}

    def test_repeat_to_budget_deterministic(self, spark):
        rows = [(i, " ".join(f"w{i}x{j}" for j in range(10)), "web")
                for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        a = sorted(map(tuple, repeat_to_budget(
            df, {"web": 1}, budget_tokens=50).collect()))
        b = sorted(map(tuple, repeat_to_budget(
            df, {"web": 1}, budget_tokens=50).collect()))
        assert a == b

    def test_sample_to_mix_respects_thresholds_exactly(self, docs):
        kept = sample_to_mix(docs, {"web": 1, "books": 1}, salt=3)
        rows = kept.collect()
        # membership must equal the reference md5 computation per row
        stats = {
            r["domain"]: r["tokens"] for r in domain_stats(docs).collect()
        }
        thr = mix_thresholds(
            {s: t for s, t in stats.items() if s in ("web", "books")},
            {"web": 1, "books": 1},
        )
        expect = set()
        for r in docs.collect():
            cut = thr.get(r["source"], "00000000")
            h = hashlib.md5(f"{r['doc_id']}|3".encode()).hexdigest()[:8]
            if h < cut:
                expect.add(r["doc_id"])
        assert {r["doc_id"] for r in rows} == expect
        # unweighted source dropped entirely
        assert all(r["source"] != "code" for r in rows)

    def test_sample_to_mix_append_stability(self, spark, docs):
        before = {
            r["doc_id"]
            for r in sample_to_mix(docs, {"web": 1, "books": 1}).collect()
        }
        extra = spark.createDataFrame(
            [(100 + i, "more web words here", "web") for i in range(20)],
            "doc_id long, text string, source string",
        )
        after_df = sample_to_mix(docs.unionByName(extra), {"web": 1, "books": 1})
        after = {r["doc_id"] for r in after_df.collect()}
        # books was the scarce source and is still fully kept; its docs
        # and any web doc whose threshold did not shrink stay members.
        # Thresholds can only move with the totals; a doc that was OUT
        # can come IN only if its source's fraction grew — web's shrank,
        # so no new old-web doc appears.
        assert {d for d in before if d < 100} >= {d for d in after if d < 100} or (
            before <= after
        )

    def test_cap_per_domain(self, docs):
        capped = cap_per_domain(docs, 1)
        per = capped.groupBy("source").count().collect()
        assert all(r["count"] == 1 for r in per)
        # deterministic: lowest doc_id wins the default ordering
        assert {r["doc_id"] for r in capped.collect()} == {1, 3, 5}

    def test_cap_per_domain_hot_domain_two_phase(self, spark):
        """Planted hot domain: the two-phase cap equals the naive
        window (default ordering = lowest doc_id per domain), NULL
        domains are exempt, and the counters fire."""
        from harness_aws_etl_pipeline_spark.operators.mixing import (
            cap_per_domain_stats,
        )

        rows = (
            [(i, "hot", "t") for i in range(300)]
            + [(1000 + i, f"cold{i}", "t") for i in range(5)]
            + [(2000, None, "t"), (2001, None, "t")]
        )
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = sorted(
            r.doc_id for r in cap_per_domain(df, 4, buckets=8).collect()
        )
        # naive answer: lowest 4 ids of "hot", every cold, both NULLs
        assert got == [0, 1, 2, 3] + [1000 + i for i in range(5)] + [2000, 2001]

        s = cap_per_domain_stats(df, 4).collect()[0]
        assert s.cap == 4 and s.domains_total == 6
        assert s.domains_capped == 1 and s.rows_dropped == 296
        assert s.max_domain == 300 and s.null_domain_rows == 2

    def test_shuffle_corpus_deterministic_and_total(self, docs):
        a = [r["doc_id"] for r in shuffle_corpus(docs, hash_fn="md5").collect()]
        b = [r["doc_id"] for r in shuffle_corpus(docs, hash_fn="md5").collect()]
        assert a == b and sorted(a) == [1, 2, 3, 4, 5]
        expect = sorted(
            range(1, 6), key=lambda i: hashlib.md5(f"{i}|0".encode()).hexdigest()[:8]
        )
        assert a == expect
        c = [r["doc_id"] for r in shuffle_corpus(docs, salt=1).collect()]
        assert sorted(c) == [1, 2, 3, 4, 5]


class TestPacking:
    def _mk(self, spark, sizes):
        rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_invariants_small(self, spark):
        df = self._mk(spark, [5, 4, 3, 2, 1, 6])
        packed = pack_sequences(df, capacity=6, buckets=1)
        rows = packed.collect()
        assert len(rows) == 6
        fills = {}
        for r in rows:
            fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
        assert all(f <= 6 for f in fills.values())
        total = sum(r["n_tokens"] for r in rows)
        assert total == 21
        assert len(fills) >= math.ceil(total / 6)
        # FFD with capacity 6 over [6,5,4,3,2,1] packs into 4 bins:
        # [6], [5,1], [4,2], [3]
        assert len(fills) == 4

    def test_oversized_clamped_and_flagged(self, spark):
        df = self._mk(spark, [10, 2])
        rows = pack_sequences(df, capacity=6, buckets=1).collect()
        by_id = {r["doc_id"]: r for r in rows}
        assert by_id[0]["n_tokens"] == 6 and by_id[0]["_truncated"]
        assert by_id[1]["n_tokens"] == 2 and not by_id[1]["_truncated"]

    def test_deterministic_across_partitioning(self, spark):
        df = self._mk(spark, [5, 4, 3, 2, 1, 6, 3, 3])
        a = sorted(map(tuple, pack_sequences(df, 8, buckets=4).collect()))
        b = sorted(
            map(tuple, pack_sequences(df.repartition(7), 8, buckets=4).collect())
        )
        assert a == b

    def test_stats_panel(self, spark):
        df = self._mk(spark, [5, 4, 3, 2, 1, 6, 10])
        row = packing_stats(df, capacity=6, buckets=2).collect()[0]
        assert row["docs_packed"] == 7
        assert row["token_total"] == 21 + 6  # doc 6 clamped 10 -> 6
        assert row["truncated_docs"] == 1
        assert row["overfull_bins"] == 0
        assert row["bins_ok"]


class TestMaterializePacked:
    def test_sequences_are_deterministic_and_complete(self, spark):
        from harness_aws_etl_pipeline_spark.operators.packing import (
            materialize_packed,
            pack_sequences,
        )

        docs = spark.createDataFrame(
            [(i, " ".join(f"w{i}_{j}" for j in range(5 + i % 7)))
             for i in range(40)],
            "doc_id long, text string",
        )
        out = materialize_packed(docs, capacity=16, buckets=4)
        rows = out.collect()
        # every doc appears exactly once across bins
        all_ids = [i for r in rows for i in r.doc_ids]
        assert sorted(all_ids) == list(range(40))
        for r in rows:
            assert r.n_docs == len(r.doc_ids)
            assert 0 < r.total_tokens <= 16
            assert abs(r.fill_fraction - r.total_tokens / 16.0) < 1e-9
            # packed_text holds each member's text, separator-joined
            assert r.packed_text.count("\n\n") == r.n_docs - 1
        # member order pure function of data: ids sorted by
        # (tokens desc, id asc) within each bin
        assignments = {
            (r.doc_id): r.n_tokens
            for r in pack_sequences(docs, 16, buckets=4).collect()
        }
        for r in rows:
            keys = [(-assignments[i], i) for i in r.doc_ids]
            assert keys == sorted(keys)

    def test_repartition_invariance(self, spark):
        from harness_aws_etl_pipeline_spark.operators.packing import (
            materialize_packed,
        )

        docs = spark.createDataFrame(
            [(i, " ".join(["tok"] * (3 + i % 5))) for i in range(30)],
            "doc_id long, text string",
        )
        a = materialize_packed(docs, capacity=12, buckets=4).collect()
        b = materialize_packed(
            docs.repartition(7), capacity=12, buckets=4
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_without_text(self, spark):
        from harness_aws_etl_pipeline_spark.operators.packing import (
            materialize_packed,
        )

        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "d e")], "doc_id long, text string"
        )
        out = materialize_packed(docs, capacity=8, with_text=False)
        assert "packed_text" not in out.columns
        assert out.count() >= 1
