"""BPE tokenizer (operators/bpe.py): training determinism, merge
order, greedy apply, losslessness, and the distributed apply path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.operators.bpe import (
    _EOW,
    apply_bpe,
    bpe_encode_word,
    train_bpe,
    word_frequencies,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "hug hug hug hug hug hug hug hug hug hug"),
            (2, "pug pug pug pug pug"),
            (3, "hugs hugs hugs hugs"),
            (4, "bun bun"),
        ],
        "doc_id long, text string",
    )


class TestWordFrequencies:
    def test_counts_and_order(self, corpus):
        wf = word_frequencies(corpus).collect()
        assert [(r.word, r.freq) for r in wf] == [
            ("hug", 10), ("pug", 5), ("hugs", 4), ("bun", 2)
        ]

    def test_max_words_cut_is_deterministic(self, corpus):
        wf = word_frequencies(corpus, max_words=2).collect()
        assert [r.word for r in wf] == ["hug", "pug"]

    def test_lowercase_folds(self, spark):
        df = spark.createDataFrame([(1, "Foo FOO foo")], "id long, text string")
        wf = word_frequencies(df).collect()
        assert [(r.word, r.freq) for r in wf] == [("foo", 3)]


class TestTraining:
    def test_first_merge_is_most_frequent_pair(self, corpus):
        # pair freqs: (u,g</w>) = 15, (h,u) = 14, (p,u) = 5, ...
        merges = train_bpe(corpus, num_merges=1)
        assert merges == [("u", "g" + _EOW)]

    def test_training_is_deterministic(self, corpus):
        a = train_bpe(corpus, num_merges=8)
        b = train_bpe(corpus, num_merges=8)
        assert a == b and len(a) >= 3

    def test_min_pair_freq_stops_early(self, spark):
        # every pair is unique -> nothing reaches min_pair_freq=2
        df = spark.createDataFrame([(1, "abc xyz")], "id long, text string")
        assert train_bpe(df, num_merges=50) == []

    def test_accepts_precomputed_word_freqs(self, corpus):
        wf = word_frequencies(corpus)
        assert train_bpe(wf, num_merges=1) == train_bpe(corpus, num_merges=1)

    def test_tie_breaks_lexicographic(self, spark):
        # "ab"x3 and "cd"x3: pairs (a,b</w>) and (c,d</w>) both freq 3
        df = spark.createDataFrame([(1, "ab ab ab cd cd cd")], "id long, text string")
        merges = train_bpe(df, num_merges=1)
        assert merges == [("a", "b" + _EOW)]


class TestEncode:
    def test_greedy_apply_follows_rank(self, corpus):
        merges = train_bpe(corpus, num_merges=10)
        ranks = {p: i for i, p in enumerate(merges)}
        # "hug" was seen 14 times as a prefix: must collapse fully
        assert bpe_encode_word("hug", ranks) == ["hug" + _EOW]
        # unseen word falls back to finer pieces but never crashes
        out = bpe_encode_word("zug", ranks)
        assert "".join(out) == "zug" + _EOW

    def test_lossless_detokenization(self, corpus):
        merges = train_bpe(corpus, num_merges=10)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in ("hug", "pug", "hugs", "bun", "unseen", "x"):
            toks = bpe_encode_word(w, ranks)
            assert "".join(toks) == w + _EOW

    def test_more_merges_never_increase_tokens(self, corpus):
        r4 = {p: i for i, p in enumerate(train_bpe(corpus, num_merges=4))}
        r8 = {p: i for i, p in enumerate(train_bpe(corpus, num_merges=8))}
        for w in ("hug", "pug", "hugs", "bun"):
            assert len(bpe_encode_word(w, r8)) <= len(bpe_encode_word(w, r4))


class TestApplySpark:
    def test_distributed_apply_matches_local(self, corpus):
        merges = train_bpe(corpus, num_merges=10)
        ranks = {p: i for i, p in enumerate(merges)}
        out = apply_bpe(corpus, merges).collect()
        for r in sorted(out, key=lambda r: r.doc_id):
            local = []
            for w in r.text.lower().split():
                local.extend(bpe_encode_word(w, ranks))
            assert list(r.bpe_tokens) == local
            assert r.bpe_tokens_cnt == len(local)

    def test_schema_appended_not_replaced(self, corpus):
        merges = train_bpe(corpus, num_merges=4)
        out = apply_bpe(corpus, merges)
        assert out.columns == ["doc_id", "text", "bpe_tokens", "bpe_tokens_cnt"]

    def test_null_text_tolerated(self, spark):
        df = spark.createDataFrame([(1, None), (2, "hug hug")], "id long, text string")
        merges = train_bpe(df.where("text is not null"), num_merges=2)
        got = {r.id: (list(r.bpe_tokens), r.bpe_tokens_cnt)
               for r in apply_bpe(df, merges).collect()}
        assert got[1] == ([], 0)
        assert got[2][1] >= 1

    def test_token_budget_vs_word_count(self, corpus):
        # with zero merges every char is a token; with training the
        # corpus compresses to near word count
        untrained = apply_bpe(corpus, [])
        trained = apply_bpe(corpus, train_bpe(corpus, num_merges=12))
        n_un = untrained.agg(F.sum("bpe_tokens_cnt")).collect()[0][0]
        n_tr = trained.agg(F.sum("bpe_tokens_cnt")).collect()[0][0]
        assert n_tr < n_un


class TestModelArtifacts:
    def test_save_load_roundtrip(self, corpus, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.bpe import (
            load_merges,
            save_merges,
        )

        merges = train_bpe(corpus, num_merges=8)
        p = str(tmp_path / "model" / "merges.json")
        save_merges(merges, p)
        assert load_merges(p) == merges

    def test_load_rejects_foreign_json(self, tmp_path):
        from harness_aws_etl_pipeline_spark.operators.bpe import load_merges

        p = tmp_path / "x.json"
        p.write_text('{"something": "else"}')
        with pytest.raises(ValueError, match="bpe-merges"):
            load_merges(str(p))

    def test_vocab_ids_deterministic_and_special_first(self, corpus):
        from harness_aws_etl_pipeline_spark.operators.bpe import build_vocab

        merges = train_bpe(corpus, num_merges=10)
        v1 = build_vocab(corpus, merges)
        v2 = build_vocab(corpus, merges)
        assert v1 == v2
        assert v1["<unk>"] == 0
        # the fully-merged most frequent word gets the smallest
        # non-special id
        assert v1["hug" + _EOW] == 1

    def test_encode_ids_matches_tokens(self, corpus):
        from harness_aws_etl_pipeline_spark.operators.bpe import (
            build_vocab,
            encode_ids,
        )

        merges = train_bpe(corpus, num_merges=10)
        vocab = build_vocab(corpus, merges)
        inv = {i: t for t, i in vocab.items()}
        toks = apply_bpe(corpus, merges)
        ids = encode_ids(corpus, merges, vocab)
        tok_by_id = {r.doc_id: list(r.bpe_tokens) for r in toks.collect()}
        for r in ids.collect():
            assert [inv[i] for i in r.bpe_ids] == tok_by_id[r.doc_id]

    def test_unseen_pieces_map_to_unk(self, spark, corpus):
        from harness_aws_etl_pipeline_spark.operators.bpe import (
            build_vocab,
            encode_ids,
        )

        merges = train_bpe(corpus, num_merges=10)
        vocab = build_vocab(corpus, merges)
        alien = spark.createDataFrame([(1, "qqq")], "doc_id long, text string")
        row = encode_ids(alien, merges, vocab).collect()[0]
        assert list(row.bpe_ids) and all(i == vocab["<unk>"] for i in row.bpe_ids)

    def test_encode_ids_requires_unk(self, corpus):
        from harness_aws_etl_pipeline_spark.operators.bpe import encode_ids

        with pytest.raises(ValueError, match="unk"):
            encode_ids(corpus, [], {"a": 1})
