"""[EXT] Byte-pair-encoding tokenizer: corpus-trained, Spark-applied.

Token counts gate every training-data budget (mixing weights, packing,
context-length stats), and a whitespace count is a poor proxy for what
a subword tokenizer will produce.  This module trains a real BPE vocab
(Sennrich et al. 2016 — the GPT-2/RoBERTa family's algorithm) on the
corpus and applies it distributed.

Reference parity note: the reference pipeline has no text operators
(``etl/src/transform/transformer.py`` is pandas column hygiene); this
module is part of the [EXT] LLM-training-data surface.

Scale split — which stage runs where:
- **Word-frequency counting is distributed**: one lower→split→explode
  → groupBy pass; partial aggregation combines map-side, so a word
  repeated 10 M times ships one row per partition, not 10 M.  The
  result is a WORD-TYPE table — sublinear in corpus bytes (natural-
  language vocabulary grows ~ Heaps' law), further bounded by
  ``max_words`` (keep the most frequent types; ties by word for
  determinism).  Training on the head vocabulary is what production
  tokenizer trainers do — tail hapaxes contribute nothing to merge
  counts that survive a single merge step.
- **Merge training is driver-side over that bounded table**: classic
  BPE trains on word types × frequencies, NOT the raw corpus, so the
  trainer's input is model-sized (≤ ``max_words`` rows) regardless of
  corpus size — the same "small model, distributed data" split as
  ``similarity.ivf_centroids``.  Pair counts are kept incrementally
  (only words containing the merged pair are re-scanned), ties broken
  by pair lexicographic order so the merge list is deterministic.
- **Applying is distributed** (``mapInPandas``): each task walks its
  words with the broadcast merge-rank dict.  A per-task memo maps
  word → tokens, so a word repeated across a batch is encoded once —
  Zipf makes this cache hit ~constantly.

The end-of-word marker ``</w>`` follows the original paper: the last
symbol of every word carries it, so "est" mid-word and "est"
word-finally are distinct symbols and detokenization is lossless
(concat tokens, split on the marker).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_frequencies",
    "train_bpe",
    "apply_bpe",
    "bpe_encode_word",
    "save_merges",
    "load_merges",
    "build_vocab",
    "encode_ids",
]

_EOW = "</w>"


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    *,
    lowercase: bool = True,
    max_words: int | None = None,
) -> DataFrame:
    """(word, freq) over whitespace tokens, most frequent first.

    ``max_words`` keeps the top types (ties broken by word asc so the
    cut is deterministic); None keeps all.
    """
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    toks = F.filter(F.split(c, r"\s+"), lambda t: t != "")
    out = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word"))
    )
    return out.limit(max_words) if max_words is not None else out


def _word_symbols(word: str) -> tuple[str, ...]:
    chars = list(word)
    chars[-1] = chars[-1] + _EOW
    return tuple(chars)


def train_bpe(
    source: DataFrame,
    num_merges: int = 1000,
    text_col: str = "text",
    *,
    lowercase: bool = True,
    max_words: int = 1_000_000,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a corpus (or directly from
    a precomputed ``(word, freq)`` frame).  Returns the ordered merge
    list — the model ``apply_bpe`` consumes.

    Stops early when no remaining pair reaches ``min_pair_freq``
    (merging hapax pairs memorizes noise).  Deterministic: pair choice
    is (max freq, then lexicographically smallest pair).
    """
    if set(source.columns) >= {"word", "freq"}:
        wf = source.select("word", "freq")
    else:
        wf = word_frequencies(
            source, text_col, lowercase=lowercase, max_words=max_words
        )
    rows = wf.collect()  # bounded: ≤ max_words word types (see module doc)
    words: dict[tuple[str, ...], int] = {}
    for r in rows:
        if r["word"]:
            sym = _word_symbols(r["word"])
            words[sym] = words.get(sym, 0) + int(r["freq"])

    # pair → total freq, and pair → set of words containing it (so a
    # merge only re-scans affected words, not the whole vocabulary)
    from collections import defaultdict

    pair_freq: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[tuple[str, ...]]] = defaultdict(set)

    def _index(sym: tuple[str, ...], freq: int, sign: int) -> None:
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pair_freq[p] += sign * freq
            if sign > 0:
                pair_words[p].add(sym)
            else:
                pair_words[p].discard(sym)

    for sym, freq in words.items():
        _index(sym, freq, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        best_freq = min_pair_freq - 1
        for p, f in pair_freq.items():
            if f > best_freq or (f == best_freq and best is not None and p < best):
                if f >= min_pair_freq:
                    best, best_freq = p, f
        if best is None:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for sym in list(pair_words[best]):
            freq = words.pop(sym)
            _index(sym, freq, -1)
            out = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new = tuple(out)
            words[new] = words.get(new, 0) + freq
            _index(new, freq, +1)
        pair_freq.pop(best, None)
        pair_words.pop(best, None)
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a merge-rank dict: repeatedly merge the
    LOWEST-rank adjacent pair (the standard greedy BPE apply)."""
    sym = list(_word_symbols(word))
    while len(sym) > 1:
        best_i, best_rank = -1, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    *,
    lowercase: bool = True,
) -> DataFrame:
    """Add ``out_col`` (array<string> of BPE tokens) and
    ``{out_col}_cnt`` (int).  Arrow-batched; the merge table rides the
    task closure (a model — ≤ num_merges pairs); per-task word memo
    collapses Zipf-repeated words to one encode each.
    """
    from collections.abc import Iterator as _Iter

    import pandas as pd

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    cnt_col = f"{out_col}_cnt"
    fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    out_schema = f"{fields}, `{out_col}` array<string>, `{cnt_col}` int"

    def _apply(batches: "_Iter[pd.DataFrame]") -> "_Iter[pd.DataFrame]":
        memo: dict[str, list[str]] = {}

        def encode(text) -> list[str]:
            if text is None:
                return []
            toks: list[str] = []
            for w in (text.lower() if lowercase else text).split():
                enc = memo.get(w)
                if enc is None:
                    if len(memo) > 1_000_000:  # bound task memory
                        memo.clear()
                    enc = bpe_encode_word(w, ranks)
                    memo[w] = enc
                toks.extend(enc)
            return toks

        for pdf in batches:
            encoded = [encode(t) for t in pdf[text_col]]
            yield pdf.assign(
                **{
                    out_col: pd.Series(encoded, index=pdf.index, dtype="object"),
                    cnt_col: pd.Series(
                        [len(e) for e in encoded], index=pdf.index, dtype="int32"
                    ),
                }
            )

    return df.mapInPandas(_apply, out_schema)


def save_merges(
    merges: list[tuple[str, str]], path: str, spark=None
) -> None:
    """Persist the merge list as versioned JSON (rank order IS the
    file order).  Goes through the engine FS adapter, so local paths
    and Hadoop-scheme paths both work."""
    import json

    from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

    payload = json.dumps(
        {"format": "bpe-merges-v1", "merges": [list(p) for p in merges]},
        ensure_ascii=False,
    ).encode("utf-8")
    get_fs(path, spark).write_bytes(path, payload)


def load_merges(path: str, spark=None) -> list[tuple[str, str]]:
    """Inverse of :func:`save_merges` (validates the format tag)."""
    import json

    from harness_aws_etl_pipeline_spark.sinks.fs import get_fs

    doc = json.loads(get_fs(path, spark).read_bytes(path).decode("utf-8"))
    if doc.get("format") != "bpe-merges-v1":
        raise ValueError(f"not a bpe-merges file: {path}")
    return [tuple(p) for p in doc["merges"]]


def build_vocab(
    source: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    *,
    lowercase: bool = True,
    max_words: int = 1_000_000,
    specials: tuple[str, ...] = ("<unk>",),
) -> dict[str, int]:
    """token → id over the corpus's ENCODED symbol inventory.

    Encodes the (bounded) word-type table with the merge ranks and
    ids every distinct output symbol: specials first (id 0 = ``<unk>``
    by default), then tokens sorted by (frequency desc, token asc) —
    the deterministic id assignment training stacks expect.  A symbol
    never produced by encoding the corpus is not in the vocab (it
    cannot occur at apply time over the same corpus; unseen words at
    inference fall back to pieces, and pieces absent here map to
    ``<unk>``).
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    wf = (
        source.select("word", "freq")
        if set(source.columns) >= {"word", "freq"}
        else word_frequencies(
            source, text_col, lowercase=lowercase, max_words=max_words
        )
    )
    counts: dict[str, int] = {}
    for r in wf.collect():  # bounded word-type table (see train_bpe)
        if not r["word"]:
            continue
        for tok in bpe_encode_word(r["word"], ranks):
            counts[tok] = counts.get(tok, 0) + int(r["freq"])
    vocab: dict[str, int] = {}
    for s in specials:
        vocab[s] = len(vocab)
    for tok in sorted(counts, key=lambda t: (-counts[t], t)):
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def encode_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    vocab: dict[str, int],
    text_col: str = "text",
    out_col: str = "bpe_ids",
    *,
    lowercase: bool = True,
    unk_token: str = "<unk>",
) -> DataFrame:
    """Add ``out_col`` (array<int> token ids) — the training-ready
    form.  Same Arrow/memo design as :func:`apply_bpe`; tokens outside
    the vocab map to ``vocab[unk_token]``."""
    from collections.abc import Iterator as _Iter

    import pandas as pd

    if unk_token not in vocab:
        raise ValueError(f"vocab must contain the unk token {unk_token!r}")
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    unk = vocab[unk_token]
    fields = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
    out_schema = f"{fields}, `{out_col}` array<int>"

    def _apply(batches: "_Iter[pd.DataFrame]") -> "_Iter[pd.DataFrame]":
        memo: dict[str, list[int]] = {}

        def encode(text) -> list[int]:
            if text is None:
                return []
            ids: list[int] = []
            for w in (text.lower() if lowercase else text).split():
                enc = memo.get(w)
                if enc is None:
                    if len(memo) > 1_000_000:
                        memo.clear()
                    enc = [
                        vocab.get(t, unk) for t in bpe_encode_word(w, ranks)
                    ]
                    memo[w] = enc
                ids.extend(enc)
            return ids

        for pdf in batches:
            yield pdf.assign(
                **{
                    out_col: pd.Series(
                        [encode(t) for t in pdf[text_col]],
                        index=pdf.index,
                        dtype="object",
                    )
                }
            )

    return df.mapInPandas(_apply, out_schema)
