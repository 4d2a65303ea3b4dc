"""Greedy BPE: incremental trainer vs naive recount reference, encode
correctness, and the distributed count column."""

import re
from collections import Counter

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.ops.bpe import (
    _PRETOK,
    _merge_word,
    bpe_token_counts,
    encode_bpe,
    train_bpe,
    train_bpe_corpus,
)

TEXTS = [
    "the lowest lower lowly low low low",
    "newer newest new news newly",
    "Spark sparks sparked sparking; spark_spark v2.0!",
    "wider widest wide widely (wide)",
    "",
    "日本語 text mixed with ascii tokens tokens tokens",
]


def naive_train_bpe(texts, n_merges=512, min_count=2):
    """Reference trainer: full pair recount every iteration."""
    wordfreq = Counter()
    for t in texts:
        if t:
            wordfreq.update(_PRETOK.findall(t.lower()))
    words = {w: list(w) for w in wordfreq}
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] += wordfreq[w]
        if not counts or max(counts.values()) < min_count:
            break
        maxc = max(counts.values())
        best = min(p for p, c in counts.items() if c == maxc)
        merges.append(best)
        words = {w: _merge_word(s, best) for w, s in words.items()}
    return merges


def naive_encode(word, merges):
    """Reference encoder: replay merges in TRAINING order."""
    syms = list(word)
    for m in merges:
        syms = _merge_word(syms, m)
    return syms


def test_incremental_trainer_matches_naive_recount():
    got = train_bpe(TEXTS, n_merges=64)
    ref = naive_train_bpe(TEXTS, n_merges=64)
    assert got == ref
    assert len(got) > 5  # actually learned something
    # deterministic across runs / input iteration order
    assert train_bpe(list(reversed(TEXTS)), n_merges=64) == got


def test_encode_matches_merge_replay():
    merges = train_bpe(TEXTS, n_merges=64)
    ranks = {p: i for i, p in enumerate(merges)}
    for t in TEXTS:
        flat = []
        for w in _PRETOK.findall(t.lower()):
            flat.extend(naive_encode(w, merges))
        assert encode_bpe(t, ranks) == flat, t
    # memoized and fresh encodes agree
    memo = {}
    for t in TEXTS + TEXTS:
        assert encode_bpe(t, ranks, memo) == encode_bpe(t, ranks)
    # unseen symbols survive as single chars
    assert encode_bpe("zzzqqq", ranks) != []


def test_bpe_token_counts_distributed(spark):
    rows = [(i, t, "en", "t", len(t)) for i, t in enumerate(TEXTS)]
    docs = load_corpus(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
    )
    merges = train_bpe_corpus(docs, n_merges=64, sample_docs=100)
    assert merges == train_bpe(TEXTS, n_merges=64)  # same sample -> same fit
    ranks = {p: i for i, p in enumerate(merges)}
    got = {r["docid"]: r["bpe_real_tokens"] for r in bpe_token_counts(docs, merges).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == len(encode_bpe(t, ranks)), (i, t)
    # subword counts sit between pre-token count and char count
    for i, t in enumerate(TEXTS):
        pre = len(_PRETOK.findall(t.lower()))
        chars = sum(len(w) for w in _PRETOK.findall(t.lower()))
        assert pre <= got[i] <= max(chars, pre), (i, pre, got[i], chars)
