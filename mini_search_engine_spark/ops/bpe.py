"""Deterministic greedy byte-pair encoding for honest token budgeting.

A training-data pipeline budgets corpora in TOKENIZER tokens, not regex
proxies (``textstats.token_counts``'s ``bpe_tokens`` column counts
``BPE_ISH_PATTERN`` pre-tokens and stays for DuckDB-oracle parity).
This module provides the real thing at small, auditable scale:

* ``train_bpe`` — classic greedy BPE (Sennrich et al. 2015,
  arXiv:1508.07909) over a word-frequency table with incremental pair
  bookkeeping: each merge updates only the words containing the merged
  pair, so training is O(corpus pre-tokenization + Σ affected-word
  lengths), not O(n_merges × vocabulary). Fully deterministic: ties on
  pair count break to the lexicographically smallest pair.
* ``train_bpe_corpus`` — fit on a deterministic bounded corpus sample
  driver-side (standard practice: tokenizers train on samples; the full
  corpus is only ENCODED, distributed).
* ``bpe_token_counts`` — count real subword tokens per doc with an
  Arrow-batched pandas UDF whose kernel memoizes the encoding per unique
  pre-token (token vocabulary ≪ token count, the same amortization the
  index build's stem memo uses).

Merges apply WITHIN pre-tokens only (``BPE_ISH_PATTERN``: letter runs /
digit runs / single symbols, lowercased) — the GPT-2 family's shape,
minus the byte-level alphabet (inputs here are already text columns).
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from mini_search_engine_spark.ops.textstats import BPE_ISH_PATTERN

_PRETOK = re.compile(BPE_ISH_PATTERN)

Pair = tuple[str, str]


def _merge_word(syms: list[str], pair: Pair) -> list[str]:
    """One left-to-right merge pass of ``pair`` over a symbol sequence."""
    a, b = pair
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_bpe(texts: Iterable[str], n_merges: int = 512, min_count: int = 2) -> list[Pair]:
    """Greedy BPE merge list from raw texts, deterministic.

    Each iteration merges the most frequent adjacent symbol pair
    (count-weighted by word frequency; ties → lexicographically smallest
    pair) and stops early when no pair reaches ``min_count``. Pair counts
    are maintained INCREMENTALLY via a pair → {word index} posting map,
    so an iteration's cost is proportional to the words actually
    containing the merged pair."""
    wordfreq: Counter[str] = Counter()
    for t in texts:
        if t:
            wordfreq.update(_PRETOK.findall(t.lower()))

    words: list[list[str]] = []
    freqs: list[int] = []
    for w, f in sorted(wordfreq.items()):  # sorted → index order deterministic
        words.append(list(w))
        freqs.append(f)

    pair_counts: Counter[Pair] = Counter()
    where: defaultdict[Pair, set[int]] = defaultdict(set)
    for i, syms in enumerate(words):
        f = freqs[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += f
            where[p].add(i)

    merges: list[Pair] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        maxc = max(pair_counts.values())
        if maxc < min_count:
            break
        best = min(p for p, c in pair_counts.items() if c == maxc)
        merges.append(best)
        for i in sorted(where[best]):
            syms, f = words[i], freqs[i]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                where[p].discard(i)
            new = _merge_word(syms, best)
            words[i] = new
            for p in zip(new, new[1:]):
                pair_counts[p] += f
                where[p].add(i)
    return merges


def train_bpe_corpus(
    docs: DataFrame,
    n_merges: int = 512,
    sample_docs: int = 2_000,
    content_col: str = "content",
) -> list[Pair]:
    """Fit merges on the ``sample_docs`` lowest-docid documents (the same
    deterministic sampling rule as the IVF quantizer fit): one small
    ordered-limit job collects the sample; training runs driver-side."""
    rows = (
        docs.select("docid", content_col).orderBy("docid").limit(sample_docs).collect()
    )
    return train_bpe((r[content_col] for r in rows), n_merges=n_merges)


def encode_bpe(text: str, ranks: dict[Pair, int], _memo: dict | None = None) -> list[str]:
    """Encode one string: pre-tokenize, then within each pre-token
    repeatedly merge the LOWEST-RANK adjacent pair (the standard BPE
    inference loop — merge order follows training order, which is what
    makes encoding independent of text batching). ``_memo`` caches the
    per-pre-token encodings across calls."""
    if not text:
        return []
    memo = _memo if _memo is not None else {}
    out: list[str] = []
    for w in _PRETOK.findall(text.lower()):
        enc = memo.get(w)
        if enc is None:
            syms = list(w)
            while len(syms) > 1:
                best, best_rank = None, None
                for p in zip(syms, syms[1:]):
                    r = ranks.get(p)
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = p, r
                if best is None:
                    break
                syms = _merge_word(syms, best)
            enc = syms
            memo[w] = enc
        out.extend(enc)
    return out


def bpe_token_counts(
    docs: DataFrame, merges: list[Pair], content_col: str = "content"
) -> DataFrame:
    """→ (docid, bpe_real_tokens): real subword token count per doc under
    the trained merge list. The merge table ships in the UDF closure
    (≲ n_merges small strings); the kernel memoizes per unique pre-token,
    so per-batch cost is O(new vocabulary), not O(tokens)."""
    ranks = {p: i for i, p in enumerate(merges)}

    @F.pandas_udf(LongType())
    def _count(texts: pd.Series) -> pd.Series:
        memo: dict = {}
        return texts.map(
            lambda t: 0 if t is None else len(encode_bpe(t, ranks, memo))
        )

    return docs.select(
        "docid", _count(F.col(content_col)).alias("bpe_real_tokens")
    )
