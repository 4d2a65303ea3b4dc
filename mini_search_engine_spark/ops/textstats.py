"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting. All native Catalyst expressions so
they vectorize in whole-stage codegen AND can be replicated in a DuckDB
oracle verbatim."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mini_search_engine_spark.analysis.stopwords import STOP_WORDS_SORTED
from mini_search_engine_spark.ops.dedup import md5_long

# "BPE-ish" pre-token pattern: letter runs, digit runs, single symbols.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _ws_tokens(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), "\\s+"), lambda t: t != F.lit(""))


def token_counts(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """→ (docid, ws_tokens, bpe_tokens, n_chars_seen)."""
    c = F.col(content_col)
    return docs.select(
        "docid",
        F.size(_ws_tokens(c)).cast("long").alias("ws_tokens"),
        F.regexp_count(c, F.lit(BPE_ISH_PATTERN)).cast("long").alias("bpe_tokens"),
        F.length(c).cast("long").alias("n_chars_seen"),
    )


def quality_columns(c: Column) -> dict[str, Column]:
    """The per-doc quality expressions, keyed by feature name — shared by
    `quality_scores` (per-doc view) and `ops.domains.source_stats`
    (per-source aggregation) so the two can never drift apart. All
    row-local Catalyst expressions."""
    toks = _ws_tokens(c)
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOP_WORDS_SORTED)))
    mean_len = F.when(n > 0, F.length(F.array_join(toks, "")) / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))
    alpha_chars = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    alpha_ratio = F.when(F.length(c) > 0, alpha_chars / F.length(c)).otherwise(F.lit(0.0))
    score = (
        F.when((mean_len >= 3) & (mean_len <= 10), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(stop_ratio <= 0.5, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(alpha_ratio >= 0.6, F.lit(0.3)).otherwise(F.lit(0.0))
    )
    return {
        "n_tokens": n,
        "mean_token_len": mean_len,
        "stopword_ratio": stop_ratio,
        "alpha_ratio": alpha_ratio,
        "quality": score,
    }


def quality_scores(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """→ per-doc quality features + a composite score in [0,1]:
    mean token length in a sane band, low stopword ratio band, low symbol
    ratio — a simple heuristic of the kind production pipelines threshold on."""
    q = quality_columns(F.col(content_col))
    n, mean_len, stop_ratio, alpha_ratio, score = (
        q["n_tokens"],
        q["mean_token_len"],
        q["stopword_ratio"],
        q["alpha_ratio"],
        q["quality"],
    )
    return docs.select(
        "docid",
        n.cast("long").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(score, 6).alias("quality"),
    )


def language_id(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """→ (docid, lang_guess) — n-gram-free heuristic: English stopword hit
    ratio ≥ 0.15 → 'en'; else non-ASCII ratio ≥ 0.05 → 'other'; else 'code'.
    Deterministic and oracle-replicable (the point is the distributed
    plumbing + an honest heuristic, not a model)."""
    c = F.col(content_col)
    toks = _ws_tokens(c)
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOP_WORDS_SORTED)))
    stop_ratio = F.when(n > 0, n_stop / n).otherwise(F.lit(0.0))
    non_ascii = F.length(F.regexp_replace(c, "[\\x00-\\x7F]", ""))
    na_ratio = F.when(F.length(c) > 0, non_ascii / F.length(c)).otherwise(F.lit(0.0))
    return docs.select(
        "docid",
        F.when(stop_ratio >= 0.15, F.lit("en"))
        .when(na_ratio >= 0.05, F.lit("other"))
        .otherwise(F.lit("code"))
        .alias("lang_guess"),
    )


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    topk: int = 50,
    content_col: str = "content",
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information →
    (a, b, n_ab, pmi), PMI descending.

    ``pmi = ln( (n_ab / N_bi) / ((n_a / N_tok) · (n_b / N_tok)) )`` with
    bigram counts over adjacent whitespace-token pairs and unigram counts
    over the token stream — the classic corpus-analytics collocation
    statistic (phrase mining, tokenizer-merge candidates, quality audits).

    Plan shape at scale: bigrams are generated NATIVELY per doc
    (``arrays_zip`` of the token array against its own 1-shift — no
    positional self-join, no explode-then-join), so the whole operator is
    two hash aggregations (bigram key, unigram key) + two joins of the
    bigram-count frame against the O(vocab) unigram-count frame (AQE
    broadcasts when vocab is small) + one-row total frames crossed in.
    ``min_count`` prunes the long tail BEFORE the joins — at web scale the
    singleton-bigram tail is the bulk of the frame and pure PMI noise.
    """
    c = F.col(content_col)
    n1 = F.greatest(F.size(F.col("_t")) - 1, F.lit(0))
    bigrams = (
        docs.select(_ws_tokens(c).alias("_t"))
        .select(
            F.slice(F.col("_t"), 1, n1).alias("_a"),
            F.slice(F.col("_t"), 2, n1).alias("_b"),
        )
        .select(F.explode(F.arrays_zip("_a", "_b")).alias("z"))
        .select(F.col("z._a").alias("a"), F.col("z._b").alias("b"))
    )
    uni = (
        docs.select(F.explode(_ws_tokens(c)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    bc = (
        bigrams.groupBy("a", "b")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    tot = bigrams.agg(F.count("*").cast("double").alias("nb")).crossJoin(
        uni.agg(F.sum("n").cast("double").alias("nu"))
    )
    return (
        bc.join(uni.select(F.col("term").alias("a"), F.col("n").alias("n_a")), "a")
        .join(uni.select(F.col("term").alias("b"), F.col("n").alias("n_b")), "b")
        .crossJoin(tot)
        .select(
            "a",
            "b",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") / F.col("nb"))
                    / ((F.col("n_a") / F.col("nu")) * (F.col("n_b") / F.col("nu")))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "a", "b")
        .limit(topk)
    )


def fingerprints(
    docs: DataFrame, k: int = 5, content_col: str = "content"
) -> DataFrame:
    """→ (docid, fingerprint) — min over char k-gram md5 hashes (a
    winnowing-style rolling-hash fingerprint, collapsed to the global min).

    Pure Catalyst and DuckDB-replicable (the oracle path); it materializes
    one k-char substring + one md5 per character, which is heavy at scale —
    ``fingerprints_rolling`` is the cheap scale twin."""
    c = F.col(content_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(k)),
    )
    return docs.select(
        "docid",
        F.array_min(F.transform(grams, lambda g: md5_long(g))).alias("fingerprint"),
    )


def fingerprints_rolling(
    docs: DataFrame, k: int = 5, content_col: str = "content"
) -> DataFrame:
    """→ (docid, fingerprint) — the SCALE path: polynomial (Rabin-Karp
    family) hash over UTF-8 byte k-grams, vectorized with numpy inside an
    Arrow-batched pandas UDF. Same contract as ``fingerprints`` (global
    min over k-gram hashes; identical content → identical fingerprint)
    under a different hash family, at a small constant per byte instead of
    one md5 + substring allocation per character. Kept out of the DuckDB
    oracle set (no SQL equivalent of this hash) — verified against a
    plain-python reference in pytest."""
    from pyspark.sql.types import LongType

    B = np.int64(1000003)  # odd multiplier; arithmetic wraps mod 2^64
    MASK = np.int64((1 << 60) - 1)  # keep the result positive in a BIGINT

    @F.pandas_udf(LongType())
    def _fp(texts: pd.Series) -> pd.Series:
        weights = B ** np.arange(k - 1, -1, -1, dtype=np.int64)  # B^(k-1)..B^0

        def one(t):
            if t is None:
                return None
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.int64)
            if len(b) < k:
                b = np.pad(b, (0, k - len(b)))
            win = np.lib.stride_tricks.sliding_window_view(b, k)
            with np.errstate(over="ignore"):
                h = (win * weights).sum(axis=1) & MASK
            return int(h.min())

        return texts.map(one)

    return docs.select("docid", _fp(F.col(content_col)).alias("fingerprint"))


def frequent_ngrams(
    docs: DataFrame,
    n: int = 3,
    min_count: int = 5,
    topk: int = 50,
    content_col: str = "content",
) -> DataFrame:
    """Frequent word n-gram mining → (gram, n_occ), count DESC then gram
    ASC, top-k — phrase-table construction for query suggestion,
    boilerplate detection, and tokenizer-merge candidates (the n>2
    generalization of ``collocations``' bigram PMI).

    Grams are generated NATIVELY per doc: ``transform`` over the token
    array's start offsets materializes each n-window with ``slice`` +
    ``array_join`` — no positional self-join, no per-row Python — then
    ONE hash aggregation counts occurrences (map-side partials absorb
    each partition's duplicates before the exchange). ``min_count`` cuts
    the singleton tail that dominates web-scale gram counts before the
    top-k."""
    base = docs.select(_ws_tokens(F.col(content_col)).alias("_t"))
    n_starts = F.size(F.col("_t")) - (n - 1)
    # guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty
    starts = F.when(n_starts >= 1, F.sequence(F.lit(1), n_starts)).otherwise(
        F.array().cast("array<int>")
    )
    grams = base.select(
        F.explode(
            F.transform(starts, lambda i: F.array_join(F.slice(F.col("_t"), i, n), " "))
        ).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
        .orderBy(F.desc("n_occ"), F.asc("gram"))
        .limit(topk)
    )


def next_words(
    docs: DataFrame,
    term: str,
    topk: int = 10,
    min_count: int = 1,
    content_col: str = "content",
) -> DataFrame:
    """Next-word continuation → (next, n_occ), count DESC then next ASC:
    the corpus-statistics half of query type-ahead ("fast" → "key", …) —
    ``search.suggest`` completes the CURRENT token from the vocab sidecar,
    this predicts the FOLLOWING token from bigram counts.

    The anchor-term filter lands on the LEFT side of the zip before any
    aggregation, so the plan counts only the anchor's successors — one
    explode + one hash agg over (occurrences of ``term``), not a corpus
    bigram table."""
    c = F.col(content_col)
    n1 = F.greatest(F.size(F.col("_t")) - 1, F.lit(0))
    return (
        docs.select(_ws_tokens(c).alias("_t"))
        .select(
            F.slice(F.col("_t"), 1, n1).alias("_a"),
            F.slice(F.col("_t"), 2, n1).alias("_b"),
        )
        .select(F.explode(F.arrays_zip("_a", "_b")).alias("z"))
        .filter(F.col("z._a") == term)
        .groupBy(F.col("z._b").alias("next"))
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
        .orderBy(F.desc("n_occ"), F.asc("next"))
        .limit(topk)
    )
