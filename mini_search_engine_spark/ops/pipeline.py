"""Training-data pipeline operators, part 2: PII redaction, Gopher-style
repetition filtering, deterministic (stratified) hash sampling.

All pure Catalyst expressions — whole-stage-codegen'd JVM-side, no Python
in the hot path, no shuffle (every operator is a per-row map) — and each
is replicable verbatim in a DuckDB oracle:

* regex semantics chosen to agree between Java regex (Spark) and RE2
  (DuckDB): no backreferences, no lookaround, greedy quantifiers with
  unambiguous alternation, ``\\d``/``\\b`` only.
* per-doc "most frequent token/bigram" is computed WITHOUT a groupBy —
  sort the token array and take the longest equal run via ``aggregate``
  (O(n log n) per row inside codegen). At 100 TB this matters: the naive
  explode → groupBy(docid, token) formulation is a full-corpus shuffle of
  every token occurrence; this one shuffles nothing.
* sampling is a threshold on a 60-bit md5-prefix hash of (salt, docid) —
  deterministic across runs/engines (same convention as ops/dedup.py),
  so the sample is reproducible lineage, not an RNG draw. At cluster
  scale the filter lands directly on the scan (no sort, no sample()
  nondeterminism across retried tasks — Spark's ``sample()`` can return
  different rows when a task is re-executed; a content-addressed
  threshold cannot).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mini_search_engine_spark.ops.dedup import md5_long
from mini_search_engine_spark.ops.textstats import _ws_tokens

# -- PII patterns (Java-regex == RE2 semantics for these) -------------------
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PHONE_PATTERN = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
IPV4_PATTERN = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# replacement tokens, applied in this order (emails can contain dots and
# digits, so they are redacted before phone/IP patterns can bite fragments;
# the phone pattern cannot overlap an IPv4 because of its separators)
_REDACTIONS = [
    (EMAIL_PATTERN, "<EMAIL>"),
    (PHONE_PATTERN, "<PHONE>"),
    (IPV4_PATTERN, "<IP>"),
]


def pii_redact(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """→ (docid, n_emails, n_phones, n_ips, redacted) — PII-pattern counts
    on the original text plus the text with each match replaced by a typed
    placeholder. One projection, no shuffle; the counts come from
    ``regexp_count`` on the ORIGINAL column so they are independent of
    replacement order."""
    c = F.col(content_col)
    red = c
    for pat, tok in _REDACTIONS:
        red = F.regexp_replace(red, pat, tok)
    return docs.select(
        "docid",
        F.regexp_count(c, F.lit(EMAIL_PATTERN)).cast("long").alias("n_emails"),
        F.regexp_count(c, F.lit(PHONE_PATTERN)).cast("long").alias("n_phones"),
        F.regexp_count(c, F.lit(IPV4_PATTERN)).cast("long").alias("n_ips"),
        red.alias("redacted"),
    )


def _max_run(sorted_arr: Column) -> Column:
    """Length of the longest run of equal adjacent elements in a SORTED
    array == the count of the most frequent element. Pure ``aggregate``
    fold with a (prev, run, best) accumulator — no explode, no shuffle."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, acc0, step, lambda acc: acc["best"])


def repetition_scores(
    docs: DataFrame,
    content_col: str = "content",
    max_dup_frac: float = 0.75,
    max_top_token_frac: float = 0.30,
    max_top_bigram_frac: float = 0.18,
) -> DataFrame:
    """→ (docid, n_tokens, dup_token_frac, top_token_frac, top_bigram_frac,
    keep) — Gopher-style repetition signals (Rae et al. 2021, table A1),
    adapted to token granularity (the quality-filter family production
    pipelines threshold on before training):

    * ``dup_token_frac`` — fraction of token occurrences that are repeats
      of an earlier token (1 - distinct/total),
    * ``top_token_frac`` — occurrences of the single most frequent token
      over all occurrences (Gopher's "fraction of characters in the most
      common n-gram" at n=1, token-counted),
    * ``top_bigram_frac`` — same for the most frequent adjacent bigram
      (Gopher's n=2 signal; their threshold for it is 0.18),
    * ``keep`` — all three signals within thresholds.

    Everything is computed inside the row: sort the token array, take the
    longest equal run (``_max_run``). No tokenizer state, no shuffle."""
    c = F.col(content_col)
    toks = _ws_tokens(c)
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    dup_frac = F.when(n > 0, (n - n_distinct) / n).otherwise(F.lit(0.0))
    top_tok = F.when(n > 0, _max_run(F.array_sort(toks)) / n).otherwise(F.lit(0.0))
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    nb = F.size(bigrams)
    top_big = F.when(nb > 0, _max_run(F.array_sort(bigrams)) / nb).otherwise(F.lit(0.0))
    return docs.select(
        "docid",
        n.cast("long").alias("n_tokens"),
        F.round(dup_frac, 6).alias("dup_token_frac"),
        F.round(top_tok, 6).alias("top_token_frac"),
        F.round(top_big, 6).alias("top_bigram_frac"),
        (
            (dup_frac <= max_dup_frac)
            & (top_tok <= max_top_token_frac)
            & (top_big <= max_top_bigram_frac)
        ).alias("keep"),
    )


# -- deterministic sampling --------------------------------------------------

_MOD = 1_000_000


def _sample_hash(docid: Column, salt: str) -> Column:
    """60-bit md5-prefix hash of (salt, docid) folded to [0, 1e6) — the
    same portable-hash convention as ops/dedup.py (DuckDB:
    ``('0x' || substring(md5(s), 1, 15))::BIGINT % 1000000``)."""
    s = F.concat(F.lit(salt), F.lit("|"), docid.cast("string"))
    return md5_long(s) % _MOD


def hash_sample(
    docs: DataFrame, fraction: float, salt: str = "sample", id_col: str = "docid"
) -> DataFrame:
    """Deterministic ``fraction``-rate sample: keep rows whose hash bucket
    falls below the threshold. Reproducible across runs, engines, task
    retries, and cluster sizes (unlike ``DataFrame.sample``); changing
    ``salt`` draws an independent sample. The filter is a per-row
    predicate — at scale it fuses into the scan with zero extra passes."""
    return docs.filter(_sample_hash(F.col(id_col), salt) < int(fraction * _MOD))


def stratified_hash_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strat_col: str = "lang",
    default_rate: float = 0.0,
    salt: str = "sample",
    id_col: str = "docid",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing for a
    training mix): each stratum value gets its own keep-rate; strata not
    listed get ``default_rate``. Same hash-threshold mechanics as
    ``hash_sample`` — a chained-CASE literal over the (small) rate table,
    not a join, so the plan stays a single scan+filter."""
    thresh = F.lit(int(default_rate * _MOD))
    for k, v in sorted(rates.items()):
        thresh = F.when(F.col(strat_col) == k, F.lit(int(v * _MOD))).otherwise(thresh)
    return docs.filter(_sample_hash(F.col(id_col), salt) < thresh)


def epoch_mix(
    docs: DataFrame,
    weights: dict[str, float],
    strat_col: str = "lang",
    default_weight: float = 1.0,
    salt: str = "mix",
    id_col: str = "docid",
) -> DataFrame:
    """Weighted dataset mixing with UP-sampling: a stratum with weight w
    contributes each doc floor(w) times, plus one more with probability
    frac(w) — so the expected epoch count of every doc is exactly its
    stratum weight (the standard training-mix "epochs per source" knob;
    weights < 1 degrade to stratified sampling, weights > 1 repeat data).

    Deterministic: the fractional copy reuses the 60-bit (salt, docid)
    hash threshold, so the mix is reproducible across runs, engines, and
    partitionings, and nested in the same way as ``hash_sample``.

    Output: input rows + ``epoch`` (0-based copy index). Per-row compute:
    a chained-CASE weight lookup, one hash, one ``explode(sequence)`` —
    no shuffle, no join; row expansion is the output size itself, which
    is the irreducible cost of up-sampling."""
    w_int = F.lit(int(default_weight))
    w_frac = F.lit(int((default_weight - int(default_weight)) * _MOD))
    for k, v in sorted(weights.items()):
        w_int = F.when(F.col(strat_col) == k, F.lit(int(v))).otherwise(w_int)
        w_frac = F.when(
            F.col(strat_col) == k, F.lit(int(round((v - int(v)) * _MOD)))
        ).otherwise(w_frac)
    n_copies = w_int + F.when(
        _sample_hash(F.col(id_col), salt) < w_frac, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        docs.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
        .withColumn("epoch", F.col("epoch").cast("long"))
    )
