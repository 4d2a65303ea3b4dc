"""Bigram language-model perplexity scoring — the OTHER standard quality
filter of a training-data pipeline (CCNet, Wenzek et al. 2019, filters
CommonCrawl by KenLM perplexity; Gopher/Rae et al. 2021 app. A does the
same). This is an honest small-n stand-in: an add-one-smoothed bigram model
trained distributed, scoring every document's per-token cross-entropy and
perplexity. The point is the distributed plumbing and the exact, oracle-
replicable math, not KenLM parity.

Design for 100 TB:

- **Bigrams never leave their row until the count.** Consecutive-token
  pairs come from ``arrays_zip(slice, slice)`` — pure Catalyst, no Python,
  no positional shuffle. Training is ONE ``groupBy(prev, cur)`` (map-side
  partial aggregation collapses repeats before the exchange); context
  totals and vocabulary size derive from that table, not a second corpus
  pass over raw tokens.
- **Scoring is two model joins + one groupBy(docid).** The model is the
  join's small side; ``min_count`` prunes the long bigram tail (the KenLM
  pruning analogue) so it stays broadcastable — pruned/unseen bigrams fall
  back to the smoothed floor ``1/(C(prev)+V)`` exactly as an unseen pair
  would, so pruning degrades scores gracefully instead of breaking them.
  Set ``broadcast_model=False`` to let Catalyst pick a shuffle join when
  the bigram table outgrows broadcast (AQE will still broadcast if it
  turns out small).
- log-probability decomposes as ``ln(C(prev,cur)+1) - ln(C(prev)+V)`` so
  both joins carry one double each.

→ ``lm_perplexity`` registry entry replicates the whole model in DuckDB
SQL (hash-exact incl. the exp()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the ONE whitespace tokenizer every oracle-parity op shares — lm/dsir
# scoring must never drift from textstats/curate gating
from .textstats import _ws_tokens


def _doc_bigrams(docs: DataFrame, content_col: str, extra_cols: list[str]) -> DataFrame:
    """→ one row per consecutive token pair: (*extra_cols, prev, cur).
    Within-row zip of toks[0:n-1] with toks[1:n]; docs with <2 tokens
    contribute nothing."""
    toks = _ws_tokens(F.col(content_col))
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("prev"),
        F.slice(toks, 2, n - 1).alias("cur"),
    )
    return (
        docs.filter(n >= 2)
        .select(*extra_cols, F.explode(pairs).alias("_p"))
        .select(*extra_cols, F.col("_p.prev").alias("prev"), F.col("_p.cur").alias("cur"))
    )


def lm_train_bigram(
    docs: DataFrame,
    content_col: str = "content",
    min_count: int = 1,
    persist_model: bool = True,
) -> tuple[DataFrame, DataFrame, int]:
    """Train the add-one bigram model. → (bigram_counts(prev, cur, c),
    context_totals(prev, t), vocab_size V).

    V is the UNIGRAM vocabulary (all tokens, including docs' last tokens) —
    the smoothing denominator must cover every possible continuation.
    ``min_count`` drops bigrams below the threshold AFTER totals/vocab are
    fixed, so pruning only moves pruned pairs onto the unseen floor — it
    never changes the probabilities of surviving pairs.

    ``persist_model`` caches the count table (MEMORY_AND_DISK): its two
    consumers — the (prev, cur) join's build side and the ctx
    re-aggregation — do NOT share an exchange in the compiled plan
    (verified: without the persist the final AQE plan holds 0
    ReusedExchange nodes and re-derives the count subplan, corpus scan
    included, under each consumer — the broadcast boundary defeats
    ReuseExchange). Measured a WASH at 200k docs on this box (cache
    write/read ≈ the saved re-scan); the default is True because at
    corpus scale the re-scan+re-tokenize side grows with the corpus while
    the cached table grows only with the vocabulary². Freed by Spark's
    ContextCleaner with the frame, or explicitly via
    ``counts.unpersist()``."""
    bg = _doc_bigrams(docs, content_col, [])
    counts = bg.groupBy("prev", "cur").count().withColumnRenamed("count", "c")
    warm = None
    if persist_model:
        from pyspark import StorageLevel

        counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
        # overlap (guide §2.6): materialize the model cache on a driver
        # thread WHILE the vocab job runs below — the two passes are
        # independent, and running them sequentially left the cluster idle
        # during each one's tail. Errors are not swallowed silently: any
        # real corpus failure re-raises in the vocab job (same input), and
        # a failed warm-up only leaves the cache cold, never wrong.
        import threading

        warm = threading.Thread(target=lambda: counts.count(), daemon=True)
        warm.start()
    vocab_size = (
        docs.select(F.explode(_ws_tokens(F.col(content_col))).alias("tok"))
        .select("tok")
        .distinct()
        .count()
    )
    if warm is not None:
        warm.join()
    ctx = counts.groupBy("prev").agg(F.sum("c").alias("t"))
    if min_count > 1:
        pruned = counts.filter(F.col("c") >= min_count)
    else:
        pruned = counts
    return pruned, ctx, vocab_size


def lm_perplexity(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "docid",
    min_count: int = 1,
    broadcast_model: bool = True,
    persist_model: bool = True,
) -> DataFrame:
    """Self-train a bigram LM on the corpus and score every document.

    → (id_col, n_bigrams, cross_entropy, perplexity); docs with <2 tokens
    get n_bigrams=0 and NULL entropy/perplexity (nothing to score).
    cross_entropy = -(1/m) Σ ln P(cur|prev) in nats; perplexity = exp(H).
    Real pipelines train on the curated corpus and score the crawl — same
    ``lm_train_bigram`` + the scoring half of this function."""
    counts, ctx, V = lm_train_bigram(
        docs, content_col, min_count=min_count, persist_model=persist_model
    )
    wrap = F.broadcast if broadcast_model else (lambda df: df)
    bg = _doc_bigrams(docs, content_col, [id_col])
    lnp = (
        F.log(F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(1.0))
        - F.log(F.coalesce(F.col("t"), F.lit(0)).cast("double") + F.lit(float(V)))
    )
    scored = (
        bg.join(wrap(counts), ["prev", "cur"], "left")
        .join(wrap(ctx), ["prev"], "left")
        .select(id_col, lnp.alias("_lnp"))
        .groupBy(id_col)
        .agg(F.count("*").alias("_m"), (-F.avg("_lnp")).alias("cross_entropy"))
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_m"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("cross_entropy"),
            F.exp(F.col("cross_entropy")).alias("perplexity"),
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "docid",
    lang_col: str | None = None,
    cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    min_count: int = 1,
    broadcast_model: bool = True,
    approx: bool = False,
    round_dp: int = 6,
    persist_scores: bool = True,
) -> DataFrame:
    """CCNet §4.4 perplexity bucketing: split the corpus into ``head`` /
    ``middle`` / ``tail`` at per-language (or global) perplexity quantiles —
    head = lowest perplexity = most LM-like text; tail is what CCNet drops
    or downweights. Docs too short to score (<2 tokens) land in
    ``unscored``.

    → (id_col[, lang_col], perplexity, bucket).

    Semantics guard: both the scores and the cut points are rounded to
    ``round_dp`` decimals BEFORE the bucket comparison (same role as pq.py's
    DIST_ROUND) so bucket assignment is bit-reproducible across engines —
    the DuckDB oracle replicates the comparison on identically rounded
    values.

    Scale: the quantile aggregate reduces to one tiny row per language
    which broadcasts back over the corpus — the corpus itself is never
    re-shuffled beyond what scoring already did. ``approx=True`` swaps the
    exact ``percentile`` (per-group value buffer — fine to ~10^8 docs per
    language) for ``percentile_approx`` (bounded-memory sketch), the right
    setting at 100 TB where a ±ε quantile moves the cut by a handful of
    borderline docs.

    ``persist_scores`` caches the (id, ppl) score table (MEMORY_AND_DISK,
    ~16 bytes/doc): it has two consumers — the quantile aggregate and the
    output join — which, like lm_train_bigram's model table, do NOT share
    an exchange in the compiled plan, so without the cache the ENTIRE
    scoring DAG (corpus scan + model joins) runs twice. Freed by Spark's
    ContextCleaner with the frame."""
    ppl = lm_perplexity(docs, content_col, id_col, min_count, broadcast_model)
    scored = ppl.select(id_col, F.round("perplexity", round_dp).alias("_ppl"))
    grp = [lang_col] if lang_col else []
    if lang_col:
        scored = scored.join(docs.select(id_col, lang_col), id_col)
    if persist_scores:
        from pyspark import StorageLevel

        scored = scored.persist(StorageLevel.MEMORY_AND_DISK)

    def _q(frac: float) -> Column:
        if approx:
            return F.percentile_approx(F.col("_ppl"), frac, 10000)
        return F.percentile(F.col("_ppl"), frac)

    qs = (
        scored.filter(F.col("_ppl").isNotNull())
        .groupBy(*grp)
        .agg(
            F.round(_q(cuts[0]), round_dp).alias("_q1"),
            F.round(_q(cuts[1]), round_dp).alias("_q2"),
        )
    )
    # left join (never inner/cross): an all-unscored corpus or language
    # group has no quantile row, and those docs must still flow through as
    # 'unscored' rather than vanish
    if grp:
        joined = scored.join(F.broadcast(qs), grp, "left")
    else:
        joined = scored.withColumn("_k", F.lit(1)).join(
            F.broadcast(qs.withColumn("_k", F.lit(1))), ["_k"], "left"
        ).drop("_k")
    bucket = (
        F.when(F.col("_ppl").isNull(), F.lit("unscored"))
        .when(F.col("_ppl") <= F.col("_q1"), F.lit("head"))
        .when(F.col("_ppl") <= F.col("_q2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return joined.select(
        id_col,
        *grp,
        F.col("_ppl").alias("perplexity"),
        bucket.alias("bucket"),
    )
