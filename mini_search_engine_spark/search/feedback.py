"""Pseudo-relevance feedback (Rocchio-style) query expansion over BM25.

The reference scores exactly the user's analyzed terms
(``InvertedIndexManager.java:1292-1489``); PRF is the classic retrieval
upgrade on top: assume the first pass's top documents are relevant, mine
their most discriminative terms, and re-run the query with those terms
added at reduced weight. Two bounded passes, no training data.

Spark shape: pass 1 is the ordinary ``bm25_topk`` plan truncated at
``fb_docs`` (a handful of docids — the only thing collected). Term mining
re-tokenizes ONLY those docs through the same analyzer as the index build
(a docid-pushdown scan of fb_docs rows — O(1) in corpus size), aggregates
tf per term, joins df from the termstats sidecar (the mined-term side is
tiny → broadcast), and takes the ``fb_terms`` best by Σtf·idf. Pass 2 is
``bm25_topk_weighted`` with originals at weight 1.0 and expansions at
``beta`` — one more pruned postings scan. Every driver collect is bounded
by fb_docs / fb_terms, never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_search_engine_spark.index.build import InvertedIndex, tokenize_docs
from mini_search_engine_spark.search.ranking import bm25_topk, bm25_topk_weighted


def expansion_terms(
    index: InvertedIndex,
    docs: DataFrame,
    keywords: list[str],
    fb_docs: int = 5,
    fb_terms: int = 5,
) -> DataFrame:
    """→ (term, fb_score, rank): the ``fb_terms`` most discriminative terms
    of the query's top ``fb_docs`` BM25 hits, scored Σ_docs tf · idf with
    idf = ln(1 + (N - df + .5)/(df + .5)) (the BM25 idf, so selection and
    scoring agree on what "discriminative" means). Original query terms are
    excluded; ties break on (rounded score DESC, term ASC)."""
    from mini_search_engine_spark.analysis.udfs import analyze_query

    orig: set[str] = set()
    for k in keywords:
        orig.update(analyze_query(k, index.analyzer))
    top = bm25_topk(index, keywords, topk=fb_docs).select("docid").collect()
    fb_ids = [r["docid"] for r in top]
    if not fb_ids:
        return index.termstats.sparkSession.range(0).select(
            F.lit("").alias("term"),
            F.lit(0.0).alias("fb_score"),
            F.col("id").alias("rank"),
        )
    fb_tf = (
        tokenize_docs(docs.filter(F.col("docid").isin(fb_ids)), index.analyzer)
        .groupBy("term")
        .agg(F.sum("tf").alias("tfsum"))
    )
    if orig:
        fb_tf = fb_tf.filter(~F.col("term").isin(sorted(orig)))
    n = float(index.n_docs)
    idf = F.log(
        F.lit(1.0) + (F.lit(n) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    scored = (
        index.termstats.join(F.broadcast(fb_tf), "term")
        .select("term", F.round(F.col("tfsum") * idf, 6).alias("fb_score"))
        .orderBy(F.desc("fb_score"), F.asc("term"))
        .limit(fb_terms)
    )
    from pyspark.sql import Window

    rw = Window.orderBy(F.desc("fb_score"), F.asc("term"))
    return scored.withColumn("rank", F.row_number().over(rw).cast("long"))


def bm25_prf(
    index: InvertedIndex,
    docs: DataFrame,
    keywords: list[str],
    topk: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 5,
    beta: float = 0.4,
) -> DataFrame:
    """Two-pass BM25 with pseudo-relevance-feedback expansion →
    (docid, score) top-k. Original analyzed terms keep their multiplicity
    as weight; each expansion term enters flat at ``beta`` (binary Rocchio
    feedback — weight-proportional variants trade oracle determinism for
    little measured gain on short queries)."""
    from mini_search_engine_spark.analysis.udfs import analyze_query

    from collections import Counter

    counts: Counter = Counter()
    for k in keywords:
        counts.update(analyze_query(k, index.analyzer))
    exp = expansion_terms(index, docs, keywords, fb_docs=fb_docs, fb_terms=fb_terms)
    weights: dict[str, float] = {t: float(c) for t, c in counts.items()}
    for r in exp.collect():  # bounded: fb_terms rows
        weights.setdefault(r["term"], 0.0)
        weights[r["term"]] += beta
    return bm25_topk_weighted(index, weights, topk=topk)
