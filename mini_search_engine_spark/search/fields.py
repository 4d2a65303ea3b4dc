"""Multi-field ranked search: weighted per-field BM25 combination.

Code search ranks a filename/path hit above the same term buried in a
function body (every production code-search engine boosts path fields;
Lucene models it as a weighted multi-field query). The reference engine is
single-field; the input_hint table (repo, path, …, content) is not. Each
field gets its OWN index — its own analyzer (code analyzer for paths,
porter/punct for prose bodies), df statistics, and avgdl, exactly the
per-field statistics BM25F argues for — and a query scores

    score(d) = Σ_f  w_f · BM25_f(q, d)

Scale shape: per-field scoring reuses the tid-pruned postings path of
``bm25_topk`` (only the query terms' posting rows are ever read from each
index); the combination is a unionByName + ONE groupBy(docid) — map-side
partials collapse each field's contribution before the exchange, and the
cut to k runs after the sum (TakeOrderedAndProject). Cost is additive in
fields, never multiplicative in corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_search_engine_spark.index.build import InvertedIndex
from mini_search_engine_spark.search.ranking import bm25_scores


def multi_field_bm25(
    fields: list[tuple[InvertedIndex, float]],
    keywords: list[str],
    topk: int | None = 10,
) -> DataFrame:
    """→ (docid, score) by descending Σ_f w_f·BM25_f, ties ascending docid.

    ``fields`` pairs each field's index with its boost. Fields may use
    DIFFERENT analyzers; ``keywords`` are analyzed per-field by the
    underlying scorer."""
    if not fields:
        raise ValueError("at least one (index, weight) field required")
    parts = [
        bm25_scores(idx, keywords).select(
            "docid", (F.col("score") * float(w)).alias("score")
        )
        for idx, w in fields
    ]
    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionByName(p)
    out = (
        scored.groupBy("docid")
        .agg(F.sum("score").alias("score"))
        .orderBy(F.desc("score"), F.asc("docid"))
    )
    return out.limit(topk) if topk is not None else out


def multi_field_bm25_dismax(
    fields: list[tuple[InvertedIndex, float]],
    keywords: list[str],
    topk: int | None = 10,
    tie_breaker: float = 0.0,
) -> DataFrame:
    """Disjunction-max ("best_fields") combination → (docid, score):

        score(d) = max_f w_f·BM25_f  +  tie_breaker · Σ_{other f}

    The sum mode (``multi_field_bm25``) rewards a term spread thinly over
    many fields as much as one strong field hit; dis-max (Lucene's
    DisjunctionMaxQuery, Elasticsearch ``best_fields``) ranks by the
    single best field so a path hit is not outranked by three weak body
    mentions. ``tie_breaker`` ∈ [0, 1] blends the other fields back in
    (0 = pure max, 1 ≡ the sum mode). Identical plan shape to the sum
    mode: per-field tid-pruned scoring, one union, ONE groupBy(docid) —
    max+sum both fold map-side."""
    if not fields:
        raise ValueError("at least one (index, weight) field required")
    parts = [
        bm25_scores(idx, keywords).select(
            "docid", (F.col("score") * float(w)).alias("score")
        )
        for idx, w in fields
    ]
    scored = parts[0]
    for p in parts[1:]:
        scored = scored.unionByName(p)
    best = F.max("score")
    rest = F.sum("score") - best
    out = (
        scored.groupBy("docid")
        .agg((best + F.lit(float(tie_breaker)) * rest).alias("score"))
        .orderBy(F.desc("score"), F.asc("docid"))
    )
    return out.limit(topk) if topk is not None else out
