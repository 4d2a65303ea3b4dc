"""More-like-this: find documents similar to a given document.

The Lucene MoreLikeThis pattern, Spark-first: the source doc's content is
one row (bounded driver work — analyze it, count tfs), its DISTINCTIVE
terms are chosen by tf·idf against the index's corpus statistics, and the
similarity query is just BM25 over those few terms — the postings-pruned
machinery the engine already has. No doc-vector self-join, no O(n²)
anything: cost == one bounded collect + one BM25 query, whatever the
corpus size.

Determinism (oracle-replicable): term selection ranks by
(round(tf·idf, 6) DESC, term ASC); results by (round(score, 6) DESC,
docid ASC) with the source doc excluded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_search_engine_spark.analysis.udfs import analyze_query
from mini_search_engine_spark.index.build import InvertedIndex
from mini_search_engine_spark.search.ranking import (
    _bm25_idf,
    _df_map,
    bm25_scores,
)


def distinctive_terms(
    index: InvertedIndex, content: str, max_terms: int = 5
) -> list[str]:
    """The ``max_terms`` highest-tf·idf analyzed terms of ``content``
    (BM25 idf against the index's df stats; terms absent from the index
    contribute nothing and are skipped)."""
    from collections import Counter

    counts = Counter(analyze_query(content, index.analyzer))
    if not counts:
        return []
    dfm = _df_map(index, sorted(counts))
    scored = [
        (round(tf * _bm25_idf(index.n_docs, dfm[t]), 6), t)
        for t, tf in counts.items()
        if dfm.get(t)
    ]
    scored.sort(key=lambda st: (-st[0], st[1]))
    return [t for _, t in scored[:max_terms]]


def more_like_this(
    index: InvertedIndex,
    docs: DataFrame,
    docid: int,
    k: int = 10,
    max_terms: int = 5,
) -> DataFrame:
    """→ (docid, score): top-``k`` docs most similar to ``docid`` —
    BM25 over the source doc's ``max_terms`` most distinctive terms,
    source excluded."""
    row = docs.filter(F.col("docid") == docid).select("content").collect()
    if not row:
        raise ValueError(f"docid {docid} not found")
    terms = distinctive_terms(index, row[0]["content"] or "", max_terms)
    if not terms:
        return (
            docs.sparkSession.range(0)
            .select(F.col("id").alias("docid"), F.lit(0.0).alias("score"))
        )
    return (
        bm25_scores(index, terms)
        .filter(F.col("docid") != docid)
        .withColumn("score", F.round("score", 6))
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(k)
    )


def significant_terms(
    index: InvertedIndex,
    fg_docids: DataFrame,
    topk: int = 20,
    min_fg_df: int = 2,
) -> DataFrame:
    """Significant-terms aggregation → (term, fg_df, bg_df, score): terms
    OVERREPRESENTED in a foreground doc set relative to the whole corpus
    (Elasticsearch's significant_terms — "why does this result set /
    segment / cluster differ?"). Score is the log relative risk
    ``ln((fg_df/fg_n) / (bg_df/bg_n))`` (round6; ties by term ASC);
    ``min_fg_df`` cuts the noise floor where one foreground occurrence of
    a rare term dominates any ratio.

    Spark shape: foreground dfs come from the INDEX, not a re-tokenize —
    explode the postings' docid arrays and semi-join against ``fg_docids``
    (one row per posting hit; at a bounded foreground the join side
    broadcasts) → count per tid; background dfs are the O(vocab)
    termstats sidecar joined on the int tid. One aggregation + one
    sidecar join, independent of foreground text volume.
    """
    fg = fg_docids.select("docid").distinct()
    fg_n = fg.count()
    if fg_n == 0:
        return index.termstats.sparkSession.range(0).select(
            F.lit("").alias("term"),
            F.col("id").alias("fg_df"),
            F.col("id").alias("bg_df"),
            F.lit(0.0).alias("score"),
        )
    posts = index.postings
    if index.compressed:
        from dataclasses import replace as _rep

        posts = _rep(index, postings=posts).decoded().postings
    hit = (
        posts.select("tid", F.explode("docids").alias("docid"))
        .join(fg, "docid", "left_semi")
        .groupBy("tid")
        .agg(F.count("*").alias("fg_df"))
        .filter(F.col("fg_df") >= min_fg_df)
    )
    n = float(index.n_docs)
    return (
        hit.join(index.termstats.select("tid", "term", F.col("df").alias("bg_df")), "tid")
        .select(
            "term",
            "fg_df",
            "bg_df",
            F.round(
                F.log(
                    (F.col("fg_df") / F.lit(float(fg_n)))
                    / (F.col("bg_df") / F.lit(n))
                ),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(topk)
    )
