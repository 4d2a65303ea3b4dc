"""Structured + fulltext serving surfaces: filtered ranked search, field
collapsing, and per-term score explanation.

The reference's query surface is pure fulltext; production engines always
serve fulltext AND a structured predicate ("spark merge, but only
lang=java repos"), collapse results by a field ("best hit per repo"), and
explain scores. These compose the existing pruned scoring passes with the
corpus table — no new index state.

Scale shape of each:

* ``bm25_topk_filtered`` — the postings side is already term-pruned
  (int-tid ``In`` pushdown); the corpus side applies the predicate BEFORE
  the join so partition/stats pruning reaches the parquet scan (filter on
  a Hive-partition column → directory pruning, see
  ``corpus.load_corpus_partitioned``). The join is a semi-join on docid;
  with both sides pruned it is two small frames, and the final cut is a
  ``TakeOrderedAndProject`` of k rows.
* ``collapse_results`` — one join from the (small, term-pruned) scored
  frame to the corpus for the collapse key, one window per key; never a
  corpus-wide window.
* ``bm25_explain`` — per-(docid, term) contribution rows for a HANDFUL of
  docids: the docid filter lands on the decoded postings, so the explain
  pass reads the same blocks the query read, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mini_search_engine_spark.index.build import InvertedIndex
from mini_search_engine_spark.search.ranking import (
    _analyzed_with_counts,
    _bm25_idf,
    _df_map,
    _exploded,
    B,
    K1,
    bm25_scores,
)
from mini_search_engine_spark.index.termid import term_id_py


def bm25_topk_filtered(
    index: InvertedIndex,
    docs: DataFrame,
    keywords: list[str],
    predicate: Column | str,
    topk: int = 10,
) -> DataFrame:
    """Exact BM25 top-k restricted to corpus rows satisfying ``predicate``
    → (docid, score). The predicate is applied to ``docs`` BEFORE the
    semi-join so Catalyst pushes it into the corpus scan (PushedFilters /
    PartitionFilters); ranking happens AFTER the restriction, so the
    returned page is the true top-k of the filtered set — not a filtered
    top-k page (which under-fills when matches are rare in the filter)."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    keep = docs.filter(pred).select("docid")
    return (
        bm25_scores(index, keywords)
        .join(keep, "docid", "semi")
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(topk)
    )


def collapse_results(
    scored: DataFrame,
    docs: DataFrame,
    collapse_col: str,
    per_group: int = 1,
    topk: int = 10,
) -> DataFrame:
    """Field collapsing (dedup-by-field): keep the best ``per_group`` rows
    of ``scored`` (docid, score) per value of ``docs.collapse_col``, then
    the global top-k → (docid, score, <collapse_col>). One result per repo
    / domain / author — the standard search-UI diversification."""
    j = scored.join(docs.select("docid", collapse_col), "docid")
    w = Window.partitionBy(collapse_col).orderBy(F.desc("score"), F.asc("docid"))
    return (
        j.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= per_group)
        .drop("_r")
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(topk)
        .select("docid", "score", collapse_col)
    )


def bm25_explain(
    index: InvertedIndex, keywords: list[str], docids: list[int]
) -> DataFrame:
    """Score breakdown for specific result docs → one row per
    (docid, term): tf, df, idf, the tf-saturation factor, and the term's
    additive contribution (contributions sum to ``bm25_topk``'s score —
    asserted in pytest). The docid filter is applied to the term-pruned
    postings, so explaining a page of results re-reads only the blocks
    the query touched."""
    counts = _analyzed_with_counts(index, keywords)
    if not counts or not docids:
        spark = index.postings.sparkSession
        return spark.range(0).select(
            F.col("id").alias("docid"),
            F.lit("").alias("term"),
            F.lit(0).alias("tf"),
            F.lit(0).alias("df"),
            F.lit(0.0).alias("idf"),
            F.lit(0.0).alias("tf_factor"),
            F.lit(0.0).alias("contribution"),
        )
    terms = sorted(counts)
    dfm = _df_map(index, terms)
    rows = [
        (term_id_py(t), t, float(counts[t]), dfm[t], _bm25_idf(index.n_docs, dfm[t]))
        for t in terms
        if dfm.get(t)
    ]
    spark = index.postings.sparkSession
    qdf = spark.createDataFrame(
        rows, "tid long, term string, qtf double, df long, idf double"
    )
    raw = index.postings.filter(F.col("tid").isin([r[0] for r in rows]))
    if index.compressed:
        from dataclasses import replace as _rep

        raw = _rep(index, postings=raw).decoded().postings
    tf_factor = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / index.avgdl)
    )
    return (
        _exploded(raw)
        .filter(F.col("docid").isin(list(docids)))
        .join(F.broadcast(qdf), "tid")
        .select(
            "docid",
            "term",
            F.col("tf").cast("long").alias("tf"),
            "df",
            F.round("idf", 6).alias("idf"),
            F.round(tf_factor, 6).alias("tf_factor"),
            F.round(F.col("qtf") * F.col("idf") * tf_factor, 6).alias(
                "contribution"
            ),
        )
        .orderBy("docid", "term")
    )
