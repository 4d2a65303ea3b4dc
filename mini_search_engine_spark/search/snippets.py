"""Result-page snippet extraction with query-term highlighting.

The reference engine returns bare docIDs; any engine serving humans needs
the matched-context line under each hit (the feature the reference's
course UI left to the TA harness). Semantics are deterministic and
oracle-replicable:

* the doc is analyzed with the index's analyzer (token stream == what the
  index matched on),
* ``pos`` = the FIRST position (1-based) of any query term,
* the snippet is the ``2*width+1``-token slice centered on ``pos`` (clamped
  at the doc edges), query terms wrapped in ``[`` … ``]``.

Scale shape: snippet extraction is a narrow per-row map (tokenize + one
array scan) — but NEVER run it over the corpus. ``search_with_snippets``
computes the match set first (postings-pruned, corpus untouched), then
semi-joins the docs frame down to the result page before tokenizing: at
100 TB the snippet stage touches k docs, not the table. The semi-join key
set is a top-k/result DataFrame, so Spark broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mini_search_engine_spark.analysis.udfs import analyze_col, analyze_query
from mini_search_engine_spark.index.build import InvertedIndex


def _first_hit_pos(toks: Column, terms: list[str]) -> Column:
    """1-based position of the first token ∈ terms, NULL if none."""
    hits = F.filter(
        F.transform(toks, lambda t, i: F.when(t.isin(*terms), i + 1)),
        lambda p: p.isNotNull(),
    )
    return F.array_min(hits)


def snippets(
    docs: DataFrame,
    terms: list[str],
    analyzer: str = "punct_nostem",
    width: int = 3,
    content_col: str = "content",
) -> DataFrame:
    """(docid, pos, snippet) for every doc in ``docs`` containing at least
    one of ``terms`` (pre-analyzed tokens). Pure Catalyst: tokenize →
    transform-with-index scan → slice → highlight-join. Callers filter
    ``docs`` to the result set FIRST (see module note)."""
    toks = analyze_col(F.coalesce(F.col(content_col), F.lit("")), analyzer)
    base = docs.select("docid", toks.alias("_toks")).withColumn(
        "pos", _first_hit_pos(F.col("_toks"), terms)
    )
    start = F.greatest(F.lit(1), F.col("pos") - width)
    window = F.slice(F.col("_toks"), start, 2 * width + 1)
    marked = F.transform(
        window,
        lambda t: F.when(t.isin(*terms), F.concat(F.lit("["), t, F.lit("]"))).otherwise(t),
    )
    return (
        base.filter(F.col("pos").isNotNull())
        .select("docid", F.col("pos").cast("long").alias("pos"), F.array_join(marked, " ").alias("snippet"))
        .orderBy("docid")
    )


def search_with_snippets(
    index: InvertedIndex,
    docs: DataFrame,
    query: str,
    k: int = 10,
    width: int = 3,
) -> DataFrame:
    """BM25 top-k + snippet per hit: (docid, score, pos, snippet).

    The ranking runs entirely on the index (postings + broadcast stats);
    only then is ``docs`` semi-joined down to the k winners and tokenized
    for snippets — the corpus scan is k rows wide."""
    from mini_search_engine_spark.search.ranking import bm25_topk

    terms = analyze_query(query, index.analyzer)
    top = bm25_topk(index, terms, k)
    page = docs.join(F.broadcast(top.select("docid")), "docid", "semi")
    snip = snippets(page, terms, analyzer=index.analyzer, width=width)
    return top.join(snip, "docid", "left").orderBy(F.desc("score"), F.asc("docid"))
