"""Percolation — reverse search: match DOCUMENTS against stored QUERIES.

The forward engine answers "which docs match this query"
(``InvertedIndexManager.java:1121-1168`` AND semantics); percolation
answers "which stored queries match this doc" — the alerting/routing
primitive (saved searches, topic subscriptions, compliance rules) that a
streaming ingest pipeline runs on every new batch.

Spark-first, with **rarest-term routing** (the Elasticsearch percolator
design): the naive shape is a join between the full (docid, term) and
(qid, term) relations, whose row count is Σ_t (docs containing t) ×
(queries containing t) — dominated by the most common term and measured
bus-bound at scale (BENCH/PERCOLATE_SCALING.md, r4). Instead:

1. Stored queries are analyzed distributed (they may number millions)
   and each query is ROUTED by its df-rarest term — for AND semantics a
   doc can only match a query if it contains that one term. For
   ``min_should=m`` the routing set is the ``nterms - m + 1`` rarest
   terms (pigeonhole: if ≥ m of n terms match, at most n - m are absent,
   so at least one of any n - m + 1 chosen terms is present).
2. Docs tokenize to a WITHIN-ROW distinct-term array (``analyze_col`` —
   no shuffle), and candidates come from one explode + broadcast join
   against the tiny routing table.
3. Verification is exact and local: ``array_intersect`` between the
   doc's term set (already in the row) and the query's term set
   (broadcast) — no second pass over the corpus.

Routing df defaults to the batch's own term df (one map-side-combined
agg); pass ``df_stats`` (e.g. ``index.termstats``) to skip even that —
routing CORRECTNESS never depends on df accuracy (any routing term the
doc must contain works), df only steers candidate selectivity. The
candidate row count drops from Σ_t df(t)·qf(t) to Σ_q df(rarest term of
q) — the ES percolator trade, now actually implemented rather than cited.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mini_search_engine_spark.analysis.udfs import analyze_col
from mini_search_engine_spark.index.build import tokenize_docs


def _query_terms(queries: DataFrame, analyzer: str) -> DataFrame:
    """(qid, query) → (qid, term, nterms): distinct analyzed terms per
    stored query, via the same tokenize kernel as the doc side."""
    q = queries.select(F.col("qid").alias("docid"), F.col("query").alias("content"))
    toks = tokenize_docs(q, analyzer).select(F.col("docid").alias("qid"), "term").distinct()
    return toks.withColumn("nterms", F.count("*").over(Window.partitionBy("qid")))


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    analyzer: str = "porter",
    min_should: int | None = None,
    df_stats: DataFrame | None = None,
    broadcast_queries: bool = True,
) -> DataFrame:
    """→ (docid, qid, matched, nterms): stored queries matching each doc.
    AND semantics by default (matched == nterms); ``min_should=m`` relaxes
    to match-at-least-m. ``queries`` has (qid long, query string); empty
    queries (all terms analyzed away) never match.

    ``df_stats`` (term, df) overrides the routing-df source (use the
    index's termstats to skip the batch df pass). ``broadcast_queries``
    broadcasts the routing and verification tables — right whenever the
    stored-query set fits in memory (tens of MB per million queries);
    set False to fall back to shuffle joins for a truly huge query set.
    """
    qterms = _query_terms(queries, analyzer)

    # per-doc DISTINCT term set as a within-row array — zero shuffle;
    # wordbreak analyzers yield NULL for unbreakable content → no terms
    dset_col = F.array_distinct(
        F.coalesce(
            analyze_col(F.coalesce(F.col("content"), F.lit("")), analyzer),
            F.array().cast("array<string>"),
        )
    )
    darr = docs.select("docid", dset_col.alias("dset"))

    if df_stats is None:
        df_stats = (
            darr.select(F.explode("dset").alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias("df"))
        )
    else:
        df_stats = df_stats.select("term", "df")

    # routing terms: the (nterms - m + 1) df-rarest terms per query
    # (1 for AND). Terms unseen by df_stats rank rarest (df 0) — for
    # batch-derived df that is the maximal optimization (no doc can
    # match), for index-derived df it is merely a conservative choice.
    n_route = (
        F.lit(1)
        if min_should is None
        else F.col("nterms") - F.lit(min_should) + F.lit(1)
    )
    rk = Window.partitionBy("qid").orderBy(F.col("df").asc(), F.col("term").asc())
    routing = (
        qterms.join(df_stats, "term", "left")
        .withColumn("df", F.coalesce(F.col("df"), F.lit(0)))
        .withColumn("__rk", F.row_number().over(rk))
        .filter(F.col("__rk") <= n_route)
        .select("term", "qid")
    )
    qarr = qterms.groupBy("qid").agg(
        F.collect_set("term").alias("qset"), F.max("nterms").alias("nterms")
    )
    if broadcast_queries:
        routing, qarr = F.broadcast(routing), F.broadcast(qarr)

    # candidates: one explode of the in-row term set + (broadcast) join
    # on the routing term — Σ_q df(rarest term) rows, not Σ_t df·qf
    cands = (
        darr.select("docid", "dset", F.explode("dset").alias("term"))
        .join(routing, "term")
        .select("docid", "dset", "qid")
    )
    need = F.col("nterms") if min_should is None else F.lit(min_should)
    out = (
        cands.join(qarr, "qid")
        .withColumn("matched", F.size(F.array_intersect(F.col("dset"), F.col("qset"))))
        .filter(F.col("matched") >= need)
        .select("docid", "qid", "matched", "nterms")
    )
    if min_should is not None:
        # multi-term routing can emit the same (doc, query) candidate
        # once per routing term the doc contains; AND (single routing
        # term) cannot, so it skips this exchange
        out = out.distinct()
    return out
