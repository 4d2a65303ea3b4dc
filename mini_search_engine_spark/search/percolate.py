"""Percolation — reverse search: match DOCUMENTS against stored QUERIES.

The forward engine answers "which docs match this query"
(``InvertedIndexManager.java:1121-1168`` AND semantics); percolation
answers "which stored queries match this doc" — the alerting/routing
primitive (saved searches, topic subscriptions, compliance rules) that a
streaming ingest pipeline runs on every new batch.

Spark-first: this is a JOIN between two term relations, not a loop over
queries. Stored queries are analyzed with the SAME analyzer as the index
build (distributed — queries are a DataFrame and may number millions at
scale), exploded to (qid, term, nterms); documents tokenize to
(docid, term) once per batch. One shuffle join on ``term`` + one
(docid, qid) aggregation recovers AND semantics: a query matches iff all
``nterms`` of its distinct terms are present. ``nterms`` rides on every
query-term row, so no second join against a query-size table. Stop-like
query terms fan out the join exactly like high-df terms in related_docs;
queries are short, so the fanout is bounded by (docs containing t) ×
(queries containing t) — the standard percolator trade, and the reason
Elasticsearch indexes queries by their rarest term. The ``min_should``
generalization (match ≥ m of n terms) falls out of the same aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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
) -> DataFrame:
    """→ (docid, qid, matched, nterms): stored queries matching each doc.
    AND semantics by default (matched == nterms); ``min_should=m`` relaxes
    to match-at-least-m. ``queries`` has (qid long, query string); empty
    queries (all terms analyzed away) never match."""
    qterms = _query_terms(queries, analyzer)
    dterms = tokenize_docs(docs, analyzer).select("docid", "term")
    hits = (
        dterms.join(qterms, "term")
        .groupBy("docid", "qid")
        .agg(F.count("*").alias("matched"), F.max("nterms").alias("nterms"))
    )
    need = F.col("nterms") if min_should is None else F.lit(min_should)
    return hits.filter(F.col("matched") >= need).select("docid", "qid", "matched", "nterms")
