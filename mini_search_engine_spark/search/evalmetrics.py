"""Relevance evaluation metrics over ranked runs — nDCG@k, MRR, P@k,
recall@k.

The reference has no eval harness; any serious relevance work needs one,
and at fleet scale (thousands of queries × reranker variants) it is a
DataFrame job, not a for-loop: one join of the run against the judgments
and two aggregations, all inside whole-stage codegen.

Conventions (TREC-standard): ``run`` is (qid, docid, rank) with rank
1-based and unique per qid; ``qrels`` is (qid, docid, grade) with
grade > 0 = relevant (graded). DCG uses the exponential gain form
(2^grade − 1)/log2(rank + 1); IDCG ranks the qrels by (grade DESC,
docid ASC) so ties are deterministic. Queries with no relevant docs get
recall/ndcg 0 (not NULL) so downstream averages are well-defined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gain(col: str) -> F.Column:
    return F.pow(F.lit(2.0), F.col(col)) - F.lit(1.0)


def relevance_metrics(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """→ (qid, p_at_k, recall_at_k, rr, ndcg_at_k, n_rel) per qid in the
    run. ``rr`` is the reciprocal rank of the first relevant result within
    the top k (0 when none)."""
    rel = qrels.filter(F.col("grade") > 0)
    runk = run.filter(F.col("rank") <= k)
    j = runk.join(rel, ["qid", "docid"], "left").select(
        "qid", "rank", F.coalesce(F.col("grade"), F.lit(0)).alias("grade")
    )
    disc = F.log2(F.col("rank").cast("double") + 1.0)
    agg = j.groupBy("qid").agg(
        F.sum(F.when(F.col("grade") > 0, 1).otherwise(0)).alias("hits"),
        F.sum(_gain("grade") / disc).alias("dcg"),
        F.coalesce(
            F.max(F.when(F.col("grade") > 0, F.lit(1.0) / F.col("rank"))), F.lit(0.0)
        ).alias("rr"),
    )
    iw = Window.partitionBy("qid").orderBy(F.desc("grade"), F.asc("docid"))
    ideal = (
        rel.withColumn("irank", F.row_number().over(iw))
        .filter(F.col("irank") <= k)
        .groupBy("qid")
        .agg(F.sum(_gain("grade") / F.log2(F.col("irank") + 1.0)).alias("idcg"))
    )
    nrel = rel.groupBy("qid").agg(F.count("*").alias("n_rel"))
    return (
        agg.join(ideal, "qid", "left")
        .join(nrel, "qid", "left")
        .select(
            "qid",
            (F.col("hits") / F.lit(float(k))).alias("p_at_k"),
            F.when(
                F.coalesce(F.col("n_rel"), F.lit(0)) > 0,
                F.col("hits") / F.col("n_rel"),
            )
            .otherwise(F.lit(0.0))
            .alias("recall_at_k"),
            "rr",
            F.when(F.coalesce(F.col("idcg"), F.lit(0.0)) > 0, F.col("dcg") / F.col("idcg"))
            .otherwise(F.lit(0.0))
            .alias("ndcg_at_k"),
            F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
        )
    )


def macro_metrics(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """One-row macro summary over the per-query metrics → (n_queries,
    mean_p_at_k, mean_recall_at_k, mrr, mean_ndcg_at_k). ``mrr`` is the
    mean of per-query reciprocal ranks — the headline number relevance
    dashboards track. Macro (query-averaged, every query weighs equally)
    rather than micro, per TREC convention."""
    per_q = relevance_metrics(run, qrels, k=k)
    return per_q.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.avg("p_at_k").alias("mean_p_at_k"),
        F.avg("recall_at_k").alias("mean_recall_at_k"),
        F.avg("rr").alias("mrr"),
        F.avg("ndcg_at_k").alias("mean_ndcg_at_k"),
    )
