"""Sparse document-vector export — tf-idf features for downstream ML.

Training pipelines consume retrieval-engine statistics as features
(classifier inputs, distillation targets, cluster spaces). This exports
every document's tf-idf vector in the sparse triplet form ML tooling
ingests directly: one row per (docid, tid, weight), with the term id
being the engine's coordination-free 60-bit hash (`index/termid.py`) —
the SAME id any other producer derives for the term with no dictionary
exchange, so exports from different corpus shards/snapshots align by
construction.

One pass over the postings: per-term df recovered by a window over the
tid partitioning the blocks already live in (no join against termstats),
explode, weight. O(postings) rows out, zero joins, one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mini_search_engine_spark.index.build import InvertedIndex


def doc_vectors(index: InvertedIndex, max_df: int | None = None) -> DataFrame:
    """→ (docid, tid, weight): sparse tf-idf triplets, weight =
    tf·ln(N/df). ``max_df`` optionally drops stop-grade terms (broadcast
    anti-join of the tiny heavy set, same contract as related_docs);
    df == N terms weigh 0 and are always dropped."""
    posts = index.postings
    if index.compressed:
        from dataclasses import replace as _rep

        posts = _rep(index, postings=posts).decoded().postings
    if max_df is not None:
        heavy = index.termstats.filter(F.col("df") > max_df).select("tid")
        posts = posts.join(F.broadcast(heavy), "tid", "left_anti")
    n = float(index.n_docs)
    df_col = F.sum("n").over(Window.partitionBy("tid")).cast("double")
    return (
        posts.withColumn("tdf", df_col)
        .select("tid", "tdf", F.explode(F.arrays_zip("docids", "tfs")).alias("z"))
        .select(
            F.col("z.docids").alias("docid"),
            "tid",
            (F.col("z.tfs") * F.log(F.lit(n) / F.col("tdf"))).alias("weight"),
        )
        .filter(F.col("weight") != 0.0)
    )
