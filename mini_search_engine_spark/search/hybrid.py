"""Hybrid lexical + vector retrieval via Reciprocal Rank Fusion.

The standard modern-search architecture: BM25 finds exact-term matches,
embedding cosine finds semantic neighbors, and RRF (Cormack, Clarke &
Büttcher 2009, SIGIR — "Reciprocal rank fusion outperforms Condorcet and
individual rank learning methods") merges the two rankings without any
score normalization:

    RRF(d) = Σ_r  1 / (k0 + rank_r(d)),   k0 = 60

Scale shape: fusion operates on the RANKINGS, not the corpora — each
input is already a top-k (or match-set) frame of at most thousands of
rows, so the rank window and the union+groupBy are driver-trivial no
matter how large the underlying indexes are. The expensive parts (BM25
postings pruning, ANN/IVF probing) stay in their own operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mini_search_engine_spark.index.build import InvertedIndex

RRF_K0 = 60


def rrf_fuse(
    rankings: list[tuple[DataFrame, str]],
    k0: int = RRF_K0,
    topk: int | None = 10,
    id_col: str = "docid",
) -> DataFrame:
    """→ (docid, rrf) by descending fused score, ties ascending id.

    ``rankings`` pairs each frame with its score column; within each
    frame the rank is ``row_number`` over (round(score, 6) DESC, id ASC)
    — rounded so ranking is reproducible across engines (the oracle
    computes the identical ranks in SQL). The single-partition rank
    window is deliberate: inputs are result lists, bounded by their own
    top-k, never corpus-sized."""
    parts = []
    for df, score_col in rankings:
        w = Window.orderBy(F.desc(F.round(F.col(score_col), 6)), F.asc(id_col))
        parts.append(
            df.select(F.col(id_col), F.row_number().over(w).alias("_rank")).select(
                id_col, (1.0 / (F.lit(k0) + F.col("_rank"))).alias("_c")
            )
        )
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    out = (
        allc.groupBy(id_col)
        .agg(F.round(F.sum("_c"), 6).alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc(id_col))
    )
    return out.limit(topk) if topk is not None else out


def hybrid_search(
    index: InvertedIndex,
    embeddings: DataFrame,
    keywords: list[str],
    query_vec: list[float],
    k_each: int = 20,
    k0: int = RRF_K0,
    topk: int = 10,
) -> DataFrame:
    """BM25 top-``k_each`` ⊕ cosine top-``k_each`` → RRF top-``topk``.

    The lexical side runs tid-pruned on the inverted index; the vector
    side is exact cosine (swap in ``ivf_cosine_topk`` for a probed index
    at scale — any (docid, score) frame fuses). ``embeddings`` ids must
    be docids."""
    from mini_search_engine_spark.ops.ann import cosine_topk
    from mini_search_engine_spark.search.ranking import bm25_topk

    lex = bm25_topk(index, keywords, k_each)
    vec = cosine_topk(embeddings, query_vec, k_each).withColumnRenamed(
        "vec_id", "docid"
    )
    return rrf_fuse([(lex, "score"), (vec, "cosine")], k0=k0, topk=topk)
