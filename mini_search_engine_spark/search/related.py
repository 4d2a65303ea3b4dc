"""All-pairs related-document similarity over the inverted index.

The reference engine ranks docs against a QUERY (``InvertedIndexManager
.java:1292-1489``); this is the document-to-document generalization: the
tf-idf cosine between every pair of documents that share at least one
indexed term, served as a top-k neighbor list per document. It powers
"related pages", duplicate triage beyond MinHash (which sees shingles, not
term weights), and doc-graph construction for clustering.

Spark-first shape (the classic inverted-index similarity join, cf. DIMSUM /
all-pairs similarity search): pairs are generated per TERM from the
postings — two docs meet only under terms they share — so the plan is one
self-join of the exploded postings on ``tid`` plus one (d1, d2) hash
aggregation, never a corpus × corpus cross product. Three scale decisions:

* **df ceiling**: a term with document frequency df yields ~df²/2 candidate
  pairs, so stop-like terms dominate cost while contributing ~0 weight
  (idf = ln(N/df) → 0 as df → N). Dropping tids with df > ceiling bounds
  per-term fanout at ceiling², and because the HIGH-df term set is tiny
  (≤ total_tokens/ceiling terms), it ships as a broadcast ANTI-join —
  the postings scan never shuffles to discover which terms to skip.
  Norms are over the same surviving terms, so the result is the exact
  cosine of the df-filtered vectors (the semantics the oracle replicates).
* **Pre-normalized weights**: the per-doc L2 norm attaches as ONE window
  over docid BEFORE the self-join (cos = Σ ŵ1·ŵ2), instead of joining a
  norm table onto the (much larger) pair aggregate twice AFTER it.
* **One materialization**: the normalized frame is persisted across its
  two self-join sides (measured: left lazy, the decode+explode subtree —
  tokenize included on an unwritten index — recomputes per reference),
  the bounded top-k result is eagerly checkpointed, and the cache is
  released before returning — no session-lifetime pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mini_search_engine_spark.index.build import InvertedIndex


def _related_plan(
    index: InvertedIndex, topk: int, max_df: int, min_sim: float
) -> tuple[DataFrame, DataFrame]:
    """The lazy plan: → (normalized-weights frame to persist, ranked
    result referencing it). Split from ``related_docs`` so tests can
    assert plan shape before the eager checkpoint hides it."""
    n = index.n_docs
    posts = index.postings
    if index.compressed:
        from dataclasses import replace as _rep

        posts = _rep(index, postings=posts).decoded().postings

    # tiny head of the df distribution → broadcast anti-join (termstats is
    # O(vocab); the > ceiling subset is O(total_tokens / ceiling))
    heavy = index.termstats.filter(F.col("df") > max_df).select("tid")
    pruned = posts.join(F.broadcast(heavy), "tid", "left_anti")

    df_col = F.sum("n").over(Window.partitionBy("tid")).cast("double")
    w = (
        pruned.withColumn("tdf", df_col)
        .select(
            "tid",
            "tdf",
            F.explode(F.arrays_zip("docids", "tfs")).alias("z"),
        )
        .select(
            "tid",
            F.col("z.docids").alias("docid"),
            (F.col("z.tfs") * F.log(F.lit(float(n)) / F.col("tdf"))).alias("w"),
        )
        .filter(F.col("w") != 0.0)  # df == N terms carry nothing
    )
    nrm = F.sqrt(F.sum(F.col("w") * F.col("w")).over(Window.partitionBy("docid")))
    wn = w.select("tid", "docid", (F.col("w") / nrm).alias("wn"))
    a, b = wn.alias("a"), wn.alias("b")
    cos = (
        a.join(b, (F.col("a.tid") == F.col("b.tid")) & (F.col("a.docid") < F.col("b.docid")))
        .groupBy(F.col("a.docid").alias("d1"), F.col("b.docid").alias("d2"))
        .agg(F.sum(F.col("a.wn") * F.col("b.wn")).alias("sim"))
        .filter(F.col("sim") >= min_sim)
    )
    sym = cos.select(
        F.col("d1").alias("docid"), F.col("d2").alias("neighbor"), "sim"
    ).unionByName(cos.select(F.col("d2").alias("docid"), F.col("d1").alias("neighbor"), "sim"))
    rw = Window.partitionBy("docid").orderBy(
        F.desc(F.round("sim", 6)), F.asc("neighbor")
    )
    ranked = (
        sym.withColumn("sim", F.round("sim", 6))
        .withColumn("rank", F.row_number().over(rw).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("docid", "neighbor", "sim", "rank")
    )
    return wn, ranked


def related_docs(
    index: InvertedIndex,
    topk: int = 3,
    max_df: int | None = None,
    min_sim: float = 0.0,
) -> DataFrame:
    """→ (docid, neighbor, sim, rank): for each doc, its ``topk`` most
    cosine-similar other docs under tf-idf weights w = tf·ln(N/df),
    restricted to discriminative terms (df ≤ ``max_df``; default N/10).

    Ties break on (rounded sim DESC, neighbor ASC); docs with no surviving
    shared term are absent. ``min_sim`` prunes the pair list before the
    per-doc window. The result (≤ n_docs·topk rows) is materialized
    eagerly so the weights cache can be released before returning."""
    n = index.n_docs
    if max_df is None:
        max_df = max(1, n // 10)
    wn, ranked = _related_plan(index, topk, max_df, min_sim)
    wn = wn.persist()
    out = ranked.localCheckpoint()  # eager; bounded at n_docs · topk rows
    wn.unpersist()
    return out
