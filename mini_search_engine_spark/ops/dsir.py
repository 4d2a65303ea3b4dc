"""DSIR-style data selection (Xie et al., "Data Selection for Language
Models via Importance Resampling", arXiv:2302.03169): score every raw-corpus
document by how much more likely its hashed n-gram features are under a
TARGET corpus' distribution than under the raw corpus' own, then resample
with Gumbel-top-k — the standard recipe for "select pretraining data that
looks like my high-quality target set".

Math (paper §3, bag-of-hashed-ngrams variant):

* feature = hashed bigram bucket ``b(g) = md5_60(prev + ' ' + cur) % K``
  (md5-prefix hashing keeps the DuckDB oracle bit-exact, same convention
  as every other op in this package);
* per-side Laplace bucket model ``P[b] = (count[b] + 1) / (total + K)``;
* per-doc importance ``log_w(d) = Σ_{g∈d} ln P_target[b(g)] − ln P_raw[b(g)]``
  (docs with <2 tokens have no features → log_w = 0, n_features = 0);
* selection: Gumbel-top-k — ``score = log_w / temperature + Gumbel(docid)``
  with the Gumbel noise derived deterministically from a salted 60-bit doc
  hash, so the sample is reproducible across engines, retries, and
  partitionings (same guarantee as ops.pipeline.hash_sample).

Scale shape:

* each side's bucket table is ONE groupBy over within-row-zipped bigrams
  (map-side partials; the exchange carries ≤ K rows per partition);
* both bucket tables collapse to K ≤ ~10^4 rows — they collect to the
  driver ONCE (bounded, like IVF's k×dim centroids), the log-ratio table
  ships back as a K-row broadcast;
* per-doc weights = one explode → broadcast join → groupBy(id) — a single
  corpus-wide exchange keyed on the doc id;
* selection is TakeOrderedAndProject over score (bounded heap, no global
  sort).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long
from .lm import _doc_bigrams

__all__ = ["dsir_log_weights", "dsir_select"]

TWO60 = float(1 << 60)


def _bucketed(docs: DataFrame, content_col: str, extra: list[str], buckets: int) -> DataFrame:
    bg = _doc_bigrams(docs, content_col, extra)
    b = F.pmod(md5_long(F.concat_ws(" ", F.col("prev"), F.col("cur"))), F.lit(buckets))
    return bg.select(*extra, b.alias("b"))


def dsir_log_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    buckets: int = 8192,
    content_col: str = "content",
    id_col: str = "docid",
    persist_features: bool = True,
) -> DataFrame:
    """→ (id_col, n_features, log_weight) for every raw doc.

    ``log_weight`` sums ln(P_target/P_raw) over the doc's hashed bigram
    buckets; positive ⇒ more target-like than the raw average. The two
    K-bucket count tables are collected (bounded by ``buckets``) and the
    per-bucket log ratio returns as one K-row broadcast.

    ``persist_features`` caches the raw side's (id, bucket) feature table:
    it has TWO consumers — the bucket-count collect and the per-doc weight
    join — which share no exchange, so without the cache the raw corpus'
    tokenize → zip-bigrams → hash pipeline (the dominant CPU cost) runs
    twice. Same convention as ``incremental_minhash_flags(persist_bands)``;
    freed by Spark's ContextCleaner with the frame."""
    spark = raw_docs.sparkSession
    raw_b = _bucketed(raw_docs, content_col, [id_col], buckets)
    if persist_features:
        from pyspark import StorageLevel

        raw_b = raw_b.persist(StorageLevel.MEMORY_AND_DISK)

    def _counts(b_df: DataFrame) -> dict[int, int]:
        return {
            r["b"]: r["c"]
            for r in b_df.groupBy("b").agg(F.count("*").alias("c")).collect()
        }

    # the two bucket-count jobs are independent — run them concurrently
    # (guide §2.6) so the smaller side's job back-fills the larger side's
    # task tail instead of following it sequentially (r6)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_raw = pool.submit(_counts, raw_b.select("b"))
        f_tgt = pool.submit(_counts, _bucketed(target_docs, content_col, [], buckets))
        cr = f_raw.result()
        ct = f_tgt.result()
    tr, tt = float(sum(cr.values())), float(sum(ct.values()))
    ratio_rows = [
        (
            b,
            math.log((ct.get(b, 0) + 1.0) / (tt + buckets))
            - math.log((cr.get(b, 0) + 1.0) / (tr + buckets)),
        )
        for b in sorted(set(cr) | set(ct))
    ]
    ratio = spark.createDataFrame(ratio_rows, "b long, lr double")
    per_doc = (
        raw_b.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_features"),
            F.sum("lr").alias("log_weight"),
        )
    )
    return (
        raw_docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_features", F.lit(0)).cast("long").alias("n_features"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_select(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    buckets: int = 8192,
    temperature: float = 1.0,
    salt: str = "dsir",
    content_col: str = "content",
    id_col: str = "docid",
) -> DataFrame:
    """Gumbel-top-k importance resampling → the selected (id_col, score)
    rows, score = log_weight/temperature + Gumbel noise.

    The noise is ``-ln(-ln(u))`` with ``u = (md5_60(salt|id) + 1) / (2^60
    + 1)`` ∈ (0, 1) — deterministic per (salt, id), so the selection is
    reproducible and partition-invariant; scores round to 6dp before the
    rank cut (repo convention) so the selected SET is engine-exact. As
    temperature → 0 this degenerates to top-k by weight; temperature 1 is
    the paper's sampling-without-replacement."""
    w = dsir_log_weights(raw_docs, target_docs, buckets, content_col, id_col)
    u = (md5_long(F.concat_ws("|", F.lit(salt), F.col(id_col))) + 1.0) / (TWO60 + 1.0)
    gumbel = -F.log(-F.log(u))
    score = F.round(F.col("log_weight") / float(temperature) + gumbel, 6)
    return (
        w.select(id_col, score.alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
