"""Deduplication operators over a (docid, content) corpus.

* exact — sha256 grouping; canonical = min docid per hash.
* MinHash + LSH — word-shingle MinHash signatures, banded LSH bucket join
  for candidate pairs. Hashes are md5-prefix based (portable: DuckDB can
  replicate ``('0x' || substring(md5(s),1,15))::BIGINT`` exactly), so the
  correctness oracle reproduces signatures bit-for-bit.
* SimHash — 60-bit sign-of-weighted-bit-sums signature (bits 0..59 keep the
  value positive in a signed 64-bit int).
* n-gram Jaccard — exact Jaccard over shingle sets, evaluated only on LSH
  candidate pairs (the scale path: no O(n²) cross join).

Everything is native Catalyst (split/transform/explode/groupBy); at 100 TB
the only shuffles are the groupBys on (band_hash) / (doc pair), both
well-distributed keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 60-bit hash from an md5 hex prefix — portable to DuckDB bit-for-bit.
def md5_long(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _tokens(col: Column) -> Column:
    """Whitespace tokens, lowercased (dedup ops don't need stemming)."""
    return F.filter(F.split(F.lower(col), "\\s+"), lambda t: t != F.lit(""))


def shingles(col: Column, k: int = 3) -> Column:
    """Word k-shingles joined by a single space; docs shorter than k words
    contribute their full token string as one shingle."""
    toks = _tokens(col)
    joined = F.array_join(toks, " ")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.when(F.size(toks) >= k, sh).otherwise(F.array(joined))


def exact_dedup(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """→ (sha, n_dups, canonical_docid): one row per distinct content."""
    return (
        docs.groupBy(F.sha2(F.col(content_col), 256).alias("sha"))
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min("docid").alias("canonical_docid"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    shingle_k: int = 3,
    content_col: str = "content",
) -> DataFrame:
    """→ (docid, sig: array<long>) — sig[j] = min over shingles of
    md5_long(j || '|' || shingle)."""
    sh = docs.select("docid", F.explode(shingles(F.col(content_col), shingle_k)).alias("sh"))
    aggs = [
        F.min(md5_long(F.concat(F.lit(f"{j}|"), F.col("sh")))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    per_doc = sh.groupBy("docid").agg(*aggs)
    return per_doc.select(
        "docid", F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig")
    )


def minhash_bands(
    docs: DataFrame,
    num_hashes: int = 16,
    band_size: int = 2,
    shingle_k: int = 3,
    content_col: str = "content",
) -> DataFrame:
    """→ (docid, band, band_key) — LSH band keys (md5 over the band's
    concatenated minhashes)."""
    sigs = minhash_signatures(docs, num_hashes, shingle_k, content_col)
    n_bands = num_hashes // band_size
    rows = []
    for b in range(n_bands):
        key = md5_long(
            F.concat_ws(
                ",",
                *[F.col("sig")[b * band_size + i].cast("string") for i in range(band_size)],
            )
        )
        rows.append(F.struct(F.lit(b).alias("band"), key.alias("band_key")))
    return sigs.select(
        "docid", F.explode(F.array(*rows)).alias("bk")
    ).select("docid", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def minhash_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 16,
    band_size: int = 2,
    shingle_k: int = 3,
    content_col: str = "content",
) -> DataFrame:
    """→ (docid_a, docid_b) distinct pairs (a < b) sharing ≥1 LSH band."""
    # persist: the self-join would otherwise recompute the full
    # shingle→minhash lineage for BOTH sides
    bands = minhash_bands(docs, num_hashes, band_size, shingle_k, content_col).persist()
    a = bands.select("band", "band_key", F.col("docid").alias("docid_a"))
    b = bands.select("band", "band_key", F.col("docid").alias("docid_b"))
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("docid_a") < F.col("docid_b"))
        .select("docid_a", "docid_b")
        .distinct()
    )


def simhash(
    docs: DataFrame, bits: int = 60, content_col: str = "content"
) -> DataFrame:
    """→ (docid, simhash) — bit b set iff Σ_tokens tf·(±1 by hash bit) > 0."""
    tok = docs.select("docid", F.explode(_tokens(F.col(content_col))).alias("tok"))
    tf = tok.groupBy("docid", "tok").agg(F.count("*").alias("tf"))
    th = tf.withColumn("h", md5_long(F.col("tok")))
    bitrows = th.select(
        "docid",
        "tf",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
    ).select(
        "docid",
        "b",
        (F.col("tf") * (F.expr("(h >> b) & 1") * 2 - 1)).alias("w"),
    )
    bitsum = bitrows.groupBy("docid", "b").agg(F.sum("w").alias("s"))
    return (
        bitsum.withColumn(
            "bitval",
            F.when(F.col("s") > 0, F.expr("cast(1 as bigint) << b")).otherwise(
                F.lit(0).cast("long")
            ),
        )
        .groupBy("docid")
        .agg(F.sum("bitval").cast("long").alias("simhash"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_k: int = 3,
    num_hashes: int = 16,
    band_size: int = 4,
    content_col: str = "content",
) -> DataFrame:
    """→ (docid_a, docid_b, jaccard) for LSH-candidate pairs above threshold.

    Exact Jaccard over distinct shingle sets, restricted to MinHash-LSH
    candidates so no O(n²) blowup; ``|A ∩ B|`` via a groupBy over the
    exploded shingle join, ``|A ∪ B| = |A|+|B|-|A∩B|``.
    """
    cands = minhash_candidate_pairs(docs, num_hashes, band_size, shingle_k, content_col).persist()
    sh = docs.select(
        "docid", F.explode(F.array_distinct(shingles(F.col(content_col), shingle_k))).alias("sh")
    ).persist()
    sizes = sh.groupBy("docid").agg(F.count("*").alias("nsh"))
    # |A ∩ B| per candidate pair via join on the shingle value
    common = (
        cands.join(sh.withColumnRenamed("docid", "docid_a"), "docid_a")
        .join(
            sh.select(F.col("docid").alias("docid_b"), F.col("sh")),
            ["docid_b", "sh"],
        )
        .groupBy("docid_a", "docid_b")
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        common.join(sizes.select(F.col("docid").alias("docid_a"), F.col("nsh").alias("na")), "docid_a")
        .join(sizes.select(F.col("docid").alias("docid_b"), F.col("nsh").alias("nb")), "docid_b")
        .select(
            "docid_a",
            "docid_b",
            (
                F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out
