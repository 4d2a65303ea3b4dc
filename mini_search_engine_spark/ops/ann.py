"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — exact brute-force cosine top-k against a query vector;
  the dot product is a sequential ``F.aggregate`` fold over
  ``zip_with(a, b, *)`` so the summation order is deterministic (index
  order) — important for float parity with the DuckDB oracle.
* ``lsh_cosine_topk`` — the scale path: random-hyperplane LSH (signed
  projections onto md5-seeded pseudo-random hyperplanes is overkill here;
  we use sign-bit bucketing of a deterministic subset of dimensions) to
  restrict the exact scoring to one bucket neighborhood. At 10^12 vectors
  the bucket join replaces the full scan; brute force remains the
  correctness baseline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_scores(
    vectors: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return vectors.select(
        F.col(id_col),
        (
            _dot(F.col(vec_col), q)
            / (F.sqrt(_norm2(F.col(vec_col))) * F.sqrt(_norm2(q)))
        ).alias("cosine"),
    )


def cosine_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine — ends in TakeOrderedAndProject (distributed heap)."""
    return (
        cosine_scores(vectors, query_vec, id_col, vec_col)
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, all-pairs self-join).

    → (vec_a, vec_b, cosine) for a < b with round(cosine,6) ≥ threshold.
    The exact quadratic baseline; at scale restrict candidates first
    (``lsh_cosine_topk``-style sign bucketing) — this is the oracle path.
    """
    a = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_va"))
    b = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_vb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = _dot(F.col("_va"), F.col("_vb")) / (
        F.sqrt(_norm2(F.col("_va"))) * F.sqrt(_norm2(F.col("_vb")))
    )
    return (
        pairs.select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _sign_bucket(vec: Column, dims: list[int]) -> Column:
    """Bucket id from the sign bits of the chosen dimensions."""
    bit = F.lit(0).cast("long")
    out = F.lit(0).cast("long")
    for i, d in enumerate(dims):
        out = out + F.when(vec[d] > 0, F.lit(1 << i).cast("long")).otherwise(bit)
    return out


def lsh_cosine_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors whose sign-bucket is within
    Hamming distance 1 of the query's bucket. Recall is tunable via n_bits;
    exactness is NOT guaranteed (that's ``cosine_topk``)."""
    dims = list(range(n_bits))
    qb = 0
    for i, d in enumerate(dims):
        if query_vec[d] > 0:
            qb |= 1 << i
    near = [qb] + [qb ^ (1 << i) for i in range(n_bits)]
    cand = vectors.withColumn("_bkt", _sign_bucket(F.col(vec_col), dims)).filter(
        F.col("_bkt").isin(near)
    )
    return cosine_topk(cand.drop("_bkt"), query_vec, k, id_col, vec_col)
