"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — exact brute-force cosine top-k against a query vector;
  the dot product is a sequential ``F.aggregate`` fold over
  ``zip_with(a, b, *)`` so the summation order is deterministic (index
  order) — important for float parity with the DuckDB oracle.
* ``lsh_cosine_topk`` — the scale path for top-k: sign-bit bucketing of a
  deterministic subset of dimensions restricts the exact scoring to one
  bucket neighborhood.
* ``lsh_cosine_pairs`` — the scale path for near-duplicate PAIRS: banded
  random-hyperplane LSH (r sign bits per band × L bands, deterministic
  seed) generates candidate pairs inside each band bucket, then exact
  cosine is computed only on candidates. Per-pair recall is
  ``1 - (1 - p^r)^L`` with ``p = 1 - θ/π``; the defaults are sized so the
  candidate stage is lossless for thresholds ≥ 0.35 at realistic pair
  counts (the quadratic plan ``cosine_pairs`` stays as the correctness
  oracle). At a true near-dup threshold (cosine ≥ 0.8, p ≥ 0.8) the same
  machinery prunes aggressively; at loose thresholds like 0.35 the math
  says most pairs are candidates — that is a property of the task, not the
  plan, and the knobs (r up, L down) trade recall for cost explicitly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from mini_search_engine_spark.ops.dedup import bucket_pairs


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
    """(id, cosine) against one query vector — one vectorized
    ``mapInArrow`` pass (r6). The Catalyst form evaluated the ``_dot`` /
    ``_norm2`` folds interpreted per element (~0.17 s of the 0.28 s scan
    at 20k×64, sf1.0) and re-derived the CONSTANT query norm per row.
    Float parity with the fold (and the DuckDB oracle) is preserved
    bit-for-bit: float32→float64 casts and per-element double multiplies
    are identical, and ``np.cumsum``'s prefix sums ARE the fold's
    sequential index-order additions — no pairwise/SIMD reassociation.
    Rows whose vector is NULL or whose length ≠ len(query) yield NULL,
    exactly as the null-padding ``zip_with`` fold did."""
    import numpy as np

    from pyspark.sql import types as T

    id_field = vectors.schema[id_col]
    schema = T.StructType(
        [
            T.StructField(id_field.name, id_field.dataType, id_field.nullable),
            T.StructField("cosine", T.DoubleType(), True),
        ]
    )
    qv = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    dim = len(qv)
    if dim == 0:  # degenerate query: keep the Catalyst fold's exact NaN/null
        q = F.array().cast("array<double>")
        return vectors.select(
            F.col(id_col),
            (
                _dot(F.col(vec_col), q)
                / (F.sqrt(_norm2(F.col(vec_col))) * F.sqrt(_norm2(q)))
            ).alias("cosine"),
        )
    # sqrt of the sequential sum of squares — same fold order driver-side
    qn = float(np.sqrt(np.cumsum(qv * qv)[-1])) if dim else 0.0
    src = vectors.select(id_col, vec_col)

    def kernel(batches):
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            ids = rb.column(0)
            vecs = rb.column(1)
            offs = vecs.offsets.to_numpy().astype(np.int64)
            base = int(offs[0])
            flat = vecs.values.to_numpy().astype(np.float64)[base : int(offs[-1])]
            lens = offs[1:] - offs[:-1]
            nulls = np.asarray(vecs.is_null())
            valid = (~nulls) & (lens == dim)
            out = np.empty(rb.num_rows, dtype=np.float64)
            if valid.any():
                starts = offs[:-1] - base
                idx = (starts[valid, None] + np.arange(dim)[None, :]).ravel()
                mat = flat[idx].reshape(-1, dim)
                prod = mat * qv[None, :]
                dots = np.cumsum(prod, axis=1)[:, -1] if dim else np.zeros(len(mat))
                sq = mat * mat
                n2 = np.cumsum(sq, axis=1)[:, -1] if dim else np.zeros(len(mat))
                out[valid] = dots / (np.sqrt(n2) * qn)
            cos = pa.array(out, pa.float64(), mask=~valid)
            yield pa.RecordBatch.from_arrays([ids, cos], [id_field.name, "cosine"])

    return src.mapInArrow(kernel, schema=schema)


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


def _band_keys_udf(n_bits: int, n_bands: int, seed: int):
    """Arrow-batched UDF: embedding → L band keys, each the band index (high
    bits) plus the r sign bits of the embedding's projections onto
    deterministic ``RandomState(seed)`` hyperplanes. The hyperplane matrix
    is built lazily from the observed dimensionality, so every worker
    derives the identical matrix from (seed, dim)."""
    state: dict[int, np.ndarray] = {}

    @F.pandas_udf(ArrayType(LongType()))
    def _keys(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy())  # (batch, dim)
        dim = mat.shape[1]
        if dim not in state:
            rng = np.random.RandomState(seed)
            state[dim] = rng.standard_normal((dim, n_bits * n_bands))
        bits = (mat @ state[dim]) > 0  # (batch, r*L)
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        keys = bits.reshape(len(mat), n_bands, n_bits) @ weights  # (batch, L)
        keys = keys + (np.arange(n_bands, dtype=np.int64) << 32)
        return pd.Series(list(keys))

    return _keys


def lsh_cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    n_bits: int = 4,
    n_bands: int = 96,
    seed: int = 221,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH.

    Same output contract as ``cosine_pairs`` — (vec_a, vec_b, cosine) for
    a < b with round(cosine, 6) ≥ threshold — but candidates come from LSH
    buckets (one groupBy on md5-grade-distributed band keys + intra-bucket
    pair enumeration) instead of an all-pairs theta self-join, and the
    exact cosine runs only on candidates. The cosine expression is the
    identical deterministic ``F.aggregate`` fold as ``cosine_pairs`` so
    surviving pairs carry bit-identical scores.

    Recall is governed by (n_bits, n_bands): per-pair miss probability is
    ``(1 - p^n_bits)^n_bands`` with ``p = 1 - arccos(cos)/π``. The defaults
    (4, 96) give < 4e-7 miss probability even at cosine = 0.35; verified
    lossless against ``cosine_pairs`` on the test corpora in pytest.
    """
    keys = _band_keys_udf(n_bits, n_bands, seed)
    keyed = vectors.select(
        F.col(id_col).alias("_id"), F.explode(keys(F.col(vec_col))).alias("bk")
    )
    cand = bucket_pairs(keyed, ["bk"], "_id", "vec_a", "vec_b")
    a = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_va"))
    b = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_vb"))
    pairs = cand.join(a, "vec_a").join(b, "vec_b")
    cos = _dot(F.col("_va"), F.col("_vb")) / (
        F.sqrt(_norm2(F.col("_va"))) * F.sqrt(_norm2(F.col("_vb")))
    )
    return (
        pairs.select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def ivf_fit_centroids(
    vectors: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 5,
    sample: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Coarse quantizer for IVF: spherical k-means on a deterministic
    driver-side sample (lowest ``sample`` ids — standard IVF practice
    trains the quantizer on a sample; the full dataset is only ASSIGNED,
    distributed). Returns (n_centroids, dim) unit-norm float64 centroids.
    Deterministic: init = the first ``n_centroids`` sampled vectors."""
    rows = (
        vectors.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample)
        .collect()
    )
    mat = np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    cent = mat[:n_centroids].copy()
    for _ in range(n_iter):
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                cent[c] = mat[m].mean(axis=0)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def _ivf_partial_sums(vectors: DataFrame, cent: np.ndarray, vec_col: str) -> DataFrame:
    """One k-means half-step as a per-PARTITION partial: fused
    assign + unit-normalize + per-list vector sum inside a single
    ``mapInPandas`` pass, accumulated across the partition's Arrow
    batches and emitted as ≤ k rows of (ivf_list, sum array, count) PER
    PARTITION — never one row per (vector, dimension)."""
    centc = cent.astype(np.float64)
    k, dim = centc.shape

    def partial(batches):
        sums = np.zeros((k, dim), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            assign = (mat @ centc.T).argmax(axis=1)
            np.add.at(sums, assign, mat)
            np.add.at(counts, assign, 1)
        nz = np.nonzero(counts)[0]
        yield pd.DataFrame(
            {
                "ivf_list": nz.astype(np.int32),
                "s": [sums[c].tolist() for c in nz],
                "n": counts[nz],
            }
        )

    return vectors.select(vec_col).mapInPandas(
        partial, "ivf_list int, s array<double>, n long"
    )


def ivf_fit_centroids_distributed(
    vectors: DataFrame,
    n_centroids: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means with DISTRIBUTED assignment and centroid sums —
    the scale path when a driver-side sample can't represent the corpus
    (``ivf_fit_centroids`` stays the default: sample-fit is standard IVF
    practice and costs one small job).

    Per iteration: the (k × dim) centroid matrix ships in the UDF
    closure and ONE fused ``mapInPandas`` pass assigns, unit-normalizes
    and partial-sums every partition down to ≤ k (list, Σvec, count)
    rows — so the only exchange is O(partitions × k) rows (each carrying
    a dim-array) into a k-group ``applyInPandas`` reduce, and only k
    rows reach the driver. No per-(vector, dimension) row ever exists:
    the r4 ``posexplode`` shape shuffled O(rows × dim) pre-combine rows
    per iteration, a corpus×dim explosion at 100 TB. Init is the
    ``n_centroids`` lowest-id vectors (deterministic, same as the sample
    fit), so on a corpus the sample fit covers fully the two agree to
    float-sum order."""
    init_rows = (
        vectors.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    )
    cent = np.asarray([list(r[vec_col]) for r in init_rows], dtype=np.float64)
    cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)

    def reduce_list(pdf: pd.DataFrame) -> pd.DataFrame:
        s = np.sum(np.stack(pdf["s"].to_numpy()), axis=0)
        return pd.DataFrame(
            {"ivf_list": pdf["ivf_list"].iloc[:1], "s": [s.tolist()], "n": [pdf["n"].sum()]}
        )

    for _ in range(n_iter):
        sums = (
            _ivf_partial_sums(vectors, cent, vec_col)
            .groupBy("ivf_list")
            .applyInPandas(reduce_list, "ivf_list int, s array<double>, n long")
            .collect()
        )
        new_cent = cent.copy()
        for r in sums:
            v = np.asarray(r["s"], dtype=np.float64)
            if np.linalg.norm(v) > 0:
                new_cent[r["ivf_list"]] = v  # spherical: direction of sum == mean
        cent = new_cent
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def ivf_assign(
    vectors: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ vectors + ``ivf_list`` (nearest-centroid id by cosine). The
    assignment is the distributed half of the IVF index: at scale this
    frame is written partitioned by ``ivf_list`` so a query scans only
    its probed lists' partitions (partition pruning does the skipping)."""
    cent = centroids.astype(np.float64)

    @F.pandas_udf("int")
    def _assign(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series((mat @ cent.T).argmax(axis=1).astype(np.int32))

    return vectors.withColumn("ivf_list", _assign(F.col(vec_col)))


def write_ivf_index(assigned: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Persist an ``ivf_assign`` output partitioned by list id: a probe's
    ``ivf_list IN (...)`` filter becomes Hive-style partition pruning
    (PartitionFilters on the scan), so a query touches only its probed
    lists' files — the on-disk realization of the IVF inverted file."""
    assigned.write.mode(mode).partitionBy("ivf_list").parquet(path)


def append_ivf_index(
    vectors: DataFrame,
    path: str,
    centroids: np.ndarray,
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Nightly append to an on-disk IVF index: assign the arriving batch
    to the EXISTING centroids (never refit — the coarse quantizer is the
    index's contract; refitting would orphan every stored assignment) and
    write under ``(batch=<id>, ivf_list=...)`` partitions with DYNAMIC
    overwrite, the same replay-idempotence pattern as
    ``incremental.append_minhash_store``: a crash-replayed batch rewrites
    its own partitions in place. Probes still prune on ``ivf_list`` —
    partition pruning composes across the extra batch level (both are
    directory levels in the same Hive layout). The initial
    ``write_ivf_index`` output has no batch level, so begin an
    incremental index by writing batch 0 through THIS function."""
    (
        ivf_assign(vectors, centroids, id_col, vec_col)
        .withColumn("batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "ivf_list")
        .parquet(path)
    )


def read_ivf_index(spark, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    # batch is physical layout, not search schema — probes filter ivf_list
    return df.drop("batch") if "batch" in df.columns else df


def ivf_cosine_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: probe the ``nprobe`` centroid lists nearest the query,
    exact cosine only inside them. ``nprobe == n_centroids`` degrades to
    the exact scan (recall 1 by construction); smaller nprobe trades
    recall for a 1/(n_centroids/nprobe) scan fraction. ``assigned`` is the
    output of ``ivf_assign`` (or a table written partitioned by
    ``ivf_list``, where the IN-filter becomes partition pruning)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = np.argsort(-(centroids @ qn))[:nprobe].tolist()
    cand = assigned.filter(F.col("ivf_list").isin([int(p) for p in probes]))
    return cosine_topk(cand.drop("ivf_list"), query_vec, k, id_col, vec_col)


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


def mmr_rerank(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    fetch_k: int = 100,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversification → (vec_id, cosine,
    mmr_score, rank): greedily pick ``k`` of the ``fetch_k`` most relevant
    vectors, each maximizing ``lam·rel − (1−lam)·max-sim-to-selected``.

    The standard retrieval diversifier (near-duplicate hits crowd out
    coverage in RAG / eval-set selection). MMR's greedy argmax is
    inherently sequential in k, so the split is: the CLUSTER does the
    heavy part (exact ``cosine_topk`` over all N vectors — distributed
    heap, no shuffle of the vector table), and the driver runs the greedy
    over the ``fetch_k`` survivors with vectorized numpy (fetch_k × dim
    floats — page-sized by contract, like the top-k seeds bm25's pruner
    collects). ``lam=1`` degrades to pure relevance order; deterministic
    id tie-break both phases. Not SQL-expressible (argmax recursion) —
    verified in pytest against an independent driver recompute.
    """
    import numpy as np

    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    top = cosine_topk(vectors, query_vec, fetch_k, id_col, vec_col)
    rows = (
        top.join(vectors.select(id_col, vec_col), id_col)
        .select(id_col, "cosine", vec_col)
        .collect()
    )
    if not rows:
        spark = vectors.sparkSession
        return spark.range(0).select(
            F.col("id").alias(id_col),
            F.lit(0.0).alias("cosine"),
            F.lit(0.0).alias("mmr_score"),
            F.lit(0).alias("rank"),
        )
    # deterministic candidate order: relevance desc, id asc (matches topk)
    rows.sort(key=lambda r: (-r["cosine"], r[id_col]))
    ids = [r[id_col] for r in rows]
    rel = np.array([r["cosine"] for r in rows])
    V = np.array([r[vec_col] for r in rows], dtype=np.float64)
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    selected: list[int] = []
    out = []
    max_sim = np.full(len(ids), -np.inf)
    for rank in range(1, min(k, len(ids)) + 1):
        if selected:
            cand_scores = lam * rel - (1.0 - lam) * max_sim
        else:
            cand_scores = lam * rel  # no diversity term for the first pick
        cand_scores[selected] = -np.inf
        # argmax with deterministic tie-break: numpy argmax returns the
        # FIRST maximal index, and candidates are sorted (rel desc, id asc)
        best = int(np.argmax(cand_scores))
        out.append((ids[best], float(rel[best]), float(cand_scores[best]), rank))
        selected.append(best)
        max_sim = np.maximum(max_sim, Vn @ Vn[best])
    spark = vectors.sparkSession
    return spark.createDataFrame(
        out, f"{id_col} long, cosine double, mmr_score double, rank long"
    )
