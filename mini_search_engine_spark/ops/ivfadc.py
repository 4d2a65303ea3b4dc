"""IVFADC — the FAISS-style composition of this package's IVF coarse
quantizer (`ops.ann`) and product quantizer (`ops.pq`): assign each
vector to its nearest coarse centroid, PQ-encode the RESIDUAL
(x − centroid), and answer queries by probing the ``nprobe`` nearest
lists and scoring 8-byte codes with an ADC table (Jégou et al. 2011 §IV;
the architecture behind every billion-scale FAISS deployment).

Score decomposition (inner product, == cosine on unit-norm corpora):
    ip(q, x̂) = ip(q, c_list) + Σ_j lut[j][codes[j]]
because x̂ = c_list + decode(codes) and the PQ codebooks are shared
across lists — so the ADC lookup table is list-INDEPENDENT and the per-
list contribution collapses to one constant. Both ship as plan literals.

Design for 100 TB:

- **Encode is one Arrow pass** (assign + residual + codes in a single
  pandas_udf batch — nothing shuffles; write the result partitioned by
  ``ivf_list`` and probing becomes partition pruning, as `write_ivf_index`
  already demonstrates for the exact-IVF path).
- **Search reads codes only**: probed lists filter the scan, the score is
  a pure-Catalyst fold (`pq.adc_score_col`) plus an `array_position`
  constant lookup, then TakeOrderedAndProject. Bytes touched per query:
  (corpus/n_lists)·nprobe·(8 code bytes + id) — at 10^12 vectors and
  4096 lists × nprobe 8, ~2·10^9 codes ≈ 16 GB spread over the cluster,
  vs 256 TB of floats for the exact scan.
- All argmax/argmin decisions happen on distances rounded to
  `pq.DIST_ROUND` (same convention as `pq_encode`) so encode is
  bit-reproducible across engines and BLAS summation orders.

→ `ivfadc_topk` registry entry replicates assignment, residual encode,
probe selection, and ADC scoring in DuckDB with the same seeded centroid
+ codebook literals. k-means-trained quantizers are pytest-verified
(recall vs exact, nprobe=n_lists degradation identity).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mini_search_engine_spark.ops.pq import (
    DIST_ROUND,
    _as_codebooks,
    adc_lut,
    adc_score_col,
)


def ivfadc_encode(
    vectors: DataFrame,
    centroids: np.ndarray,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id_col, ivf_list, codes): nearest-centroid assignment by inner
    product (rounded, ties → lowest list id) + PQ codes of the residual.
    One Arrow-batched pass, no shuffle."""
    cent = np.asarray(centroids, dtype=np.float64)
    cb = _as_codebooks(codebooks)
    m, k, sub = cb.shape
    if cent.shape[1] != m * sub:
        raise ValueError(f"centroid dim {cent.shape[1]} != codebook dim {m * sub}")

    out_t = T.StructType(
        [
            T.StructField("ivf_list", T.IntegerType()),
            T.StructField("codes", T.ArrayType(T.IntegerType())),
        ]
    )

    @F.pandas_udf(out_t)
    def _enc(emb):
        import pandas as pd

        x = np.asarray(list(emb), dtype=np.float64)  # (n, d)
        dots = np.round(x @ cent.T, DIST_ROUND)  # (n, L)
        lists = dots.argmax(1).astype(np.int32)  # first max on ties
        r = (x - cent[lists]).reshape(len(x), m, sub)
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            d2 = ((r[:, j, None, :] - cb[j][None, :, :]) ** 2).sum(-1)
            codes[:, j] = np.round(d2, DIST_ROUND).argmin(1)
        return pd.DataFrame({"ivf_list": lists, "codes": list(codes)})

    # asNondeterministic: downstream plans FILTER on ivf_list and PROJECT
    # codes — Catalyst duplicates a deterministic UDF into both operators
    # (two Arrow passes per row). Nondeterministic expressions cannot be
    # duplicated, pinning exactly ONE evaluation. (The function IS
    # deterministic; the marker only constrains the optimizer.)
    enc = vectors.select(
        id_col, _enc.asNondeterministic()(F.col(vec_col)).alias("_e")
    )
    return enc.select(id_col, "_e.ivf_list", "_e.codes")


def ivfadc_topk(
    encoded: DataFrame,
    centroids: np.ndarray,
    codebooks,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by IVFADC inner product over (ivf_list, codes) → (id_col,
    score). Probes the ``nprobe`` lists with the highest (rounded)
    ip(query, centroid); score = that constant + the ADC fold — pure
    Catalyst over the probed lists' codes."""
    cent = np.asarray(centroids, dtype=np.float64)
    cb = _as_codebooks(codebooks)
    q = np.asarray(query_vec, dtype=np.float64)

    # probe selection: rounded sequential dots, ties → lowest list id
    qc = []
    for row in cent:
        acc = 0.0
        for i in range(len(q)):
            acc += q[i] * row[i]
        qc.append(round(acc, DIST_ROUND))
    order = sorted(range(len(qc)), key=lambda p: (-qc[p], p))[: int(nprobe)]
    probes = [int(p) for p in order]

    lut = adc_lut(q, cb, metric="ip")
    probes_arr = F.array(*[F.lit(p) for p in probes])
    consts_arr = F.array(*[F.lit(float(qc[p])) for p in probes])
    cand = encoded.filter(F.col("ivf_list").isin(probes))
    score = (
        F.element_at(consts_arr, F.array_position(probes_arr, F.col("ivf_list")).cast("int"))
        + adc_score_col(F.col("codes"), lut)
    )
    return (
        cand.select(id_col, F.round(score, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(int(k))
    )


def ivf_train_centroids(
    vectors: DataFrame,
    n_lists: int = 16,
    vec_col: str = "embedding",
    sample_n: int = 100_000,
    seed: int = 29,
    iters: int = 10,
) -> np.ndarray:
    """Coarse k-means for IVFADC on a bounded driver sample (same contract
    as `ann.ivf_fit_centroids` but UN-normalized vectors, since IVFADC
    assigns by raw inner product with residual encoding)."""
    rows = vectors.select(vec_col).limit(int(sample_n)).collect()
    x = np.asarray([r[0] for r in rows], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=n_lists, replace=len(x) < n_lists)].copy()
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        # distinct farthest point per empty cell (see pq.pq_train)
        far = np.argsort(-d2.min(1))
        far_i = 0
        for c in range(n_lists):
            mask = assign == c
            if mask.any():
                cent[c] = x[mask].mean(0)
            else:
                cent[c] = x[far[far_i % len(far)]]
                far_i += 1
    return cent


def seeded_centroids(
    n_lists: int = 16, dim: int = 64, scale: float = 0.125, seed: int = 11
) -> np.ndarray:
    """Deterministic data-independent coarse centroids (seeded N(0, scale))
    — the oracle fixture, mirroring `pq.seeded_codebooks`."""
    rng = np.random.RandomState(seed)
    return (rng.standard_normal((n_lists, dim)) * scale).round(6)
