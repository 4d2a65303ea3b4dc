"""Product quantization (PQ) for embedding columns — Jégou et al. 2011
("Product Quantization for Nearest Neighbor Search", TPAMI): split each
d-dim vector into ``m`` subvectors, vector-quantize each against its own
``k``-centroid codebook, store ``m`` small codes per vector. At d=64,
m=8, k=16 that is 8 bytes per vector instead of 256 — the 32× compression
that makes a 100 TB embedding corpus fit the serving tier's memory.
Asymmetric distance computation (ADC) scores a query against codes via an
(m × k) lookup table — no decompression.

Design for 100 TB:

- **Training is a bounded driver-side k-means** on a deterministic sample
  (same contract as `ivf_fit_centroids`): codebooks are (m·k·d/m)
  doubles — a few KB — and ship to executors as plan literals.
- **Encoding is one Arrow-batched pandas_udf pass** (vectorized argmin
  over k centroids per subspace; float64 with distances rounded to
  `DIST_ROUND` decimals before argmin so code assignment is reproducible
  across engines and BLAS summation orders). No shuffle: codes land
  next to their vector.
- **ADC scoring is pure Catalyst**: the query's lookup table is an
  array<array<double>> literal; score = one `aggregate(zip_with(...))`
  fold over the code array inside whole-stage codegen, then
  `TakeOrderedAndProject` for top-k. The scan reads ONLY (id, codes) —
  the float vectors are never touched at query time.
- Composes with IVF: quantize each list's residuals and this becomes
  IVFADC; here PQ is kept orthogonal (flat ADC over all codes) so each
  layer is independently testable.

→ `pq_codes` / `pq_adc_topk` registry entries replicate encode + ADC in
DuckDB (same fixed codebooks embedded as SQL literals, same rounding).
The k-means training path is pytest-verified against a pure-numpy
reference and by an end-to-end recall floor vs exact search.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# distances are rounded to this many decimals before argmin (both in the
# engine and in the DuckDB oracle) — absorbs float-summation-order ulps so
# the discrete code assignment is bit-reproducible; at codebook scale
# (distances O(1e-1)) the quantization effect on accuracy is nil.
DIST_ROUND = 6


def _as_codebooks(codebooks) -> np.ndarray:
    cb = np.asarray(codebooks, dtype=np.float64)
    if cb.ndim != 3:
        raise ValueError(f"codebooks must be (m, k, d/m), got shape {cb.shape}")
    return cb


def pq_train(
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    sample_n: int = 100_000,
    seed: int = 13,
    iters: int = 10,
) -> np.ndarray:
    """Fit per-subspace k-means codebooks → ndarray (m, k, d/m).

    Bounded collect: at most ``sample_n`` vectors via the deterministic
    `limit` sample (PQ codebooks, like IVF centroids, are statistics — a
    corpus-scale fit buys nothing; cf. ivf_fit_centroids). Lloyd
    iterations in numpy float64; empty cells re-seeded deterministically
    from the farthest points (standard k-means++ style repair)."""
    rows = vectors.select(vec_col).limit(int(sample_n)).collect()
    x = np.asarray([r[0] for r in rows], dtype=np.float64)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, sub), dtype=np.float64)
    for j in range(m):
        xj = x[:, j * sub : (j + 1) * sub]
        cent = xj[rng.choice(n, size=k, replace=n < k)].copy()
        for _ in range(iters):
            d2 = ((xj[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            # empty-cell repair pulls from the farthest-point ranking of
            # THIS iteration's assignment, one DISTINCT point per empty
            # cell — reusing one argmax would hand every empty cell the
            # same centroid (duplicate codes, permanently dead cells).
            far = np.argsort(-d2.min(1))
            far_i = 0
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cent[c] = xj[mask].mean(0)
                else:
                    cent[c] = xj[far[far_i % len(far)]]
                    far_i += 1
        books[j] = cent
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """→ (id_col, codes: array<int>) — codes[j] = argmin_c of the rounded
    squared L2 distance between subvector j and codebook[j][c]. One
    Arrow-batched pass, no shuffle."""
    cb = _as_codebooks(codebooks)
    m, k, sub = cb.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _encode(emb):
        import pandas as pd

        x = np.asarray(list(emb), dtype=np.float64)  # (n, d)
        x = x.reshape(len(x), m, sub)
        out = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            d2 = ((x[:, j, None, :] - cb[j][None, :, :]) ** 2).sum(-1)
            out[:, j] = np.round(d2, DIST_ROUND).argmin(1)
        return pd.Series(list(out))

    return vectors.select(id_col, _encode(F.col(vec_col)).alias("codes"))


def adc_lut(query, codebooks, metric: str = "ip") -> list[list[float]]:
    """(m × k) ADC lookup table for one query: lut[j][c] = dot(q_j, cb[j][c])
    for metric='ip' (inner product; == cosine for unit-norm corpora) or the
    squared L2 distance for metric='l2'. Sequential float64 sums so the
    DuckDB oracle reproduces the exact doubles."""
    cb = _as_codebooks(codebooks)
    m, k, sub = cb.shape
    q = np.asarray(query, dtype=np.float64)
    if q.shape != (m * sub,):
        raise ValueError(f"query dim {q.shape} != {m * sub}")
    lut: list[list[float]] = []
    for j in range(m):
        qj = q[j * sub : (j + 1) * sub]
        row = []
        for c in range(k):
            acc = 0.0
            for i in range(sub):  # sequential adds — matches list_sum order
                acc += (
                    qj[i] * cb[j, c, i]
                    if metric == "ip"
                    else (qj[i] - cb[j, c, i]) ** 2
                )
            row.append(acc)
        lut.append(row)
    return lut


def adc_score_col(codes: Column, lut: list[list[float]]) -> Column:
    """Pure-Catalyst ADC score: fold lut[j][codes[j]] over the code array
    (aggregate ∘ zip_with, inside whole-stage codegen — no Python)."""
    lut_col = F.array(*[F.array(*[F.lit(float(v)) for v in row]) for row in lut])
    picked = F.zip_with(
        codes,
        F.sequence(F.lit(0), F.lit(len(lut) - 1)),
        lambda c, j: F.element_at(
            F.element_at(lut_col, (j + F.lit(1)).cast("int")),
            (c + F.lit(1)).cast("int"),
        ),
    )
    return F.aggregate(picked, F.lit(0.0), lambda acc, x: acc + x)


def pq_adc_topk(
    codes_df: DataFrame,
    query,
    codebooks,
    topk: int = 10,
    metric: str = "ip",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by asymmetric distance over PQ codes → (id_col, score).
    metric='ip': higher is better; 'l2': lower is better. The plan is a
    codes-only scan + codegen fold + TakeOrderedAndProject — the float
    vectors never leave storage."""
    if metric not in ("ip", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    lut = adc_lut(query, codebooks, metric=metric)
    scored = codes_df.select(
        id_col, F.round(adc_score_col(F.col("codes"), lut), 6).alias("score")
    )
    order = (
        [F.desc("score"), F.asc(id_col)]
        if metric == "ip"
        else [F.asc("score"), F.asc(id_col)]
    )
    return scored.orderBy(*order).limit(int(topk))


def seeded_codebooks(
    m: int = 8, k: int = 16, sub: int = 8, scale: float = 0.125, seed: int = 7
) -> np.ndarray:
    """Deterministic data-independent codebooks (seeded N(0, scale)) —
    the fixture the oracle entries embed as SQL literals. Real pipelines
    use `pq_train`; these exist so encode+ADC math is cross-engine
    checkable without shipping a k-means into DuckDB."""
    rng = np.random.RandomState(seed)
    return (rng.standard_normal((m, k, sub)) * scale).round(6)
