"""IVFADC (ops/ivfadc.py): encode parity vs numpy, probed-list containment,
recall floor with trained quantizers (measured 0.44@nprobe=4 — ABOVE flat
PQ's 0.34 at the same code budget, the residual-quantization win), and
codegen-only scoring."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from mini_search_engine_spark.ops import (
    ivf_train_centroids,
    ivfadc_encode,
    ivfadc_topk,
    pq_train,
    seeded_centroids,
    seeded_codebooks,
)
from mini_search_engine_spark.ops.pq import DIST_ROUND

M, K, SUB = 8, 16, 8


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    df.count()
    yield df
    df.unpersist()


def _np_encode(X, cent, cb):
    X = np.asarray(X, dtype=np.float64)
    lists = np.round(X @ cent.T, DIST_ROUND).argmax(1)
    r = (X - cent[lists]).reshape(len(X), M, SUB)
    codes = np.empty((len(X), M), dtype=np.int64)
    for j in range(M):
        d2 = ((r[:, j, None, :] - cb[j][None, :, :]) ** 2).sum(-1)
        codes[:, j] = np.round(d2, DIST_ROUND).argmin(1)
    return lists, codes


def test_encode_matches_numpy(spark, emb):
    cent, cb = seeded_centroids(), seeded_codebooks()
    rows = emb.collect()
    lists, codes = _np_encode([r["embedding"] for r in rows], cent, cb)
    ref = {
        r["vec_id"]: (int(l), list(c))
        for r, l, c in zip(rows, lists, codes)
    }
    got = {
        r["vec_id"]: (r["ivf_list"], list(r["codes"]))
        for r in ivfadc_encode(emb, cent, cb).collect()
    }
    assert got == ref


def test_results_come_from_probed_lists(spark, emb):
    cent, cb = seeded_centroids(), seeded_codebooks()
    enc = ivfadc_encode(emb, cent, cb).cache()
    q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    qn = np.asarray(q, dtype=np.float64)
    probes = set(np.argsort(-np.round(cent @ qn, DIST_ROUND), kind="stable")[:4].tolist())
    got_ids = [r["vec_id"] for r in ivfadc_topk(enc, cent, cb, q, k=50, nprobe=4).collect()]
    lists_of = {r["vec_id"]: r["ivf_list"] for r in enc.collect()}
    assert all(lists_of[i] in probes for i in got_ids)
    enc.unpersist()


def test_recall_floor_trained(spark, emb):
    cent = ivf_train_centroids(emb, n_lists=16)
    cb = pq_train(emb, m=M, k=K)
    enc = ivfadc_encode(emb, cent, cb).cache()
    enc.count()
    rows = emb.collect()
    X = np.array([r["embedding"] for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    recs = []
    for qi in range(5):
        q = X[qi]
        exact = set(ids[np.argsort(-(X @ q))[:10]].tolist())
        got = {
            r["vec_id"]
            for r in ivfadc_topk(enc, cent, cb, list(q), k=10, nprobe=4).collect()
        }
        recs.append(len(got & exact) / 10)
    enc.unpersist()
    assert float(np.mean(recs)) >= 0.2


def test_scoring_is_codegen_only(spark, emb):
    cent, cb = seeded_centroids(), seeded_codebooks()
    q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    plan = (
        ivfadc_topk(ivfadc_encode(emb, cent, cb), cent, cb, q, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") + plan.count("BatchEvalPython") == 1
    assert "TakeOrderedAndProject" in plan


def test_ivfadc_on_disk_partition_pruning(spark, emb, tmp_path):
    """IVFADC codes written through write_ivf_index (partitioned by
    ivf_list) must answer probes with PartitionFilters pruning — the
    100 TB serving shape: a query's files = its probed lists only, each
    holding 8-byte codes instead of float vectors."""
    from mini_search_engine_spark.ops.ann import read_ivf_index, write_ivf_index

    cent, cb = seeded_centroids(), seeded_codebooks()
    enc = ivfadc_encode(emb, cent, cb)
    path = str(tmp_path / "ivfadc")
    write_ivf_index(enc, path)
    disk = read_ivf_index(spark, path)

    q = list(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    mem = [r["vec_id"] for r in ivfadc_topk(enc, cent, cb, q, k=10, nprobe=4).collect()]
    dsk_df = ivfadc_topk(disk, cent, cb, q, k=10, nprobe=4)
    assert [r["vec_id"] for r in dsk_df.collect()] == mem
    plan = dsk_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_list" in plan, plan
    # the on-disk plan reads codes only — no embedding column, no Python
    assert "ArrowEvalPython" not in plan and "embedding" not in plan


def test_dim_mismatch_raises(spark, emb):
    with pytest.raises(ValueError, match="centroid dim"):
        ivfadc_encode(emb, np.zeros((4, 32)), seeded_codebooks())
