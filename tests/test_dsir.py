"""DSIR importance weights + Gumbel-top-k selection (ops/dsir.py) vs a
plain-python reference, with determinism and degenerate-doc handling."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.ops import dsir_log_weights, dsir_select

SCHEMA = "docid long, content string"
K = 64  # small bucket count -> collisions exercised

RAW = [
    (1, "the cat sat on the mat"),
    (2, "stock market prices fell sharply today"),
    (3, "the cat ran after the dog"),
    (4, "single"),  # 1 token -> no features
    (6, ""),  # empty -> no features
    (8, "cat dog cat dog cat dog"),
]
TARGET = [
    (101, "the cat chased the dog across the mat"),
    (102, "a cat and a dog sat together"),
]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _feats(text: str):
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    return [_h60(f"{a} {b}") % K for a, b in zip(toks, toks[1:])]


def _ref_weights(raw, target):
    cr, ct = {}, {}
    for _, t in raw:
        for b in _feats(t):
            cr[b] = cr.get(b, 0) + 1
    for _, t in target:
        for b in _feats(t):
            ct[b] = ct.get(b, 0) + 1
    tr, tt = sum(cr.values()), sum(ct.values())
    out = {}
    for d, t in raw:
        fs = _feats(t)
        w = sum(
            math.log((ct.get(b, 0) + 1.0) / (tt + K))
            - math.log((cr.get(b, 0) + 1.0) / (tr + K))
            for b in fs
        )
        out[d] = (len(fs), w)
    return out


@pytest.fixture(scope="module")
def frames(spark):
    return (
        spark.createDataFrame(RAW, SCHEMA),
        spark.createDataFrame(TARGET, SCHEMA),
    )


def test_weights_match_python_reference(spark, frames):
    raw_df, tgt_df = frames
    got = {
        r["docid"]: (r["n_features"], r["log_weight"])
        for r in dsir_log_weights(raw_df, tgt_df, buckets=K).collect()
    }
    ref = _ref_weights(RAW, TARGET)
    assert set(got) == set(ref)
    for d, (n, w) in ref.items():
        assert got[d][0] == n
        assert got[d][1] == pytest.approx(w, abs=1e-9)


def test_target_like_docs_score_higher(spark, frames):
    """Sign sanity needs a collision-free bucket space (at K=64 unrelated
    bigrams can hash onto target buckets); parity at K=64 is covered
    above."""
    raw_df, tgt_df = frames
    got = {
        r["docid"]: r["log_weight"]
        for r in dsir_log_weights(raw_df, tgt_df, buckets=65536).collect()
    }
    # doc 1/3 share cat/dog/the bigram mass with the target; doc 2 shares none
    assert got[1] > got[2] and got[3] > got[2]
    assert got[4] == 0.0 and got[6] == 0.0  # featureless -> weight 0


def test_select_deterministic_and_partition_invariant(spark, frames):
    raw_df, tgt_df = frames
    a = [tuple(r) for r in dsir_select(raw_df, tgt_df, k=3, buckets=K).collect()]
    b = [
        tuple(r)
        for r in dsir_select(raw_df.repartition(5), tgt_df, k=3, buckets=K).collect()
    ]
    assert a == b and len(a) == 3
    # scores strictly ordered desc with docid tiebreak
    assert a == sorted(a, key=lambda t: (-t[1], t[0]))


def test_select_gumbel_matches_python(spark, frames):
    raw_df, tgt_df = frames
    ref_w = _ref_weights(RAW, TARGET)
    exp = []
    for d, (_, w) in ref_w.items():
        u = (_h60(f"dsir|{d}") + 1.0) / (float(1 << 60) + 1.0)
        exp.append((d, round(w + -math.log(-math.log(u)), 6)))
    exp = sorted(exp, key=lambda t: (-t[1], t[0]))[:4]
    got = [
        (r["docid"], r["score"])
        for r in dsir_select(raw_df, tgt_df, k=4, buckets=K).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (gd, gs), (ed, es) in zip(got, exp):
        assert gs == pytest.approx(es, abs=1e-6)


def test_temperature_zero_limit_ranks_by_weight(spark, frames):
    """Tiny temperature drowns the noise: selection = top-k by weight."""
    raw_df, tgt_df = frames
    got = [
        r["docid"]
        for r in dsir_select(
            raw_df, tgt_df, k=2, buckets=K, temperature=1e-9
        ).collect()
    ]
    ref = sorted(_ref_weights(RAW, TARGET).items(), key=lambda kv: (-kv[1][1], kv[0]))
    assert got == [d for d, _ in ref[:2]]
