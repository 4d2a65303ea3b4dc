"""Bigram-LM perplexity (ops/lm.py) vs a plain-python reference, plus the
short-doc edge, the min_count pruning fallback, and plan/partition props."""

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.ops import lm_perplexity, lm_train_bigram

SCHEMA = "docid long, content string"

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ran"),
    (2, "a dog sat on a log"),
    (3, "the the the"),  # repeated-token doc: low perplexity
    (4, "single"),  # 1 token -> no bigrams
    (5, ""),  # empty -> no bigrams
    (6, "on the mat the cat sat"),
]


def _tok(s):
    return [t for t in re.split(r"\s+", s.lower()) if t]


def _ref(docs, min_count=1):
    bgc = Counter()
    vocab = set()
    for _, text in docs:
        toks = _tok(text)
        vocab.update(toks)
        bgc.update(zip(toks, toks[1:]))
    ctx = Counter()
    for (p, _), c in bgc.items():
        ctx[p] += c
    V = len(vocab)
    kept = {k: c for k, c in bgc.items() if c >= min_count}
    out = {}
    for docid, text in docs:
        toks = _tok(text)
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            out[docid] = (0, None, None)
            continue
        s = sum(
            math.log(kept.get(p, 0) + 1) - math.log(ctx.get(p[0], 0) + V)
            for p in pairs
        )
        h = -s / len(pairs)
        out[docid] = (len(pairs), h, math.exp(h))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def test_lm_matches_python_reference(spark, docs_df):
    got = {r["docid"]: r for r in lm_perplexity(docs_df).collect()}
    ref = _ref(DOCS)
    assert set(got) == set(ref)
    for docid, (m, h, ppl) in ref.items():
        r = got[docid]
        assert r["n_bigrams"] == m
        if h is None:
            assert r["cross_entropy"] is None and r["perplexity"] is None
        else:
            assert r["cross_entropy"] == pytest.approx(h, abs=1e-9)
            assert r["perplexity"] == pytest.approx(ppl, rel=1e-9)


def test_lm_perplexity_is_exp_entropy_and_bounded(spark, docs_df):
    rows = [r for r in lm_perplexity(docs_df).collect() if r["perplexity"] is not None]
    assert rows
    for r in rows:
        assert r["perplexity"] == pytest.approx(math.exp(r["cross_entropy"]), rel=1e-12)
        # add-one smoothing bounds every conditional by 1/(t+V) from below
        # and (c+1)/(c+V) < 1 from above -> entropy strictly positive
        assert r["cross_entropy"] > 0


def test_lm_min_count_prunes_to_unseen_floor(spark, docs_df):
    got = {r["docid"]: r for r in lm_perplexity(docs_df, min_count=2).collect()}
    ref = _ref(DOCS, min_count=2)
    for docid, (m, h, ppl) in ref.items():
        r = got[docid]
        assert r["n_bigrams"] == m
        if h is not None:
            assert r["cross_entropy"] == pytest.approx(h, abs=1e-9)
    # pruning must be a no-op for docs whose bigrams all survive, and must
    # RAISE entropy for docs that lost bigrams (floor < kept probability)
    full = _ref(DOCS, min_count=1)
    for docid in ref:
        if ref[docid][1] is not None and full[docid][1] is not None:
            assert ref[docid][1] >= full[docid][1] - 1e-12


def test_lm_train_returns_consistent_model(spark, docs_df):
    counts, ctx, V = lm_train_bigram(docs_df)
    bgc = {(r["prev"], r["cur"]): r["c"] for r in counts.collect()}
    ctxd = {r["prev"]: r["t"] for r in ctx.collect()}
    ref_bgc = Counter()
    vocab = set()
    for _, text in DOCS:
        toks = _tok(text)
        vocab.update(toks)
        ref_bgc.update(zip(toks, toks[1:]))
    assert bgc == dict(ref_bgc)
    assert V == len(vocab)
    for p, t in ctxd.items():
        assert t == sum(c for (a, _), c in ref_bgc.items() if a == p)


def test_lm_plan_broadcasts_model(spark, docs_df):
    plan = lm_perplexity(docs_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_lm_deterministic_under_repartition(spark, docs_df):
    a = sorted(map(tuple, lm_perplexity(docs_df).collect()))
    b = sorted(map(tuple, lm_perplexity(docs_df.repartition(5)).collect()))
    assert [t[:2] for t in a] == [t[:2] for t in b]
    for x, y in zip(a, b):
        if x[2] is None:
            assert y[2] is None
        else:
            assert x[2] == pytest.approx(y[2], abs=1e-9)


# ---------------------------------------------------------------------------
# perplexity_buckets (CCNet head/middle/tail)
# ---------------------------------------------------------------------------

def _quantile_cont(vals, q):
    """Linear-interpolation quantile (quantile_cont / F.percentile)."""
    v = sorted(vals)
    if not v:
        return None
    pos = q * (len(v) - 1)
    lo = int(math.floor(pos))
    hi = min(lo + 1, len(v) - 1)
    return v[lo] + (pos - lo) * (v[hi] - v[lo])


def _ref_buckets(docs, cuts=(1.0 / 3.0, 2.0 / 3.0)):
    ref = _ref(docs)
    ppl = {d: (None if r[2] is None else round(r[2], 6)) for d, r in ref.items()}
    scored = [p for p in ppl.values() if p is not None]
    q1 = round(_quantile_cont(scored, cuts[0]), 6)
    q2 = round(_quantile_cont(scored, cuts[1]), 6)
    out = {}
    for d, p in ppl.items():
        if p is None:
            out[d] = (p, "unscored")
        elif p <= q1:
            out[d] = (p, "head")
        elif p <= q2:
            out[d] = (p, "middle")
        else:
            out[d] = (p, "tail")
    return out


def test_buckets_match_python_reference(spark, docs_df):
    from mini_search_engine_spark.ops import perplexity_buckets

    got = {
        r["docid"]: (r["perplexity"], r["bucket"])
        for r in perplexity_buckets(docs_df).collect()
    }
    ref = _ref_buckets(DOCS)
    assert set(got) == set(ref)
    for d in ref:
        rp, rb = ref[d]
        gp, gb = got[d]
        assert gb == rb, (d, got[d], ref[d])
        if rp is None:
            assert gp is None
        else:
            assert gp == pytest.approx(rp, abs=1e-6)


def test_buckets_per_lang_grouping(spark):
    """Terciles computed within each language independently — the same
    perplexity can be 'head' in one language and 'tail' in another."""
    from mini_search_engine_spark.ops import perplexity_buckets

    rows = [(i, t, "en") for i, (_, t) in enumerate(DOCS)] + [
        (100 + i, t, "xx") for i, (_, t) in enumerate(DOCS)
    ]
    df = spark.createDataFrame(rows, "docid long, content string, lang string")
    out = perplexity_buckets(df, lang_col="lang").collect()
    en = {r["docid"]: r["bucket"] for r in out if r["lang"] == "en"}
    xx = {r["docid"] - 100: r["bucket"] for r in out if r["lang"] == "xx"}
    # same texts + shared corpus-wide model => identical per-lang bucketing
    assert en == xx
    assert set(en.values()) >= {"head", "tail", "unscored"}


def test_buckets_all_unscored_flow_through(spark):
    from mini_search_engine_spark.ops import perplexity_buckets

    df = spark.createDataFrame([(0, "solo"), (1, "")], SCHEMA)
    got = {r["docid"]: r["bucket"] for r in perplexity_buckets(df).collect()}
    assert got == {0: "unscored", 1: "unscored"}


def test_buckets_score_once_quantiles_broadcast(spark, docs_df):
    """The score table is computed ONCE (cached, read back via
    InMemoryTableScan for both the quantile agg and the output join) and
    the quantile rows come back via a broadcast — the bucket stage adds no
    corpus-sized shuffle beyond lm_perplexity's own."""
    from mini_search_engine_spark.ops import perplexity_buckets

    out = perplexity_buckets(docs_df)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the only joins DOWNSTREAM of the cached scores are broadcast ones
    post = plan.split("InMemoryTableScan", 1)[0]
    assert "SortMergeJoin" not in post, post


def test_buckets_approx_path_properties(spark, docs_df):
    """approx=True swaps interpolated quantile_cont for percentile_approx,
    which returns an ACTUAL data value — borderline docs may shift bucket
    (the documented ±ε trade). The guarantees that must hold regardless:
    buckets partition the scored docs monotonically by perplexity,
    unscored assignment is identical, and per-bucket sizes differ from the
    exact terciles by at most one (the borderline doc)."""
    from mini_search_engine_spark.ops import perplexity_buckets

    exact = perplexity_buckets(docs_df, approx=False).collect()
    approx = perplexity_buckets(docs_df, approx=True).collect()
    assert {r["docid"] for r in approx} == {r["docid"] for r in exact}
    assert {r["docid"]: r["bucket"] == "unscored" for r in approx} == {
        r["docid"]: r["bucket"] == "unscored" for r in exact
    }
    by_bucket = {}
    for r in approx:
        if r["bucket"] != "unscored":
            by_bucket.setdefault(r["bucket"], []).append(r["perplexity"])
    for lo, hi in (("head", "middle"), ("middle", "tail"), ("head", "tail")):
        if lo in by_bucket and hi in by_bucket:
            assert max(by_bucket[lo]) <= min(by_bucket[hi])
    exact_sizes = {}
    for r in exact:
        exact_sizes[r["bucket"]] = exact_sizes.get(r["bucket"], 0) + 1
    for b in ("head", "middle", "tail"):
        assert abs(len(by_bucket.get(b, [])) - exact_sizes.get(b, 0)) <= 1
