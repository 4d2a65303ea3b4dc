"""Naive Bayes classifier (ops/classify.py) vs a plain-python reference,
plus the scale knobs: hashed feature space boundedness, min_count pruning,
broadcast-join plan shape, determinism under repartitioning."""

import math
import re
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.ops import nb_classify, nb_score, nb_train

SCHEMA = "docid long, content string, lang string"

DOCS = [
    (0, "def main print hello world import sys", "py"),
    (1, "public static void main string args class", "java"),
    (2, "import os import re def parse return None", "py"),
    (3, "private final int value public class getter", "java"),
    (4, "the quick brown fox jumps over the lazy dog", "en"),
    (5, "a tale of two cities it was the best of times", "en"),
    (6, "def def def lambda lambda yield async await", "py"),
    (7, "interface extends implements abstract public void", "java"),
    (8, "", "en"),  # zero-token doc: must still classify (priors argmax)
    (9, "public def the", "py"),  # mixed-evidence doc
]


def _ref_nb(docs):
    """Plain-python multinomial NB with add-one smoothing, identical
    tokenization, identical tie-break (score desc, label asc)."""
    tok = lambda s: [t for t in re.split(r"\s+", s.lower()) if t]  # noqa: E731
    counts = defaultdict(Counter)
    label_docs = Counter()
    for _, text, y in docs:
        label_docs[y] += 1
        counts[y].update(tok(text))
    labels = sorted(label_docs)
    vocab = {t for y in counts for t in counts[y]}
    V = len(vocab)
    n_docs = sum(label_docs.values())
    totals = {y: sum(counts[y].values()) for y in labels}
    priors = {y: math.log(label_docs[y] / n_docs) for y in labels}
    floors = {y: -math.log(totals[y] + V) for y in labels}
    out = {}
    for docid, text, _ in docs:
        toks = [t for t in tok(text) if t in vocab]
        scores = {}
        for y in labels:
            s = priors[y] + len(toks) * floors[y]
            for t in toks:
                s += math.log(counts[y][t] + 1)
            scores[y] = s
        pred = min(labels, key=lambda y: (-scores[y], y))
        out[docid] = (pred, scores[pred])
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, SCHEMA)


def test_nb_matches_python_reference(spark, docs_df):
    got = {r["docid"]: (r["pred"], r["score"]) for r in nb_classify(docs_df).collect()}
    ref = _ref_nb(DOCS)
    assert set(got) == set(ref)
    for docid, (pred, score) in ref.items():
        assert got[docid][0] == pred, f"doc {docid}: {got[docid][0]} != {pred}"
        assert got[docid][1] == pytest.approx(score, abs=1e-9)


def test_nb_zero_token_doc_gets_prior_argmax(spark, docs_df):
    row = {r["docid"]: r for r in nb_classify(docs_df).collect()}[8]
    # priors: en 3/10, java 3/10, py 4/10 -> 'py' wins outright
    assert row["pred"] == "py"
    assert row["score"] == pytest.approx(math.log(4 / 10), abs=1e-12)
    assert not row["correct"]


def test_nb_correct_column(spark, docs_df):
    rows = nb_classify(docs_df).collect()
    for r in rows:
        assert r["correct"] == (r["pred"] == r["lang"])


def test_nb_hashed_features_bounded_and_consistent(spark, docs_df):
    # Huge bucket space => no collisions on this vocab => predictions equal
    # the exact-token model (bucketing is a bijection on the observed vocab).
    exact = {r["docid"]: r["pred"] for r in nb_classify(docs_df).collect()}
    hashed_model = nb_train(docs_df, hash_buckets=1 << 22)
    hashed = {
        r["docid"]: r["pred"]
        for r in nb_score(docs_df, hashed_model).collect()
    }
    assert hashed == exact
    # Tiny bucket space => model rows capped at the bucket count even though
    # the vocab is larger (THE scale guarantee for 100 TB vocabularies).
    small = nb_train(docs_df, hash_buckets=8)
    assert small.deltas.count() <= 8
    assert small.vocab_size <= 8


def test_nb_min_count_prunes_vocab(spark, docs_df):
    full = nb_train(docs_df)
    pruned = nb_train(docs_df, min_count=2)
    assert pruned.vocab_size < full.vocab_size
    # every surviving token really does occur >= 2 times corpus-wide
    tok_counts = Counter(
        t for _, text, _ in DOCS for t in re.split(r"\s+", text.lower()) if t
    )
    for r in pruned.deltas.select("token").collect():
        assert tok_counts[r["token"]] >= 2


def test_nb_score_plan_broadcasts_model(spark, docs_df):
    model = nb_train(docs_df)
    plan = nb_score(docs_df, model)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_nb_deterministic_under_repartition(spark, docs_df):
    a = sorted(map(tuple, nb_classify(docs_df).collect()))
    b = sorted(map(tuple, nb_classify(docs_df.repartition(7)).collect()))
    assert [t[:3] for t in a] == [t[:3] for t in b]  # docid, lang, pred exact
    for x, y in zip(a, b):
        assert x[3] == pytest.approx(y[3], abs=1e-9)  # score fp-stable
