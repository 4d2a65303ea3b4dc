"""LTR feature export (search/ltr.py): internal consistency against the
already-parity-tested rankers, top-N cut, and missing-signal handling."""

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.search import bm25_topk_batch, ltr_features


@pytest.fixture(scope="module")
def idx(spark, tiny_corpus):
    from mini_search_engine_spark.corpus import load_corpus

    return build_index(load_corpus(tiny_corpus), analyzer="punct_nostem")


QUERIES = {"q1": ["cat", "dog"], "q2": ["information"]}


def test_bm25_feature_equals_batch_ranker(spark, idx):
    feats = {
        (r["qid"], r["docid"]): r["bm25"]
        for r in ltr_features(idx, QUERIES).collect()
    }
    ranked = {
        (r["qid"], r["docid"]): r["score"]
        for r in bm25_topk_batch(idx, QUERIES, topk=100).collect()
    }
    assert set(feats) == set(ranked)
    for k in feats:
        assert feats[k] == pytest.approx(ranked[k], abs=1e-9)


def test_tfidf_dot_and_counts_hand_checked(spark, idx):
    """doc 0 = 'cat dog cat': tf(cat)=2, tf(dog)=1, dl=3."""
    row = {
        r["docid"]: r
        for r in ltr_features(idx, {"q": ["cat", "dog"]}).collect()
    }[0]
    n = float(idx.n_docs)
    # df over tiny corpus: cat in docs {0,2,7}, dog in {0,1,2,5,7}
    idf_cat, idf_dog = n / 3.0, n / 5.0
    expect = 2 * idf_cat * idf_cat + 1 * idf_dog * idf_dog
    assert row["tfidf_dot"] == pytest.approx(expect, abs=1e-9)
    assert row["matched_terms"] == 2
    assert row["sum_tf"] == 3
    assert row["dl"] == 3


def test_topk_cut_and_ordering(spark, idx):
    full = ltr_features(idx, QUERIES)
    cut = ltr_features(idx, QUERIES, topk=2)
    per_q = {
        q: sorted(
            [r for r in full.collect() if r["qid"] == q],
            key=lambda r: (-round(r["bm25"], 6), r["docid"]),
        )[:2]
        for q in QUERIES
    }
    expect = {(r["qid"], r["docid"]) for q in per_q for r in per_q[q]}
    assert {(r["qid"], r["docid"]) for r in cut.collect()} == expect


def test_absent_terms_and_missing_pagerank(spark, idx):
    assert ltr_features(idx, {"qz": ["zzzunseen"]}).count() == 0
    pr = spark.createDataFrame([(0, 0.5)], "docid long, pagerank double")
    got = {
        r["docid"]: r["pagerank"]
        for r in ltr_features(idx, {"q": ["cat"]}, pagerank_df=pr).collect()
    }
    assert got[0] == 0.5
    assert all(v is None for d, v in got.items() if d != 0)
