"""Structured+fulltext serving: filtered ranked search, field collapsing,
score explain, query-time synonyms — vs driver-side recomputes on the tiny
corpus."""

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.search import (
    bm25_explain,
    bm25_topk,
    bm25_topk_filtered,
    collapse_results,
    search_query,
)
from mini_search_engine_spark.search.ranking import bm25_scores


@pytest.fixture(scope="module")
def corpus(tiny_corpus):
    return load_corpus(tiny_corpus).cache()


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, analyzer="porter", positional=True, block_span=4)


def test_filtered_search_restricts_then_ranks(index, corpus):
    full = {
        r["docid"]: r["score"] for r in bm25_scores(index, ["cat", "dog"]).collect()
    }
    got = bm25_topk_filtered(
        index, corpus, ["cat", "dog"], "docid % 2 = 0", topk=10
    ).collect()
    expect = sorted(
        ((d, s) for d, s in full.items() if d % 2 == 0),
        key=lambda x: (-x[1], x[0]),
    )
    assert [(r["docid"], r["score"]) for r in got] == expect and len(expect) >= 2
    # ranking happens AFTER the restriction: every even-matching doc
    # appears, including ones outside the unfiltered top-k of equal size


def test_filtered_search_pushes_predicate_to_scan(index, corpus, tmp_path):
    """On a parquet-backed corpus the predicate must reach the scan as a
    pushed filter, not a post-scan Filter only."""
    p = str(tmp_path / "c")
    corpus.write.parquet(p)
    disk = corpus.sparkSession.read.parquet(p)
    df = bm25_topk_filtered(index, disk, ["cat", "dog"], "n_chars >= 19")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "n_chars" in plan.split("PushedFilters: [")[1].split("]")[0]


def test_collapse_results_best_per_group(index, corpus):
    docs = corpus.withColumn("grp", (F.col("docid") % 2).cast("long"))
    scored = bm25_scores(index, ["cat", "dog"])
    got = collapse_results(scored, docs, "grp", per_group=1, topk=10).collect()
    full = {r["docid"]: r["score"] for r in scored.collect()}
    best = {}
    for d, s in full.items():
        g = d % 2
        if g not in best or (-s, d) < (-best[g][1], best[g][0]):
            best[g] = (d, s)
    expect = sorted(
        ((d, s, g) for g, (d, s) in best.items()), key=lambda x: (-x[1], x[0])
    )
    assert [(r["docid"], r["score"], r["grp"]) for r in got] == expect
    assert len(got) == 2  # exactly one survivor per group


def test_explain_contributions_sum_to_score(index):
    top = bm25_topk(index, ["cat", "dog"], 3).collect()
    docids = [r["docid"] for r in top]
    ex = bm25_explain(index, ["cat", "dog"], docids).collect()
    sums = {}
    for r in ex:
        sums[r["docid"]] = sums.get(r["docid"], 0.0) + r["contribution"]
        assert r["df"] > 0 and r["tf"] > 0
    for r in top:
        assert abs(sums[r["docid"]] - r["score"]) < 1e-4, (r, sums)
    # doc 0 "cat dog cat": tf(cat)=2, tf(dog)=1 hand-check
    if 0 in sums:
        by = {(r["docid"], r["term"]): r for r in ex}
        assert by[(0, "cat")]["tf"] == 2 and by[(0, "dog")]["tf"] == 1


def test_synonym_expansion(index):
    # retriev docs {1,3}; synonym maps 'retrieval'→'systems' adds nothing
    # new to 3 but 'cat'→'fox' widens {0,2,7} to include 5
    base = [r["docid"] for r in search_query(index, "cat").collect()]
    syn = [
        r["docid"]
        for r in search_query(index, "cat", synonyms={"cat": ["fox"]}).collect()
    ]
    assert base == [0, 2, 7] and syn == [0, 2, 5, 7]
    # equals the manually expanded query
    manual = [r["docid"] for r in search_query(index, "cat OR fox").collect()]
    assert syn == manual
    # expansion composes under NOT: NOT cat with synonym excludes fox doc too
    neg = [
        r["docid"]
        for r in search_query(index, "NOT cat", synonyms={"cat": ["fox"]}).collect()
    ]
    assert neg == [1, 3, 4, 6]


def test_anchor_texts_and_rank(spark):
    from mini_search_engine_spark.search import anchor_bm25, anchor_texts

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "epsilon zeta"),
            (2, "eta theta iota"),
        ],
        "docid long, content string",
    )
    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (2, 0), (0, 2)], "src long, dst long"  # dup edge dedups
    )
    at = {r["docid"]: r["anchor_text"] for r in anchor_texts(docs, edges, n_tokens=2).collect()}
    assert at == {2: "alpha beta epsilon zeta", 0: "eta theta"}
    # hub cap: keep only the lowest-src anchor
    capped = {
        r["docid"]: r["anchor_text"]
        for r in anchor_texts(docs, edges, n_tokens=2, max_anchors=1).collect()
    }
    assert capped[2] == "alpha beta"

    # anchor field makes doc 2 findable by 'alpha' (only doc 0's CONTENT
    # has it); with a 2.0 anchor boost doc 2 must outrank doc 0
    got = anchor_bm25(docs, edges, ["alpha"], topk=5).collect()
    by = {r["docid"]: r["score"] for r in got}
    assert set(by) == {0, 2} and by[2] > by[0] > 0
