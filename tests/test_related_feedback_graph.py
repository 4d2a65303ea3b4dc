"""related_docs (all-pairs tf-idf cosine), bm25_prf (pseudo-relevance
feedback), link_distance (BFS), cocitation — hand-derived goldens +
brute-force parity."""

import math

import pytest

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.search import (
    bm25_prf,
    bm25_topk,
    cocitation,
    expansion_terms,
    link_distance,
    related_docs,
)

TEXTS = {
    0: "apple banana apple",
    1: "banana apple",
    2: "cherry banana",
    3: "durian cherry cherry",
    4: "apple cherry durian banana",
}


@pytest.fixture(scope="module")
def sim_corpus(spark):
    rows = [(i, t, "en", "t", len(t)) for i, t in TEXTS.items()]
    return load_corpus(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
    ).cache()


@pytest.fixture(scope="module")
def sim_index(sim_corpus):
    return build_index(sim_corpus, analyzer="punct_nostem", block_span=4)


def _brute_force(max_df):
    n = len(TEXTS)
    tf = {d: {} for d in TEXTS}
    df = {}
    for d, t in TEXTS.items():
        for w in t.split():
            tf[d][w] = tf[d].get(w, 0) + 1
        for w in set(t.split()):
            df[w] = df.get(w, 0) + 1
    vecs = {
        d: {
            w: c * math.log(n / df[w])
            for w, c in ws.items()
            if df[w] <= max_df and df[w] < n
        }
        for d, ws in tf.items()
    }
    sims = {}
    for a in TEXTS:
        for b in TEXTS:
            if a >= b:
                continue
            dot = sum(vecs[a][w] * vecs[b].get(w, 0.0) for w in vecs[a])
            na = math.sqrt(sum(v * v for v in vecs[a].values()))
            nb = math.sqrt(sum(v * v for v in vecs[b].values()))
            if dot > 0:
                sims[(a, b)] = dot / (na * nb)
    return sims


def test_related_docs_bruteforce(sim_index):
    got = {
        (r["docid"], r["neighbor"]): (r["sim"], r["rank"])
        for r in related_docs(sim_index, topk=4, max_df=5).collect()
    }
    sims = _brute_force(max_df=5)
    # symmetric expansion + per-doc rank over (round6 desc, neighbor asc)
    expect = {}
    for (a, b), s in sims.items():
        expect.setdefault(a, []).append((b, s))
        expect.setdefault(b, []).append((a, s))
    for d, nbrs in expect.items():
        nbrs.sort(key=lambda x: (-round(x[1], 6), x[0]))
        for rank, (other, s) in enumerate(nbrs[:4], start=1):
            assert (d, other) in got, (d, other)
            gs, gr = got[(d, other)]
            assert abs(gs - s) < 1e-5 and gr == rank, (d, other)
    assert len(got) == sum(min(4, len(v)) for v in expect.values())


def test_related_docs_df_ceiling(sim_index):
    # banana has df=4: under ceiling 3 it stops contributing, so the pair
    # (0, 2) — which shares ONLY banana — must disappear
    full = {(r["docid"], r["neighbor"]) for r in related_docs(sim_index, topk=4, max_df=5).collect()}
    cut = {(r["docid"], r["neighbor"]) for r in related_docs(sim_index, topk=4, max_df=3).collect()}
    assert (0, 2) in full and (2, 0) in full
    assert (0, 2) not in cut and (2, 0) not in cut
    # and surviving sims match the ceiling-aware brute force
    sims = _brute_force(max_df=3)
    got = {
        (r["docid"], r["neighbor"]): r["sim"]
        for r in related_docs(sim_index, topk=4, max_df=3).collect()
    }
    for (a, b), s in sims.items():
        assert abs(got[(a, b)] - s) < 1e-5 and abs(got[(b, a)] - s) < 1e-5


PRF_TEXTS = {
    0: "query zebra",
    1: "query zebra yak",
    2: "zebra yak",
    3: "query",
    4: "walrus",
}


@pytest.fixture(scope="module")
def prf_corpus(spark):
    rows = [(i, t, "en", "t", len(t)) for i, t in PRF_TEXTS.items()]
    return load_corpus(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
    ).cache()


@pytest.fixture(scope="module")
def prf_index(prf_corpus):
    return build_index(prf_corpus, analyzer="punct_nostem", block_span=4)


def test_expansion_terms(prf_index, prf_corpus):
    # top-2 BM25 docs for 'query' are the shortest ones: 3 ("query") and
    # 0 ("query zebra"); their only non-query term is zebra
    exp = expansion_terms(prf_index, prf_corpus, ["query"], fb_docs=2, fb_terms=3).collect()
    assert [r["term"] for r in exp] == ["zebra"]
    assert exp[0]["rank"] == 1 and exp[0]["fb_score"] > 0


def test_bm25_prf_pulls_expansion_matches(prf_index, prf_corpus):
    base = {r["docid"] for r in bm25_topk(prf_index, ["query"], topk=10).collect()}
    assert 2 not in base  # doc 2 has no original term
    prf = bm25_prf(prf_index, prf_corpus, ["query"], topk=10, fb_docs=2, fb_terms=3, beta=0.4)
    rows = {r["docid"]: r["score"] for r in prf.collect()}
    assert 2 in rows and rows[2] > 0
    # originals still dominate: every original-term doc outranks doc 2
    assert all(rows[d] > rows[2] for d in (0, 1, 3))


def test_bm25_prf_beta_zero_is_base(prf_index, prf_corpus):
    base = [(r["docid"], round(r["score"], 9)) for r in bm25_topk(prf_index, ["query"], topk=10).collect()]
    prf = [
        (r["docid"], round(r["score"], 9))
        for r in bm25_prf(prf_index, prf_corpus, ["query"], topk=10, beta=0.0).collect()
    ]
    assert prf == base


def test_link_distance_chain(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (7, 8)], "src long, dst long"
    )
    got = {r["docid"]: r["dist"] for r in link_distance(edges, seeds=[0], max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 4 is beyond max_hops; 7/8 unreachable
    # early stop: frontier empties after hop 1, far before max_hops
    got2 = {r["docid"]: r["dist"] for r in link_distance(edges, seeds=[3], max_hops=50).collect()}
    assert got2 == {3: 0, 4: 1}
    # multi-seed min-dist: a node reachable from both seeds keeps the min
    got3 = {r["docid"]: r["dist"] for r in link_distance(edges, seeds=[0, 2], max_hops=9).collect()}
    assert got3 == {0: 0, 2: 0, 1: 1, 3: 1, 4: 2}


def test_cocitation_hand(spark):
    edges = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3), (12, 1)],
        "src long, dst long",
    )
    got = {
        (r["d1"], r["d2"]): (r["common"], r["jaccard"])
        for r in cocitation(edges).collect()
    }
    # indeg (distinct): 1→3, 2→2, 3→1
    assert got[(1, 2)] == (2, round(2 / 3, 6))
    assert got[(1, 3)] == (1, round(1 / 3, 6))
    assert (2, 3) not in got
    # outdeg cap: dropping sources with outdeg > 1 leaves no pair evidence
    assert cocitation(edges, max_outdeg=1).count() == 0


def test_related_docs_plan_broadcast_antijoin(sim_index):
    """The df-ceiling heavy-term exclusion must reach the plan as a
    BROADCAST anti-join (the >ceiling set is tiny by construction) —
    never a shuffled one. Asserted on the lazy plan (_related_plan);
    related_docs itself returns an eagerly-checkpointed result whose plan
    is a LogicalRDD leaf."""
    from mini_search_engine_spark.search.related import _related_plan

    _, ranked = _related_plan(sim_index, topk=2, max_df=3, min_sim=0.0)
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan
    # the anti-join build side is broadcast, not exchanged by hash
    anti_idx = plan.index("LeftAnti")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan[:anti_idx]
