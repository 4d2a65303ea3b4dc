"""Property test: percolation (rarest-term routing + kernel verify) vs a
brute-force set-logic oracle on randomized corpora/queries — routing
completeness for AND and the min_should pigeonhole must hold for ANY
data, not just the handcrafted cases."""

from hypothesis import given, settings
from hypothesis import strategies as st

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.search import percolate

WORDS = ["apple", "banana", "cherry", "dates", "elder", "figs", "grape"]

doc_strategy = st.lists(st.sampled_from(WORDS), min_size=0, max_size=8)
query_strategy = st.lists(st.sampled_from(WORDS), min_size=1, max_size=3)


def _brute(docs_tokens, query_tokens, min_should):
    out = set()
    for d, toks in docs_tokens.items():
        s = set(toks)
        for q, qt in query_tokens.items():
            qs = set(qt)
            if not qs:
                continue
            m = len(qs & s)
            need = len(qs) if min_should is None else min_should
            if m >= need and m >= 1:
                out.add((d, q, m, len(qs)))
    return out


@settings(max_examples=12, deadline=None)
@given(
    docs=st.lists(doc_strategy, min_size=1, max_size=10),
    qs=st.lists(query_strategy, min_size=1, max_size=6),
    min_should=st.sampled_from([None, 1, 2]),
)
def test_percolate_matches_bruteforce(spark_session_holder, docs, qs, min_should):
    spark = spark_session_holder
    rows = [(i, " ".join(toks), "en", "t", 0) for i, toks in enumerate(docs)]
    corpus = load_corpus(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
    )
    queries = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(qs)], "qid long, query string"
    )
    got = {
        (r["docid"], r["qid"], r["matched"], r["nterms"])
        for r in percolate(
            corpus, queries, analyzer="punct_nostem", min_should=min_should
        ).collect()
    }
    expect = _brute(
        {i: toks for i, toks in enumerate(docs)},
        {i: t for i, t in enumerate(qs)},
        min_should,
    )
    assert got == expect, (min_should, got ^ expect)


def test_probe_gate_emits_identical_rows(spark):
    """r6 cost gate: a small stored-query set skips the routing-df probe
    (term-sorted fallback routing). Emitted rows must be IDENTICAL to the
    probed path for both AND and min_should semantics — routing choice
    only tunes which candidates get checked, never what matches."""
    rows = [
        (i, f"apple banana doc{i % 3} cherry grape" if i % 2 else "figs elder dates",
         "en", "t", 0)
        for i in range(40)
    ]
    corpus = load_corpus(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
    )
    queries = spark.createDataFrame(
        [(0, "apple cherry"), (1, "figs dates"), (2, "banana doc1"), (3, "grape elder")],
        "qid long, query string",
    )
    for ms in (None, 1):
        probed = percolate(
            corpus, queries, analyzer="punct_nostem", min_should=ms,
            probe_min_queries=0,  # force the routing-df probe
        )
        gated = percolate(corpus, queries, analyzer="punct_nostem", min_should=ms)
        assert probed.exceptAll(gated).count() == 0
        assert gated.exceptAll(probed).count() == 0
        assert gated.count() > 0


# hypothesis re-runs the test function many times; a module fixture would
# re-enter Spark setup per example — reuse the session via a plain fixture
import pytest


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark
