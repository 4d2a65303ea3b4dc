"""Property test: the composable boolean query language (one pruned scan +
one Catalyst boolean over a presence array) vs a brute-force set-logic
oracle on randomized corpora and randomized nested expressions — AND/OR/NOT
nesting, the all-leaves-False universe path, and empty-analysis leaves must
hold for ANY data, not just the handcrafted oracle entries."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.search import search_query

WORDS = ["apple", "banana", "cherry", "dates", "elder", "figs", "grape"]

doc_strategy = st.lists(st.sampled_from(WORDS), min_size=0, max_size=8)

expr_strategy = st.recursive(
    st.sampled_from(WORDS),
    lambda inner: st.one_of(
        st.tuples(st.just("and"), inner, inner),
        st.tuples(st.just("or"), inner, inner),
        st.tuples(st.just("not"), inner),
    ),
    max_leaves=6,
)


def _render(e) -> str:
    if isinstance(e, str):
        return e
    if e[0] == "not":
        return f"(NOT {_render(e[1])})"
    return f"({_render(e[1])} {e[0].upper()} {_render(e[2])})"


def _eval(e, toks: set) -> bool:
    if isinstance(e, str):
        return e in toks
    if e[0] == "not":
        return not _eval(e[1], toks)
    a, b = _eval(e[1], toks), _eval(e[2], toks)
    return (a and b) if e[0] == "and" else (a or b)


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(doc_strategy, min_size=1, max_size=10),
    expr=expr_strategy,
)
def test_boolean_query_matches_bruteforce(spark_session_holder, docs, expr):
    spark = spark_session_holder
    rows = [(i, " ".join(toks), "en", "t", 0) for i, toks in enumerate(docs)]
    corpus = load_corpus(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
    )
    idx = build_index(corpus, analyzer="punct_nostem")
    got = {r["docid"] for r in search_query(idx, _render(expr)).collect()}
    expect = {i for i, toks in enumerate(docs) if _eval(expr, set(toks))}
    assert got == expect, (_render(expr), got ^ expect)


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark
