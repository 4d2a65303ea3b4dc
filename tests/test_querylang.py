"""Boolean query-language parser + single-scan evaluator vs hand-derived
goldens on the tiny corpus and a brute-force driver-side evaluator.

Tiny-corpus term sets (porter + stopwords, from tests/conftest.py):
cat {0,2,7}  dog {0,1,2,5,7}  inform {1,3}  retriev {1,3}
quick {5}  brown {5}  fox {5}  stem {4}  system {3}
"""

import pytest

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.search import (
    QuerySyntaxError,
    parse_query,
    search_and,
    search_query,
)
from mini_search_engine_spark.search.querylang import And, Not, Or, Phrase, Term


@pytest.fixture(scope="module")
def index(tiny_corpus):
    return build_index(
        load_corpus(tiny_corpus).cache(),
        analyzer="porter",
        positional=True,
        block_span=4,
    )


def ids(df):
    return [r["docid"] for r in df.collect()]


# -- parser ------------------------------------------------------------------

def test_parse_precedence_and_shapes():
    # NOT > AND > OR; adjacency is implicit AND
    assert parse_query("a OR b AND c") == Or(
        (Term("a"), And((Term("b"), Term("c"))))
    )
    assert parse_query("a b") == And((Term("a"), Term("b")))
    assert parse_query("NOT a AND b") == And((Not(Term("a")), Term("b")))
    assert parse_query('"x y" OR z') == Or((Phrase("x y"), Term("z")))
    assert parse_query("(a OR b) AND c") == And(
        (Or((Term("a"), Term("b"))), Term("c"))
    )
    # operators match case-insensitively; bare words keep their case for
    # the analyzer to normalize
    assert parse_query("a and b") == And((Term("a"), Term("b")))
    assert parse_query("not a") == Not(Term("a"))


@pytest.mark.parametrize(
    "bad", ["", "(a OR b", "a)", "a AND", "OR a", "a NOT", "()"]
)
def test_parse_errors(bad):
    with pytest.raises(QuerySyntaxError):
        parse_query(bad)


# -- evaluation --------------------------------------------------------------

def test_basic_ops_match_flat_apis(index):
    assert ids(search_query(index, "cat AND dog")) == ids(
        search_and(index, ["cat", "dog"])
    )
    assert ids(search_query(index, "cat dog")) == [0, 2, 7]  # implicit AND
    assert ids(search_query(index, "cat OR information")) == [0, 1, 2, 3, 7]


def test_not_and_universe(index):
    assert ids(search_query(index, "dog AND NOT cat")) == [1, 5]
    # top-level NOT needs the doc universe (incl. empty doc 6)
    assert ids(search_query(index, "NOT dog")) == [3, 4, 6]
    assert ids(search_query(index, "NOT dog AND NOT information")) == [4, 6]


def test_precedence_changes_results(index):
    # cat OR (inform AND retriev) vs (cat OR inform) AND retriev
    assert ids(search_query(index, "cat OR information AND retrieval")) == [
        0, 1, 2, 3, 7,
    ]
    assert ids(search_query(index, "(cat OR information) AND retrieval")) == [1, 3]


def test_stopword_leaf_is_composable(index):
    # 'the' analyzes to nothing → False leaf, not whole-query poison
    assert ids(search_query(index, "the OR cat")) == [0, 2, 7]
    assert ids(search_query(index, "the AND cat")) == []
    assert ids(search_query(index, "NOT the")) == list(range(8))


def test_phrase_leaves(index):
    assert ids(search_query(index, '"quick brown" AND dog')) == [5]
    assert ids(search_query(index, '"quick brown" AND NOT fox')) == []
    assert ids(search_query(index, 'cat OR "information retrieval"')) == [
        0, 1, 2, 3, 7,
    ]
    # stopword-only phrase matches nothing
    assert ids(search_query(index, '"the" OR cat')) == [0, 2, 7]


def test_matches_bruteforce(index, tiny_corpus):
    """Cross-check a nested query against a driver-side evaluator over
    the analyzed corpus."""
    from mini_search_engine_spark.analysis.udfs import analyze_query

    docs = {
        r["doc_id"]: set(analyze_query(r["text"], "porter"))
        for r in tiny_corpus.collect()
    }
    q = "(cat OR information) AND NOT (fox OR stemming)"
    expect = sorted(
        d
        for d, toks in docs.items()
        if ("cat" in toks or "inform" in toks)
        and not ("fox" in toks or "stem" in toks)
    )
    assert ids(search_query(index, q)) == expect and len(expect) > 0


def test_search_window_unordered_proximity(index, tiny_corpus):
    from mini_search_engine_spark.analysis.udfs import analyze_query
    from mini_search_engine_spark.search import search_near, search_window

    # doc 5 = [quick, brown, fox, quick, brown, dog]: quick@{0,3}, dog@{5}
    # → need a 3-position span; ordered near(dog→quick) finds nothing
    assert ids(search_window(index, ["dog", "quick"], window=2)) == []
    assert ids(search_window(index, ["dog", "quick"], window=3)) == [5]
    assert ids(search_near(index, ["dog", "quick"], slop=2)) == []
    # adjacency either order
    assert ids(search_window(index, ["cat", "dog"], window=2)) == [0, 2, 7]
    # single analyzed term degrades to keyword
    assert ids(search_window(index, ["cat"], window=5)) == [0, 2, 7]
    with pytest.raises(ValueError):
        search_window(index, ["cat", "dog"], window=1)

    # brute-force parity across windows on all docs
    toks = {
        r["doc_id"]: analyze_query(r["text"], "porter")
        for r in tiny_corpus.collect()
    }
    for terms, w in [(["quick", "dog"], 3), (["cat", "dog"], 4), (["quick", "brown", "dog"], 4)]:
        expect = sorted(
            d
            for d, tk in toks.items()
            if all(t in tk for t in terms)
            and any(
                all(
                    any(p <= q < p + w for q, x in enumerate(tk) if x == t)
                    for t in terms
                )
                for p in range(len(tk))
            )
        )
        assert ids(search_window(index, terms, window=w)) == expect, (terms, w)


def test_positive_query_plan_has_no_join(index):
    """A pure-term boolean query — however deeply nested — must stay ONE
    pruned scan + ONE aggregate: no join operator anywhere in the plan
    (the doclens universe join is reserved for queries satisfiable by a
    doc with none of the terms)."""
    df = search_query(index, "cat AND (dog OR information) AND NOT fox")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
