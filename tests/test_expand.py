"""Dictionary-expansion queries (search/expand.py): prefix, wildcard,
fuzzy. Expansion must hit the INDEXED (analyzed) vocabulary, prune the
postings scan via tids, and the semi-join fallback must agree with the
inline-literal path."""

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.search import (
    search_fuzzy,
    search_keyword,
    search_prefix,
    search_wildcard,
    vocab_matches,
)
from mini_search_engine_spark.search.expand import _glob_to_java_regex


@pytest.fixture(scope="module")
def idx(spark, tiny_corpus):
    i = build_index(load_corpus(tiny_corpus), analyzer="porter", block_span=4)
    yield i
    i.unpersist()


def _ids(df):
    return [r["docid"] for r in df.collect()]


def test_prefix_search(spark, idx):
    # porter stems stemming/stems/stemmed → 'stem'; prefix hits the stem
    assert _ids(search_prefix(idx, "stem")) == [4]
    assert _ids(search_prefix(idx, "cat")) == [0, 2, 7]
    # prefix spanning several vocabulary terms = OR over them
    assert _ids(search_prefix(idx, "s")) == sorted(
        set(_ids(search_keyword(idx, "stemming")) + _ids(search_keyword(idx, "systems")))
    )
    assert _ids(search_prefix(idx, "zzz")) == []
    with pytest.raises(ValueError):
        search_prefix(idx, "   ")


def test_wildcard_search(spark, idx):
    assert _ids(search_wildcard(idx, "d?g")) == _ids(search_keyword(idx, "dog"))
    assert _ids(search_wildcard(idx, "*og")) == _ids(search_keyword(idx, "dog"))
    assert _ids(search_wildcard(idx, "retriev*")) == [1, 3]
    # regex metachars in the pattern are literal, not regex
    assert _ids(search_wildcard(idx, "d.g")) == []
    with pytest.raises(ValueError):
        search_wildcard(idx, "*?*")


def test_glob_translation():
    assert _glob_to_java_regex("d?g*") == "^d.g.*$"
    assert _glob_to_java_regex("a.b") == r"^a\.b$"


def test_fuzzy_search(spark, idx):
    # 'cot' →1 edit→ 'cat' (and nothing else at distance ≤1)
    assert _ids(search_fuzzy(idx, "cot", max_edits=1)) == [0, 2, 7]
    # distance 0 == exact keyword
    assert _ids(search_fuzzy(idx, "quick", max_edits=0)) == _ids(
        search_keyword(idx, "quick")
    )
    # 'dpg' matches 'dog' (sub) at 1
    assert _ids(search_fuzzy(idx, "dpg", max_edits=1)) == _ids(
        search_keyword(idx, "dog")
    )
    assert _ids(search_fuzzy(idx, "zzzzzz", max_edits=1)) == []
    with pytest.raises(ValueError):
        search_fuzzy(idx, "x", max_edits=-1)


def test_semi_join_fallback_matches_inline(spark, idx):
    # force the broadcast semi-join path with a 1-tid cap; results must be
    # identical to the inline In(tid, …) path
    inline = _ids(search_prefix(idx, "s"))
    fallback = _ids(search_prefix(idx, "s", max_expansion=1))
    assert inline == fallback and len(vocab_matches(
        idx, F.col("term").startswith("s")).collect()) > 1


def test_vocab_matches_exposes_expansion(spark, idx):
    terms = {r["term"] for r in vocab_matches(idx, F.col("term").startswith("c")).collect()}
    assert terms == {"cat"}


def test_suggest(spark, idx):
    from mini_search_engine_spark.search import suggest

    # porter-analyzed vocabulary: 'stemming stems stemmed' all stem to 'stem'
    got = [(r["term"], r["df"]) for r in suggest(idx, "st", k=5).collect()]
    assert got == [("stem", 1)]
    # df-ranked, ties lexical: 'cat' (docs 0,2,7) beats 'quick' (doc 5)
    top = [r["term"] for r in suggest(idx, "c", k=3).collect()]
    assert top[0] == "cat"
    with pytest.raises(ValueError):
        suggest(idx, "  ")
    # the executed plan is TakeOrderedAndProject over ONE cached scan whose
    # columns are the vocab sidecar's (term/df-shaped) — no join, no
    # explode, no postings probe. Everything after the first
    # InMemoryTableScan is the cache's stored build lineage, not executed
    # on a warm query, so only the prefix is asserted.
    plan = suggest(idx, "c", k=3)._jdf.queryExecution().executedPlan().toString()
    executed, _, rest = plan.partition("InMemoryTableScan")
    scan_cols = rest[rest.index("[") : rest.index("]")]
    assert "TakeOrderedAndProject" in executed, plan
    assert "Join" not in executed and "Explode" not in executed, plan
    assert "term" in scan_cols and "plist" not in scan_cols, plan


def test_did_you_mean(spark, idx):
    from mini_search_engine_spark.search import did_you_mean

    got = [(r["term"], r["dist"]) for r in did_you_mean(idx, "cot", max_edits=1, k=3).collect()]
    assert got[0] == ("cat", 1)  # closest, highest-df correction first
    # an exact vocabulary hit ranks itself at distance 0
    got = [(r["term"], r["dist"]) for r in did_you_mean(idx, "dog", max_edits=1, k=2).collect()]
    assert got[0] == ("dog", 0)
