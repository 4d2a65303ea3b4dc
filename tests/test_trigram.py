"""Trigram index + verified substring search (index/trigram.py)."""

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.trigram import (
    _gram_hash_py,
    _query_grams,
    build_trigram_index,
    substring_search,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "def flushSegment(self): pass", "en", "t", 0),
        (1, "the FLUSH segment path goes here", "en", "t", 0),
        (2, "nothing relevant whatsoever", "en", "t", 0),
        (3, None, "en", "t", 0),
        (4, "flush flush flush segment segment", "en", "t", 0),
        (5, "a flu shot is not a flush", "en", "t", 0),  # trigram FP bait
    ]
    return load_corpus(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
    ).cache()


@pytest.fixture(scope="module")
def tidx(corpus):
    idx = build_trigram_index(corpus, block_span=2)
    yield idx
    idx.unpersist()


def _python_oracle(corpus, q):
    return sorted(
        r["docid"]
        for r in corpus.collect()
        if r["content"] and q.lower() in r["content"].lower()
    )


def _ids(df):
    return [r["docid"] for r in df.collect()]


def test_substring_search_exact(corpus, tidx):
    for q in ["flush seg", "FLUSH", "flushSegment(self)", "segment path", "not a flush"]:
        assert _ids(substring_search(tidx, corpus, q)) == _python_oracle(corpus, q), q


def test_rarest_gram_pruning_stays_exact(corpus, tidx):
    # 'flush segment path goes' has 21 grams; max_grams=2 intersects only
    # the two rarest — verification must still make the result exact
    q = "segment path goes"
    assert len(_query_grams(q)) > 2
    assert _ids(substring_search(tidx, corpus, q, max_grams=2)) == _python_oracle(corpus, q)


def test_missing_gram_short_circuits(corpus, tidx):
    # 'zzz' occurs nowhere: the gramstats probe alone answers empty
    assert _ids(substring_search(tidx, corpus, "zzzqqq")) == []


def test_short_query_raises(corpus, tidx):
    with pytest.raises(ValueError):
        substring_search(tidx, corpus, "ab")


def test_blocked_postings_cap_hot_grams(corpus, tidx):
    # block_span=2 over 6 docs: a gram occurring in docs {0,1,4,5} must be
    # split across blocks, no row carrying all its docids
    sizes = tidx.postings.select(F.size("docids").alias("s")).agg(F.max("s")).collect()[0][0]
    assert sizes <= 2  # block span bounds every posting row
    # df sidecar still counts documents, not rows
    h = _gram_hash_py("flu")
    df = tidx.gramstats.filter(F.col("tid") == h).collect()[0]["df"]
    assert df == 4  # docs 0, 1, 4, 5


def test_verification_scan_is_candidate_pruned(corpus, tidx):
    # the corpus side of the verify join is reached through a semi-join on
    # candidates (broadcast at this size) — not a full filter-only scan
    plan = substring_search(tidx, corpus, "flush seg")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_regex_search(corpus, tidx):
    import re

    from mini_search_engine_spark.index.trigram import regex_search, required_literals

    def py_oracle(pat):
        rx = re.compile(pat, re.IGNORECASE)
        return sorted(
            r["docid"] for r in corpus.collect() if r["content"] and rx.search(r["content"])
        )

    for pat in [r"flush\w*segment", r"(flush|xyzq) segment", r"flu\w+ shot", r"segment\s+path"]:
        got = _ids(regex_search(tidx, corpus, pat))
        assert got == py_oracle(pat), (pat, got)

    # unprunable pattern: raises by default, scans when explicitly allowed
    with pytest.raises(ValueError):
        regex_search(tidx, corpus, r"\w+")
    assert _ids(regex_search(tidx, corpus, r"f\w+h", allow_full_scan=True)) == py_oracle(r"f\w+h")

    # extraction soundness corners: the optional 'c?' breaks the run ('ab'
    # too short, 'xyz' survives); an alternation is never required
    assert required_literals(r"abc?xyz") == ["xyz"]
    assert required_literals(r"(foo|bar)") == []


def test_trigram_index_roundtrip_and_pushdown(spark, corpus, tidx, tmp_path):
    from mini_search_engine_spark.index.trigram import (
        read_trigram_index,
        substring_search,
        write_trigram_index,
    )

    path = str(tmp_path / "tri")
    write_trigram_index(tidx, path)
    disk = read_trigram_index(spark, path)
    assert disk.n_docs == tidx.n_docs and disk.block_span == tidx.block_span

    for q in ["flush seg", "segment path", "not a flush"]:
        assert _ids(substring_search(disk, corpus, q)) == _ids(
            substring_search(tidx, corpus, q)
        ), q

    # the stored postings scan prunes on the int gram id (PushedFilters)
    probed = disk.postings.filter(
        F.col("tid").isin([_gram_hash_py("flu"), _gram_hash_py("seg")])
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(tid" in plan, plan


def test_short_docs_contribute_no_grams(spark):
    """Content under 3 chars must emit NO grams: sequence(1, len-2) is
    descending there and would otherwise leak bogus 1-2-char 'trigrams'
    into the postings and df stats (ADVICE r4)."""
    rows = [
        (0, "", "en", "t", 0),
        (1, "a", "en", "t", 0),
        (2, "ab", "en", "t", 0),
        (3, "abc", "en", "t", 0),
    ]
    corpus = load_corpus(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
    )
    idx = build_trigram_index(corpus, block_span=2)
    try:
        stats = idx.gramstats.collect()
        # exactly one gram in the whole corpus: 'abc' from doc 3
        assert [(r["tid"], r["df"]) for r in stats] == [(_gram_hash_py("abc"), 1)]
        posts = idx.postings.collect()
        assert len(posts) == 1 and posts[0]["docids"] == [3]
    finally:
        idx.unpersist()
