"""Facade parity: the reference-API surface drives the same results."""

import pytest

from mini_search_engine_spark.engine import MiniSearchEngine


@pytest.fixture(scope="module")
def eng(tiny_corpus):
    return MiniSearchEngine.from_corpus(tiny_corpus, analyzer="porter", positional=True,
                                        block_span=4)


def ids(df):
    return [r["docid"] for r in df.collect()]


def test_facade_queries(eng):
    assert ids(eng.search_query("cats")) == [0, 2, 7]
    assert ids(eng.search_and_query(["cat", "dog"])) == [0, 2, 7]
    assert ids(eng.search_or_query(["cat", "retrieval"])) == [0, 1, 2, 3, 7]
    assert ids(eng.search_phrase_query("information retrieval")) == [1, 3]
    assert ids(eng.search_bm25(["cat"], 3)) == [7, 0, 2]
    assert eng.get_num_documents() == 8
    assert eng.get_document_frequency("cat") == 3
    assert eng.get_document_frequency("nonexistent") == 0


def test_facade_retrieve(eng):
    got = eng.retrieve(eng.search_query("retrieval"))
    rows = {r["docid"]: r["content"] for r in got.collect()}
    assert set(rows) == {1, 3}
    assert "retrieval" in rows[1]


def test_facade_delete_and_combined(eng, spark):
    edges = spark.createDataFrame([(0, 1), (1, 0), (2, 1)], "src long, dst long")
    eng.compute_page_rank(edges, num_iter=5)
    top = eng.search_query_combined(["cat"], top_k=3, weight=100.0)
    assert ids(top)[0] == 0  # pagerank hub among cat docs
    eng.delete_documents("cat")
    assert ids(eng.search_query("cat")) == []
    assert ids(eng.search_query("dog")) != []


def test_facade_save_open(eng, tmp_path, spark, tiny_corpus):
    path = str(tmp_path / "facade_idx")
    eng2 = MiniSearchEngine.from_corpus(tiny_corpus, positional=True, block_span=4)
    eng2.save(path)
    eng3 = MiniSearchEngine.open(spark, path)
    assert ids(eng3.search_and_query(["cat", "dog"])) == [0, 2, 7]
