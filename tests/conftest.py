import os

import pytest

from mini_search_engine_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mse-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    """Hand-written 8-doc corpus in the driver testdata shape; golden-checkable
    (pattern of reference Team10MergeTest / Team2TfIdfTest fixtures)."""
    rows = [
        (0, "cat dog cat", "en", "t", 11),
        (1, "dog information retrieval", "en", "t", 25),
        (2, "the cat and the dog", "en", "t", 19),
        (3, "information retrieval systems", "en", "t", 29),
        (4, "stemming stems stemmed", "en", "t", 22),
        (5, "quick brown fox; quick brown dog!", "en", "t", 33),
        (6, "", "en", "t", 0),
        (7, "cat cat cat cat dog", "en", "t", 19),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def postings_with_term(index):
    """Decoded postings joined back to term strings via the termstats
    dictionary sidecar (postings themselves are tid-encoded)."""
    from pyspark.sql import functions as F

    p = index.decoded().postings
    if "term" in p.columns:  # raw fused output carries a sparse term column
        p = p.drop("term")
    return p.join(F.broadcast(index.termstats.select("tid", "term")), "tid")
