"""Native-Catalyst tokenizer must agree token-for-token with the Python
kernel (the DuckDB oracles assume this equivalence)."""

from mini_search_engine_spark.analysis.tokenizers import (
    naive_tokenize,
    punctuation_tokenize,
)
from mini_search_engine_spark.analysis.udfs import analyze_col
from mini_search_engine_spark.corpus import load_documents
from pyspark.sql import functions as F


def test_native_punct_matches_python(spark, sf_dir):
    docs = load_documents(spark, sf_dir).limit(200)
    got = docs.select("docid", "content", analyze_col(F.col("content"), "punct_nostem").alias("t")).collect()
    for r in got:
        assert list(r["t"]) == punctuation_tokenize(r["content"]), r["docid"]


def test_native_naive_matches_python(spark):
    rows = [(0, "The  Quick\tBrown "), (1, ""), (2, "a,b c^d!e"), (3, "x\x0by")]
    df = spark.createDataFrame(rows, "docid long, content string")
    got = df.select("docid", "content", analyze_col(F.col("content"), "naive").alias("t")).collect()
    for r in got:
        assert list(r["t"]) == naive_tokenize(r["content"]), r["docid"]


def test_native_punct_edge_cases(spark):
    rows = [
        (0, "I am Happy Today!"),
        (1, "cat^dog up^down"),
        (2, " , . ; ? !  "),
        (3, "MIXED Case WORDS"),
        (4, "tab\tnewline\ncr\rvt\x0bff\x0cdone"),
    ]
    df = spark.createDataFrame(rows, "docid long, content string")
    got = df.select("docid", "content", analyze_col(F.col("content"), "punct_nostem").alias("t")).collect()
    for r in got:
        assert list(r["t"]) == punctuation_tokenize(r["content"]), (r["docid"], list(r["t"]))
