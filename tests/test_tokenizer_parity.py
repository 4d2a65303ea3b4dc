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


# Team1PunctuationTokenizerTest goldens: (input, expected tokens) pairs,
# asserted against BOTH the python kernel and the native Spark column
TEAM1_PUNCT_GOLDENS = [
    ("uci cs221\tinformation\nretrieval", ["uci", "cs221", "information", "retrieval"]),
    ("uci,cs221.information;retrieval?project!1",
     ["uci", "cs221", "information", "retrieval", "project", "1"]),
    ("uci~cs221/information>retrieval", ["uci~cs221/information>retrieval"]),
    ("UciCS221InformationRetrieval", ["ucics221informationretrieval"]),
    ("uci \tcs221\t\ninformation\n \tretrieval", ["uci", "cs221", "information", "retrieval"]),
    ("uci,.cs221.;information;?retrieval?!project!,.1",
     ["uci", "cs221", "information", "retrieval", "project", "1"]),
]


def test_team1_punct_goldens(spark):
    for text, expected in TEAM1_PUNCT_GOLDENS:
        assert punctuation_tokenize(text) == expected, text
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(TEAM1_PUNCT_GOLDENS)],
        "docid long, content string",
    )
    got = {
        r["docid"]: list(r["t"])
        for r in df.select(
            "docid", analyze_col(F.col("content"), "punct_nostem").alias("t")
        ).collect()
    }
    for i, (_, expected) in enumerate(TEAM1_PUNCT_GOLDENS):
        assert got[i] == expected, i
