"""Word-break tokenizer as a distributed Arrow UDF with a broadcast dict."""

from mini_search_engine_spark.analysis.tokenizers import load_frequency_dict
from mini_search_engine_spark.analysis.udfs import word_break_col
from pyspark.sql import functions as F


def test_word_break_col(spark):
    d = load_frequency_dict(["cat 10", "dog 10", "and 10", "informationretrieval 1", "information 5", "retrieval 5"])
    df = spark.createDataFrame(
        [(0, "catanddog"), (1, "informationretrieval"), (2, "zzz"), (3, "")],
        "id long, s string",
    )
    got = {r["id"]: r["toks"] for r in df.select("id", word_break_col(F.col("s"), d).alias("toks")).collect()}
    assert got[0] == ["cat", "dog"]  # "and" filtered as stopword
    # product: p(informationretrieval)=1/41 > p(information)*p(retrieval)=(5/41)^2? 1/41≈0.024 vs 0.0149 → single token wins
    assert got[1] == ["informationretrieval"]
    assert got[2] is None  # unbreakable → NULL (reference throws)
    assert got[3] == []
