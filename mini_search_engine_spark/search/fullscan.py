"""Brute-force full-scan search — the correctness oracle.

Reference: ``search/FullScanSearcher.java:27-40`` — scan every document,
keep those whose analyzed token set contains all analyzed query tokens.
Kept as the pytest oracle for the index-backed operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_search_engine_spark.analysis.udfs import analyze_col, analyze_query


def full_scan_search(
    docs: DataFrame, keywords: list[str] | str, analyzer: str = "porter"
) -> DataFrame:
    """docids of documents containing ALL analyzed query tokens."""
    if isinstance(keywords, str):
        keywords = [keywords]
    terms = sorted({t for k in keywords for t in analyze_query(k, analyzer)})
    if not terms:
        return docs.sparkSession.range(0).select(F.col("id").alias("docid"))
    # Project tokens first: Spark disallows a Python UDF inside a
    # higher-order-function lambda, so the Arrow analyzer must be its own
    # projection step before the forall filter.
    with_toks = docs.withColumn("_toks", analyze_col(F.col("content"), analyzer))
    cond = F.forall(
        F.array(*[F.lit(t) for t in terms]),
        lambda t: F.array_contains(F.col("_toks"), t),
    )
    return with_toks.filter(cond).select("docid").orderBy("docid")
