"""Auxiliary sources: url map + link graph TSVs (reference S2).

Reference: ``IcsSearchEngine.readUrlTsv`` / ``readIdGraphTsv``
(``search/IcsSearchEngine.java:51-91``) split lines on whitespace into
``docid → url`` and ``fromId → toId`` maps. Spark-first: schema'd CSV
scans — distributed, pushdown-friendly, no driver-side maps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_url_tsv(spark: SparkSession, path: str) -> DataFrame:
    """→ (docid: long, url: string)."""
    return (
        spark.read.csv(path, sep="\t", schema="docid long, url string")
        .filter(F.col("docid").isNotNull())
    )


def read_id_graph_tsv(spark: SparkSession, path: str) -> DataFrame:
    """→ edges (src: long, dst: long)."""
    return (
        spark.read.csv(path, sep="\t", schema="src long, dst long")
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
