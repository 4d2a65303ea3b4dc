"""Bucketed doc-store co-location: the whole point is the ABSENCE of an
Exchange in the join plan — asserted here against a shuffling control."""

import pytest

from pyspark.sql import functions as F

from mini_search_engine_spark.storage import colocated_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    docs = spark.range(0, 1000).select(
        F.col("id").alias("docid"), (F.col("id") % 97).alias("meta")
    )
    scores = spark.range(0, 1000, 3).select(
        F.col("id").alias("docid"), (F.col("id") * 0.5).alias("score")
    )
    write_bucketed(docs, "t_docs_b", buckets=8, path=str(base / "docs"))
    write_bucketed(scores, "t_scores_b", buckets=8, path=str(base / "scores"))
    yield "t_docs_b", "t_scores_b", docs, scores
    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_scores_b")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_colocated_join_is_exchange_free(spark, bucketed_tables):
    lt, rt, docs, scores = bucketed_tables
    j = colocated_join(spark, lt, rt, "docid")
    plan = _plan(j)
    # no SHUFFLE exchange (broadcast is pinned off — the co-location
    # contract targets joins where neither side is broadcastable)
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" in plan and "Bucketed: true" in plan, plan
    # control: the same sort-merge join over non-bucketed frames shuffles
    control = docs.hint("merge").join(scores, "docid")
    assert "Exchange hashpartitioning" in _plan(control)
    # and the data is identical either way
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, control.collect()))


def test_raw_parquet_read_loses_bucketing(spark, bucketed_tables):
    # reading the SAME files without the catalog drops the bucket spec —
    # documents why colocated_join goes through spark.table
    lt, rt, _, _ = bucketed_tables
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {lt}")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    raw = spark.read.parquet(loc.replace("file:", ""))
    j = raw.hint("merge").join(spark.table(rt), "docid")
    assert "Exchange hashpartitioning" in _plan(j)
