"""Connected components + canonical dedup (ops/cluster.py)."""

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.ops import (
    connected_components,
    dedup_clusters,
    dedup_keep_canonical,
)

PAIRS = "docid_a long, docid_b long"


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, PAIRS)
    return {r["docid"]: r["cluster"] for r in connected_components(df, **kw).collect()}


def test_components_basic(spark):
    # two components {1,2,3} and {5,6}; 3 linked via 2, never paired with 1
    got = _cc(spark, [(1, 2), (2, 3), (5, 6)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}


def test_components_chain_diameter(spark):
    # a 12-node path needs ~diameter iterations + checkpointing mid-loop
    got = _cc(spark, [(i, i + 1) for i in range(12)], checkpoint_every=3)
    assert got == {i: 0 for i in range(13)}


def test_components_max_iter_raises(spark):
    with pytest.raises(RuntimeError):
        _cc(spark, [(i, i + 1) for i in range(12)], max_iter=2)


def test_components_no_leaked_caches(spark):
    # compare RDD-id SETS, not counts: Spark's async ContextCleaner may
    # drop a STALE cache from an earlier test module between the two
    # snapshots (count goes down — not a leak); a leak is a NEW id that
    # survives the call
    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    _cc(spark, [(1, 2), (2, 3), (3, 4), (9, 10)])
    after = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    assert after - before == set(), f"leaked cache ids: {after - before}"


def test_dedup_clusters_and_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"content {i}") for i in range(8)], "docid long, content string"
    )
    pairs = spark.createDataFrame([(0, 3), (3, 5), (2, 6)], PAIRS)
    clusters = {
        r["docid"]: r["cluster"] for r in dedup_clusters(docs, pairs).collect()
    }
    assert clusters == {0: 0, 1: 1, 2: 2, 3: 0, 4: 4, 5: 0, 6: 2, 7: 7}
    kept = sorted(
        r["docid"] for r in dedup_keep_canonical(docs, pairs).select("docid").collect()
    )
    assert kept == [0, 1, 2, 4, 7]  # one per cluster, all singletons


def test_dedup_clusters_end_to_end_minhash(spark, sf_dir):
    """Default pair source: every near-dup pair lands in one cluster and
    the cluster id is the min member (spot-checked against the raw pairs)."""
    from mini_search_engine_spark.corpus import load_documents
    from mini_search_engine_spark.ops import minhash_candidate_pairs

    docs = load_documents(spark, sf_dir)
    clusters = {r["docid"]: r["cluster"] for r in dedup_clusters(docs).collect()}
    assert len(clusters) == docs.count()
    for r in minhash_candidate_pairs(docs).collect():
        a, b = r["docid_a"], r["docid_b"]
        assert clusters[a] == clusters[b] <= min(a, b)
