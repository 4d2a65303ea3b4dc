"""Atomic upsert (streaming.upsert_docs): ONE snapshot appends the revised
segment AND tombstones the superseded docids — the Iceberg MERGE commit.

Parity model: after the upsert, every query over the segmented index must
equal the same query over a FROM-SCRATCH build of the post-upsert corpus
(so df, n_docs, avgdl, and every posting block shift exactly)."""

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.search import bm25_topk, search_and
from mini_search_engine_spark.streaming import (
    current_snapshot,
    maybe_compact,
    read_segmented_index,
    upsert_docs,
    write_segment,
)

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _rows(lo, hi, tag="orig"):
    return [
        (i, f"alpha word{i % 4} beta common {tag}", "en", "t", 0)
        for i in range(lo, hi)
    ]


def _corpus(spark, rows):
    return load_corpus(spark.createDataFrame(rows, SCHEMA))


def _base_index(spark, tmp_path, n=20):
    idxp = str(tmp_path / "upsert_idx")
    docs = _corpus(spark, _rows(0, n))
    write_segment(build_index(docs, analyzer="porter", block_span=8), idxp, "base")
    return idxp, docs


def _bm25(idx, terms=("word1", "common"), k=50):
    return [
        (r["docid"], round(r["score"], 9))
        for r in bm25_topk(idx, list(terms), k).collect()
    ]


def test_upsert_matches_from_scratch_build(spark, tmp_path):
    idxp, docs = _base_index(spark, tmp_path)
    # revise docs 3 and 5: new content arrives under FRESH docids 103/105
    old = docs.filter(F.col("docid").isin(3, 5))
    revised = old.select(
        (F.col("docid") + 100).alias("docid"),
        F.concat(F.col("content"), F.lit(" gamma revised")).alias("content"),
    )
    snap = upsert_docs(
        spark, idxp, revised, old.select("docid"),
        analyzer="porter", block_span=8, seg_id="u1",
    )
    assert "u1" in snap.segments and len(snap.deletes) == 1

    seg_idx = read_segmented_index(spark, idxp, analyzer="porter", block_span=8)
    survivors = (
        docs.select("docid", "content")
        .filter(~F.col("docid").isin(3, 5))
        .unionByName(revised)
    )
    full = build_index(survivors, analyzer="porter", block_span=8)

    assert seg_idx.n_docs == full.n_docs == 20
    assert abs(seg_idx.avgdl - full.avgdl) < 1e-9
    assert _bm25(seg_idx) == _bm25(full)
    # old content gone, revised content findable
    hits = [r["docid"] for r in search_and(seg_idx, ["gamma", "revised"]).collect()]
    assert hits == [103, 105]
    assert 3 not in {r["docid"] for r in search_and(seg_idx, ["alpha"]).collect()}


def test_upsert_is_one_atomic_snapshot_with_time_travel(spark, tmp_path):
    idxp, docs = _base_index(spark, tmp_path)
    before = current_snapshot(spark, idxp)
    old = docs.filter(F.col("docid") == 0)
    revised = old.select(
        (F.col("docid") + 100).alias("docid"), F.col("content")
    )
    after = upsert_docs(
        spark, idxp, revised, old.select("docid"),
        analyzer="porter", block_span=8, seg_id="u1",
    )
    # exactly one snapshot advanced: both halves committed together
    assert after.snapshot_id == before.snapshot_id + 1
    # time travel to the pre-upsert snapshot sees the original doc 0
    old_idx = read_segmented_index(
        spark, idxp, analyzer="porter", block_span=8,
        snapshot_id=before.snapshot_id,
    )
    assert 0 in {r["docid"] for r in search_and(old_idx, ["alpha"]).collect()}
    new_idx = read_segmented_index(spark, idxp, analyzer="porter", block_span=8)
    ids = {r["docid"] for r in search_and(new_idx, ["alpha"]).collect()}
    assert 0 not in ids and 100 in ids


def test_upsert_replay_is_noop_and_self_tombstone_raises(spark, tmp_path):
    idxp, docs = _base_index(spark, tmp_path)
    old = docs.filter(F.col("docid") == 1)
    revised = old.select((F.col("docid") + 100).alias("docid"), "content")
    s1 = upsert_docs(spark, idxp, revised, old.select("docid"),
                     analyzer="porter", block_span=8, seg_id="u1")
    s2 = upsert_docs(spark, idxp, revised, old.select("docid"),
                     analyzer="porter", block_span=8, seg_id="u1")
    assert s2.snapshot_id == s1.snapshot_id  # replay: no-op
    idx = read_segmented_index(spark, idxp, analyzer="porter", block_span=8)
    assert idx.n_docs == 20
    with pytest.raises(ValueError):
        upsert_docs(spark, idxp, old, old.select("docid"),
                    analyzer="porter", block_span=8, seg_id="u2")


def test_upsert_pure_insert_writes_no_delete_file(spark, tmp_path):
    idxp, docs = _base_index(spark, tmp_path)
    new = _corpus(spark, _rows(200, 205, tag="fresh"))
    snap = upsert_docs(spark, idxp, new, [], analyzer="porter",
                       block_span=8, seg_id="u1")
    assert snap.deletes == []
    idx = read_segmented_index(spark, idxp, analyzer="porter", block_span=8)
    assert idx.n_docs == 25


def test_compaction_after_upsert_purges_tombstones(spark, tmp_path):
    idxp, docs = _base_index(spark, tmp_path)
    old = docs.filter(F.col("docid") < 4)
    revised = old.select(
        (F.col("docid") + 100).alias("docid"),
        F.concat(F.col("content"), F.lit(" gamma")).alias("content"),
    )
    upsert_docs(spark, idxp, revised, old.select("docid"),
                analyzer="porter", block_span=8, seg_id="u1")
    pre = _bm25(read_segmented_index(spark, idxp, analyzer="porter", block_span=8))
    assert maybe_compact(spark, idxp, threshold=2, analyzer="porter", block_span=8)
    snap = current_snapshot(spark, idxp)
    assert snap.deletes == []  # physically purged
    post = _bm25(read_segmented_index(spark, idxp, analyzer="porter", block_span=8))
    assert pre == post
