"""Doc-level merge-on-read deletes (index/deletes.py) + the snapshot
delete-file commit protocol (streaming delete_docs / time travel / purge).

The invariant everywhere: an index with tombstones applied is
indistinguishable — postings, statistics, scores — from a from-scratch
build over the surviving documents only. The reference has no doc-level
delete (only the lazy term-granular quirk, InvertedIndexManager.java
deleteDocuments — see index/merge.py B5); this is the Iceberg
equality-delete analog a takedown/opt-out pipeline needs at 100 TB."""

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.index.deletes import apply_deletes
from mini_search_engine_spark.search import bm25_topk, search_and, search_phrase
from mini_search_engine_spark.streaming import (
    current_snapshot,
    delete_docs,
    gc,
    maybe_compact,
    read_segmented_index,
    write_segment,
)
from tests.conftest import postings_with_term

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _rows(lo, hi):
    return [(i, f"alpha word{i % 4} beta common", "en", "t", 0) for i in range(lo, hi)]


def _corpus(spark, rows):
    return load_corpus(spark.createDataFrame(rows, SCHEMA))


def _tomb(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "docid long")


def _postings_set(index):
    cols = ["term", "block", "docids", "tfs", "dls"]
    if index.positional:
        cols.append("positions")
    return {tuple(map(str, r)) for r in postings_with_term(index).select(*cols).collect()}


def _stats_set(index):
    return {(r["term"], r["df"]) for r in index.termstats.select("term", "df").collect()}


def test_apply_deletes_equals_rebuild(spark, tiny_corpus):
    """Tombstoning docids then querying == building only the survivors:
    postings arrays, df, doclens, n_docs/avgdl, BM25 scores, phrase hits."""
    docs = load_corpus(tiny_corpus)
    full = build_index(docs, analyzer="porter", positional=True, block_span=4)
    # 0 and 7 are the heavy 'cat' docs (df and max_tf both shift); 4 kills
    # the only 'stem*' doc entirely (its terms must vanish from the dict)
    deleted = apply_deletes(full, _tomb(spark, [0, 4, 7]))
    rebuilt = build_index(
        docs.filter(~F.col("docid").isin(0, 4, 7)),
        analyzer="porter",
        positional=True,
        block_span=4,
    )

    assert deleted.n_docs == rebuilt.n_docs == 5
    assert deleted.avgdl == pytest.approx(rebuilt.avgdl)
    assert _stats_set(deleted) == _stats_set(rebuilt)
    assert _postings_set(deleted) == _postings_set(rebuilt)
    assert sorted(map(tuple, deleted.doclens.collect())) == sorted(
        map(tuple, rebuilt.doclens.collect())
    )
    got = [(r["docid"], round(r["score"], 9)) for r in bm25_topk(deleted, ["cat", "dog"], 8).collect()]
    want = [(r["docid"], round(r["score"], 9)) for r in bm25_topk(rebuilt, ["cat", "dog"], 8).collect()]
    assert got == want
    assert [r["docid"] for r in search_phrase(deleted, "quick brown").collect()] == [5]
    # no empty posting rows survive and no tombstoned docid remains anywhere
    assert deleted.postings.filter(F.size("docids") == 0).count() == 0
    assert (
        deleted.postings.filter(
            F.arrays_overlap("docids", F.array(F.lit(0), F.lit(4), F.lit(7)))
        ).count()
        == 0
    )
    for idx in (full, rebuilt):
        idx.unpersist()


def test_apply_deletes_nonexistent_is_noop(spark, tiny_corpus):
    docs = load_corpus(tiny_corpus)
    full = build_index(docs, analyzer="porter", block_span=4)
    same = apply_deletes(full, _tomb(spark, [999, 12345]))
    assert same.n_docs == full.n_docs
    assert same.avgdl == pytest.approx(full.avgdl)
    assert _stats_set(same) == _stats_set(full)
    assert _postings_set(same) == _postings_set(full)
    full.unpersist()


def test_apply_deletes_on_compressed_decodes_first(spark, tiny_corpus):
    docs = load_corpus(tiny_corpus)
    comp = build_index(docs, analyzer="porter", block_span=4, compress=True)
    deleted = apply_deletes(comp, _tomb(spark, [0]))
    rebuilt = build_index(
        docs.filter(F.col("docid") != 0), analyzer="porter", block_span=4
    )
    assert not deleted.compressed
    assert _postings_set(deleted) == _postings_set(rebuilt)
    for idx in (comp, rebuilt):
        idx.unpersist()


def test_delete_docs_snapshot_time_travel_and_purge(spark, tmp_path):
    """delete_docs commits a tombstone snapshot WITHOUT rewriting segments;
    older snapshots time-travel to the pre-delete state; compaction
    physically purges and drops the delete files; gc sweeps them."""
    idxp = str(tmp_path / "del_idx")
    segs = []
    for s in range(2):
        seg = build_index(
            _corpus(spark, _rows(10 * s, 10 * s + 10)), analyzer="porter", block_span=8
        )
        assert write_segment(seg, idxp, str(s)) is True
        segs.append(seg)
    pre = current_snapshot(spark, idxp)
    assert pre.deletes == []

    snap = delete_docs(spark, idxp, [5, 12, 999])
    assert snap.parent == pre.snapshot_id and len(snap.deletes) == 1
    # no segment data was rewritten — same segment list, same files
    assert snap.segments == pre.segments

    live = read_segmented_index(spark, idxp, block_span=8)
    assert live.n_docs == 18
    hits = [r["docid"] for r in search_and(live, ["alpha", "word1"]).collect()]
    assert 5 not in hits and 13 in hits
    # time travel: the pre-delete snapshot still sees all 20
    old = read_segmented_index(spark, idxp, block_span=8, snapshot_id=pre.snapshot_id)
    assert old.n_docs == 20
    # audit view: tombstones visible but unapplied
    raw = read_segmented_index(spark, idxp, block_span=8, apply_tombstones=False)
    assert raw.n_docs == 20

    # a second delete stacks a second delete file on the same snapshot chain
    snap2 = delete_docs(spark, idxp, [7])
    assert len(snap2.deletes) == 2
    assert read_segmented_index(spark, idxp, block_span=8).n_docs == 17

    # compaction merges the ALREADY-FILTERED view → physical purge,
    # tombstone-free snapshot
    assert maybe_compact(spark, idxp, threshold=2) is True
    post = current_snapshot(spark, idxp)
    assert post.deletes == []
    compacted = read_segmented_index(spark, idxp, block_span=8, apply_tombstones=False)
    assert compacted.n_docs == 17  # gone physically, not just masked
    rebuilt = build_index(
        _corpus(spark, [r for r in _rows(0, 20) if r[0] not in (5, 7, 12)]),
        analyzer="porter",
        block_span=8,
    )
    got = [(r["docid"], round(r["score"], 9)) for r in bm25_topk(compacted, ["word2"], 5).collect()]
    want = [(r["docid"], round(r["score"], 9)) for r in bm25_topk(rebuilt, ["word2"], 5).collect()]
    assert got == want

    # gc with retention 1: expired snapshots' delete files leave the disk
    gc(spark, idxp, retain_snapshots=1)
    from mini_search_engine_spark.index.build import _hadoop_fs

    fs, delroot = _hadoop_fs(spark, f"{idxp}/deletes")
    remaining = [st.getPath().getName() for st in fs.listStatus(delroot)] if fs.exists(delroot) else []
    assert remaining == []
    for s in segs + [rebuilt]:
        s.unpersist()


def test_delete_docs_requires_snapshot(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        delete_docs(spark, str(tmp_path / "nowhere"), [1])


def test_dedup_to_takedown_pipeline(spark, tmp_path):
    """The full 100 TB dedup loop end-to-end: discover near-dup clusters
    (MinHash → connected components), tombstone the non-canonical members
    of an ALREADY-BUILT segmented index via delete_docs (DataFrame form),
    and verify search serves exactly one representative per cluster."""
    from mini_search_engine_spark.ops import dedup_clusters
    from mini_search_engine_spark.search import search_keyword

    # 7 content groups × 2 exact-dup docs (i and i+7), disjoint vocabulary
    rows = [
        (i, f"group{i % 7}x token{i % 7}a token{i % 7}b token{i % 7}c", "en", "t", 0)
        for i in range(14)
    ]
    docs = _corpus(spark, rows)
    idxp = str(tmp_path / "takedown_idx")
    for s, (lo, hi) in enumerate([(0, 7), (7, 14)]):
        seg = build_index(
            _corpus(spark, rows[lo:hi]), analyzer="porter", block_span=8
        )
        assert write_segment(seg, idxp, str(s)) is True
        seg.unpersist()

    clusters = dedup_clusters(docs)
    tomb = clusters.filter(F.col("docid") != F.col("cluster")).select("docid")
    assert sorted(r["docid"] for r in tomb.collect()) == list(range(7, 14))
    delete_docs(spark, idxp, tomb)

    live = read_segmented_index(spark, idxp, block_span=8)
    assert live.n_docs == 7
    for k in range(7):
        assert [r["docid"] for r in search_keyword(live, f"token{k}a").collect()] == [k]
