"""Segment merge, lazy deletion, and checkpoint-resume (north_rule)."""

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.index.lineage import (
    finalize_index,
    read_lineage_metrics,
    resumable_build,
)
from mini_search_engine_spark.index.merge import delete_terms, merge_segments
from mini_search_engine_spark.search import bm25_topk, search_and, search_keyword


def _mk(spark, rows):
    return load_corpus(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
    )


def _postings_dict(index):
    from conftest import postings_with_term

    out = {}
    for r in postings_with_term(index).collect():
        out.setdefault(r["term"], []).extend(zip(r["docids"], r["tfs"]))
    return {t: sorted(v) for t, v in out.items()}


def test_merge_equals_full_build(spark):
    rows = [(i, f"alpha beta doc{i % 3} gamma" + (" alpha" * (i % 2)), "en", "t", 0) for i in range(10)]
    full = build_index(_mk(spark, rows), analyzer="porter", block_span=4, positional=True)
    seg_a = build_index(_mk(spark, rows[:6]), analyzer="porter", block_span=4, positional=True)
    seg_b = build_index(_mk(spark, rows[6:]), analyzer="porter", block_span=4, positional=True)
    merged = merge_segments([seg_a, seg_b])
    assert _postings_dict(merged) == _postings_dict(full)
    assert merged.n_docs == full.n_docs
    assert merged.avgdl == pytest.approx(full.avgdl)


def test_merge_arrow_path_equals_catalyst(spark):
    # the sorted-Arrow re-aggregation must produce posting-identical output
    rows = [(i, f"alpha beta doc{i % 3} gamma" + (" alpha" * (i % 2)), "en", "t", 0) for i in range(10)]
    seg_a = build_index(_mk(spark, rows[:6]), analyzer="porter", block_span=4)
    seg_b = build_index(_mk(spark, rows[6:]), analyzer="porter", block_span=4)
    cat = merge_segments([seg_a, seg_b])
    arr = merge_segments([seg_a, seg_b], use_arrow=True)
    assert _postings_dict(arr) == _postings_dict(cat)
    assert arr.n_docs == cat.n_docs


def _postings_dict_pos(index):
    from conftest import postings_with_term

    out = {}
    for r in postings_with_term(index).collect():
        out.setdefault(r["term"], []).extend(
            zip(r["docids"], r["tfs"], [tuple(p) for p in r["positions"]])
        )
    return {t: sorted(v) for t, v in out.items()}


def test_merge_arrow_positional_equals_catalyst(spark):
    # VERDICT r2 item 7: the sorted-Arrow kernel now carries position lists
    # (as Arrow list offsets — no per-row Python) through the merge
    rows = [(i, f"alpha beta doc{i % 3} gamma" + (" alpha" * (i % 2)), "en", "t", 0) for i in range(10)]
    full = build_index(_mk(spark, rows), analyzer="porter", block_span=4, positional=True)
    seg_a = build_index(_mk(spark, rows[:6]), analyzer="porter", block_span=4, positional=True)
    seg_b = build_index(_mk(spark, rows[6:]), analyzer="porter", block_span=4, positional=True)
    cat = merge_segments([seg_a, seg_b])
    arr = merge_segments([seg_a, seg_b], use_arrow=True)
    assert arr.positional and cat.positional
    assert _postings_dict_pos(arr) == _postings_dict_pos(cat) == _postings_dict_pos(full)


def test_arrow_local_build_positional_compressed(spark):
    # the positional sorted-Arrow kernel's COMPRESSED path (grouped flat-
    # segment codec) must round-trip: build via the non-porter local_blocks
    # route and compare decoded postings+positions against the exchange plan
    from mini_search_engine_spark.search import search_phrase

    rows = [(i, f"alpha beta doc{i % 3} gamma" + (" alpha beta" * (i % 2)), "en", "t", 0) for i in range(10)]
    docs = _mk(spark, rows).repartitionByRange(2, "docid")
    exch = build_index(docs, analyzer="punct_nostem", block_span=4, positional=True, compress=True)
    local = build_index(
        docs, analyzer="punct_nostem", block_span=4, positional=True, compress=True,
        local_blocks=True,
    )
    assert _postings_dict_pos(local) == _postings_dict_pos(exch)
    got = sorted(r["docid"] for r in search_phrase(local, "alpha beta").collect())
    want = sorted(r["docid"] for r in search_phrase(exch, "alpha beta").collect())
    assert got == want and got


def test_merge_rebase(spark):
    # two segments with OVERLAPPING local docids — rebase shifts the right one
    rows_a = [(0, "apple pie", "en", "t", 0), (1, "apple tart", "en", "t", 0)]
    rows_b = [(0, "apple cake", "en", "t", 0)]
    seg_a = build_index(_mk(spark, rows_a), block_span=4)
    seg_b = build_index(_mk(spark, rows_b), block_span=4)
    merged = merge_segments([seg_a, seg_b], rebase_docids=True)
    assert _postings_dict(merged)["appl"] == [(0, 1), (1, 1), (2, 1)]
    assert merged.n_docs == 3


def test_delete_terms_lazy(spark):
    rows = [(0, "cat dog", "en", "t", 0), (1, "cat bird", "en", "t", 0)]
    idx = build_index(_mk(spark, rows), block_span=4)
    idx2 = delete_terms(idx, ["cat"])
    assert [r["docid"] for r in search_keyword(idx2, "cat").collect()] == []
    assert [r["docid"] for r in search_keyword(idx2, "dog").collect()] == [0]
    # documents themselves are NOT deleted (reference quirk)
    assert [r["docid"] for r in search_and(idx2, ["bird"]).collect()] == [1]


def test_resumable_build_and_resume(spark, tmp_path):
    rows = [(i, f"word{i % 5} alpha beta common", "en", "t", 0) for i in range(40)]
    docs = _mk(spark, rows).cache()
    path_full = str(tmp_path / "full")
    resumable_build(docs, path_full, n_parts=4, block_span=8, compress=True)
    full = finalize_index(spark, path_full, block_span=8, compress=True)

    # crash after 2 partitions, then resume
    path_resume = str(tmp_path / "resumed")
    with pytest.raises(RuntimeError, match="injected failure"):
        resumable_build(docs, path_resume, n_parts=4, block_span=8, compress=True,
                        fail_after_parts=2)
    done_before = read_lineage_metrics(spark, path_resume)
    assert done_before["parts"] == 2
    written = resumable_build(docs, path_resume, n_parts=4, block_span=8, compress=True)
    # resume skipped committed partitions
    assert {w["pid"] for w in written}.isdisjoint({0, 1}) or len(written) <= 3
    resumed = finalize_index(spark, path_resume, block_span=8, compress=True)

    assert _postings_dict(resumed) == _postings_dict(full)
    assert resumed.n_docs == full.n_docs == 40
    got_f = [(r["docid"], round(r["score"], 9)) for r in bm25_topk(full, ["alpha", "word1"], 5).collect()]
    got_r = [(r["docid"], round(r["score"], 9)) for r in bm25_topk(resumed, ["alpha", "word1"], 5).collect()]
    assert got_f == got_r

    metrics = read_lineage_metrics(spark, path_resume)
    assert metrics["docs"] == 40
    assert metrics["n_postings"] > 0
    assert metrics["bytes_after"] < metrics["bytes_before"]
