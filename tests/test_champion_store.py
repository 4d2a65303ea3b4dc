"""Incremental champion-tier maintenance over a snapshot-committed
segmented index: incremental refresh must equal a from-scratch
champion_index of the same snapshot, hash-equal postings."""

import pytest

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.index.champion_store import (
    current_champion_id,
    gc_champion,
    read_champion,
    refresh_champion,
)
from mini_search_engine_spark.index.prune import champion_index
from mini_search_engine_spark.search import bm25_topk
from mini_search_engine_spark.streaming.ingest import (
    delete_docs,
    maybe_compact,
    read_segmented_index,
    write_segment,
)

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _rows(lo, hi):
    # variable tf/dl so champion pruning actually ranks postings
    return [
        (
            i,
            " ".join(
                ["alpha"] * (1 + i % 3)
                + [f"word{i % 5}"] * (1 + i % 2)
                + ["beta common filler"] * (1 + i % 4)
            ),
            "en",
            "t",
            0,
        )
        for i in range(lo, hi)
    ]


def _write_seg(spark, idxp, lo, hi, seg_id):
    seg = build_index(
        load_corpus(spark.createDataFrame(_rows(lo, hi), SCHEMA)),
        analyzer="porter",
        block_span=8,
    )
    assert write_segment(seg, idxp, seg_id) is True
    seg.unpersist()


def _postings_dict(idx):
    out = {}
    for r in idx.postings.collect():
        out[(r["tid"], r["block"])] = (
            list(r["docids"]),
            list(r["tfs"]),
            list(r["dls"]),
        )
    return out


def test_champion_refresh_incremental_equals_scratch(spark, tmp_path):
    idxp = str(tmp_path / "champ_store")
    _write_seg(spark, idxp, 0, 40, "0")

    tier0, mode0 = refresh_champion(spark, idxp, n_per_term=4, block_span=8)
    assert mode0 == "full" and tier0.pruned is True

    # no snapshot change -> noop
    _, mode_noop = refresh_champion(spark, idxp, n_per_term=4, block_span=8)
    assert mode_noop == "noop"

    # append two more segments -> incremental, and hash-equal to scratch
    _write_seg(spark, idxp, 40, 70, "1")
    _write_seg(spark, idxp, 70, 100, "2")
    tier, mode = refresh_champion(spark, idxp, n_per_term=4, block_span=8)
    assert mode == "incremental"

    scratch = champion_index(
        read_segmented_index(spark, idxp, block_span=8), n_per_term=4
    )
    assert _postings_dict(tier) == _postings_dict(scratch)
    assert tier.n_docs == scratch.n_docs == 100

    # ranked serving off the maintained tier matches the scratch tier
    got_t = [(r["docid"], round(r["score"], 9)) for r in bm25_topk(tier, ["alpha"], 4).collect()]
    got_s = [(r["docid"], round(r["score"], 9)) for r in bm25_topk(scratch, ["alpha"], 4).collect()]
    assert got_t == got_s

    # old tiers are retained until gc'd (readers of the previous tier)
    assert current_champion_id(spark, idxp) is not None
    victims = gc_champion(spark, idxp, retain=1)
    assert len(victims) >= 1
    assert read_champion(spark, idxp).pruned is True


def test_champion_refresh_full_on_delete_and_compact(spark, tmp_path):
    idxp = str(tmp_path / "champ_full")
    for s in range(3):
        _write_seg(spark, idxp, 30 * s, 30 * s + 30, str(s))
    _, mode0 = refresh_champion(spark, idxp, n_per_term=4, block_span=8)
    assert mode0 == "full"

    # tombstones invalidate incremental (tier never saw the delete)
    delete_docs(spark, idxp, [0, 1, 2])
    tier, mode = refresh_champion(spark, idxp, n_per_term=4, block_span=8)
    assert mode == "full"
    kept_docids = {
        d for r in tier.postings.collect() for d in r["docids"]
    }
    assert not kept_docids & {0, 1, 2}
    scratch = champion_index(
        read_segmented_index(spark, idxp, block_span=8), n_per_term=4
    )
    assert _postings_dict(tier) == _postings_dict(scratch)

    # compaction changes folded -> full again, still scratch-equal
    assert maybe_compact(spark, idxp, threshold=2, block_span=8) is True
    tier2, mode2 = refresh_champion(spark, idxp, n_per_term=4, block_span=8)
    assert mode2 == "full"
    scratch2 = champion_index(
        read_segmented_index(spark, idxp, block_span=8), n_per_term=4
    )
    assert _postings_dict(tier2) == _postings_dict(scratch2)


def test_champion_refresh_requires_snapshot(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        refresh_champion(spark, str(tmp_path / "nope"))


def test_ingest_stream_auto_champion(spark, tmp_path):
    """The VERDICT contract end-to-end: ingest_stream(auto_champion=n)
    keeps the on-disk tier in step with the stream — after the stream
    drains, the tier equals a from-scratch champion_index of the
    segmented index (hash-equal postings), refreshed incrementally."""
    from mini_search_engine_spark.streaming.ingest import ingest_stream

    inp = str(tmp_path / "in")
    idxp = str(tmp_path / "auto_champ")
    spark.createDataFrame(_rows(0, 40), SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    q = ingest_stream(
        spark, inp, idxp, SCHEMA, analyzer="porter", block_span=8, auto_champion=4
    )
    q.awaitTermination(120)
    # second run: new files only -> incremental refresh path
    spark.createDataFrame(_rows(40, 80), SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    q2 = ingest_stream(
        spark, inp, idxp, SCHEMA, analyzer="porter", block_span=8, auto_champion=4
    )
    q2.awaitTermination(120)

    tier = read_champion(spark, idxp)
    scratch = champion_index(
        read_segmented_index(spark, idxp, block_span=8), n_per_term=4
    )
    assert _postings_dict(tier) == _postings_dict(scratch)
    assert tier.n_docs == 80
