"""Structured Streaming ingest: per-batch segments, resume via checkpoint,
segmented index == full-build index; watermarked window agg."""

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.search import bm25_topk, search_and
from mini_search_engine_spark.streaming import (
    compact_segments,
    ingest_stream,
    maybe_compact,
    num_segments,
    read_segmented_index,
    windowed_event_counts,
    write_segment,
)

SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _rows(lo, hi):
    return [(i, f"alpha word{i % 4} beta common", "en", "t", 0) for i in range(lo, hi)]


def test_stream_ingest_and_resume(spark, tmp_path):
    inp = str(tmp_path / "incoming")
    idxp = str(tmp_path / "stream_idx")

    spark.createDataFrame(_rows(0, 20), SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    q = ingest_stream(spark, inp, idxp, SCHEMA, analyzer="porter", block_span=8)
    q.awaitTermination(120)

    # more files arrive; a new run picks up ONLY the new ones (checkpoint)
    spark.createDataFrame(_rows(20, 30), SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    q2 = ingest_stream(spark, inp, idxp, SCHEMA, analyzer="porter", block_span=8)
    q2.awaitTermination(120)

    seg_idx = read_segmented_index(spark, idxp, block_span=8)
    assert seg_idx.n_docs == 30

    full = build_index(
        load_corpus(spark.createDataFrame(_rows(0, 30), SCHEMA)),
        analyzer="porter",
        block_span=8,
    )

    def hits(idx):
        return [r["docid"] for r in search_and(idx, ["alpha", "word1"]).collect()]

    assert hits(seg_idx) == hits(full)
    got_s = [(r["docid"], round(r["score"], 9)) for r in bm25_topk(seg_idx, ["word2"], 5).collect()]
    got_f = [(r["docid"], round(r["score"], 9)) for r in bm25_topk(full, ["word2"], 5).collect()]
    assert got_s == got_f

    compacted = compact_segments(seg_idx)
    assert hits(compacted) == hits(full)
    # compaction actually reduced (term, block) row count vs segments
    assert compacted.postings.count() <= seg_idx.postings.count()


def test_stream_ingest_inline_auto_compact(spark, tmp_path):
    """auto_compact=True triggers the reference's inline merge policy from
    the stream itself: once the committed segment count reaches the
    threshold, the batch handler merges all segments before returning."""
    inp = str(tmp_path / "incoming")
    idxp = str(tmp_path / "ac_idx")

    spark.createDataFrame(_rows(0, 20), SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    q = ingest_stream(spark, inp, idxp, SCHEMA, block_span=8, auto_compact=True, merge_threshold=2)
    q.awaitTermination(120)
    assert num_segments(spark, idxp) == 1  # below threshold: untouched

    spark.createDataFrame(_rows(20, 30), SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    q2 = ingest_stream(spark, inp, idxp, SCHEMA, block_span=8, auto_compact=True, merge_threshold=2)
    q2.awaitTermination(120)
    assert num_segments(spark, idxp) == 1  # second segment triggered the merge

    seg_idx = read_segmented_index(spark, idxp, block_span=8)
    assert seg_idx.n_docs == 30
    full = build_index(
        load_corpus(spark.createDataFrame(_rows(0, 30), SCHEMA)),
        analyzer="porter",
        block_span=8,
    )
    got = [r["docid"] for r in search_and(seg_idx, ["alpha", "word1"]).collect()]
    want = [r["docid"] for r in search_and(full, ["alpha", "word1"]).collect()]
    assert got == want


def test_auto_compact_threshold_policy(spark, tmp_path):
    """Reference LSM policy parity (InvertedIndexManager.java:52,295-297):
    segments accumulate until the threshold, then ONE merge collapses them
    all; queries are identical before and after; below-threshold calls are
    no-ops."""
    idxp = str(tmp_path / "lsm_idx")
    for s in range(3):
        seg = build_index(
            load_corpus(spark.createDataFrame(_rows(10 * s, 10 * s + 10), SCHEMA)),
            analyzer="porter",
            block_span=8,
        )
        write_segment(seg, idxp, str(s))
        seg.unpersist()
    assert num_segments(spark, idxp) == 3

    # below threshold → no-op
    assert maybe_compact(spark, idxp, threshold=4, block_span=8) is False
    assert num_segments(spark, idxp) == 3

    before = read_segmented_index(spark, idxp, block_span=8)
    hits_before = [r["docid"] for r in search_and(before, ["alpha", "word1"]).collect()]
    rows_before = before.postings.count()

    # at threshold → merge-all + swap
    assert maybe_compact(spark, idxp, threshold=3, block_span=8) is True
    assert num_segments(spark, idxp) == 1
    after = read_segmented_index(spark, idxp, block_span=8)
    assert after.n_docs == 30
    hits_after = [r["docid"] for r in search_and(after, ["alpha", "word1"]).collect()]
    assert hits_after == hits_before
    assert after.postings.count() <= rows_before
    # idempotent: one segment stays one segment
    assert maybe_compact(spark, idxp, threshold=3, block_span=8) is False


def test_compaction_replay_safety(spark, tmp_path):
    """A micro-batch replayed AFTER a compaction folded its segment must
    not duplicate its documents (stream died between maybe_compact and the
    batch commit): write_segment refuses ids in the current snapshot's
    folded list, and the read path sees ONLY snapshot-committed segments —
    a straggler dir force-written around the protocol is invisible.
    Successive compactions union their folded lists."""
    from mini_search_engine_spark.streaming.ingest import folded_seg_ids, live_seg_ids

    idxp = str(tmp_path / "replay_idx")
    segs = {}
    for s in range(3):
        seg = build_index(
            load_corpus(spark.createDataFrame(_rows(10 * s, 10 * s + 10), SCHEMA)),
            analyzer="porter",
            block_span=8,
        )
        assert write_segment(seg, idxp, str(s)) is True
        segs[s] = seg
    assert maybe_compact(spark, idxp, threshold=3, block_span=8) is True
    assert folded_seg_ids(spark, idxp) == {"0", "1", "2"}

    # replayed batch 2: the write is a no-op and the index is unchanged
    assert write_segment(segs[2], idxp, "2") is False
    idx = read_segmented_index(spark, idxp, block_span=8)
    assert idx.n_docs == 30 and idx.doclens.count() == 30

    # a straggler dir force-written around the check (pre-fix writer /
    # partial replay) is invisible to the read path and the seg count
    base = f"{idxp}/segments/seg=1"
    segs[1].postings.write.mode("overwrite").parquet(f"{base}/postings")
    segs[1].doclens.write.mode("overwrite").parquet(f"{base}/doclens")
    segs[1].termstats.write.mode("overwrite").parquet(f"{base}/termstats")
    (live_one,) = live_seg_ids(spark, idxp)
    assert live_one.startswith("compact-")
    assert num_segments(spark, idxp) == 1
    idx2 = read_segmented_index(spark, idxp, block_span=8)
    assert idx2.n_docs == 30 and idx2.doclens.count() == 30

    # second-generation compaction: new batches fold in and the manifest
    # accumulates, so EVERY historical batch id stays replay-protected
    for s in (3, 4):
        seg = build_index(
            load_corpus(spark.createDataFrame(_rows(10 * s, 10 * s + 10), SCHEMA)),
            analyzer="porter",
            block_span=8,
        )
        assert write_segment(seg, idxp, str(s)) is True
        segs[s] = seg
    assert maybe_compact(spark, idxp, threshold=3, block_span=8) is True
    assert folded_seg_ids(spark, idxp) == {"0", "1", "2", "3", "4"}
    assert write_segment(segs[0], idxp, "0") is False
    idx3 = read_segmented_index(spark, idxp, block_span=8)
    assert idx3.n_docs == 50 and idx3.doclens.count() == 50
    for seg in segs.values():
        seg.unpersist()


def test_windowed_event_counts_batch_parity(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = windowed_event_counts(ev, window="1 hour")
    exp = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )
    g = {(r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6)) for r in got.collect()}
    e = {(r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6)) for r in exp.collect()}
    assert g == e


def test_windowed_event_counts_streaming(spark, tmp_path, sf_dir):
    # run the same agg as an availableNow stream over the events parquet
    ev_batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    schema = ev_batch.schema
    stream = spark.readStream.schema(schema).parquet(f"{sf_dir}")
    # restrict to events.parquet via pathGlobFilter
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_win")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode emits only windows older than the watermark; at least the
    # early windows must match the batch computation
    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.sql("select * from ev_win").collect()
    }
    exp_df = windowed_event_counts(ev_batch, window="1 hour")
    exp = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in exp_df.collect()
    }
    assert got, "streaming produced no closed windows"
    for k, v in got.items():
        assert exp[k] == v


def test_streaming_exact_dedup_stateful(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: a doc whose content hash
    appeared in ANY earlier micro-batch is dropped; state survives a query
    restart via the checkpoint."""
    from mini_search_engine_spark.streaming import streaming_exact_dedup

    inp = str(tmp_path / "dedup_in")
    outp = str(tmp_path / "dedup_out")
    cp = str(tmp_path / "dedup_ck")

    def content(i):
        return f"unique content number {i} with words"

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(inp)
        docs = load_corpus(stream)
        q = (
            streaming_exact_dedup(docs)
            .writeStream.format("parquet")
            .option("path", outp)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: 10 docs, all distinct contents
    rows1 = [(i, content(i), "en", "t", 0) for i in range(10)]
    spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    run_once()

    # batch 2 (new query run, restored state): 10-14 duplicate batch-1
    # contents, 15-19 are new
    rows2 = [(i, content(i - 10), "en", "t", 0) for i in range(10, 15)] + [
        (i, content(i), "en", "t", 0) for i in range(15, 20)
    ]
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    run_once()

    kept = sorted(r["docid"] for r in spark.read.parquet(outp).collect())
    assert kept == list(range(10)) + list(range(15, 20))


def test_snapshot_commit_protocol(spark, tmp_path):
    """streaming/snapshots.py: a segment data dir is INVISIBLE until the
    atomic snapshot-file commit references it (crash between data write
    and commit leaves the previous snapshot current); a torn snapshot
    file (no terminator / invalid JSON) is skipped; gc sweeps
    unreferenced dirs while retaining the files of the newest snapshots;
    parent ids record lineage."""
    from mini_search_engine_spark.streaming import (
        current_snapshot,
        gc,
        list_snapshot_ids,
        read_snapshot,
    )
    from mini_search_engine_spark.streaming.ingest import live_seg_ids

    idxp = str(tmp_path / "snap_idx")
    segs = []
    for s in range(2):
        seg = build_index(
            load_corpus(spark.createDataFrame(_rows(10 * s, 10 * s + 10), SCHEMA)),
            analyzer="porter",
            block_span=8,
        )
        assert write_segment(seg, idxp, str(s)) is True
        segs.append(seg)
    snap = current_snapshot(spark, idxp)
    assert snap.snapshot_id == 1 and snap.parent == 0
    assert snap.segments == ["0", "1"]

    # crashed writer: data dir written, commit never happened → invisible
    orphan = build_index(
        load_corpus(spark.createDataFrame(_rows(20, 30), SCHEMA)),
        analyzer="porter",
        block_span=8,
    )
    base = f"{idxp}/segments/seg=99"
    orphan.postings.write.mode("overwrite").parquet(f"{base}/postings")
    orphan.doclens.write.mode("overwrite").parquet(f"{base}/doclens")
    orphan.termstats.write.mode("overwrite").parquet(f"{base}/termstats")
    segs.append(orphan)
    assert live_seg_ids(spark, idxp) == ["0", "1"]
    assert read_segmented_index(spark, idxp, block_span=8).n_docs == 20

    # torn snapshot (truncated write, never renamed complete) is skipped
    with open(f"{idxp}/segments_meta/snap-7.json", "w") as f:
        f.write('{"snapshot_id": 7, "segments": ["99"]')  # invalid JSON
    assert 7 in list_snapshot_ids(spark, idxp)
    assert current_snapshot(spark, idxp).snapshot_id == 1
    assert read_snapshot(spark, idxp, 7) is None

    # gc: unreferenced data dir swept, newest snapshots' files retained
    deleted = gc(spark, idxp, retain_snapshots=2)
    assert "seg=99" in deleted
    assert read_segmented_index(spark, idxp, block_span=8).n_docs == 20
    assert current_snapshot(spark, idxp).snapshot_id == 1
    for s in segs:
        s.unpersist()


def test_session_event_counts_matches_sessionize(spark, sf_dir):
    """Native session_window (streaming op) and the batch lag/running-sum
    sessionize must carve IDENTICAL sessions on real event data: same
    per-user session count, and each session's [min ts, max ts + gap)
    equals the window bounds."""
    from mini_search_engine_spark.ops import sessionize
    from mini_search_engine_spark.streaming import session_event_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = {
        (r["user_id"], r["session_start"]): (
            r["session_end"], r["n_events"], r["n_types"],
        )
        for r in session_event_counts(ev, gap="30 minutes").collect()
    }
    exp_rows = (
        sessionize(ev, gap_minutes=30.0)
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("start"),
            F.max("ts").alias("mx"),
            F.count("*").alias("n"),
            F.count_distinct("event_type").alias("t"),
        )
        .collect()
    )
    from datetime import timedelta

    exp = {
        (r["user_id"], r["start"]): (r["mx"] + timedelta(minutes=30), r["n"], r["t"])
        for r in exp_rows
    }
    assert got == exp and len(got) > 20


def test_session_event_counts_streaming(spark, tmp_path, sf_dir):
    from mini_search_engine_spark.streaming import session_event_counts

    ev_batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    stream = (
        spark.readStream.schema(ev_batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = session_event_counts(stream, gap="30 minutes", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("ev_sess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["n_types"])
        for r in spark.sql("select * from ev_sess").collect()
    }
    exp = {
        (r["user_id"], r["session_start"]): (r["session_end"], r["n_events"], r["n_types"])
        for r in session_event_counts(ev_batch, gap="30 minutes").collect()
    }
    # append mode emits only watermark-closed sessions; every emitted
    # session must match the batch computation exactly
    assert got, "streaming produced no closed sessions"
    for k, v in got.items():
        assert exp[k] == v


def test_percolate_stream_alerts(spark, tmp_path):
    from mini_search_engine_spark.search import percolate
    from mini_search_engine_spark.streaming.ingest import percolate_stream

    inp = str(tmp_path / "perc_in")
    alerts = str(tmp_path / "alerts")
    queries = spark.createDataFrame(
        [(1, "alpha word1"), (2, "word2"), (3, "nomatch")], "qid long, query string"
    )
    spark.createDataFrame(_rows(0, 12), SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    q = percolate_stream(spark, inp, SCHEMA, queries, alerts, analyzer="porter")
    q.awaitTermination(120)

    got = {
        (r["docid"], r["qid"])
        for r in spark.read.parquet(alerts).select("docid", "qid").collect()
    }
    exp_df = percolate(
        load_corpus(spark.createDataFrame(_rows(0, 12), SCHEMA)), queries, analyzer="porter"
    )
    exp = {(r["docid"], r["qid"]) for r in exp_df.collect()}
    assert got == exp and exp  # batch parity, non-empty
    assert all(qid != 3 for _, qid in got)

    # checkpointed resume: only NEW docs percolate on the second run
    spark.createDataFrame(_rows(12, 16), SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    q2 = percolate_stream(spark, inp, SCHEMA, queries, alerts, analyzer="porter")
    q2.awaitTermination(120)
    alerts_df = spark.read.parquet(alerts)
    # no duplicate (docid, qid) rows — batch 0 was not replayed
    assert alerts_df.count() == alerts_df.select("docid", "qid").distinct().count()
    assert alerts_df.filter("docid >= 12").count() > 0


def test_commit_snapshot_rebases_concurrent_deltas(spark, tmp_path):
    """An ingest-style commit planned from snapshot S must not revert a
    tombstone committed between its read of S and its own commit (ADVICE
    r4): with ``base=S`` the commit is a DELTA rebased onto the current
    snapshot, so BOTH the new segment and the new delete file survive."""
    from mini_search_engine_spark.streaming import commit_snapshot, current_snapshot

    p = str(tmp_path / "snap_rebase")
    s0 = commit_snapshot(spark, p, segments=["a"])

    # committer 1 (delete_docs-style), planned from s0, lands first
    s1 = commit_snapshot(spark, p, segments=["a"], deletes=["d1"], base=s0)
    assert s1.deletes == ["d1"]

    # committer 2 (write_segment-style), ALSO planned from s0 — its stale
    # payload carries no tombstones; the rebase must keep d1 anyway
    s2 = commit_snapshot(spark, p, segments=["a", "b"], base=s0)
    assert sorted(s2.segments) == ["a", "b"]
    assert s2.deletes == ["d1"]
    assert current_snapshot(spark, p).snapshot_id == s2.snapshot_id

    # compaction planned from s0 (folds 'a', purges nothing it didn't see):
    # rebased, it must keep segment 'b' and tombstone d1 it never saw
    s3 = commit_snapshot(spark, p, segments=["c"], folded=["a"], base=s0)
    assert sorted(s3.segments) == ["b", "c"]
    assert s3.folded == ["a"] and s3.deletes == ["d1"]


def test_commit_snapshot_conflicting_removals_raise(spark, tmp_path):
    """Two compactions racing over the same input segments: the loser's
    removal set no longer applies and must surface as a conflict, never a
    silent overwrite."""
    from mini_search_engine_spark.streaming import (
        CommitConflictError,
        commit_snapshot,
    )

    p = str(tmp_path / "snap_conflict")
    s0 = commit_snapshot(spark, p, segments=["a", "b"])
    # compaction 1 wins: folds a+b into c1
    commit_snapshot(spark, p, segments=["c1"], folded=["a", "b"], base=s0)
    # compaction 2, planned from s0, tries to fold the same inputs
    with pytest.raises(CommitConflictError):
        commit_snapshot(spark, p, segments=["c2"], folded=["a", "b"], base=s0)


def test_incremental_dedup_stream(spark, tmp_path):
    """Continuous incremental near-dedup: per-batch flags land under
    batch_id dirs, survivors' bands append to the store so LATER batches
    dedup against them, and checkpoint resume skips processed batches."""
    from mini_search_engine_spark.ops import write_minhash_store
    from mini_search_engine_spark.streaming import incremental_dedup_stream

    def rows(lo, hi):
        # content keyed by i % 8 with FULLY residue-distinct token streams
        # (no shared shingles — near-identical texts would legitimately LSH-
        # collide across residues); base covers residues 0-5, so residues
        # 6/7 first appear in the stream (their first carriers must survive)
        return [
            (i, " ".join(f"tok{k}r{i % 8}" for k in range(10)), "en", "t", 0)
            for i in range(lo, hi)
        ]

    inp = str(tmp_path / "dd_in")
    store = str(tmp_path / "dd_store")
    flags = str(tmp_path / "dd_flags")
    write_minhash_store(
        load_corpus(spark.createDataFrame(rows(0, 6), SCHEMA)), store
    )
    # two files -> two micro-batches at maxFilesPerTrigger=1
    spark.createDataFrame(rows(6, 13), SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    spark.createDataFrame(rows(13, 20), SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    q = incremental_dedup_stream(
        spark, inp, SCHEMA, store, flags, max_files_per_trigger=1
    )
    q.awaitTermination(120)

    got = {
        r["docid"]: r["is_dup"]
        for r in spark.read.parquet(flags).collect()
    }
    # every streamed doc verdicted exactly once; survivors = first carriers
    # of residues 6 (docid 6) and 7 (docid 7); everything else duplicates
    # the base corpus or an earlier survivor
    assert got == {i: (0 if i in (6, 7) else 1) for i in range(6, 20)}
    # docids 14/15 (residues 6/7, SECOND batch) prove the cross-batch store
    # append: they can only be dups via batch-1 survivors 6/7
    flagged = {
        r["docid"]: r["store_match"]
        for r in spark.read.parquet(flags).collect()
    }
    assert flagged[14] == 6 and flagged[15] == 7

    # checkpoint resume: a third file, rerun — old batches not reprocessed
    spark.createDataFrame(rows(20, 24), SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    q2 = incremental_dedup_stream(
        spark, inp, SCHEMA, store, flags, max_files_per_trigger=1
    )
    q2.awaitTermination(120)
    all_flags = spark.read.parquet(flags)
    assert all_flags.count() == 18  # 14 + 4, no replays
    assert all_flags.filter("docid >= 20 AND is_dup = 0").count() == 0


def test_incremental_dedup_stream_auto_compact(spark, tmp_path):
    """compact_every folds the store's batch partitions inside the stream:
    verdicts identical to the non-compacting run, store rows preserved,
    partition count collapsed to ONE negative folded id (which a future
    append's positive batch id can never clobber)."""
    import os

    from mini_search_engine_spark.ops import (
        read_minhash_store,
        write_minhash_store,
    )
    from mini_search_engine_spark.streaming import incremental_dedup_stream

    def rows(lo, hi):
        return [
            (i, " ".join(f"tok{k}r{i % 8}" for k in range(10)), "en", "t", 0)
            for i in range(lo, hi)
        ]

    inp = str(tmp_path / "cc_in")
    store = str(tmp_path / "cc_store")
    flags = str(tmp_path / "cc_flags")
    write_minhash_store(
        load_corpus(spark.createDataFrame(rows(0, 6), SCHEMA)), store
    )
    spark.createDataFrame(rows(6, 13), SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    spark.createDataFrame(rows(13, 20), SCHEMA).coalesce(1).write.mode("append").parquet(inp)
    q = incremental_dedup_stream(
        spark, inp, SCHEMA, store, flags, max_files_per_trigger=1,
        compact_every=1,
    )
    q.awaitTermination(120)

    got = {
        r["docid"]: r["is_dup"] for r in spark.read.parquet(flags).collect()
    }
    assert got == {i: (0 if i in (6, 7) else 1) for i in range(6, 20)}
    # the store folded after every batch: exactly one (negative) partition
    parts = sorted(d for d in os.listdir(store) if d.startswith("batch="))
    assert len(parts) == 1 and int(parts[0][len("batch="):]) < 0
    # folded store still carries base + both batches' survivors
    docids = {
        r["docid"] for r in read_minhash_store(spark, store).select("docid").distinct().collect()
    }
    assert docids == set(range(0, 8))  # base 0-5 + survivors 6, 7
