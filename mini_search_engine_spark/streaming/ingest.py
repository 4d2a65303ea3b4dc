"""Incremental index ingestion via Structured Streaming.

The reference's only incremental behavior is ``addDocument`` + auto-``flush``
at 1000 docs and merge at 8 segments (``InvertedIndexManager.java:44,52``)
— an LSM pattern. The Spark-native analog: a file-source stream of new
corpus files, ``foreachBatch`` building one index SEGMENT per micro-batch
(``Trigger.AvailableNow`` for catch-up runs), and a compaction job that
re-blocks segments (≅ ``mergeAllSegments``).

Because docids are globally unique and postings blocks are docid-range
aligned, a segmented index (multiple (term, block) rows across segments)
is ALREADY correct for every query operator — the aggregations sum across
rows. Compaction is purely a read-amplification optimization, exactly like
the reference's merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import json

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import (
    DEFAULT_BLOCK_SPAN,
    InvertedIndex,
    build_index,
    _hadoop_fs,
    _read_sidecar,
    _write_sidecar,
)
from mini_search_engine_spark.index.merge import merge_segments

# reference: InvertedIndexManager.java:52 — auto-merge all segments when
# the segment count reaches this
DEFAULT_MERGE_THRESHOLD = 8

# name of the compacted segment and of the manifest recording which batch
# segment ids were folded into it (replay-safety: a restarted stream that
# replays an uncommitted micro-batch must not resurrect a segment whose
# documents already live inside seg=compact)
COMPACT_SEG = "compact"
FOLDED_MANIFEST = "_folded.json"


def ingest_stream(
    spark: SparkSession,
    input_path: str,
    index_path: str,
    schema: str,
    analyzer: str = "porter",
    positional: bool = False,
    block_span: int = DEFAULT_BLOCK_SPAN,
    available_now: bool = True,
    auto_compact: bool = False,
    merge_threshold: int = DEFAULT_MERGE_THRESHOLD,
):
    """Stream corpus files from ``input_path`` into per-batch index segments.

    Returns the StreamingQuery; call ``.awaitTermination()``. Checkpointed —
    a killed run resumes from the last committed micro-batch (this is the
    streaming counterpart of lineage-based batch resume).

    ``auto_compact=True`` reproduces the reference's inline policy: after
    each committed segment, merge ALL segments once the count reaches
    DEFAULT_MERGE_THRESHOLD (``InvertedIndexManager.java:295-297`` blocks
    addDocument the same way). Default off — a production stream keeps
    triggers short and runs ``maybe_compact`` as a separate maintenance
    job against the same segment root.
    """

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs = load_corpus(batch_df)
        # fused shuffle-free segment build: a micro-batch is small and its
        # (term, block) split rows union into the segmented index like any
        # other segment — no exchange per trigger
        idx = build_index(
            docs,
            analyzer=analyzer,
            positional=positional,
            block_span=block_span,
            local_blocks=(analyzer == "porter"),
        )
        wrote = write_segment(idx, index_path, str(batch_id))
        idx.unpersist()
        if not wrote:
            # replayed batch whose segment a past compaction already folded
            # into seg=compact — committing the no-op batch is the fix
            return
        if auto_compact:
            maybe_compact(
                spark,
                index_path,
                threshold=merge_threshold,
                analyzer=analyzer,
                positional=positional,
                block_span=block_span,
            )

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(input_path)
    )
    writer = (
        reader.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", f"{index_path}/_checkpoint")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def write_segment(idx: InvertedIndex, index_path: str, seg_id: str) -> bool:
    """Persist one index segment (postings + doclens + the segment's
    (term, tid, df) dictionary sidecar — postings are tid-encoded).

    Replay-safe: if ``seg_id`` is recorded in the compacted segment's
    folded manifest, its documents already live inside ``seg=compact`` —
    a replayed micro-batch (stream died after compaction but before the
    batch committed) is a no-op. Returns True iff the segment was written.
    """
    spark = idx.postings.sparkSession
    if seg_id in folded_seg_ids(spark, index_path):
        return False
    base = f"{index_path}/segments/seg={seg_id}"
    idx.postings.write.mode("overwrite").parquet(f"{base}/postings")
    idx.doclens.write.mode("overwrite").parquet(f"{base}/doclens")
    idx.termstats.write.mode("overwrite").parquet(f"{base}/termstats")
    return True


def folded_seg_ids(spark: SparkSession, index_path: str) -> set[str]:
    """Segment ids already folded into ``seg=compact`` by a past compaction
    (read from the manifest the compaction wrote INSIDE the compacted
    segment, so manifest and data swap in/out atomically together)."""
    text = _read_sidecar(
        spark, f"{index_path}/segments/seg={COMPACT_SEG}/{FOLDED_MANIFEST}"
    )
    return set(json.loads(text)["folded"]) if text else set()


def live_seg_ids(spark: SparkSession, index_path: str) -> list[str]:
    """Ids of on-disk segments that are part of the live index: every
    ``seg=<id>`` directory except ones the folded manifest marks as already
    merged into ``seg=compact`` (such a directory can only exist if a
    replayed batch rewrote it before write_segment grew the manifest check
    — its documents are duplicates of rows in the compacted segment)."""
    fs, path = _hadoop_fs(spark, f"{index_path}/segments")
    if not fs.exists(path):
        return []
    folded = folded_seg_ids(spark, index_path)
    return sorted(
        name[len("seg="):]
        for st in fs.listStatus(path)
        if st.isDirectory()
        and (name := st.getPath().getName()).startswith("seg=")
        and name[len("seg="):] not in folded
    )


def num_segments(spark: SparkSession, index_path: str) -> int:
    """Count committed live on-disk segments (folded stragglers excluded)."""
    return len(live_seg_ids(spark, index_path))


def maybe_compact(
    spark: SparkSession,
    index_path: str,
    threshold: int = DEFAULT_MERGE_THRESHOLD,
    analyzer: str = "porter",
    positional: bool = False,
    block_span: int = DEFAULT_BLOCK_SPAN,
) -> bool:
    """Reference LSM merge policy: when the number of committed segments
    reaches ``threshold``, merge ALL of them into one segment
    (``InvertedIndexManager.java:52,295-297`` — auto ``mergeAllSegments``
    at DEFAULT_MERGE_THRESHOLD=8). Returns True iff a compaction ran.

    The merged segment set is written COMPLETE to a sibling root first,
    then swapped in by directory rename and the old set deleted — the
    Spark analog of the reference's rename-swap (``:413-431``), under the
    same single-writer assumption its in-place pairwise merge makes.
    Globally-unique docids mean no rebase is needed; compaction is purely
    read-amplification control (fewer (term, block) rows per key).

    Replay-safety (checkpointed streams): the ids of every folded batch
    segment — plus any ids an earlier compaction already folded — are
    written to ``seg=compact/_folded.json`` INSIDE the compacted segment
    before the swap. ``write_segment`` refuses to rewrite a folded id and
    ``read_segmented_index`` skips folded straggler directories, so a
    micro-batch replayed after an inline compaction cannot duplicate its
    documents in both ``seg=compact`` and ``seg=<batch_id>``.

    Every rename is checked: a failed rename aborts the swap with the OLD
    segment set still live (and restores it if the first rename already
    moved it aside); the trash copy is deleted only after the new live
    directory verifiably exists."""
    seg_ids = live_seg_ids(spark, index_path)
    if len(seg_ids) < max(threshold, 2):
        return False
    merged = compact_segments(
        read_segmented_index(
            spark,
            index_path,
            analyzer=analyzer,
            positional=positional,
            block_span=block_span,
        )
    )
    tmp_root = f"{index_path}/segments_compacting"
    fs, tmp = _hadoop_fs(spark, tmp_root)
    fs.delete(tmp, True)  # stale aborted attempt must not nest under new writes
    base = f"{tmp_root}/seg={COMPACT_SEG}"
    merged.postings.write.mode("overwrite").parquet(f"{base}/postings")
    merged.doclens.write.mode("overwrite").parquet(f"{base}/doclens")
    merged.termstats.write.mode("overwrite").parquet(f"{base}/termstats")
    # manifest travels inside the compacted segment: swap-in is atomic with
    # the data, and a crashed swap leaves no manifest pointing at live data
    folded = sorted(
        (set(seg_ids) - {COMPACT_SEG}) | folded_seg_ids(spark, index_path)
    )
    _write_sidecar(
        spark, f"{base}/{FOLDED_MANIFEST}", json.dumps({"folded": folded}), "overwrite"
    )

    _, live = _hadoop_fs(spark, f"{index_path}/segments")
    _, trash = _hadoop_fs(spark, f"{index_path}/segments_old")
    fs.delete(trash, True)
    if not fs.rename(live, trash):
        # abort: old set untouched and still live; drop the staged output
        fs.delete(tmp, True)
        raise IOError(f"compaction aborted: rename {live} -> {trash} failed")
    if not fs.rename(tmp, live):
        # restore the old set so the index stays queryable, then abort
        restored = fs.rename(trash, live)
        fs.delete(tmp, True)
        raise IOError(
            f"compaction aborted: rename {tmp} -> {live} failed"
            + ("" if restored else f"; RESTORE ALSO FAILED, data in {trash}")
        )
    if not fs.exists(live):
        raise IOError(f"compaction swap left no live segments dir at {live}")
    fs.delete(trash, True)
    return True


def read_segmented_index(
    spark: SparkSession,
    index_path: str,
    analyzer: str = "porter",
    positional: bool = False,
    block_span: int = DEFAULT_BLOCK_SPAN,
) -> InvertedIndex:
    """Assemble a queryable index over all committed LIVE segments.

    Segment dirs are enumerated explicitly (not a ``seg=*`` glob) so a
    folded straggler — a batch segment a replayed stream rewrote after its
    documents were compacted into ``seg=compact`` — is never read twice."""
    segs = live_seg_ids(spark, index_path)
    if not segs:
        raise FileNotFoundError(f"no live segments under {index_path}/segments")
    seg_bases = [f"{index_path}/segments/seg={s}" for s in segs]
    postings = spark.read.parquet(*[f"{b}/postings" for b in seg_bases])
    doclens = spark.read.parquet(*[f"{b}/doclens" for b in seg_bases])
    # per-segment dfs sum (docids are globally unique across segments);
    # hashed tids agree across independently built segments by construction
    termstats = (
        spark.read.parquet(*[f"{b}/termstats" for b in seg_bases])
        .groupBy("tid")
        .agg(F.sum("df").cast("long").alias("df"), F.min("term").alias("term"))
        .select("term", "tid", "df")
    )
    stats = doclens.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    return InvertedIndex(
        postings=postings,
        doclens=doclens,
        termstats=termstats,
        n_docs=int(stats["n"]),
        avgdl=float(stats["avgdl"] or 0.0),
        analyzer=analyzer,
        block_span=block_span,
        positional=positional,
        compressed=False,
    )


def compact_segments(index: InvertedIndex) -> InvertedIndex:
    """Merge a segmented index into single (term, block) rows (≅ mergeAllSegments)."""
    return merge_segments([index])


def streaming_exact_dedup(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Custom STATEFUL streaming operator: cross-batch exact deduplication.

    Keeps only the FIRST document ever seen per content hash — documents
    whose sha256 appeared in any earlier micro-batch (or elsewhere in the
    same batch; lowest docid wins) are dropped. Grouping key = the sha
    itself via ``applyInPandasWithState``: state is a single boolean per
    distinct hash (O(1) rows per key, the shape RocksDB-backed state
    stores scale to), per-trigger group count is bounded by the batch's
    distinct hashes, and the in-batch winner is deterministic (min docid).

    The training-data-pipeline use: continuous ingest where an exact
    duplicate of ANYTHING seen before must not enter the corpus. Batch
    oracle: ``ops.exact_dedup`` canonical docids. Works only on streaming
    DataFrames; for batch frames use ``exact_dedup``.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keyed = docs.withColumn("sha", F.sha2(F.col(content_col), 256))
    out_schema = keyed.schema
    state_schema = "seen boolean"

    def dedup_group(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            return  # hash seen in an earlier batch — drop all rows
        first = None
        for pdf in pdfs:
            cand = pdf.sort_values("docid").head(1)
            if first is None or cand["docid"].iloc[0] < first["docid"].iloc[0]:
                first = cand
        if first is not None:
            state.update((True,))
            yield first

    return keyed.groupBy("sha").applyInPandasWithState(
        dedup_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream —
    handles late data up to the watermark; works on both batch and
    streaming DataFrames."""
    src = events
    if events.isStreaming:
        # watermarks require TIMESTAMP (not NTZ) event time
        src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
