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

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import (
    DEFAULT_BLOCK_SPAN,
    InvertedIndex,
    build_index,
)
from mini_search_engine_spark.index.merge import merge_segments

# reference: InvertedIndexManager.java:52 — auto-merge all segments when
# the segment count reaches this
DEFAULT_MERGE_THRESHOLD = 8


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
        write_segment(idx, index_path, str(batch_id))
        idx.unpersist()
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


def write_segment(idx: InvertedIndex, index_path: str, seg_id: str) -> None:
    """Persist one index segment (postings + doclens + the segment's
    (term, tid, df) dictionary sidecar — postings are tid-encoded)."""
    base = f"{index_path}/segments/seg={seg_id}"
    idx.postings.write.mode("overwrite").parquet(f"{base}/postings")
    idx.doclens.write.mode("overwrite").parquet(f"{base}/doclens")
    idx.termstats.write.mode("overwrite").parquet(f"{base}/termstats")


def num_segments(spark: SparkSession, index_path: str) -> int:
    """Count committed on-disk segments."""
    from mini_search_engine_spark.index.build import _hadoop_fs

    fs, path = _hadoop_fs(spark, f"{index_path}/segments")
    if not fs.exists(path):
        return 0
    return sum(
        1
        for st in fs.listStatus(path)
        if st.isDirectory() and st.getPath().getName().startswith("seg=")
    )


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
    read-amplification control (fewer (term, block) rows per key)."""
    from mini_search_engine_spark.index.build import _hadoop_fs

    n = num_segments(spark, index_path)
    if n < max(threshold, 2):
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
    base = f"{tmp_root}/seg=compact/"
    merged.postings.write.mode("overwrite").parquet(f"{base}/postings")
    merged.doclens.write.mode("overwrite").parquet(f"{base}/doclens")
    merged.termstats.write.mode("overwrite").parquet(f"{base}/termstats")

    fs, live = _hadoop_fs(spark, f"{index_path}/segments")
    _, tmp = _hadoop_fs(spark, tmp_root)
    _, trash = _hadoop_fs(spark, f"{index_path}/segments_old")
    fs.delete(trash, True)
    fs.rename(live, trash)
    fs.rename(tmp, live)
    fs.delete(trash, True)
    return True


def read_segmented_index(
    spark: SparkSession,
    index_path: str,
    analyzer: str = "porter",
    positional: bool = False,
    block_span: int = DEFAULT_BLOCK_SPAN,
) -> InvertedIndex:
    """Assemble a queryable index over all committed segments."""
    postings = spark.read.parquet(f"{index_path}/segments/seg=*/postings")
    doclens = spark.read.parquet(f"{index_path}/segments/seg=*/doclens")
    # per-segment dfs sum (docids are globally unique across segments);
    # hashed tids agree across independently built segments by construction
    termstats = (
        spark.read.parquet(f"{index_path}/segments/seg=*/termstats")
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
