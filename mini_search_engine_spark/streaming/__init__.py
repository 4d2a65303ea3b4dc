"""Structured Streaming surfaces: incremental index ingest + event windows.

Segment commits go through the snapshot-file protocol in
``streaming.snapshots`` (atomic single-file metadata commit, immutable
segment dirs — the Iceberg-style replacement for directory rename-swaps
that object stores cannot do atomically)."""

from mini_search_engine_spark.streaming.ingest import (
    DEFAULT_MERGE_THRESHOLD,
    compact_segments,
    delete_docs,
    folded_seg_ids,
    ingest_stream,
    live_seg_ids,
    maybe_compact,
    num_segments,
    read_segmented_index,
    incremental_dedup_stream,
    streaming_exact_dedup,
    session_event_counts,
    upsert_docs,
    windowed_event_counts,
    write_segment,
)
from mini_search_engine_spark.streaming.snapshots import (
    CommitConflictError,
    Snapshot,
    commit_snapshot,
    current_snapshot,
    gc,
    list_snapshot_ids,
    read_snapshot,
)

__all__ = [
    "CommitConflictError",
    "DEFAULT_MERGE_THRESHOLD",
    "Snapshot",
    "commit_snapshot",
    "compact_segments",
    "current_snapshot",
    "delete_docs",
    "folded_seg_ids",
    "gc",
    "ingest_stream",
    "list_snapshot_ids",
    "live_seg_ids",
    "maybe_compact",
    "num_segments",
    "read_segmented_index",
    "read_snapshot",
    "incremental_dedup_stream",
    "streaming_exact_dedup",
    "session_event_counts",
    "upsert_docs",
    "windowed_event_counts",
    "write_segment",
]
