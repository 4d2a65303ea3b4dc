"""Structured Streaming surfaces: incremental index ingest + event windows."""

from mini_search_engine_spark.streaming.ingest import (
    DEFAULT_MERGE_THRESHOLD,
    compact_segments,
    ingest_stream,
    maybe_compact,
    num_segments,
    read_segmented_index,
    streaming_exact_dedup,
    windowed_event_counts,
    write_segment,
)

__all__ = [
    "DEFAULT_MERGE_THRESHOLD",
    "compact_segments",
    "ingest_stream",
    "maybe_compact",
    "num_segments",
    "read_segmented_index",
    "streaming_exact_dedup",
    "windowed_event_counts",
    "write_segment",
]
