"""Structured Streaming surfaces: incremental index ingest + event windows."""

from mini_search_engine_spark.streaming.ingest import (
    ingest_stream,
    read_segmented_index,
    compact_segments,
    streaming_exact_dedup,
    windowed_event_counts,
)

__all__ = [
    "ingest_stream",
    "read_segmented_index",
    "compact_segments",
    "streaming_exact_dedup",
    "windowed_event_counts",
]
