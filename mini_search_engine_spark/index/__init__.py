"""Index build, compression, merge, lineage."""

from mini_search_engine_spark.index.build import (
    InvertedIndex,
    tokenize_docs,
    build_index,
    write_index,
    read_index,
)
from mini_search_engine_spark.index.compress import (
    delta_varint_encode,
    delta_varint_decode,
    naive_encode,
    naive_decode,
)

__all__ = [
    "InvertedIndex",
    "tokenize_docs",
    "build_index",
    "write_index",
    "read_index",
    "delta_varint_encode",
    "delta_varint_decode",
    "naive_encode",
    "naive_decode",
]
