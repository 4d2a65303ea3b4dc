"""Document chunking + sequence packing for LLM training pipelines.

Long documents must be split into bounded token windows before
tokenization/training; short chunks are then packed into fixed-size
training sequences. Both ops are designed for the 100 TB regime:

* ``chunk_documents`` is a pure narrow Catalyst transformation — one
  whitespace split, one ``sequence``-generated start list, one explode, no
  shuffle, no Python. Output inflation is exactly
  ``1 + overlap/(chunk_size-overlap)`` per token, known in advance.
* ``pack_sequences`` is the one genuinely stateful op (greedy first-fit is
  a prefix-dependent recurrence no window function expresses), so it runs
  as an Arrow-batched ``applyInPandas`` over deterministic hash-bucket
  groups: the SAME (docid, chunk_id) ordering inside the SAME bucket on
  every run/retry/cluster size ⇒ bit-identical packing regardless of input
  partitioning — the property a resumable training-data job needs.
  Parallelism = ``n_buckets`` (one group per task), state = one open bin.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "docid",
) -> DataFrame:
    """Split each document's whitespace tokens into overlapping windows.

    Window ``i`` covers tokens ``[i*step, i*step + chunk_size)`` with
    ``step = chunk_size - overlap``; starts run while ``start <
    max(n_tokens - overlap, 1)`` so the tail is emitted once (never a
    window fully contained in its predecessor) and a document shorter than
    one window yields exactly one (short) chunk. Zero-token documents
    yield nothing. Returns (id_col, chunk_id, n_tokens, chunk)."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    base = (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .filter(F.col("_n") > 0)
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("_n") - overlap, F.lit(1)) - 1,
        F.lit(step),
    )
    exploded = base.select(id_col, "_toks", F.explode(starts).alias("_start"))
    chunk_toks = F.slice("_toks", F.col("_start") + 1, chunk_size)
    return exploded.select(
        id_col,
        (F.col("_start") / step).cast("long").alias("chunk_id"),
        F.size(chunk_toks).cast("long").alias("n_tokens"),
        F.array_join(chunk_toks, " ").alias("chunk"),
    )


def pack_sequences(
    chunks: DataFrame,
    max_tokens: int = 512,
    n_buckets: int = 256,
    id_col: str = "docid",
) -> DataFrame:
    """Greedy first-fit packing of chunks into training sequences of at
    most ``max_tokens`` tokens, deterministic under any input
    partitioning.

    Chunks are routed to ``pmod(hash64(docid), n_buckets)`` buckets; inside
    a bucket they are sorted by (docid, chunk_id) and packed sequentially:
    a chunk opens a new bin when it would overflow the current one. A
    chunk larger than ``max_tokens`` gets a bin of its own (never split —
    chunking upstream owns size control). Output: one row per packed
    sequence (bucket, seq_id, n_tokens, parts) where parts is the ordered
    array of (docid, chunk_id) — the recipe a loader uses to materialize
    the sequence without shipping chunk text through the packer."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    routed = chunks.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).alias("bucket"),
        F.col(id_col).cast("long").alias("docid"),
        "chunk_id",
        "n_tokens",
    )

    def pack(key, pdf):
        pdf = pdf.sort_values(["docid", "chunk_id"], kind="mergesort")
        seqs = []  # [total_tokens, [part, ...]] per open-order bin
        used = 0
        for d, c, n in zip(pdf["docid"], pdf["chunk_id"], pdf["n_tokens"]):
            n = int(n)
            if not seqs or (used > 0 and used + n > max_tokens):
                seqs.append([0, []])
                used = 0
            used += n
            seqs[-1][0] += n
            seqs[-1][1].append({"docid": int(d), "chunk_id": int(c)})
        return pd.DataFrame(
            {
                "bucket": [int(key[0])] * len(seqs),
                "seq_id": range(len(seqs)),
                "n_tokens": [t for t, _ in seqs],
                "parts": [p for _, p in seqs],
            }
        )

    schema = (
        "bucket long, seq_id long, n_tokens long, "
        "parts array<struct<docid:long, chunk_id:long>>"
    )
    return routed.groupBy("bucket").applyInPandas(pack, schema)
