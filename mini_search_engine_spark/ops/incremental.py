"""Incremental (cross-batch) deduplication against a persisted store.

The nightly 100 TB scenario: the corpus on disk is already deduped; a new
crawl batch arrives and must be deduped (a) against the existing corpus and
(b) within itself — WITHOUT rescanning the existing corpus' content or
re-deriving its signatures. Two persisted stores make that possible:

* exact store   — parquet of (sha, canonical_docid), one row per distinct
  content already in the corpus (``exact_dedup`` output).
* minhash store — parquet of (docid, band, band_key) LSH band keys,
  Hive-partitioned by ``(batch, band)`` and band_key-sorted within each
  written file so Parquet row-group min/max stats can skip non-colliding
  key ranges on selective probes. The per-batch partition makes appends
  idempotent (dynamic partition overwrite) — the contract
  ``streaming.incremental_dedup_stream`` relies on for crash-replay.

Scale shape — the batch is small relative to the store (one day's crawl vs
years of corpus), so every batch↔store comparison BROADCASTS the batch side
and STREAMS the store exactly once:

    matched = store ⋈_BroadcastHashJoin broadcast(batch keys)   # tiny output
    flags   = batch ⟕ broadcast(matched aggregates)

The store is never shuffled, never sorted, never collected. The only
Exchanges in the plan move batch-derived rows (signature aggregation and the
collision rows, both ≪ store). Appending a deduped batch's signatures is a
partitioned parquet append — no rewrite of existing store files.

Semantics (mirrors the DuckDB oracle in ``__spark_entry__.py``):
* ``store_match``  = min store docid sharing ≥1 LSH band with the new doc
  (NULL ⇒ no near-dup in the corpus).
* ``batch_match``  = min SMALLER batch docid sharing ≥1 band (NULL ⇒ this
  doc is the canonical representative of its within-batch near-dup group).
* ``is_dup``       = store_match or batch_match present (0/1 int).

Reference parity note: the reference engine (Haixiang6123/mini-search-engine)
has no dedup; this extends the LSH family of ``ops/dedup.py`` to the
incremental regime a production pipeline actually runs nightly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import exact_dedup, minhash_bands

__all__ = [
    "write_minhash_store",
    "append_minhash_store",
    "read_minhash_store",
    "incremental_minhash_flags",
    "write_exact_store",
    "append_exact_store",
    "read_exact_store",
    "incremental_exact_flags",
    "compact_minhash_store",
    "compact_exact_store",
]


# --------------------------------------------------------------------------
# minhash (near-dup) store
# --------------------------------------------------------------------------

def _bands_sorted(docs: DataFrame, num_hashes: int, band_size: int,
                  shingle_k: int, content_col: str) -> DataFrame:
    # sortWithinPartitions (NOT a global sort — no extra shuffle): each
    # task's per-band output file is band_key-ordered, so parquet row-group
    # stats prune selective band_key probes at read time.
    return minhash_bands(
        docs, num_hashes, band_size, shingle_k, content_col
    ).sortWithinPartitions("band", "band_key")


def write_minhash_store(
    docs: DataFrame,
    path: str,
    num_hashes: int = 16,
    band_size: int = 2,
    shingle_k: int = 3,
    content_col: str = "content",
    batch_id: int = 0,
) -> None:
    """Materialize the LSH band store for an already-deduped corpus.

    Layout: Hive-partitioned by ``(batch, band)`` — the initial corpus is
    ``batch=<batch_id>`` (default 0), each later append its own batch
    partition — band_key-sorted within each file so row-group stats prune
    selective probes. One pass over the corpus, no shuffle beyond the
    signature aggregation minhash itself requires."""
    _bands_sorted(docs, num_hashes, band_size, shingle_k, content_col) \
        .withColumn("batch", F.lit(int(batch_id))) \
        .write.mode("overwrite").partitionBy("batch", "band").parquet(path)


def append_minhash_store(
    docs: DataFrame,
    path: str,
    batch_id: int,
    num_hashes: int = 16,
    band_size: int = 2,
    shingle_k: int = 3,
    content_col: str = "content",
) -> None:
    """Append a (deduped) batch's band keys under its own ``batch=<id>``
    partition. Uses DYNAMIC partition overwrite, so re-running the same
    batch_id (a crash-replayed micro-batch) REWRITES that batch's
    partitions instead of appending duplicate rows — the append is
    idempotent per batch_id. Existing batches' files are untouched."""
    (
        _bands_sorted(docs, num_hashes, band_size, shingle_k, content_col)
        .withColumn("batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch", "band")
        .parquet(path)
    )


def read_minhash_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select("docid", "band", "band_key")


def incremental_minhash_flags(
    new_docs: DataFrame,
    store_bands: DataFrame,
    num_hashes: int = 16,
    band_size: int = 2,
    shingle_k: int = 3,
    content_col: str = "content",
    persist_bands: bool = True,
) -> DataFrame:
    """→ (docid, store_match, batch_match, is_dup) for every new doc.

    Plan shape (asserted in tests/test_incremental.py): zero SortMergeJoins;
    the store parquet scan feeds the streamed side of a BroadcastHashJoin
    whose build side is the batch's band keys.

    ``persist_bands`` caches the batch's band table (MEMORY_AND_DISK,
    n_bands rows/doc of (docid, band, band_key)): it has TWO consumers —
    the store probe's broadcast side and the within-batch bucket-min
    window — which share no exchange, so without the cache the whole
    shingle→minhash signature pipeline (the dominant CPU cost) runs
    twice. Freed by Spark's ContextCleaner with the frame.

    r5 serial-fraction fix: the within-batch verdict was a broadcast of
    the per-bucket min table back onto the bands — a batch-bands-sized
    relation (n_bands rows/doc) BUILT SINGLE-THREADED on the driver, a
    serial cost that does not shrink with executor count (measured as the
    bulk of the 0.789 2→8 efficiency gap). It is now a window aggregate
    over ``partitionBy(band, band_key)`` on the bands themselves — one
    parallel batch-sized exchange, no driver-built relation, one fewer
    consumer of the persisted bands. The STORE probe keeps its broadcast:
    that build side is the same batch-sized table, but the alternative
    there would shuffle the (much larger) store, which is the design's
    whole point to avoid."""
    bands = minhash_bands(new_docs, num_hashes, band_size, shingle_k, content_col)
    if persist_bands:
        from pyspark import StorageLevel

        bands = bands.persist(StorageLevel.MEMORY_AND_DISK)

    # store probe: stream the store once against a broadcast of the batch
    # keys; only collision rows (tiny) survive to the aggregation shuffle.
    # The docid != new_docid guard is the replay-safety valve: after a
    # crash between a streaming batch's store append and its checkpoint
    # commit, the replayed batch probes a store that already contains its
    # own survivors — without the guard every survivor would match itself.
    probe = bands.select(F.col("docid").alias("new_docid"), "band", "band_key")
    store_match = (
        store_bands.join(F.broadcast(probe), ["band", "band_key"])
        .filter(F.col("docid") != F.col("new_docid"))
        .groupBy("new_docid")
        .agg(F.min("docid").alias("store_match"))
        .withColumnRenamed("new_docid", "docid")
    )

    # within-batch: per-bucket min docid as a WINDOW aggregate on the
    # bands (one parallel batch-sized exchange, no driver-built broadcast
    # relation); a doc is a within-batch dup iff some bucket it sits in
    # has a smaller min — and that min is the smallest batch doc sharing
    # ANY band.
    from pyspark.sql.window import Window

    wb = Window.partitionBy("band", "band_key")
    batch_match = (
        bands.withColumn("m", F.min("docid").over(wb))
        .filter(F.col("m") < F.col("docid"))
        .groupBy("docid")
        .agg(F.min("m").alias("batch_match"))
    )

    return (
        new_docs.select("docid")
        .join(F.broadcast(store_match), "docid", "left")
        .join(F.broadcast(batch_match), "docid", "left")
        .withColumn(
            "is_dup",
            (F.col("store_match").isNotNull() | F.col("batch_match").isNotNull())
            .cast("int"),
        )
    )


# --------------------------------------------------------------------------
# exact (sha256) store
# --------------------------------------------------------------------------

def write_exact_store(
    docs: DataFrame, path: str, content_col: str = "content", batch_id: int = 0
) -> None:
    """(sha, canonical_docid) per distinct content, sha-sorted within files
    for row-group stat pruning on selective probes. Hive-partitioned by
    ``batch`` exactly like the minhash store — the initial corpus is
    ``batch=<batch_id>``, each later append its own partition."""
    exact_dedup(docs, content_col).select("sha", "canonical_docid") \
        .sortWithinPartitions("sha") \
        .withColumn("batch", F.lit(int(batch_id))) \
        .write.mode("overwrite").partitionBy("batch").parquet(path)


def append_exact_store(
    docs: DataFrame, path: str, batch_id: int, content_col: str = "content"
) -> None:
    """Append a (deduped) batch's shas under its own ``batch=<id>``
    partition with DYNAMIC overwrite — same replay idempotence as
    ``append_minhash_store``: a crash-replayed batch REWRITES its own
    partition instead of appending duplicate (sha, canonical) rows."""
    (
        exact_dedup(docs, content_col).select("sha", "canonical_docid")
        .sortWithinPartitions("sha")
        .withColumn("batch", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(path)
    )


def read_exact_store(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).select("sha", "canonical_docid")


def incremental_exact_flags(
    new_docs: DataFrame,
    store: DataFrame,
    content_col: str = "content",
) -> DataFrame:
    """→ (docid, store_canonical, batch_dup_of, is_dup) for every new doc.

    ``store_canonical``: canonical docid of identical content already in the
    corpus (NULL ⇒ unseen). ``batch_dup_of``: smallest batch docid with the
    same content, when smaller than this one. Same broadcast-probe shape as
    the minhash path: the store streams once, never shuffles. The
    ``canonical_docid != docid`` guard is the same replay-safety valve as
    the minhash path's: a crash-replayed batch probes a store that already
    holds its own survivors — without the guard every survivor would match
    itself and the whole batch would be dropped as dups of itself."""
    batch = new_docs.select("docid", F.sha2(F.col(content_col), 256).alias("sha"))
    probe = batch.select("docid", "sha")
    matched = (
        store.join(F.broadcast(probe), "sha")
        .filter(F.col("canonical_docid") != F.col("docid"))
        .groupBy("docid")
        .agg(F.min("canonical_docid").alias("store_canonical"))
    )
    bmin = batch.groupBy("sha").agg(F.min("docid").alias("batch_canonical"))
    return (
        batch.join(F.broadcast(matched), "docid", "left")
        .join(F.broadcast(bmin), "sha")
        .select(
            "docid",
            "store_canonical",
            F.when(
                F.col("batch_canonical") < F.col("docid"), F.col("batch_canonical")
            ).alias("batch_dup_of"),
            (
                F.col("store_canonical").isNotNull()
                | (F.col("batch_canonical") < F.col("docid"))
            ).cast("int").alias("is_dup"),
        )
    )


# --------------------------------------------------------------------------
# store maintenance: compaction + takedown purge
# --------------------------------------------------------------------------

def _compact_partitioned_store(
    spark: SparkSession,
    path: str,
    cols: list[str],
    part_cols: list[str],
    remove: DataFrame | None,
    remove_on: str,
    sort_col: str,
) -> int:
    """Shared engine for the two stores: stream every live row into a
    STAGING directory's fresh batch partition (the store path cannot be
    both read and overwritten in one Spark job, and truncating lineage to
    allow it would materialize a store-sized frame), rename the staged
    partition dir into the store, THEN delete the superseded batch
    directories. Crash windows: before the rename → an orphan staging dir
    the next compaction overwrites; between rename and deletes →
    duplicate rows across old and new partitions — harmless for every
    consumer (flags aggregate with min over matches; duplicate identical
    rows change no verdict) and cleared by the next compaction. Returns
    the new batch id.

    The folded partition id DESCENDS from -1 (-1, -2, …) while stream /
    nightly appends ascend from 1 (base corpus = 0): a compacted
    partition can therefore never collide with a future
    ``append_*_store(batch_id=...)``, whose dynamic overwrite of
    ``batch=<id>`` would otherwise silently REPLACE the folded store."""
    from mini_search_engine_spark.index.build import _hadoop_fs

    cur = spark.read.parquet(path)
    old_batches = [r["batch"] for r in cur.select("batch").distinct().collect()]
    new_batch = min(0, min(old_batches)) - 1
    live = cur.select(*cols)
    if remove is not None:
        live = live.join(
            F.broadcast(remove.select(F.col(remove.columns[0]).alias(remove_on))),
            on=remove_on,
            how="left_anti",
        )
    stage = path.rstrip("/") + f".compact-{new_batch}"
    (
        live.sortWithinPartitions(sort_col)
        .withColumn("batch", F.lit(int(new_batch)))
        .write.mode("overwrite")
        .partitionBy(*part_cols)
        .parquet(stage)
    )
    fs, _ = _hadoop_fs(spark, path)
    _, staged_part = _hadoop_fs(spark, f"{stage}/batch={new_batch}")
    _, dest_part = _hadoop_fs(spark, f"{path}/batch={new_batch}")
    if not fs.rename(staged_part, dest_part):
        raise IOError(f"store compaction commit failed: rename to {dest_part}")
    _, stage_dir = _hadoop_fs(spark, stage)
    fs.delete(stage_dir, True)  # _SUCCESS remnants
    for b in old_batches:
        _, bdir = _hadoop_fs(spark, f"{path}/batch={b}")
        fs.delete(bdir, True)
    return new_batch


def compact_minhash_store(
    spark: SparkSession,
    path: str,
    remove_docids: DataFrame | None = None,
) -> int:
    """Fold every per-batch partition of the LSH band store into ONE fresh
    batch partition (restoring the band_key file sort appends can't keep),
    optionally dropping ``remove_docids`` rows — the takedown/opt-out path:
    a purged doc must stop matching future batches, else its content
    "ghosts" in dedup verdicts after deletion from the corpus. One read +
    one partitioned write; the store never shuffles to the driver. Run it
    on the nightly cadence appends outpace (same role as index
    ``maybe_compact``). Returns the surviving batch id."""
    return _compact_partitioned_store(
        spark, path,
        cols=["docid", "band", "band_key"],
        part_cols=["batch", "band"],
        remove=remove_docids,
        remove_on="docid",
        sort_col="band_key",
    )


def compact_exact_store(
    spark: SparkSession,
    path: str,
    remove_docids: DataFrame | None = None,
) -> int:
    """Exact-store twin of ``compact_minhash_store``. ``remove_docids``
    drops rows whose CANONICAL doc was taken down; note a takedown of
    content that still exists under other docids should instead re-point
    the sha (delete + ``append_exact_store`` of a surviving holder)."""
    return _compact_partitioned_store(
        spark, path,
        cols=["sha", "canonical_docid"],
        part_cols=["batch"],
        remove=remove_docids,
        remove_on="canonical_docid",
        sort_col="sha",
    )
