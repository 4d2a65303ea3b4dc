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
years of corpus), so every batch↔store comparison BROADCASTS a batch-bounded
build side and STREAMS the store exactly once:

    hits  = store ⋈_BroadcastHashJoin broadcast(batch bucket keys)
    m12   = two smallest distinct store docids per bucket
            (dense_rank≤2 window — WindowGroupLimit prunes map-side, so the
            exchange is O(touched buckets), independent of bucket heat)
    flags = batch bands ⋈ broadcast(m12), then min per doc

The store is never shuffled globally, never sorted, never collected, and —
critically — store and batch docids are never PAIRED inside a bucket: every
per-bucket reduction happens before batch docids enter the plan, so a hot
boilerplate bucket costs a count, not a cross product. Appending a deduped
batch's signatures is a partitioned parquet append — no rewrite of existing
store files.

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
    n_bands rows/doc of (docid, band, band_key)): it has THREE consumers —
    the touched-bucket distinct, the per-bucket store-min join, and the
    within-batch bucket-min window — which share no exchange, so without
    the cache the whole shingle→minhash signature pipeline (the dominant
    CPU cost) runs three times. Freed by Spark's ContextCleaner with the
    frame.

    r5 hot-bucket fix: the store probe used to join the store against the
    batch's full (docid, band, band_key) table and aggregate the COLLISION
    PAIRS — an O(store_bucket × batch_bucket) pair enumeration inside every
    bucket, the exact degeneracy ``minhash_pairs`` guards with
    ``max_bucket``. On a dup-heavy corpus that explodes (measured: 6M store
    rows × 2M batch rows → 1.17e9 joined rows at 1M docs, 2→8 scaling 0.51
    on the probe half — straggler-bound by the hottest buckets; a 100 TB
    boilerplate cluster would be catastrophically worse). The probe now
    aggregates BEFORE batch docids enter: (1) the store semi-joins the
    batch's docid-free bucket set, (2) the two smallest DISTINCT store
    docids per bucket come from a dense_rank≤2 window — Spark's
    WindowGroupLimit prunes each map partition to those rows BEFORE the
    exchange, so the shuffled volume is O(touched buckets × mappers),
    independent of bucket heat (NOTE: WindowGroupLimit is a Spark 3.5+
    optimizer rule gated on spark.sql.optimizer.windowGroupLimitThreshold,
    default on — this env runs 4.1.2; on older Spark or with the rule
    disabled, hot buckets shuffle pre-limit: correctness is unchanged but
    the heat-independence claim needs that rule) — and (3) that
    one-row-per-bucket table
    joins the bands map-side. Two mins (not one) preserve the replay-safety
    guard exactly: after a crash between a streaming batch's store append
    and its checkpoint commit, the replayed batch probes a store holding
    its own survivors, and "min store docid ≠ the doc itself" is m1 unless
    m1 IS the doc, in which case it is the second-distinct m2.

    Broadcast regime: every build side is batch-bounded (touched buckets,
    per-bucket mins, per-doc matches ≤ n_bands rows/doc resp. 1 row/doc) —
    the nightly contract is "one day's batch fits the driver; the store
    never shuffles". The within-batch verdict is a window aggregate over
    ``partitionBy(band, band_key)`` on the bands themselves (one parallel
    batch-sized exchange, no driver-built relation)."""
    from pyspark.sql.window import Window

    bands = minhash_bands(new_docs, num_hashes, band_size, shingle_k, content_col)
    if persist_bands:
        from pyspark import StorageLevel

        bands = bands.persist(StorageLevel.MEMORY_AND_DISK)

    # (1) buckets the batch touches — docid-free, distinct (partial-agg
    # collapses hot buckets map-side before the exchange).
    touched = bands.select("band", "band_key").distinct()
    # (2) store rows in touched buckets: ≤ one output row per store row —
    # the store streams once, no pair fanout. dense_rank ≤ 2 keeps the two
    # smallest DISTINCT docids per bucket (WindowGroupLimit prunes map-side);
    # the agg collapses them to (m1, m2) with m2 NULL for single-doc buckets.
    hits = store_bands.join(F.broadcast(touched), ["band", "band_key"])
    w2 = Window.partitionBy("band", "band_key").orderBy("docid")
    m12 = (
        hits.withColumn("_rk", F.dense_rank().over(w2))
        .filter(F.col("_rk") <= 2)
        .groupBy("band", "band_key")
        .agg(
            F.min("docid").alias("_m1"),
            F.when(F.max("docid") > F.min("docid"), F.max("docid")).alias("_m2"),
        )
    )
    # (3) per new doc: min over its buckets of "smallest store docid that
    # isn't the doc itself" — m1 unless m1 == docid (replay), then m2.
    eff = F.when(F.col("_m1") != F.col("docid"), F.col("_m1")).otherwise(
        F.col("_m2")
    )
    store_match = (
        bands.join(F.broadcast(m12), ["band", "band_key"])
        .select("docid", eff.alias("_eff"))
        .filter(F.col("_eff").isNotNull())
        .groupBy("docid")
        .agg(F.min("_eff").alias("store_match"))
    )

    # within-batch: per-bucket min docid as a WINDOW aggregate on the
    # bands (one parallel batch-sized exchange, no driver-built broadcast
    # relation); a doc is a within-batch dup iff some bucket it sits in
    # has a smaller min — and that min is the smallest batch doc sharing
    # ANY band.
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
