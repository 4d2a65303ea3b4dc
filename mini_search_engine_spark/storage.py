"""Bucketed doc-store layout — co-located joins without a shuffle.

At serving time every result page pays a hydration join (top-k docids →
content/metadata), and at build time doc-keyed frames join each other
(corpus ⋈ doclens, corpus ⋈ per-doc quality/dedup verdicts). On a plain
parquet layout each of those is a full shuffle of the BIG side. Spark's
native bucketing (`bucketBy` + `saveAsTable`) persists the hash
partitioning INTO the table layout: two tables bucketed by the same key
into the same bucket count join bucket-to-bucket — the physical plan has
NO Exchange on either side (asserted in pytest), which at 100 TB is the
difference between a metadata-local merge and re-shuffling the corpus
for every enrichment pass.

Contract notes: bucket files are also ``sortBy(key)``-ordered so the
sort-merge join can skip its sort; all writers of a co-location group
MUST agree on (key, n_buckets) — keep ``DEFAULT_BUCKETS`` fixed per
deployment, resizing means rewriting the group. ``saveAsTable`` is
required (bucket metadata lives in the catalog, not in the files); pass
``path`` to keep the data external to the warehouse dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEFAULT_BUCKETS = 32


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "docid",
    buckets: int = DEFAULT_BUCKETS,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted) by
    ``key`` so equal-key joins against co-bucketed tables are
    exchange-free."""
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, key).sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(spark, left_table: str, right_table: str, key: str = "docid") -> DataFrame:
    """Join two co-bucketed tables on ``key`` bucket-to-bucket. The
    exchange elimination comes from the tables' bucket specs; this helper
    centralizes two easy-to-miss requirements: reads go through the
    catalog (``spark.table`` — a raw ``spark.read.parquet`` of the same
    files does NOT see the bucket metadata and shuffles), and the join is
    pinned to sort-merge (``hint("merge")``) because the planner's
    broadcast fallback ignores bucketing — correct when one side is tiny,
    but the co-location contract exists precisely for joins where NEITHER
    side is."""
    return spark.table(left_table).hint("merge").join(spark.table(right_table), key)
