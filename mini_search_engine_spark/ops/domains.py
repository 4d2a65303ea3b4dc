"""Source/domain-level curation — the host-level filtering stage every
web-scale training-data pipeline runs BEFORE per-document filters:
RefinedWeb (Penedo et al. 2023 §3.1) drops whole domains by URL/host
statistics, Gopher (Rae et al. 2021 app. A1.1) maintains a domain
blocklist, and C4 / DCLM aggregate quality and duplication per host to
decide which hosts are worth keeping at all. The reference engine groups
results per source (`collapse_by_source`); this module makes the source
axis a first-class curation dimension.

Design for 100 TB:

- **Per-doc signals are row-local.** The content hash (`sha2`), token
  count, and composite quality score (shared expressions with
  `ops.textstats.quality_columns` — the two views cannot drift) are all
  computed inside the corpus scan; nothing per-doc ever shuffles.
- **One aggregation keyed by source.** `groupBy(source)` with map-side
  partial aggregation; the distinct-hash count uses Spark's two-phase
  partial-distinct (keyed on (source, sha) — the same cardinality the
  exact-dedup groupBy already handles corpus-wide, here strictly less).
  Output cardinality is O(#sources) ≪ O(docs).
- **The verdict joins back as a broadcast.** `source_filter` semi-joins
  docs against the kept-source list — O(#sources) rows broadcast, the
  corpus side never moves. At 10^12 files the per-host table is still
  only as big as the number of hosts.

→ `source_stats` / `source_filtered_docs` registry entries replicate the
whole computation (sha256 grouping + quality formula + thresholds) in
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_search_engine_spark.ops.textstats import quality_columns


def source_stats(
    docs: DataFrame,
    content_col: str = "content",
    source_col: str = "source",
    min_docs: int = 1,
    max_dup_frac: float = 1.0,
    min_avg_quality: float = 0.0,
    min_avg_tokens: float = 0.0,
) -> DataFrame:
    """Per-source curation report → (source, n_docs, n_unique, dup_frac,
    avg_tokens, avg_quality, keep).

    dup_frac = 1 − distinct(sha256(content))/n_docs — the fraction of
    docs that are exact duplicates of another doc IN THE SAME SOURCE
    (boilerplate/mirror detection). `keep` applies all four thresholds;
    callers tune them per corpus (defaults keep everything).
    avg_quality / avg_tokens are rounded to 4 places so the report is
    reproducible across engines and summation orders."""
    q = quality_columns(F.col(content_col))
    per_doc = docs.select(
        F.col(source_col).alias("source"),
        F.sha2(F.col(content_col), 256).alias("_sha"),
        q["n_tokens"].cast("double").alias("_toks"),
        q["quality"].alias("_q"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("_sha").alias("n_unique"),
        F.round(F.avg("_toks"), 4).alias("avg_tokens"),
        F.round(F.avg("_q"), 4).alias("avg_quality"),
    )
    dup_frac = F.round(F.lit(1.0) - F.col("n_unique") / F.col("n_docs"), 6)
    keep = (
        (F.col("n_docs") >= F.lit(min_docs))
        & (F.col("dup_frac") <= F.lit(float(max_dup_frac)))
        & (F.col("avg_quality") >= F.lit(float(min_avg_quality)))
        & (F.col("avg_tokens") >= F.lit(float(min_avg_tokens)))
    )
    return agg.withColumn("dup_frac", dup_frac).select(
        "source",
        "n_docs",
        "n_unique",
        "dup_frac",
        "avg_tokens",
        "avg_quality",
        keep.alias("keep"),
    )


def source_filter(
    docs: DataFrame,
    content_col: str = "content",
    source_col: str = "source",
    min_docs: int = 1,
    max_dup_frac: float = 1.0,
    min_avg_quality: float = 0.0,
    min_avg_tokens: float = 0.0,
) -> DataFrame:
    """Drop every document whose source fails the thresholds. The kept-
    source list is O(#sources) and ships as a broadcast semi-join — the
    corpus side is filtered in place, no shuffle. Returns docs unchanged
    in schema."""
    kept = source_stats(
        docs,
        content_col=content_col,
        source_col=source_col,
        min_docs=min_docs,
        max_dup_frac=max_dup_frac,
        min_avg_quality=min_avg_quality,
        min_avg_tokens=min_avg_tokens,
    ).filter(F.col("keep"))
    return docs.join(
        F.broadcast(kept.select(F.col("source").alias(source_col))),
        on=source_col,
        how="left_semi",
    ).select(*docs.columns)
