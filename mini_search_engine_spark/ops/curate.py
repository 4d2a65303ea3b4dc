"""End-to-end training-data curation pipeline — the composed funnel every
LLM data pipeline runs (C4/Raffel et al. 2019 §2.2, RefinedWeb/Penedo et
al. 2023 fig. 2, Dolma, DCLM): host-level filtering → exact dedup →
per-document quality gates → benchmark decontamination → deterministic
subsampling. Each stage already exists as an oracle-verified operator in
this package; this module is the composition, with one lazy DataFrame for
the survivors and a per-stage funnel report for pipeline observability.

Design for 100 TB:

- Stage order is the cheap-to-expensive order the literature settled on:
  the O(#sources) source verdict and the row-local quality/token gates
  run INSIDE the scan (Catalyst fuses consecutive filters into one pass),
  exact dedup is the only corpus-wide exchange (one hash shuffle on
  sha256, canonical selection by row_number — no join back), and the
  decontamination window join runs map-side against a broadcast eval
  window-hash set, LAST, over the already-shrunk corpus.
- The whole pipeline is ONE lazy plan: no stage materializes unless the
  caller asks. `curation_funnel` (the per-stage doc counts) evaluates
  each prefix, so it costs one extra pass per stage — it is the
  diagnostic view; production callers persist `curate()`'s output once
  and derive counts from lineage metrics instead.

→ `curated_docs` / `curation_funnel` registry entries replicate every
stage (source stats + thresholds, sha256 canonical row-number, token
gate, window-hash anti-join, md5 hash sample) in one DuckDB CTE chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mini_search_engine_spark.ops.dedup import decontaminate
from mini_search_engine_spark.ops.domains import source_filter
from mini_search_engine_spark.ops.pipeline import _MOD, _sample_hash
from mini_search_engine_spark.ops.textstats import quality_columns

_STAGES = (
    "input",
    "source_filter",
    "exact_dedup",
    "doc_gates",
    "decontaminate",
    "sample",
)


def _stage_frames(
    docs: DataFrame,
    content_col: str,
    id_col: str,
    source_col: str,
    min_avg_tokens: float,
    max_dup_frac: float,
    min_source_quality: float,
    min_doc_tokens: int,
    min_quality: float,
    eval_docs: DataFrame | None,
    window: int,
    max_contam_frac: float,
    sample_rate: float | None,
    salt: str,
) -> list[DataFrame]:
    """The cumulative pipeline prefixes, one DataFrame per stage (all lazy,
    all with the input schema)."""
    q = quality_columns(F.col(content_col))

    s1 = source_filter(
        docs,
        content_col=content_col,
        source_col=source_col,
        max_dup_frac=max_dup_frac,
        min_avg_quality=min_source_quality,
        min_avg_tokens=min_avg_tokens,
    )

    # exact dedup: ONE shuffle keyed on the content hash, min-docid
    # canonical via row_number — no second join back onto the corpus.
    w = Window.partitionBy(F.sha2(F.col(content_col), 256)).orderBy(id_col)
    s2 = (
        s1.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # row-local gates — fused into one filter pass by Catalyst.
    s3 = s2.filter(
        (q["n_tokens"] >= F.lit(int(min_doc_tokens)))
        & (q["quality"] >= F.lit(float(min_quality)))
    )

    if eval_docs is not None:
        # The contamination flag is a PURE PER-DOC function (own content ×
        # eval window set), so compute it from the RAW input rather than
        # s3: flagging s3 would re-derive the whole upstream prefix —
        # including the dedup window SHUFFLE — a second time under the
        # anti-join's right side (exchange reuse does not fire across it).
        # Flags for docs the earlier stages dropped are harmless extras in
        # an anti-join; the survivors' verdicts are identical.
        # decontaminate's corpus contract is a (docid, content) frame —
        # rename through it so curate's id_col keyword works for any id.
        flagged = decontaminate(
            docs.withColumnRenamed(id_col, "docid"),
            eval_docs,
            window=window,
            content_col=content_col,
        ).filter(F.col("contam_frac") > F.lit(float(max_contam_frac)))
        s4 = s3.join(
            flagged.select(F.col("docid").alias(id_col)), on=id_col, how="left_anti"
        ).select(*docs.columns)
    else:
        s4 = s3

    if sample_rate is not None:
        s5 = s4.filter(
            _sample_hash(F.col(id_col), salt) < int(sample_rate * _MOD)
        )
    else:
        s5 = s4

    return [docs, s1, s2, s3, s4, s5]


def curate(
    docs: DataFrame,
    content_col: str = "content",
    id_col: str = "docid",
    source_col: str = "source",
    min_avg_tokens: float = 0.0,
    max_dup_frac: float = 1.0,
    min_source_quality: float = 0.0,
    min_doc_tokens: int = 0,
    min_quality: float = 0.0,
    eval_docs: DataFrame | None = None,
    window: int = 8,
    max_contam_frac: float = 0.0,
    sample_rate: float | None = None,
    salt: str = "curate-v1",
) -> DataFrame:
    """The curated corpus: documents surviving source filter → exact dedup
    → doc-level token/quality gates → decontamination (docs sharing a
    ``window``-token run with ``eval_docs`` beyond ``max_contam_frac``
    coverage are dropped; default 0.0 = any shared window drops) →
    deterministic hash sample. Input schema preserved; one lazy plan."""
    return _stage_frames(
        docs,
        content_col,
        id_col,
        source_col,
        min_avg_tokens,
        max_dup_frac,
        min_source_quality,
        min_doc_tokens,
        min_quality,
        eval_docs,
        window,
        max_contam_frac,
        sample_rate,
        salt,
    )[-1]


def curation_funnel(docs: DataFrame, **kwargs) -> DataFrame:
    """Per-stage funnel report → (stage_idx, stage, n_docs): how many
    documents survive each cumulative pipeline prefix. Diagnostic view —
    it evaluates every prefix (one count job per stage when collected);
    production pipelines persist `curate()`'s output and read counts from
    lineage metrics instead. Takes the same keyword arguments as
    `curate`."""
    frames = _stage_frames(
        docs,
        kwargs.pop("content_col", "content"),
        kwargs.pop("id_col", "docid"),
        kwargs.pop("source_col", "source"),
        kwargs.pop("min_avg_tokens", 0.0),
        kwargs.pop("max_dup_frac", 1.0),
        kwargs.pop("min_source_quality", 0.0),
        kwargs.pop("min_doc_tokens", 0),
        kwargs.pop("min_quality", 0.0),
        kwargs.pop("eval_docs", None),
        kwargs.pop("window", 8),
        kwargs.pop("max_contam_frac", 0.0),
        kwargs.pop("sample_rate", None),
        kwargs.pop("salt", "curate-v1"),
    )
    if kwargs:
        raise TypeError(f"unknown curation arguments: {sorted(kwargs)}")
    counted = [
        # global agg (no keys) so an empty stage still yields its 0 row
        f.groupBy()
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select(
            F.lit(i).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            "n_docs",
        )
        for i, (name, f) in enumerate(zip(_STAGES, frames))
    ]
    out = counted[0]
    for c in counted[1:]:
        out = out.unionByName(c)
    return out
