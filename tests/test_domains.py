"""Source/domain-level curation (ops/domains.py): hand-built corpus with a
duplicate-heavy source, a low-quality source, and a clean source; verifies
the report values, the keep verdicts, and that source_filter drops exactly
the failing sources' docs. Also asserts the verdict join is a broadcast."""

import pyspark.sql.functions as F

from mini_search_engine_spark.ops import source_filter, source_stats

GOOD = "the quick brown fox jumps over the lazy dog near the river bank today"
# 12-char symbol runs: mean token length outside the [3,10] band and zero
# alpha chars -> only the stopword-band 0.3 survives.
JUNK = "!!!!!!!!!!!! ???????????? ************ $$$$$$$$$$$$ ############"


def _corpus(spark):
    rows = [
        # src_clean: 3 unique good docs
        (0, GOOD + " zero", "src_clean"),
        (1, GOOD + " one", "src_clean"),
        (2, GOOD + " two", "src_clean"),
        # src_mirror: 4 docs, 3 exact copies -> dup_frac = 0.5
        (3, GOOD + " mirrored", "src_mirror"),
        (4, GOOD + " mirrored", "src_mirror"),
        (5, GOOD + " mirrored", "src_mirror"),
        (6, GOOD + " distinct", "src_mirror"),
        # src_junk: symbol soup, quality 0.3 per doc (stop_ratio 0 only)
        (7, JUNK, "src_junk"),
        (8, JUNK + " .", "src_junk"),
    ]
    return spark.createDataFrame(rows, "docid long, content string, source string")


def test_source_stats_report(spark):
    stats = {
        r["source"]: r.asDict()
        for r in source_stats(_corpus(spark), max_dup_frac=0.4, min_avg_quality=0.5).collect()
    }
    assert stats["src_clean"]["n_docs"] == 3
    assert stats["src_clean"]["n_unique"] == 3
    assert stats["src_clean"]["dup_frac"] == 0.0
    assert stats["src_clean"]["keep"] is True

    assert stats["src_mirror"]["n_docs"] == 4
    assert stats["src_mirror"]["n_unique"] == 2
    assert stats["src_mirror"]["dup_frac"] == 0.5
    assert stats["src_mirror"]["keep"] is False  # dup_frac 0.5 > 0.4

    assert stats["src_junk"]["avg_quality"] == 0.3  # stopword band only
    assert stats["src_junk"]["keep"] is False  # quality 0.3 < 0.5


def test_source_filter_drops_failing_sources(spark):
    kept = source_filter(_corpus(spark), max_dup_frac=0.4, min_avg_quality=0.5)
    assert sorted(r["docid"] for r in kept.collect()) == [0, 1, 2]
    # schema unchanged
    assert kept.columns == ["docid", "content", "source"]


def test_source_filter_verdict_is_broadcast(spark):
    plan = source_filter(_corpus(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_min_docs_threshold(spark):
    stats = {
        r["source"]: r["keep"]
        for r in source_stats(_corpus(spark), min_docs=3).collect()
    }
    assert stats == {"src_clean": True, "src_mirror": True, "src_junk": False}


def test_quality_formula_shared_with_quality_scores(spark):
    """source_stats' avg_quality must equal the mean of quality_scores'
    per-doc quality for the same source (shared expressions)."""
    from mini_search_engine_spark.ops import quality_scores

    docs = _corpus(spark)
    per_doc = (
        quality_scores(docs)
        .join(docs.select("docid", "source"), "docid")
        .groupBy("source")
        .agg(F.round(F.avg("quality"), 4).alias("aq"))
    )
    expected = {r["source"]: r["aq"] for r in per_doc.collect()}
    got = {r["source"]: r["avg_quality"] for r in source_stats(docs).collect()}
    assert got == expected
