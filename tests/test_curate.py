"""End-to-end curation pipeline (ops/curate.py): hand-built corpus where
every stage removes something — a short-doc source (source gate), exact
duplicates (dedup stage), a short doc inside a good source (doc gate), a
doc quoting the eval set verbatim (decontamination) — plus funnel
consistency and sampling determinism."""

import pyspark.sql.functions as F

from mini_search_engine_spark.ops import curate, curation_funnel

LONG = " ".join(f"w{i}" for i in range(20))  # 20 tokens


def _corpus(spark):
    rows = [
        # src_good: long docs
        (1, LONG + " alpha", "src_good"),
        (2, LONG + " beta", "src_good"),
        (3, LONG + " beta", "src_good"),  # exact dup of 2 -> dropped at dedup
        (4, "tiny doc", "src_good"),  # < 10 tokens -> doc gate
        (5, LONG + " stolen eval text here absolutely verbatim", "src_good"),
        # src_short: avg tokens tiny -> whole source dropped
        (6, "a b", "src_short"),
        (7, "c d", "src_short"),
    ]
    return spark.createDataFrame(rows, "docid long, content string, source string")


def _eval(spark):
    # shares an 8-token run with doc 5's tail
    tail = "stolen eval text here absolutely verbatim"
    return spark.createDataFrame(
        [(100, "w17 w18 w19 " + tail)], "docid long, content string"
    )


KW = dict(min_avg_tokens=10.0, min_doc_tokens=10, window=8, max_contam_frac=0.0)


def test_curate_stages(spark):
    out = curate(_corpus(spark), eval_docs=_eval(spark), **KW)
    assert sorted(r["docid"] for r in out.collect()) == [1, 2]
    assert out.columns == ["docid", "content", "source"]


def test_funnel_counts(spark):
    rows = sorted(
        curation_funnel(_corpus(spark), eval_docs=_eval(spark), **KW).collect(),
        key=lambda r: r["stage_idx"],
    )
    assert [(r["stage"], r["n_docs"]) for r in rows] == [
        ("input", 7),
        ("source_filter", 5),  # src_short's 2 docs gone
        ("exact_dedup", 4),  # doc 3 gone
        ("doc_gates", 3),  # doc 4 gone
        ("decontaminate", 2),  # doc 5 gone
        ("sample", 2),  # no sampling configured
    ]


def test_funnel_last_stage_matches_curate(spark):
    docs = _corpus(spark)
    funnel = {
        r["stage"]: r["n_docs"]
        for r in curation_funnel(docs, eval_docs=_eval(spark), **KW).collect()
    }
    n = curate(docs, eval_docs=_eval(spark), **KW).count()
    assert funnel["sample"] == n


def test_sampling_deterministic_and_partition_invariant(spark):
    docs = _corpus(spark)
    a = sorted(r["docid"] for r in curate(docs, sample_rate=0.5).collect())
    b = sorted(
        r["docid"] for r in curate(docs.repartition(7), sample_rate=0.5).collect()
    )
    assert a == b and 0 < len(a) < 7


def test_unknown_kwarg_raises(spark):
    try:
        curation_funnel(_corpus(spark), bogus=1).collect()
    except TypeError as e:
        assert "bogus" in str(e)
    else:
        raise AssertionError("expected TypeError")


def test_custom_id_col(spark):
    """curate/curation_funnel with id_col != 'docid' must produce the same
    funnel — the decontamination stage renames through dedup's (docid,
    content) contract."""
    docs = _corpus(spark).withColumnRenamed("docid", "page_id")
    out = curate(docs, eval_docs=_eval(spark), id_col="page_id", **KW)
    assert sorted(r["page_id"] for r in out.collect()) == [1, 2]
    funnel = {
        r["stage"]: r["n_docs"]
        for r in curation_funnel(
            docs, eval_docs=_eval(spark), id_col="page_id", **KW
        ).collect()
    }
    assert funnel["decontaminate"] == 2


def test_no_eval_skips_decontamination(spark):
    out = curate(_corpus(spark), **{**KW, "max_contam_frac": 0.0})
    # doc 5 survives when there is no eval set
    assert 5 in {r["docid"] for r in out.collect()}
