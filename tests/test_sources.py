"""TSV source scans (reference IcsSearchEngine.readUrlTsv/readIdGraphTsv)."""

from mini_search_engine_spark.sources import read_id_graph_tsv, read_url_tsv


def test_tsv_sources(spark, tmp_path):
    (tmp_path / "url.tsv").write_text("0\thttp://a\n1\thttp://b\n")
    (tmp_path / "id-graph.tsv").write_text("0\t1\n1\t0\n0\t0\n")
    urls = read_url_tsv(spark, str(tmp_path / "url.tsv"))
    assert {(r["docid"], r["url"]) for r in urls.collect()} == {
        (0, "http://a"),
        (1, "http://b"),
    }
    edges = read_id_graph_tsv(spark, str(tmp_path / "id-graph.tsv"))
    assert edges.count() == 3
    assert edges.schema["src"].dataType.typeName() == "long"


def test_load_corpus_num_partitions_doc_id_shape(spark):
    """num_partitions must range-partition BOTH corpus shapes by docid
    (ADVICE r1): contiguous docid ranges per partition."""
    from mini_search_engine_spark.corpus import load_corpus

    rows = [(i, f"text {i}", "en", "t", 0) for i in range(100)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = load_corpus(df, num_partitions=4)
    parts = out.select("docid").rdd.glom().collect()
    ranges = sorted(
        (min(r["docid"] for r in p), max(r["docid"] for r in p))
        for p in parts
        if p
    )
    # contiguous, non-overlapping docid ranges
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    assert sum(hi - lo + 1 for lo, hi in ranges) >= 100 - len(ranges)  # dense-ish


def test_corpus_lang_partition_pruning(spark, tmp_path):
    from mini_search_engine_spark.corpus import (
        load_corpus,
        load_corpus_partitioned,
        write_corpus_partitioned,
    )

    rows = [
        (0, "english words", "en", "t", 0),
        (1, "mehr deutsche woerter", "de", "t", 0),
        (2, "more english", "en", "t", 0),
        (3, "encore francais", "fr", "t", 0),
    ]
    docs = load_corpus(
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
    )
    path = str(tmp_path / "corpus")
    write_corpus_partitioned(docs, path, ["lang"])

    back = load_corpus_partitioned(spark, path)
    en = back.filter("lang = 'en'")
    assert sorted(r["docid"] for r in en.collect()) == [0, 2]

    # the lang predicate must prune at the scan: a NON-EMPTY
    # PartitionFilters list naming lang (not a post-scan Filter)
    import re

    plan = en._jdf.queryExecution().executedPlan().toString()
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and any("lang" in x and x.strip() for x in pf), plan
