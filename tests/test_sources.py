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
