"""End-to-end code-search story over an input_hint-shaped repo corpus:
one corpus → body/path/symbol indexes + trigram index → a camelCase query
resolves across naming conventions with path+definition boosts, substring
and regex queries hit raw text, and the result page carries snippets,
facets, and completion — every serving surface composing on one corpus."""

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.index.trigram import (
    build_trigram_index,
    regex_search,
    substring_search,
)
from mini_search_engine_spark.ops import symbol_field
from mini_search_engine_spark.search import (
    facet_counts,
    multi_field_bm25,
    search_with_snippets,
    snippets,
    suggest,
)


@pytest.fixture(scope="module")
def repo(spark):
    # (repo, path, commit, lang, content) — the input_hint shape
    rows = [
        ("org/app", "src/index/FlushWriter.java", "c1", "java",
         "public class FlushWriter { void flushSegment(PostingBuffer buf) {} }"),
        ("org/app", "src/util/strings.py", "c1", "py",
         "def flush_segment(buffer): return buffer.flush()"),
        ("org/app", "docs/design.md", "c1", "md",
         "the flush segment path writes posting buffers to disk"),
        ("org/lib", "src/codec/varint.rs", "c2", "rs",
         "fn decode_varint(bytes: &[u8]) -> u64 { 0 }"),
        ("org/lib", "README.md", "c2", "md",
         "a library of encoding utilities nothing about flushing"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    return load_corpus(df).cache()


def test_cross_convention_fielded_search(spark, repo):
    # three naming conventions of one concept, one query
    body = build_index(repo, analyzer="code", positional=True)
    paths = build_index(
        repo.withColumn("content", F.col("path")), analyzer="code"
    )
    syms = build_index(symbol_field(repo), analyzer="code")

    by_path = {r["path"]: r["docid"] for r in repo.select("docid", "path").collect()}
    jdoc = by_path["src/index/FlushWriter.java"]
    pdoc = by_path["src/util/strings.py"]
    mdoc = by_path["docs/design.md"]

    top = [
        r["docid"]
        for r in multi_field_bm25(
            [(syms, 3.0), (paths, 2.0), (body, 1.0)], ["flush", "segment"], 5
        ).collect()
    ]
    # all three spellings found; defining files outrank the prose mention
    assert set(top) >= {jdoc, pdoc, mdoc}
    assert top.index(jdoc) < top.index(mdoc) and top.index(pdoc) < top.index(mdoc)


def test_raw_text_queries(spark, repo):
    tri = build_trigram_index(repo)
    by_path = {r["path"]: r["docid"] for r in repo.select("docid", "path").collect()}
    # exact punctuation-preserving substring — impossible on the tokenized index
    got = [r["docid"] for r in substring_search(tri, repo, "&[u8]").collect()]
    assert got == [by_path["src/codec/varint.rs"]]
    # regex with a required literal — search is case-insensitive by design,
    # so the pattern spans both the camelCase and snake_case definitions
    got = [r["docid"] for r in regex_search(tri, repo, r"flush\w*Segment\s*\(").collect()]
    assert sorted(got) == sorted(
        [by_path["src/index/FlushWriter.java"], by_path["src/util/strings.py"]]
    )
    tri.unpersist()


def test_result_page_surfaces(spark, repo):
    idx = build_index(repo, analyzer="code", positional=True)
    # ranked page with snippets
    page = search_with_snippets(idx, repo, "flush segment", k=3, width=2)
    rows = page.collect()
    assert rows and all("[flush]" in (r["snippet"] or "") or "[segment]" in (r["snippet"] or "") for r in rows)
    # facets over the match set
    res = snippets(repo, ["flush"], analyzer="code", width=1).select("docid")
    fc = {tuple(r)[:1][0]: r["n_docs"] for r in facet_counts(res, repo, ["lang"]).collect()}
    assert fc.get("java") == 1 and fc.get("py") == 1 and fc.get("md") == 1
    # completion over the code-analyzed vocabulary
    comp = [r["term"] for r in suggest(idx, "flu", k=5).collect()]
    assert "flush" in comp
