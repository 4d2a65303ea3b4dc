"""Facade mirroring the reference engine's user-facing API.

Maps the surface of ``InvertedIndexManager`` + ``IcsSearchEngine``
(method-for-method, see cites) onto the Spark-native modules, so a user of
the reference can switch without relearning the API. All methods return
DataFrames (the distributed generalization of the reference's iterators).

Reference methods → here:

* ``createOrOpen/createOrOpenPositional`` (``InvertedIndexManager.java:105-140``)
  → ``MiniSearchEngine.from_corpus(..., positional=)`` / ``open(path)``
* ``addDocument``+``flush`` (``:162-298``) → batch ``from_corpus`` or
  streaming ``mini_search_engine_spark.streaming.ingest_stream``
* ``mergeAllSegments`` (``:327``) → ``index.merge`` / streaming compaction
* ``searchQuery`` (``:879``), ``searchAndQuery`` (``:934``),
  ``searchOrQuery`` (``:1032``), ``searchPhraseQuery`` (``:1106``),
  ``searchTfIdf`` (``:1292``) → same names, snake_case
* ``deleteDocuments`` (``:1548``) → ``delete_documents`` (same
  delete-the-term quirk)
* ``getNumDocuments``/``getDocumentFrequency``/``getNumSegments``
  (``:1494-1561``) → ``get_num_documents``/``get_document_frequency``/
  ``get_num_blocks``
* ``documentIterator`` (``:1533``) → ``documents()`` (the corpus frame)
* ``IcsSearchEngine.computePageRank/searchQuery``
  (``IcsSearchEngine.java:116,199``) → ``compute_page_rank`` /
  ``search_query_combined``
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_search_engine_spark.corpus import load_corpus
from mini_search_engine_spark.index.build import (
    DEFAULT_BLOCK_SPAN,
    InvertedIndex,
    build_index,
    read_index,
    write_index,
)
from mini_search_engine_spark.index.merge import delete_terms
from mini_search_engine_spark.search import (
    bm25_topk,
    search_and,
    search_keyword,
    search_or,
    search_phrase,
    search_tfidf,
)
from mini_search_engine_spark.search.pagerank import combined_search, pagerank


class MiniSearchEngine:
    def __init__(self, index: InvertedIndex, corpus: DataFrame | None = None):
        self.index = index
        self.corpus = corpus
        self._pagerank: DataFrame | None = None

    # ---- construction -----------------------------------------------------
    @classmethod
    def from_corpus(
        cls,
        corpus: DataFrame,
        analyzer: str = "porter",
        positional: bool = False,
        block_span: int = DEFAULT_BLOCK_SPAN,
        compress: bool = False,
    ) -> "MiniSearchEngine":
        docs = load_corpus(corpus) if "docid" not in corpus.columns else corpus
        return cls(
            build_index(
                docs,
                analyzer=analyzer,
                positional=positional,
                block_span=block_span,
                compress=compress,
            ),
            corpus=docs,
        )

    @classmethod
    def open(cls, spark: SparkSession, path: str, corpus: DataFrame | None = None):
        return cls(read_index(spark, path), corpus=corpus)

    def save(self, path: str) -> None:
        write_index(self.index, path)

    def warm(self) -> "MiniSearchEngine":
        """Serving mode: decode-once + pin (see ``InvertedIndex.warm``)."""
        return MiniSearchEngine(self.index.warm(), corpus=self.corpus)

    # ---- queries (reference names, snake_case) ----------------------------
    def search_query(self, keyword: str) -> DataFrame:
        return search_keyword(self.index, keyword)

    def search_and_query(self, keywords: list[str]) -> DataFrame:
        return search_and(self.index, keywords)

    def search_or_query(self, keywords: list[str]) -> DataFrame:
        return search_or(self.index, keywords)

    def search_phrase_query(self, phrase: str | list[str]) -> DataFrame:
        return search_phrase(self.index, phrase)

    def search_tfidf(self, keywords: list[str], top_k: int | None = 10) -> DataFrame:
        return search_tfidf(self.index, keywords, top_k)

    def search_bm25(
        self, keywords: list[str], top_k: int = 10, prune: bool = False
    ) -> DataFrame:
        return bm25_topk(self.index, keywords, top_k, prune=prune)

    # ---- maintenance -------------------------------------------------------
    def delete_documents(self, keyword: str) -> None:
        """Reference quirk kept: deletes the KEYWORD's posting list."""
        self.index = delete_terms(self.index, [keyword])

    # ---- stats -------------------------------------------------------------
    def get_num_documents(self) -> int:
        return self.index.n_docs

    def get_document_frequency(self, keyword: str) -> int:
        rows = self.index.termstats.filter(F.col("term") == keyword).collect()
        return int(rows[0]["df"]) if rows else 0

    def get_num_blocks(self) -> int:
        return self.index.postings.select("block").distinct().count()

    def documents(self) -> DataFrame:
        if self.corpus is None:
            raise ValueError("engine opened without a corpus handle")
        return self.corpus

    def retrieve(self, docids: DataFrame) -> DataFrame:
        """docid frame → full document rows (the doc-store fetch join)."""
        return docids.join(self.documents(), "docid")

    # ---- web ranking -------------------------------------------------------
    def compute_page_rank(self, edges: DataFrame, num_iter: int = 100) -> DataFrame:
        self._pagerank = pagerank(edges, num_iter=num_iter).persist()
        return self._pagerank

    def search_query_combined(
        self, keywords: list[str], top_k: int = 10, weight: float = 1.0
    ) -> DataFrame:
        if self._pagerank is None:
            raise ValueError("call compute_page_rank first")
        scored = search_tfidf(self.index, keywords, topk=None)
        return combined_search(scored, self._pagerank, weight, top_k)
