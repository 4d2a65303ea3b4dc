"""mini_search_engine_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch rebuild of the capability surface of the reference
``Haixiang6123/mini-search-engine`` (UCI CS221 "Peterman Search Engine",
Java; see SURVEY.md) re-expressed Spark-first:

* corpus ingestion over an (Iceberg-shaped) table of source files
  ``(repo, path, commit, lang, content)`` or the driver testdata shape
  ``(doc_id, text, lang, source, n_chars)``;
* analyzers (punctuation tokenizer + fixed stopword list + Lucene-variant
  Porter stemmer) as vectorized Arrow UDFs / native Catalyst expressions;
* docid-range-blocked posting lists with delta+varint compression and
  per-block max-score metadata (block-max WAND style pruning);
* boolean / keyword / phrase search, reference TF-IDF and BM25 top-k;
* PageRank + combined web ranking;
* training-data-pipeline ops: dedup (exact / MinHash-LSH / SimHash),
  embedding ANN, text statistics, multimodal plumbing.

Everything is DataFrame-first: Catalyst plans the scans, joins and
aggregations; Python appears only in Arrow-batched vectorized UDFs.
"""

__version__ = "0.1.0"
