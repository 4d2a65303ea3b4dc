"""Query operators: boolean/keyword/phrase, TF-IDF, BM25, PageRank."""

from mini_search_engine_spark.search.boolean import (
    search_keyword,
    search_and,
    search_and_segments,
    search_or,
    search_near,
    search_phrase,
    search_window,
)
from mini_search_engine_spark.search.ranking import (
    search_tfidf,
    bm25_topk,
    bm25_topk_batch,
    bm25_page,
    rescore_topk,
)
from mini_search_engine_spark.search.querylang import (
    parse_query,
    search_query,
    expand_synonyms,
    QuerySyntaxError,
)
from mini_search_engine_spark.search.anchor import (
    anchor_texts,
    anchor_bm25,
)
from mini_search_engine_spark.search.structured import (
    bm25_topk_filtered,
    collapse_results,
    bm25_explain,
)
from mini_search_engine_spark.search.expand import (
    search_fuzzy,
    search_prefix,
    suggest,
    did_you_mean,
    search_wildcard,
    vocab_matches,
)
from mini_search_engine_spark.search.facets import facet_counts
from mini_search_engine_spark.search.fields import multi_field_bm25, multi_field_bm25_dismax
from mini_search_engine_spark.search.hybrid import hybrid_search, rrf_fuse
from mini_search_engine_spark.search.morelike import distinctive_terms, more_like_this, significant_terms
from mini_search_engine_spark.search.fullscan import full_scan_search
from mini_search_engine_spark.search.snippets import snippets, search_with_snippets
from mini_search_engine_spark.search.pagerank import (
    cocitation,
    combined_search,
    hits,
    link_distance,
    pagerank,
    personalized_pagerank,
)
from mini_search_engine_spark.search.related import related_docs
from mini_search_engine_spark.search.feedback import bm25_prf, expansion_terms
from mini_search_engine_spark.search.ranking import bm25_topk_weighted
from mini_search_engine_spark.search.ltr import ltr_features
from mini_search_engine_spark.search.percolate import Percolator, percolate
from mini_search_engine_spark.search.serving import Bm25MicroBatcher
from mini_search_engine_spark.search.evalmetrics import macro_metrics, relevance_metrics

__all__ = [
    "search_keyword",
    "search_and",
    "search_and_segments",
    "search_or",
    "search_near",
    "search_phrase",
    "search_window",
    "search_prefix",
    "search_wildcard",
    "search_fuzzy",
    "suggest",
    "did_you_mean",
    "vocab_matches",
    "search_tfidf",
    "bm25_topk",
    "bm25_topk_batch",
    "ltr_features",
    "bm25_page",
    "rescore_topk",
    "parse_query",
    "search_query",
    "expand_synonyms",
    "QuerySyntaxError",
    "anchor_texts",
    "anchor_bm25",
    "bm25_topk_filtered",
    "collapse_results",
    "bm25_explain",
    "multi_field_bm25",
    "multi_field_bm25_dismax",
    "rrf_fuse",
    "hybrid_search",
    "facet_counts",
    "more_like_this",
    "distinctive_terms",
    "significant_terms",
    "full_scan_search",
    "snippets",
    "search_with_snippets",
    "pagerank",
    "combined_search",
    "hits",
    "link_distance",
    "personalized_pagerank",
    "cocitation",
    "related_docs",
    "bm25_prf",
    "expansion_terms",
    "bm25_topk_weighted",
    "Bm25MicroBatcher",
    "Percolator",
    "percolate",
    "relevance_metrics",
    "macro_metrics",
]
