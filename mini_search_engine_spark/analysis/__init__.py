"""Text analysis: tokenizers, stopwords, Porter stemmer, Spark analyzer exprs.

Reference surface: ``analysis/Analyzer.java:10-13`` (analyze: String ->
List<String>), ``ComposableAnalyzer.java:8-24`` (tokenize then stem each
token). Rebuilt as plain-Python kernels (usable driver-side for query
analysis) plus Arrow-vectorized pandas UDFs / native Catalyst column
expressions for the corpus-side hot path.
"""

from mini_search_engine_spark.analysis.stopwords import STOP_WORDS
from mini_search_engine_spark.analysis.porter import porter_stem
from mini_search_engine_spark.analysis.tokenizers import (
    punctuation_tokenize,
    naive_tokenize,
    word_break_tokenize,
    word_break_logp,
    prepare_logprob_dict,
    load_frequency_dict,
    load_frequency_dict_file,
    analyze,
)
from mini_search_engine_spark.analysis.udfs import (
    analyze_col,
    ANALYZERS,
)

__all__ = [
    "STOP_WORDS",
    "porter_stem",
    "punctuation_tokenize",
    "naive_tokenize",
    "word_break_tokenize",
    "word_break_logp",
    "prepare_logprob_dict",
    "load_frequency_dict",
    "load_frequency_dict_file",
    "analyze",
    "analyze_col",
    "ANALYZERS",
]
