"""Dictionary-expansion queries: prefix, wildcard, fuzzy (edit distance).

The reference's query surface is exact-term only (``InvertedIndexManager.
java`` searchQuery/searchAndQuery/searchOrQuery); prefix, wildcard and
fuzzy matching are the standard next queries a search user reaches for,
and they fall out of the term-dictionary sidecar with no new index state:

* **expansion runs on ``termstats``** — the O(vocabulary) dictionary, never
  the postings. Even at 100 TB the vocabulary is tens of millions of rows;
  a predicate scan over it is trivial next to any postings touch.
* **the expanded tid set prunes the postings scan** exactly like a
  multi-term OR: small expansions inline as a parquet-pushable
  ``In(tid, …)`` literal (int column-stat pruning, same path as
  search/boolean._postings_for); expansions past ``max_expansion`` switch
  to a broadcast semi-join of the tid frame (same bounded-collect /
  semi-join fallback pattern as search/ranking.py's block-prefix pushdown)
  so no driver collect is ever unbounded.
* fuzzy matching stays JVM-side: a cheap length-delta prefilter, then
  Spark's builtin ``levenshtein(…, threshold)`` which early-outs past the
  bound — no Python, no UDF, whole-stage codegen keeps it fused.

Patterns/keywords are matched against the INDEXED vocabulary — i.e. the
analyzed terms (for stemming analyzers the dictionary holds stems). Input
is normalized with the same Java-trim + lowercase every tokenize path
applies; wildcard/fuzzy inputs are NOT stemmed (stemming a pattern or a
misspelling would corrupt it).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mini_search_engine_spark.index.build import InvertedIndex

# expansions up to this many tids inline as an In(tid, …) literal on the
# postings scan; beyond it a broadcast semi-join prunes instead (bound
# shared with search/ranking.py's block-prefix pushdown)
MAX_INLINE_EXPANSION = 8192


def _norm(s: str) -> str:
    # Java String.trim (every char <= U+0020) + lowercase — the exact
    # normalization the tokenize paths apply (analysis/tokenizers.py)
    return s.strip("".join(chr(c) for c in range(0x21))).lower()


def _glob_to_java_regex(pattern: str) -> str:
    """Translate a ``*``/``?`` glob to an anchored Java regex, escaping
    every other char literally (RE2-safe subset: no backrefs)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def vocab_matches(index: InvertedIndex, cond: Column) -> DataFrame:
    """(term, tid, df) dictionary rows matching ``cond`` — the expansion
    set, exposed for introspection ("what did my wildcard hit?")."""
    return index.termstats.filter(cond).select("term", "tid", "df")


def _docids_for_expansion(
    index: InvertedIndex, cond: Column, max_expansion: int
) -> DataFrame:
    """OR-union of docids over every dictionary term matching ``cond``."""
    from dataclasses import replace

    matches = vocab_matches(index, cond).select("tid")
    tids = [r["tid"] for r in matches.limit(max_expansion + 1).collect()]
    if not tids:
        return (
            index.postings.sparkSession.range(0).select(F.col("id").alias("docid"))
        )
    if len(tids) <= max_expansion:
        filtered = index.postings.filter(F.col("tid").isin(tids))
    else:  # huge expansion: broadcast semi-join, no unbounded collect
        filtered = index.postings.join(F.broadcast(matches), "tid", "semi")
    posts = replace(index, postings=filtered).decoded().postings
    return (
        posts.select(F.explode("docids").alias("docid")).distinct().orderBy("docid")
    )


def search_prefix(
    index: InvertedIndex, prefix: str, max_expansion: int = MAX_INLINE_EXPANSION
) -> DataFrame:
    """Docs containing any indexed term starting with ``prefix``
    (normalized). Empty prefix is rejected — it would be a full scan
    dressed as a query."""
    p = _norm(prefix)
    if not p:
        raise ValueError("prefix must be non-empty after normalization")
    return _docids_for_expansion(index, F.col("term").startswith(p), max_expansion)


def search_wildcard(
    index: InvertedIndex, pattern: str, max_expansion: int = MAX_INLINE_EXPANSION
) -> DataFrame:
    """Docs containing any indexed term matching the ``*``/``?`` glob.
    A leading-wildcard pattern is allowed but scans the whole dictionary
    (still only O(vocabulary) — never the postings)."""
    p = _norm(pattern)
    if not p.replace("*", "").replace("?", ""):
        raise ValueError("pattern must contain at least one literal char")
    return _docids_for_expansion(
        index, F.col("term").rlike(_glob_to_java_regex(p)), max_expansion
    )


def search_fuzzy(
    index: InvertedIndex,
    keyword: str,
    max_edits: int = 1,
    max_expansion: int = MAX_INLINE_EXPANSION,
) -> DataFrame:
    """Docs containing any indexed term within ``max_edits`` Levenshtein
    edits (insert/delete/substitute) of ``keyword`` — includes the exact
    term itself at distance 0. The length-delta prefilter prunes most of
    the dictionary before the bounded ``levenshtein(…, threshold)``
    (which returns -1 past the threshold and early-outs internally)."""
    q = _norm(keyword)
    if not q:
        raise ValueError("keyword must be non-empty after normalization")
    if max_edits < 0:
        raise ValueError("max_edits must be >= 0")
    cond = (
        (F.abs(F.length("term") - F.lit(len(q))) <= max_edits)
        & F.levenshtein(F.col("term"), F.lit(q), max_edits).between(0, max_edits)
    )
    return _docids_for_expansion(index, cond, max_expansion)


def suggest(index: InvertedIndex, prefix: str, k: int = 10) -> DataFrame:
    """Search-as-you-type completion: the top-``k`` dictionary terms
    starting with ``prefix``, ranked by document frequency (ties broken
    lexically). Runs entirely on the O(vocabulary) termstats sidecar —
    TakeOrderedAndProject over a startswith filter; the postings are never
    touched, so latency is independent of corpus size."""
    p = _norm(prefix)
    if not p:
        raise ValueError("prefix must be non-empty after normalization")
    return (
        vocab_matches(index, F.col("term").startswith(p))
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )


def did_you_mean(
    index: InvertedIndex, keyword: str, max_edits: int = 2, k: int = 3
) -> DataFrame:
    """Spell correction: the top-``k`` dictionary terms within
    ``max_edits`` Levenshtein edits of ``keyword``, ranked by (distance
    asc, df desc, term asc) — closest first, popularity breaks ties. Pure
    vocab-sidecar work (length prefilter + bounded JVM ``levenshtein``,
    no UDF, postings untouched); → (term, df, dist)."""
    q = _norm(keyword)
    if not q:
        raise ValueError("keyword must be non-empty after normalization")
    dist = F.levenshtein(F.col("term"), F.lit(q), max_edits)
    return (
        index.termstats.filter(F.abs(F.length("term") - F.lit(len(q))) <= max_edits)
        .withColumn("dist", dist)
        .filter(F.col("dist").between(0, max_edits))
        .select("term", "df", F.col("dist").cast("long").alias("dist"))
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(k)
    )
