"""Boolean query operators: keyword, AND, OR, phrase.

Reference semantics (post-merge, i.e. logical corpus-wide — SURVEY.md §7.1
trap #4):

* keyword — ``searchQuery`` analyzes the keyword and uses its FIRST token;
  empty analysis → empty result (``InvertedIndexManager.java:879-926``).
* AND — ``searchAndQuery``: any keyword whose analysis is empty → empty
  result; otherwise docs containing ALL analyzed terms
  (``:934-1024``; smallest-list-first binary-search intersection — the
  physical strategy is Catalyst's to choose here).
* OR — ``searchOrQuery``: sorted de-duplicated union (``:1032-1094``).
* phrase — ``searchPhraseQuery``: positional index required (throws
  otherwise, ``:1107-1108``); AND-intersect then left-fold positional
  adjacency (``:1224-1252``). The fold is expressed natively:
  ``surv_k = array_intersect(transform(surv_{k-1}, p→p+1), positions_k)``.

All functions return a DataFrame of ``docid`` (ascending), ready to join
back to the corpus for content fetch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_search_engine_spark.analysis.udfs import analyze_query
from mini_search_engine_spark.index.build import InvertedIndex
from mini_search_engine_spark.index.termid import term_ids


def _empty_docids(index: InvertedIndex) -> DataFrame:
    return (
        index.postings.sparkSession.range(0)
        .select(F.col("id").alias("docid"))
    )


def _postings_for(index: InvertedIndex, terms: list[str]) -> DataFrame:
    """Blocked postings rows for the given terms (tid-pruned parquet scan).

    The query terms hash to 60-bit ids DRIVER-SIDE (no Spark job, see
    index/termid.py) and the int filter lands on the scan (``PushedFilters:
    In(tid, …)`` — int compares against parquet column stats, cheaper than
    string equality); the Arrow decode UDF runs only on the surviving
    blocks — decoding then pruning would ship the whole postings table
    through Python for a point lookup."""
    from dataclasses import replace

    filtered = index.postings.filter(F.col("tid").isin(term_ids(terms)))
    return replace(index, postings=filtered).decoded().postings


def search_keyword(index: InvertedIndex, keyword: str) -> DataFrame:
    toks = analyze_query(keyword, index.analyzer)
    if not toks:
        return _empty_docids(index)
    t = toks[0]
    return (
        _postings_for(index, [t])
        .select(F.explode("docids").alias("docid"))
        .orderBy("docid")
    )


def search_and(index: InvertedIndex, keywords: list[str]) -> DataFrame:
    term_lists = [analyze_query(k, index.analyzer) for k in keywords]
    if any(not tl for tl in term_lists):
        return _empty_docids(index)  # reference `:941-945`
    terms = sorted({t for tl in term_lists for t in tl})
    # conjunct coverage as a bit_or over a driver-assigned bit per term id:
    # count_distinct(tid) planned as TWO exchanges (distinct on (docid,
    # tid), then the per-docid count); the bit mask is a plain aggregate
    # with map-side partials — ONE exchange, same docid set (r6). The
    # query term count is tiny, so the chained-CASE bit literal matches
    # the BM25 weight-literal convention.
    tids = term_ids(terms)
    if len(tids) > 63:  # bit mask is a long; huge conjunctions take the
        return (  # two-exchange count_distinct path (correct at any arity)
            _postings_for(index, terms)
            .select("tid", F.explode("docids").alias("docid"))
            .groupBy("docid")
            .agg(F.count_distinct("tid").alias("nt"))
            .filter(F.col("nt") == len(tids))
            .select("docid")
            .orderBy("docid")
        )
    bit = F.lit(0)
    for i, tid in enumerate(tids):
        bit = F.when(F.col("tid") == F.lit(tid), F.lit(1 << i)).otherwise(bit)
    full = (1 << len(tids)) - 1
    return (
        _postings_for(index, terms)
        .select(bit.alias("_bit"), F.explode("docids").alias("docid"))
        .groupBy("docid")
        .agg(F.bit_or("_bit").alias("_m"))
        .filter(F.col("_m") == full)
        .select("docid")
        .orderBy("docid")
    )


def search_and_segments(
    segments: list[InvertedIndex], keywords: list[str]
) -> DataFrame:
    """Reference PRE-merge AND semantics over a segmented index
    (``InvertedIndexManager.java:968-973``): each segment is consulted
    independently, and a segment whose dictionary lacks ANY conjunct
    contributes nothing. Because a matching document's own postings put
    every conjunct into its segment's dictionary, the skip can never drop
    a true match — the union over segments equals corpus-wide
    ``search_and`` on the merged index (asserted in
    ``tests/test_reference_parity.py``); this mode exists to model the
    reference behavior explicitly, and the dictionary-presence probe is
    the same early-out the reference uses to avoid touching postings."""
    assert segments, "need at least one segment"
    term_lists = [analyze_query(k, segments[0].analyzer) for k in keywords]
    if any(not tl for tl in term_lists):
        return _empty_docids(segments[0])  # reference `:941-945`
    terms = sorted({t for tl in term_lists for t in tl})
    # ONE probe job over the UNIONED postings scans (per-segment conjunct
    # coverage via countDistinct), not a driver job per segment — at
    # hundreds of streaming segments the per-segment probe loop is
    # O(segments) scheduling round trips per query (VERDICT r2 item 4).
    # The probe reads postings, not termstats: termstats is itself an
    # aggregation per segment, so a union of termstats would materialize
    # one AQE query stage (= one job) PER SEGMENT; postings term-presence
    # is the same dictionary fact from a plain pruned scan, so the union
    # has a single exchange regardless of segment count (asserted in
    # tests/test_reference_parity.py).
    tids = term_ids(terms)
    stats = None
    for i, seg in enumerate(segments):
        s = seg.postings.filter(F.col("tid").isin(tids)).select(
            F.lit(i).alias("_seg"), "tid"
        )
        stats = s if stats is None else stats.unionByName(s)
    surviving = {
        r["_seg"]
        for r in (
            stats.groupBy("_seg")
            .agg(F.count_distinct("tid").alias("nt"))
            .filter(F.col("nt") == len(terms))
            .collect()
        )
    }
    if not surviving:
        return _empty_docids(segments[0])
    # one unioned postings plan over the surviving segments: docids are
    # global and each doc's postings live in exactly one segment, so the
    # corpus-wide groupBy(docid) conjunct count over the union is the
    # per-segment AND (asserted equal in tests/test_reference_parity.py)
    posts = None
    for i, seg in enumerate(segments):
        if i not in surviving:
            continue  # segment-miss: contributes nothing (`:968-973`)
        p = _postings_for(seg, terms).select("tid", "docids")
        posts = p if posts is None else posts.unionByName(p)
    n = len(terms)
    return (
        posts.select("tid", F.explode("docids").alias("docid"))
        .groupBy("docid")
        .agg(F.count_distinct("tid").alias("nt"))
        .filter(F.col("nt") == n)
        .select("docid")
        .orderBy("docid")
    )


def search_or(index: InvertedIndex, keywords: list[str]) -> DataFrame:
    terms = sorted({t for k in keywords for t in analyze_query(k, index.analyzer)})
    if not terms:
        return _empty_docids(index)
    return (
        _postings_for(index, terms)
        .select(F.explode("docids").alias("docid"))
        .distinct()
        .orderBy("docid")
    )


def _positional_chain(
    index: InvertedIndex, phrase: str | list[str], slop: int
) -> DataFrame:
    """Shared machinery for phrase (slop=1) and ordered-proximity search:
    docs where the analyzed tokens appear in order with every consecutive
    gap ≤ ``slop`` positions. The survivor fold stays pure Catalyst array
    ops — for slop=1 it is the reference's adjacency fold verbatim; for
    slop>1 each step is the union of the ``slop`` shifted intersections."""
    if not index.positional:
        raise NotImplementedError(
            "phrase search requires a positional index"  # reference `:1107-1108`
        )
    if slop < 1:
        raise ValueError("slop must be >= 1 (1 = exact phrase adjacency)")
    text = " ".join(phrase) if isinstance(phrase, list) else phrase
    terms = analyze_query(text, index.analyzer)
    if not terms:
        return _empty_docids(index)
    if len(terms) == 1:
        return search_keyword(index, terms[0])

    posts = _postings_for(index, sorted(set(terms)))
    # per-(tid, docid) positions — one exploded frame, reused per phrase slot
    tp = posts.select(
        "tid",
        F.explode(F.arrays_zip("docids", "positions")).alias("z"),
    ).select("tid", F.col("z.docids").alias("docid"), F.col("z.positions").alias("pos"))

    joined: DataFrame | None = None
    for i, t in enumerate(terms):
        cur = tp.filter(F.col("tid") == term_ids([t])[0]).select(
            F.col("docid"), F.col("pos").alias(f"pos_{i}")
        )
        joined = cur if joined is None else joined.join(cur, "docid")

    def _shifted_intersect(surv, d: int, pos_col):
        # NB the closure must expose a ONE-argument lambda: pyspark's
        # ``transform`` inspects arity, and a second (default) parameter
        # would be bound to the array index
        return F.array_intersect(F.transform(surv, lambda p: p + d), pos_col)

    surv = F.col("pos_0")
    for i in range(1, len(terms)):
        shifted = [
            _shifted_intersect(surv, d, F.col(f"pos_{i}"))
            for d in range(1, slop + 1)
        ]
        surv = shifted[0] if len(shifted) == 1 else F.array_distinct(
            F.concat(*shifted)
        )
    return (
        joined.withColumn("surv", surv)
        .filter(F.size("surv") > 0)
        .select("docid")
        .orderBy("docid")
    )


def search_phrase(index: InvertedIndex, phrase: str | list[str]) -> DataFrame:
    """Docs containing the analyzed phrase tokens consecutively, in order."""
    return _positional_chain(index, phrase, slop=1)


def search_near(
    index: InvertedIndex, phrase: str | list[str], slop: int = 2
) -> DataFrame:
    """Ordered proximity search: the analyzed tokens appear in order with
    each consecutive gap ≤ ``slop`` token positions (``slop=1`` degrades
    to exact phrase). Beyond the reference's surface (exact phrase only) —
    the standard query-log/training-data proximity primitive, built from
    the same positional index with no extra state."""
    return _positional_chain(index, phrase, slop)


def search_window(
    index: InvertedIndex, keywords: list[str], window: int
) -> DataFrame:
    """UNORDERED proximity: docs where one occurrence of EVERY analyzed
    term falls inside some ``window``-position span (any order) — the
    sloppy-phrase / WITHIN operator that complements ``search_near``'s
    ordered chain.

    Exact predicate, pure Catalyst: a qualifying span exists iff some
    anchor position ``p`` (WLOG the span's minimum — so an occurrence of
    one of the terms) has every term occurring in ``[p, p + window - 1]``.
    After the same per-term positions join the phrase chain uses, that is
    one nested ``exists(anchor, p -> AND_i exists(pos_i, q -> p ≤ q <
    p + window))`` over per-doc position arrays — no positional self-join,
    no explode; per-doc cost O(Σ|pos| · m) on arrays already in memory.
    ``window = len(terms)`` is the unordered-phrase special case."""
    terms = sorted({t for k in keywords for t in analyze_query(k, index.analyzer)})
    if not index.positional:
        raise NotImplementedError("window search requires a positional index")
    if not terms:
        return _empty_docids(index)
    if window < len(terms):
        raise ValueError("window must be >= number of distinct terms")
    if len(terms) == 1:
        return search_keyword(index, terms[0])

    posts = _postings_for(index, terms)
    tp = posts.select(
        "tid",
        F.explode(F.arrays_zip("docids", "positions")).alias("z"),
    ).select("tid", F.col("z.docids").alias("docid"), F.col("z.positions").alias("pos"))

    joined: DataFrame | None = None
    from mini_search_engine_spark.index.termid import term_ids as _tids

    for i, t in enumerate(terms):
        cur = tp.filter(F.col("tid") == _tids([t])[0]).select(
            F.col("docid"), F.col("pos").alias(f"pos_{i}")
        )
        joined = cur if joined is None else joined.join(cur, "docid")

    anchors = F.col("pos_0")
    for i in range(1, len(terms)):
        anchors = F.concat(anchors, F.col(f"pos_{i}"))

    def _all_in_span(p):
        cond = F.lit(True)
        for i in range(len(terms)):
            cond = cond & F.exists(
                F.col(f"pos_{i}"), lambda q: (q >= p) & (q < p + window)
            )
        return cond

    return (
        joined.filter(F.exists(anchors, _all_in_span))
        .select("docid")
        .orderBy("docid")
    )
