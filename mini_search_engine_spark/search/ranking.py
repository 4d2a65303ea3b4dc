"""Ranked retrieval: reference TF-IDF and flagship BM25 (block-max pruned).

TF-IDF replicates ``searchTfIdf`` (``InvertedIndexManager.java:1292-1489``)
exactly, including its quirks (SURVEY.md §7.1):
* idf has NO logarithm: ``idf = N / df`` (``:1312,1422``);
* query weight ``q[t] = multiplicity(t in analyzed query) · N/df`` (``:1309-1314``);
* per (distinct) matched query term: ``dot += tf·idf·q[t]``,
  ``len += (tf·idf)²``; ``score = dot / sqrt(len)`` — cosine normalized
  over QUERY terms only (``:1418-1436``);
* ties broken by ascending docid (the reference heap leaves ties
  unspecified; we pin them for determinism).

BM25 (north_star, k1=1.2 b=0.75) uses the Lucene/ATIRE idf
``ln(1 + (N - df + 0.5)/(df + 0.5))`` and
``tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))``; doc length comes from the ``dls``
array denormalized into the postings at build time, so the only query-time
state is a broadcast map of per-term df — no join against a doc-stats
table.

Block-max pruning (``bm25_topk(prune=True)``): blocks are docid-range
aligned ACROSS terms (build.py), so for a range r the upper bound
``UB(r) = Σ_t ub(t, r)`` bounds every doc in r. Phase 1 exactly scores the
highest-UB ranges covering ≥ k candidates → threshold θ = k-th best exact
score; phase 2 exactly scores only the remaining ranges with UB ≥ θ. Both
phases are plain DataFrame plans ending in TakeOrderedAndProject — the
distributed generalization of the reference's bounded heap
(``:1293-1298``) and of Block-Max WAND's skip logic.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mini_search_engine_spark.analysis.udfs import analyze_query
from mini_search_engine_spark.index.build import InvertedIndex
from mini_search_engine_spark.index.termid import term_id_py, term_ids

K1 = 1.2
B = 0.75


def _empty_scored(index: InvertedIndex) -> DataFrame:
    return (
        index.postings.sparkSession.range(0)
        .select(F.col("id").alias("docid"), F.lit(0.0).alias("score"))
    )


def _analyzed_with_counts(index: InvertedIndex, keywords: list[str]) -> Counter:
    terms: list[str] = []
    for k in keywords:
        terms.extend(analyze_query(k, index.analyzer))
    return Counter(terms)


def _df_map(index: InvertedIndex, terms: list[str]) -> dict[str, int]:
    """term → df for the (few) analyzed query terms. On a warm index the
    dfs are memoized driver-side (``InvertedIndex.df_cache``; a warm index
    is immutable, so entries never go stale) — a repeated-term query skips
    this lookup job entirely, one fewer sequential stage wave at serving
    time. Absent terms are negative-cached as 0 (callers treat 0 as
    missing already)."""
    cache = index.df_cache
    if cache is None:
        rows = index.termstats.filter(F.col("term").isin(terms)).collect()
        return {r["term"]: int(r["df"]) for r in rows}
    missing = [t for t in terms if t not in cache]
    if missing:
        found = {
            r["term"]: int(r["df"])
            for r in index.termstats.filter(F.col("term").isin(missing)).collect()
        }
        for t in missing:
            cache[t] = found.get(t, 0)
    return {t: cache[t] for t in terms if cache[t]}


def _exploded(posts: DataFrame) -> DataFrame:
    return posts.select(
        "tid",
        F.explode(F.arrays_zip("docids", "tfs", "dls")).alias("z"),
    ).select(
        "tid",
        F.col("z.docids").alias("docid"),
        F.col("z.tfs").alias("tf"),
        F.col("z.dls").alias("dl"),
    )


def search_tfidf(
    index: InvertedIndex, keywords: list[str], topk: int | None = 10
) -> DataFrame:
    """Reference-parity TF-IDF top-k → (docid, score) descending."""
    counts = _analyzed_with_counts(index, keywords)
    if not counts:
        return _empty_scored(index)
    terms = sorted(counts)
    dfm = _df_map(index, terms)
    n = index.n_docs
    # term → (query-weight, idf) scalars folded into chained-CASE literals
    # over the DRIVER-HASHED term ids (same rationale as BM25: no
    # broadcast-exchange build per query job; int equality, not string)
    rows = [
        (term_id_py(t), counts[t] * (n / dfm[t]), n / dfm[t])
        for t in terms
        if dfm.get(t)
    ]
    if not rows:
        return _empty_scored(index)
    qw_expr = F.lit(0.0)
    idf_expr = F.lit(0.0)
    for tid, qw, idf in rows:
        qw_expr = F.when(F.col("tid") == F.lit(tid), F.lit(float(qw))).otherwise(qw_expr)
        idf_expr = F.when(F.col("tid") == F.lit(tid), F.lit(float(idf))).otherwise(idf_expr)

    from dataclasses import replace as _rep

    filtered = index.postings.filter(F.col("tid").isin(term_ids(terms)))
    filtered = _rep(index, postings=filtered).decoded().postings
    tfidf = F.col("tf") * idf_expr
    scored = (
        _exploded(filtered)
        .groupBy("docid")
        .agg(
            F.sum(tfidf * qw_expr).alias("dot"),
            F.sum(tfidf * tfidf).alias("len2"),
        )
        .select("docid", (F.col("dot") / F.sqrt(F.col("len2"))).alias("score"))
    )
    out = scored.orderBy(F.desc("score"), F.asc("docid"))
    return out.limit(topk) if topk is not None else out


def _bm25_idf(n: int, df: int) -> float:
    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))


def _bm25_qvec(index: InvertedIndex, keywords: list[str]):
    counts = _analyzed_with_counts(index, keywords)
    if not counts:
        return None
    dfm = _df_map(index, sorted(counts))
    rows = [
        (term_id_py(t), float(counts[t]), _bm25_idf(index.n_docs, dfm[t]))
        for t in sorted(counts)
        if dfm.get(t)
    ]
    return rows or None


def _term_weight_expr(rows: list[tuple[int, float, float]]) -> F.Column:
    """Per-term weight qw·idf as a chained-CASE literal over the (few)
    query term IDS (driver-hashed — int equality in codegen). Query state
    is a handful of scalars — folding them into the expression keeps every
    scoring job a single stage, where a broadcast join would add a
    broadcast-exchange build (measured ~0.2-0.5 s of fixed latency PER JOB
    on this box, paid twice more by the pruned path's extra jobs)."""
    chain = F.lit(0.0)
    for tid, qw, idf in rows:
        chain = F.when(F.col("tid") == F.lit(tid), F.lit(float(qw * idf))).otherwise(chain)
    return chain


def _bm25_exact(
    posts: DataFrame, rows: list[tuple[str, float, float]], avgdl: float
) -> DataFrame:
    w = _term_weight_expr(rows)
    denom = F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / avgdl)
    return (
        _exploded(posts)
        .groupBy("docid")
        .agg(F.sum(w * (F.col("tf") * (K1 + 1.0)) / denom).alias("score"))
    )


def _bm25_topk_fused_cold(
    index: InvertedIndex, counts: Counter, topk: int
) -> DataFrame:
    """Single-JOB exact BM25 for cold terms on a warm serving index
    (VERDICT r3 item 6): the per-term df is recovered INSIDE the scoring
    job instead of a separate termstats-probe job. Every postings row
    carries its block's posting count ``n`` and df = Σ n over the term's
    blocks, so a window ``sum(n) over (partition by tid)`` on the
    term-filtered frame (query-terms × blocks rows — a few hundred)
    reconstructs df, and idf becomes a column expression. One driver
    round trip end-to-end where the probe+literal path takes two
    sequential stage waves; at concurrency the saved wave is the p50 term
    that grows with queue depth. The probe+literal path stays optimal for
    memo-HIT terms (no window exchange at all)."""
    from dataclasses import replace as _rep

    from pyspark.sql import Window

    qw_by_tid = {term_id_py(t): float(c) for t, c in counts.items()}
    raw = index.postings.filter(F.col("tid").isin(list(qw_by_tid)))
    withdf = raw.withColumn(
        "qdf", F.sum("n").over(Window.partitionBy("tid")).cast("double")
    )
    posts = withdf
    if index.compressed:
        posts = _rep(index, postings=withdf).decoded().postings
    n = float(index.n_docs)
    idf = F.log(
        F.lit(1.0) + (F.lit(n) - F.col("qdf") + F.lit(0.5)) / (F.col("qdf") + F.lit(0.5))
    )
    qw = F.lit(0.0)
    for tid, c in qw_by_tid.items():
        qw = F.when(F.col("tid") == F.lit(tid), F.lit(c)).otherwise(qw)
    ex = posts.select(
        "tid",
        "qdf",
        F.explode(F.arrays_zip("docids", "tfs", "dls")).alias("z"),
    ).select(
        "tid",
        "qdf",
        F.col("z.docids").alias("docid"),
        F.col("z.tfs").alias("tf"),
        F.col("z.dls").alias("dl"),
    )
    denom = F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / index.avgdl)
    return (
        ex.groupBy("docid")
        .agg(F.sum(qw * idf * (F.col("tf") * (K1 + 1.0)) / denom).alias("score"))
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(topk)
    )


def bm25_topk(
    index: InvertedIndex,
    keywords: list[str],
    topk: int = 10,
    prune: bool = False,
    prune_min_blocks: int = 64,
    prune_min_postings: int = 5_000_000,
) -> DataFrame:
    """BM25 top-k → (docid, score) descending, ties by ascending docid."""
    # The fused-cold path recovers df as sum(n) over the term's posting
    # blocks — valid ONLY when the postings are complete. On a pruned
    # (champion) tier that sum is the capped df and would inflate idf,
    # breaking prune.py's "surviving docs score identically" invariant
    # (and disagree with the termstats-fed memo on repeat queries), so
    # pruned indexes always take the global-termstats probe path below.
    if not prune and index.df_cache is not None and not index.pruned:
        counts = _analyzed_with_counts(index, keywords)
        if not counts:
            return _empty_scored(index)
        missing = [t for t in counts if t not in index.df_cache]
        if missing:
            # warm serving, cold terms → fuse the df probe into the
            # scoring job (single stage wave; see _bm25_topk_fused_cold)
            # and fill the memo ASYNCHRONOUSLY so repeats of these terms
            # take the literal path without ever paying a probe wave
            # (dict writes are GIL-atomic; failures just leave the memo
            # cold, never wrong)
            import threading

            def _fill(ts=missing, idx=index):
                try:
                    # own job group: Spark localProperties are inherited by
                    # child threads, so without this the background probe
                    # would be attributed to the CALLER's job group
                    sc = idx.termstats.sparkSession.sparkContext
                    sc.setJobGroup("bm25-df-memo-fill", "async df memo fill")
                    found = {
                        r["term"]: int(r["df"])
                        for r in idx.termstats.filter(F.col("term").isin(ts)).collect()
                    }
                    for t in ts:
                        idx.df_cache.setdefault(t, found.get(t, 0))
                except Exception:
                    pass

            threading.Thread(target=_fill, daemon=True).start()
            return _bm25_topk_fused_cold(index, counts, topk)
    if prune:
        # cost-based fallback #2 (r6, measured): the two-phase pruned path
        # pays 3 extra sequential driver round trips (~0.3 s each on this
        # box) before the final job; its benefit is the fraction of the
        # query terms' postings it never decodes. The exact path's marginal
        # cost is decode+score of Σ df(term) postings, so below a postings
        # budget there is nothing worth skipping: sf1.0 local[32] A/B —
        # pruned 1.35 s vs exact 0.42 s at Σ df ≈ 10⁵. The dfs are already
        # driver-side (the _df_map probe the qvec needs anyway), so the
        # gate is pure driver arithmetic; at real scale common terms carry
        # df ≫ the budget and pruning stays on.
        counts = _analyzed_with_counts(index, keywords)
        if not counts:
            return _empty_scored(index)
        dfm = _df_map(index, sorted(counts))
        rows = [
            (term_id_py(t), float(counts[t]), _bm25_idf(index.n_docs, dfm[t]))
            for t in sorted(counts)
            if dfm.get(t)
        ] or None
        if sum(dfm.get(t) or 0 for t in counts) < prune_min_postings:
            prune = False
    else:
        rows = _bm25_qvec(index, keywords)
    if rows is None:
        return _empty_scored(index)
    spark = index.postings.sparkSession
    qtids = [r[0] for r in rows]
    # tid/block filters are applied to the RAW postings (stats + byte
    # columns only) and the codec UDF runs strictly on the surviving rows —
    # pruning must reduce Python/Arrow work, not merely row counts.
    raw = index.postings.filter(F.col("tid").isin(qtids))

    def dec(df: DataFrame) -> DataFrame:
        if not index.compressed:
            return df
        from dataclasses import replace as _rep

        return _rep(index, postings=df).decoded().postings

    # cost-based fallback: the two-phase pruning spends 2 extra Spark jobs
    # (UB ranking + θ seeding); with only a handful of docid ranges there is
    # nothing to skip, so run the single-job exact plan. Driver-side
    # arithmetic — no extra action.
    n_blocks = (index.n_docs + index.block_span - 1) // max(index.block_span, 1)
    if prune and n_blocks < prune_min_blocks:
        prune = False

    if not prune:
        return (
            _bm25_exact(dec(raw), rows, index.avgdl)
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(topk)
        )

    # ---- block-max pruning over docid-range-aligned blocks ----
    # Distributed throughout: per-range upper bounds are a DataFrame agg
    # over BLOCK-LEVEL stats (no posting arrays touched); only the top few
    # ranges needed to seed θ are ever collected (≤ a few hundred rows,
    # independent of corpus size).
    avgdl = index.avgdl
    w = _term_weight_expr(rows)
    ub_expr = (
        w
        * F.col("max_tf")
        * (K1 + 1.0)
        / (F.col("max_tf") + K1 * (1.0 - B + B * F.col("min_dl") / avgdl))
    )
    # NOT persisted: the UB agg touches only block-level stat columns of a
    # term-pushdown scan (no posting arrays, no codec), so recomputing it
    # inside the final plan is cheaper than leaking a cached RDD per query
    # in a serving session.
    ub_range = (
        raw.select("tid", "block", "n", "max_tf", "min_dl")
        .groupBy("block")
        .agg(F.sum(ub_expr).alias("ub"), F.sum("n").alias("n_cand"))
    )
    # Phase 1: cheapest ranges that cover ≥ topk candidates seed θ. Collect
    # a bounded prefix of ranges ordered by ub (descending).
    prefix = ub_range.orderBy(F.desc("ub"), F.asc("block")).limit(
        max(64, topk)
    ).collect()
    if not prefix:
        return _empty_scored(index)
    phase1: list[int] = []
    cand = 0
    for r in prefix:
        phase1.append(r["block"])
        cand += r["n_cand"]
        if cand >= max(topk, 1):
            break
    p1 = _bm25_exact(dec(raw.filter(F.col("block").isin(phase1))), rows, avgdl)
    top1 = p1.orderBy(F.desc("score"), F.asc("docid")).limit(topk).collect()
    theta = top1[-1]["score"] if len(top1) >= topk else float("-inf")

    # Phase 2: exact-score only surviving ranges (ub ≥ θ). When pruning
    # works, the survivor list is SHORT — collect up to a bounded prefix
    # and push it as an InSet predicate (single-stage final job). Only if
    # more than the cap survive (pruning not selective — e.g. uniform
    # scores) fall back to a distributed semi-join on the block id.
    surv = ub_range.filter((F.col("ub") >= theta) & ~F.col("block").isin(phase1))
    cap = 8192
    surv_ids = [r["block"] for r in surv.select("block").limit(cap + 1).collect()]
    if len(surv_ids) <= cap:
        p2_src = raw.filter(F.col("block").isin(surv_ids)) if surv_ids else None
    else:
        p2_src = raw.join(F.broadcast(surv.select("block")), "block", "left_semi")
    seed = spark.createDataFrame(
        [(r["docid"], r["score"]) for r in top1], "docid long, score double"
    )
    if p2_src is None:
        return seed.orderBy(F.desc("score"), F.asc("docid")).limit(topk)
    p2 = _bm25_exact(dec(p2_src), rows, avgdl)
    out = (
        p2.unionByName(seed)
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(topk)
    )
    return out


def bm25_topk_weighted(
    index: InvertedIndex, weights: dict[str, float], topk: int = 10
) -> DataFrame:
    """Exact BM25 top-k for an ALREADY-ANALYZED weighted query vector
    {term: weight} — ``bm25_topk`` with real-valued term weights instead
    of analyzer multiplicities. The composable form relevance-feedback
    expansion needs: expansion terms enter with fractional weight, and the
    plan is identical to the unweighted path (one pruned scan, weights
    folded into the chained-CASE literal)."""
    terms = sorted(t for t, qw in weights.items() if qw)
    if not terms:
        return _empty_scored(index)
    dfm = _df_map(index, terms)
    rows = [
        (term_id_py(t), float(weights[t]), _bm25_idf(index.n_docs, dfm[t]))
        for t in terms
        if dfm.get(t)
    ]
    if not rows:
        return _empty_scored(index)
    raw = index.postings.filter(F.col("tid").isin([r[0] for r in rows]))
    if index.compressed:
        from dataclasses import replace as _rep

        raw = _rep(index, postings=raw).decoded().postings
    return (
        _bm25_exact(raw, rows, index.avgdl)
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(topk)
    )


def bm25_scores(index: InvertedIndex, keywords: list[str]) -> DataFrame:
    """UNRANKED exact BM25 → (docid, score) for every matching doc — the
    composable form of ``bm25_topk`` (no ordering, no limit) used by
    multi-field combination, where the top-k cut must happen AFTER the
    per-field scores are summed."""
    rows = _bm25_qvec(index, keywords)
    if rows is None:
        return _empty_scored(index)
    raw = index.postings.filter(F.col("tid").isin([r[0] for r in rows]))
    if index.compressed:
        from dataclasses import replace as _rep

        raw = _rep(index, postings=raw).decoded().postings
    return _bm25_exact(raw, rows, index.avgdl)


def rescore_topk(
    index: InvertedIndex,
    tier: InvertedIndex,
    keywords: list[str],
    fetch_k: int = 100,
    topk: int = 10,
) -> DataFrame:
    """Two-phase retrieval — the web-scale serving architecture: a cheap
    first pass over the champion tier (``index/prune.py``) nominates
    ``fetch_k`` candidates, then the FULL index rescores exactly those
    docs and returns the true BM25 top-``topk``.

    Why both phases: the champion tier keeps global df/avgdl, so a doc
    that SURVIVES pruning for every query term scores identically there
    — but a doc pruned out of one term's champion list loses that term's
    contribution in phase 1. Rescoring candidates on the full postings
    restores each candidate's exact score, so errors are confined to
    docs the tier never nominates (the classic static-pruning recall
    trade, Manning et al. §7.1.3), never to scores of returned docs.

    Scale shape: phase 1 reads α·n_per_term postings per query term from
    the bounded tier (TakeOrderedAndProject, corpus-size-independent);
    the candidate set (≤ fetch_k rows) BROADCASTS into phase 2, whose
    scan reads only the query terms' postings (int tid pushdown) and
    joins map-side — no shuffle of either index, both cuts bounded.
    Candidates cut on the 6dp-ROUNDED phase-1 score (docid tie-break) so
    the nominated set is reproducible across engines/summation orders."""
    cand = (
        bm25_scores(tier, keywords)
        .select("docid", F.round("score", 6).alias("cscore"))
        .orderBy(F.desc("cscore"), F.asc("docid"))
        .limit(fetch_k)
        .select("docid")
    )
    return (
        bm25_scores(index, keywords)
        .join(F.broadcast(cand), "docid")
        .orderBy(F.desc("score"), F.asc("docid"))
        .limit(topk)
    )


def bm25_page(
    index: InvertedIndex,
    keywords: list[str],
    page_size: int = 10,
    after: tuple[float, int] | None = None,
) -> DataFrame:
    """Keyset pagination over exact BM25 (the ``search_after`` contract):
    page rows strictly after cursor ``after=(score, docid)`` in
    (score DESC, docid ASC) order → (docid, score), page-ordered.

    Deep paging with OFFSET forces every executor to rank ``offset +
    page_size`` rows and the driver to discard ``offset`` of them — at
    page 1000 that is 1000× the work of page 1. The keyset cursor keeps
    the per-page cost CONSTANT in page depth: the cursor predicate
    filters before the top-k, so the plan stays one scoring pass + a
    ``TakeOrderedAndProject`` of exactly ``page_size`` rows per
    partition, regardless of how deep the caller has paged. Scores are
    deterministic for a fixed index, so the float-equality tie-break on
    docid is exact across pages (same guarantee Elasticsearch's
    ``search_after`` documents). Page 1 = ``after=None``; the caller
    passes the last row of each page as the next cursor.
    """
    scores = bm25_scores(index, keywords)
    if after is not None:
        s, d = after
        scores = scores.filter(
            (F.col("score") < s) | ((F.col("score") == s) & (F.col("docid") > d))
        )
    return scores.orderBy(F.desc("score"), F.asc("docid")).limit(page_size)


def bm25_topk_batch(
    index: InvertedIndex, queries: dict[str, list[str]], topk: int = 10
) -> DataFrame:
    """Exact BM25 top-k for a BATCH of queries in ONE scoring job →
    (qid, docid, score, rank), scores identical to per-query ``bm25_topk``.

    Serving latency on this engine is stage-WAVE-bound, not scan-bound
    (BENCH/SERVING.md): N sequential ``bm25_topk`` calls pay N driver
    round trips + N scheduling waves even when each scan is tiny. Batch
    scoring amortizes all of it: postings are filtered ONCE to the union
    of every query's term ids (one int-IN pushdown scan, each posting
    block decoded once even when queries share terms), the per-(qid, tid)
    weights join in as ONE small broadcast (amortized over the whole
    batch — the chained-CASE-literal trick bm25_topk uses per query
    cannot scale to hundreds of queries' worth of CASE arms), and the
    per-query top-k is a single window pass partitioned by qid. The
    offline path for relevance eval sets, query-log replays, and bulk
    re-ranking; interactive single queries stay on ``bm25_topk``.
    """
    qvecs: dict[str, Counter] = {}
    all_terms: set[str] = set()
    for qid, kws in queries.items():
        counts = _analyzed_with_counts(index, kws)
        qvecs[qid] = counts
        all_terms |= set(counts)
    spark = index.postings.sparkSession
    dfm = _df_map(index, sorted(all_terms)) if all_terms else {}
    rows = [
        (qid, term_id_py(t), float(c) * _bm25_idf(index.n_docs, dfm[t]))
        for qid, counts in qvecs.items()
        for t, c in counts.items()
        if dfm.get(t)
    ]
    if not rows:
        return spark.range(0).select(
            F.lit("").alias("qid"),
            F.col("id").alias("docid"),
            F.lit(0.0).alias("score"),
            F.lit(0).alias("rank"),
        )
    qdf = spark.createDataFrame(rows, "qid string, tid long, w double")
    raw = index.postings.filter(
        F.col("tid").isin(sorted({tid for _, tid, _ in rows}))
    )
    if index.compressed:
        from dataclasses import replace as _rep

        raw = _rep(index, postings=raw).decoded().postings
    denom = F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / index.avgdl)
    scored = (
        _exploded(raw)
        .join(F.broadcast(qdf), "tid")
        .groupBy("qid", "docid")
        .agg(F.sum(F.col("w") * (F.col("tf") * (K1 + 1.0)) / denom).alias("score"))
    )
    from pyspark.sql import Window

    rw = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        scored.withColumn("rank", F.row_number().over(rw).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("qid", "docid", "score", "rank")
    )
