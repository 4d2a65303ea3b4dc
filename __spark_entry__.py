"""Driver contract for the spark-graft builder (PySpark target).

Every entry pairs a Spark DataFrame implementation (mini_search_engine_spark)
with a DuckDB-equivalent ANSI SQL oracle. Hash parity notes:

* the tokenizer used for oracle-checked search queries is the reference
  PunctuationTokenizer WITHOUT stemming ("punct_nostem") — byte-identical
  in Java-regex (Spark) and RE2 (DuckDB); the Porter path is covered by
  pytest goldens instead (DuckDB can't stem).
* 60-bit portable hashes: Spark ``conv(substring(md5(s),1,15),16,10)`` ==
  DuckDB ``('0x' || substring(md5(s),1,15))::BIGINT``.
* float columns are rounded to 6 decimals on BOTH sides and ordered by the
  rounded value so top-k selection is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_search_engine_spark.analysis.stopwords import STOP_WORDS_SORTED
from mini_search_engine_spark.analysis.tokenizers import PUNCT_SPLIT_PATTERN
from mini_search_engine_spark.corpus import load_documents
from mini_search_engine_spark.index.build import build_index
from mini_search_engine_spark.ops import (
    cosine_topk,
    exact_dedup,
    fingerprints,
    language_id,
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    pii_redact,
    quality_scores,
    repetition_scores,
    simhash,
    stratified_hash_sample,
    token_counts,
)
from mini_search_engine_spark.search import (
    bm25_topk,
    pagerank,
    search_and,
    search_keyword,
    search_near,
    search_or,
    search_phrase,
    search_tfidf,
)
from mini_search_engine_spark.search.pagerank import combined_search

ANALYZER = "punct_nostem"
BLOCK_SPAN = 1 << 16

_STOP_IN = ", ".join(f"'{w}'" for w in STOP_WORDS_SORTED)

# tokenized documents fragment (shared by many oracles) — replicates
# PunctuationTokenizer exactly: trim → lower → regex split → drop '' → drop
# stopwords. The trim is Java String.trim (every char ≤ U+0020, expressed as
# an anchored RE2 class — DuckDB's trim() strips only spaces), matching the
# engine's btrim/strip(JAVA_TRIM_CHARS) paths.
_JTRIM = r"regexp_replace(text, '^[\x00-\x20]+|[\x00-\x20]+$', '', 'g')"
_TL = f"""
tl AS (
  SELECT doc_id,
         list_filter(
           regexp_split_to_array(lower({_JTRIM}), '{PUNCT_SPLIT_PATTERN}'),
           x -> x <> '' AND x NOT IN ({_STOP_IN})
         ) AS toks
  FROM documents
)"""

_TOK = _TL + """,
tok AS (SELECT doc_id, unnest(toks) AS term FROM tl)"""

_WS = """
wtl AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
)"""


def _index(spark: SparkSession, sf_dir: str, positional: bool = False):
    docs = load_documents(spark, sf_dir)
    return build_index(docs, analyzer=ANALYZER, positional=positional, block_span=BLOCK_SPAN)


def _round_score(df: DataFrame, col: str = "score", k: int | None = None) -> DataFrame:
    out = df.withColumn(col, F.round(F.col(col), 6)).orderBy(
        F.desc(col), F.asc("docid")
    )
    return out.limit(k) if k is not None else out


# --------------------------------------------------------------------------
# query implementations
# --------------------------------------------------------------------------

def q_keyword(spark, sf_dir):
    return search_keyword(_index(spark, sf_dir), "spark")


def q_and(spark, sf_dir):
    return search_and(_index(spark, sf_dir), ["spark", "merge"])


def q_and_segments(spark, sf_dir):
    """Reference pre-merge AND semantics (quirk #4) over a 2-segment split
    of the corpus; provably equals corpus-wide AND, so it shares the
    and_search oracle — this entry hash-checks that equivalence."""
    from mini_search_engine_spark.search import search_and_segments

    docs = load_documents(spark, sf_dir)
    n = docs.count()
    segs = [
        build_index(docs.filter(F.col("docid") < n // 2), analyzer=ANALYZER,
                    block_span=BLOCK_SPAN),
        build_index(docs.filter(F.col("docid") >= n // 2), analyzer=ANALYZER,
                    block_span=BLOCK_SPAN),
    ]
    return search_and_segments(segs, ["spark", "merge"])


def q_or(spark, sf_dir):
    return search_or(_index(spark, sf_dir), ["vector", "window"])


def q_phrase(spark, sf_dir):
    return search_phrase(_index(spark, sf_dir, positional=True), "batch batch")


def q_near(spark, sf_dir):
    """Ordered proximity: 'spark' then 'merge' within 3 positions (slop=3)
    — the positional-chain generalization of phrase search."""
    return search_near(_index(spark, sf_dir, positional=True), ["spark", "merge"], slop=3)


def q_window_search(spark, sf_dir):
    """Unordered proximity (search/boolean.py search_window): both terms
    inside some 4-position span in ANY order — the WITHIN/sloppy-phrase
    complement of near_search's ordered chain; nested exists over per-doc
    position arrays, no positional self-join."""
    from mini_search_engine_spark.search import search_window

    return search_window(
        _index(spark, sf_dir, positional=True), ["spark", "merge"], window=4
    )


def q_boolean_query(spark, sf_dir):
    """Composable boolean query language (search/querylang.py): the whole
    nested expression — OR group, positional-phrase leaf, NOT — evaluates
    in ONE pruned postings scan + ONE aggregate (presence-set compile to
    a single Catalyst predicate; no join for positive queries)."""
    from mini_search_engine_spark.search import search_query

    return search_query(
        _index(spark, sf_dir, positional=True),
        '(spark OR merge) AND "fast key" AND NOT scan',
    )


def q_boolean_query_universe(spark, sf_dir):
    """Top-level NOT — the one query shape whose result can include docs
    containing none of the query's terms, so the doc universe (doclens
    sidecar) joins in; positive queries never pay that join."""
    from mini_search_engine_spark.search import search_query

    return search_query(_index(spark, sf_dir), "NOT spark AND NOT merge")


def q_prefix_search(spark, sf_dir):
    """Dictionary-expansion query (search/expand.py): docs containing any
    indexed term starting with 'par' (partition, parquet, page, …). The
    expansion runs on the O(vocab) termstats sidecar; the expanded tid set
    prunes the postings scan like a multi-term OR."""
    from mini_search_engine_spark.search import search_prefix

    return search_prefix(_index(spark, sf_dir), "par")


def q_wildcard_search(spark, sf_dir):
    from mini_search_engine_spark.search import search_wildcard

    return search_wildcard(_index(spark, sf_dir), "s?ar*")


def q_fuzzy_search(spark, sf_dir):
    """Edit-distance-1 match of 'spank' (not itself in the vocabulary)
    against the term dictionary — JVM-side length prefilter + thresholded
    levenshtein — then OR over the matching terms' postings."""
    from mini_search_engine_spark.search import search_fuzzy

    return search_fuzzy(_index(spark, sf_dir), "spank", max_edits=1)


def _code_corpus(spark, sf_dir):
    """Deterministic code-shaped derivation of the documents table (both
    engines build the SAME text): prepend a camelCase ident, a snake_case
    ident, and an ACRONYM+digit ident built from the doc's first 4 words —
    exercises every boundary rule of the code analyzer
    (analysis/tokenizers.py CODE_* spec) at corpus scale."""
    w = F.split(F.col("content"), " ")

    def cap(i):
        t = F.element_at(w, i)
        return F.concat(F.upper(F.substring(t, 1, 1)), F.expr(
            f"substring(element_at(split(content, ' '), {i}), 2)"
        ))

    ident_camel = F.concat(F.lit("get"), cap(1), cap(2))
    ident_snake = F.concat(F.element_at(w, 3), F.lit("_"), F.element_at(w, 4), F.lit("_count"))
    ident_acro = F.concat(F.lit("HTTP"), cap(1), F.lit("42"))
    derived = F.concat_ws(" ", ident_camel, ident_snake, ident_acro, F.col("content"))
    return load_documents(spark, sf_dir).withColumn("content", derived)


def q_code_term_df(spark, sf_dir):
    """Full (term, df) vocabulary of the code-analyzed derived corpus —
    hashes EVERY subtoken the camelCase/snake_case/acronym splitter emits
    against the DuckDB twin of the regex spec."""
    idx = build_index(_code_corpus(spark, sf_dir), analyzer="code", block_span=BLOCK_SPAN)
    return idx.termstats.select("term", "df")


def q_code_search(spark, sf_dir):
    """Cross-convention hit: the camelCase QUERY string 'getWindowCount'
    analyzes to [get, window, count] and AND-matches docs whose snake_case
    ident / text carry the same subtokens — the user-visible point of
    code-aware tokenization."""
    from mini_search_engine_spark.analysis.udfs import analyze_query

    idx = build_index(_code_corpus(spark, sf_dir), analyzer="code", block_span=BLOCK_SPAN)
    return search_and(idx, analyze_query("getWindowCount", "code"))


def q_snippets(spark, sf_dir):
    """Result-page snippet extraction (search/snippets.py): first hit
    position of {spark, merge} per matching doc + the 7-token highlighted
    context window. In serving this runs AFTER the postings-pruned match
    (see search_with_snippets) — here over all matching docs so the oracle
    hashes every snippet."""
    from mini_search_engine_spark.search import snippets

    return snippets(load_documents(spark, sf_dir), ["spark", "merge"], width=3)


def q_fielded_bm25(spark, sf_dir):
    """Multi-field ranked search (search/fields.py): a synthetic 'title'
    field (first 4 analyzed tokens — deterministic in both engines) gets
    its OWN index/df/avgdl and a 2.0 boost over the body; score =
    2·BM25_title + 1·BM25_body, cut to 10 after the sum."""
    from mini_search_engine_spark.analysis.udfs import analyze_col
    from mini_search_engine_spark.search import multi_field_bm25

    docs = load_documents(spark, sf_dir)
    title = docs.withColumn(
        "content",
        F.array_join(F.slice(analyze_col(F.col("content"), ANALYZER), 1, 4), " "),
    )
    idx_t = build_index(title, analyzer=ANALYZER, block_span=BLOCK_SPAN)
    idx_b = _index(spark, sf_dir)
    return _round_score(
        multi_field_bm25([(idx_t, 2.0), (idx_b, 1.0)], ["spark", "merge"], topk=None),
        k=10,
    )


def q_fielded_dismax(spark, sf_dir):
    """Disjunction-max multi-field search (search/fields.py
    multi_field_bm25_dismax): same two fields as fielded_bm25 but
    score = max_f(w_f·BM25_f) + 0.3·(Σ others) — a path/title hit is not
    outranked by several weak body mentions; same one-union one-groupBy
    plan as the sum mode."""
    from mini_search_engine_spark.analysis.udfs import analyze_col
    from mini_search_engine_spark.search import multi_field_bm25_dismax

    docs = load_documents(spark, sf_dir)
    title = docs.withColumn(
        "content",
        F.array_join(F.slice(analyze_col(F.col("content"), ANALYZER), 1, 4), " "),
    )
    idx_t = build_index(title, analyzer=ANALYZER, block_span=BLOCK_SPAN)
    idx_b = _index(spark, sf_dir)
    return _round_score(
        multi_field_bm25_dismax(
            [(idx_t, 2.0), (idx_b, 1.0)], ["spark", "merge"], topk=None, tie_breaker=0.3
        ),
        k=10,
    )


def q_hits_rank(spark, sf_dir):
    """HITS hubs/authorities (search/pagerank.py hits), 3 iterations with
    per-half-step L2 normalization — the query-independent complement to
    the reference's PageRank; the norm is a one-row aggregate crossJoined
    back in, no driver collect inside the loop."""
    from mini_search_engine_spark.search import hits

    edges, _ = _edges(spark, sf_dir)
    out = hits(edges, num_iter=3)
    return out.select(
        "docid",
        F.round("authority", 6).alias("authority"),
        F.round("hub", 6).alias("hub"),
    )


def q_link_distance(spark, sf_dir):
    """BFS hop distance from seed docs {0, 1} up to 4 hops
    (search/pagerank.py link_distance) — one eager-checkpoint job per hop,
    early-stop on an empty frontier."""
    from mini_search_engine_spark.search import link_distance

    edges, _ = _edges(spark, sf_dir)
    return link_distance(edges, seeds=[0, 1], max_hops=4).orderBy("docid")


def q_personalized_pagerank(spark, sf_dir):
    """Personalized PageRank from seeds {0, 1}, 5 iterations
    (search/pagerank.py personalized_pagerank): the reference formula
    with teleport mass on the seed set — proximity ranking with hop
    decay, vs link_distance's flat hop count."""
    from mini_search_engine_spark.search import personalized_pagerank

    edges, nodes = _edges(spark, sf_dir)
    pr = personalized_pagerank(edges, seeds=[0, 1], num_iter=5, nodes=nodes)
    return pr.select("docid", F.round("ppr", 6).alias("ppr")).orderBy("docid")


def q_cocitation(spark, sf_dir):
    """Co-citation pairs (search/pagerank.py cocitation): docs linked from
    ≥1 common source, Jaccard over in-neighbor sets; one edge self-join on
    src + one (d1, d2) aggregation."""
    from mini_search_engine_spark.search import cocitation

    edges, _ = _edges(spark, sf_dir)
    return cocitation(edges, min_common=1).orderBy("d1", "d2")


def q_related_docs(spark, sf_dir):
    """All-pairs tf-idf cosine top-3 neighbors per doc
    (search/related.py): pair generation per term via a postings self-join
    on tid. The df ceiling (default N/10, broadcast anti-join of the tiny
    heavy-term set) is the scale knob, but the synthetic corpus has a
    29-term stopword-filtered vocabulary where every informative term has
    df ≈ 0.8N — any cut degenerates the result to exact-duplicate pairs —
    so this entry runs ceiling = N to exercise the full similarity math;
    the ceiling path is covered by pytest."""
    from mini_search_engine_spark.search import related_docs

    idx = _index(spark, sf_dir)
    return related_docs(idx, topk=3, max_df=idx.n_docs).orderBy("docid", "rank")


def q_bm25_prf(spark, sf_dir):
    """Pseudo-relevance-feedback BM25 (search/feedback.py bm25_prf):
    pass 1 takes the top-5 BM25 docs for [spark, merge], mines their 5
    most discriminative non-query terms (Σtf·idf over a docid-pushdown
    re-tokenize of just those docs), pass 2 re-scores with the expansion
    terms at weight 0.4."""
    from mini_search_engine_spark.search import bm25_prf

    idx = _index(spark, sf_dir)
    docs = load_documents(spark, sf_dir)
    # widen before rounding+re-limiting so rounded ties resolve by docid
    raw = bm25_prf(idx, docs, ["spark", "merge"], topk=50, fb_docs=5, fb_terms=5, beta=0.4)
    return _round_score(raw, k=10)


PERC_QUERIES = [
    (1, "spark merge"),
    (2, "vector window"),
    (3, "fast key order"),
    (4, "zzzunseen"),  # never matches
]


def q_percolate(spark, sf_dir):
    """Reverse search (search/percolate.py): which stored queries match
    each doc — ONE shuffle join of doc terms against exploded query terms
    + one (docid, qid) aggregate recovering AND semantics; no per-query
    loop."""
    from mini_search_engine_spark.search import percolate

    queries = spark.createDataFrame(PERC_QUERIES, "qid long, query string")
    return percolate(
        load_documents(spark, sf_dir), queries, analyzer=ANALYZER
    ).orderBy("docid", "qid")


def _eval_run_qrels(spark, sf_dir):
    """Shared by search_eval / search_eval_macro: the bm25_batch run cut
    to 10 (ranked on rounded scores) + corpus-derived sparse graded qrels
    (relevant = doc contains ALL the query's terms with Σtf > 3·nterms;
    grade = least(3, Σtf − 3·nterms))."""
    from pyspark.sql import Window

    from mini_search_engine_spark.index.build import tokenize_docs
    from mini_search_engine_spark.search import bm25_topk_batch

    idx = _index(spark, sf_dir)
    raw = bm25_topk_batch(idx, BM25_BATCH, topk=50)
    r = raw.withColumn("score", F.round("score", 6))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    run = (
        r.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("qid", "docid", "rank")
    )
    toks = tokenize_docs(load_documents(spark, sf_dir), ANALYZER).select(
        "docid", "term", "tf"
    )
    qt = spark.createDataFrame(
        [
            (qid, t, len(set(ts)))
            for qid, ts in BM25_BATCH.items()
            for t in sorted(set(ts))
        ],
        "qid string, term string, nterms int",
    )
    qrels = (
        toks.join(F.broadcast(qt), "term")
        .groupBy("qid", "docid")
        .agg(
            F.count("*").alias("matched"),
            F.max("nterms").alias("nterms"),
            F.sum("tf").alias("tfsum"),
        )
        .filter(F.col("matched") == F.col("nterms"))
        .select(
            "qid",
            "docid",
            F.least(F.lit(3), F.col("tfsum") - 3 * F.col("nterms"))
            .cast("int")
            .alias("grade"),
        )
        .filter(F.col("grade") > 0)
    )
    return run, qrels


def q_search_eval(spark, sf_dir):
    """Relevance eval harness (search/evalmetrics.py relevance_metrics):
    nDCG@10 / MRR / P@10 / recall@10 per query of the bm25_batch run,
    against graded qrels derived from the corpus itself (sparse raw-tf
    grading that BM25's dl normalization disagrees with, so the metrics
    are non-degenerate) — one run⋈qrels join + two aggregations, no
    driver loop over queries."""
    from mini_search_engine_spark.search import relevance_metrics

    run, qrels = _eval_run_qrels(spark, sf_dir)
    m = relevance_metrics(run, qrels, k=10)
    return m.select(
        "qid",
        F.round("p_at_k", 6).alias("p_at_k"),
        F.round("recall_at_k", 6).alias("recall_at_k"),
        F.round("rr", 6).alias("rr"),
        F.round("ndcg_at_k", 6).alias("ndcg_at_k"),
        "n_rel",
    ).orderBy("qid")


def q_search_eval_macro(spark, sf_dir):
    """Macro summary: one row of query-averaged P@10 / recall@10 / MRR /
    nDCG@10 — the dashboard headline numbers, TREC macro convention.
    For hash determinism the gate averages the ROUNDED per-query metrics
    on both sides (averaging unrounded doubles would race the 6th decimal
    across engines); the `macro_metrics` API itself (unrounded averages)
    is pytest-verified against a pure-Python reference."""
    per_q = q_search_eval(spark, sf_dir)
    return per_q.agg(
        F.count("*").cast("long").alias("n_queries"),
        F.round(F.avg("p_at_k"), 6).alias("mean_p_at_k"),
        F.round(F.avg("recall_at_k"), 6).alias("mean_recall_at_k"),
        F.round(F.avg("rr"), 6).alias("mrr"),
        F.round(F.avg("ndcg_at_k"), 6).alias("mean_ndcg_at_k"),
    )


def q_significant_terms(spark, sf_dir):
    """Significant-terms aggregation (search/morelike.py
    significant_terms): terms overrepresented in the lang='de' slice vs
    the whole corpus — foreground dfs from the INDEX (postings explode +
    semi-join), background dfs from the termstats sidecar."""
    from mini_search_engine_spark.search import significant_terms

    docs = load_documents(spark, sf_dir)
    fg = docs.filter(F.col("lang") == "de").select("docid")
    return significant_terms(_index(spark, sf_dir), fg, topk=20, min_fg_df=2)


def q_index_diff(spark, sf_dir):
    """Vocabulary drift report (index/build.py index_diff): full-outer
    join of two snapshots' O(vocab) termstats sidecars on the 60-bit int
    term id — old = even-docid half, new = full corpus, so every status
    except 'removed'/'shrunk' occurs."""
    from mini_search_engine_spark.index.build import index_diff

    docs = load_documents(spark, sf_dir)
    old = build_index(
        docs.filter(F.col("docid") % 2 == 0), analyzer=ANALYZER, block_span=BLOCK_SPAN
    )
    new = build_index(docs, analyzer=ANALYZER, block_span=BLOCK_SPAN)
    return index_diff(old, new).orderBy("term")


def q_champion_bm25(spark, sf_dir):
    """Static index pruning (index/prune.py champion_index): BM25 top-10
    served from the champion tier (each term's top-8 postings by impact
    order tf DESC, dl ASC, docid ASC; global df/avgdl retained so
    surviving docs score exactly as on the full index). The oracle
    replicates the pruning rule in SQL — this entry hash-checks the
    trade's exact semantics, not an approximation."""
    from mini_search_engine_spark.index.prune import champion_index

    tier = champion_index(_index(spark, sf_dir), n_per_term=8)
    raw = bm25_topk(tier, ["spark", "merge"], topk=50)
    return _round_score(raw, k=10)


def q_rescore_topk(spark, sf_dir):
    """Two-phase retrieval (search/ranking.py rescore_topk): champion-tier
    first pass (top-8 postings per term) nominates 30 candidates on the
    6dp-rounded tier score, then the FULL index rescores exactly those
    docs — candidate errors stay confined to never-nominated docs, scores
    of returned docs are exact. The oracle replicates both phases."""
    from mini_search_engine_spark.index.prune import champion_index
    from mini_search_engine_spark.search import rescore_topk

    idx = _index(spark, sf_dir)
    tier = champion_index(idx, n_per_term=8)
    raw = rescore_topk(idx, tier, ["spark", "merge"], fetch_k=30, topk=20)
    return _round_score(raw, k=10)


def q_anchor_texts(spark, sf_dir):
    """Anchor-field construction (search/anchor.py): per target, inbound
    link snippets (first 3 whitespace tokens of each linking doc)
    aggregated in ascending-src order — ONE hash exchange on dst, hub skew
    capped by max_anchors inside the same partitioning."""
    from mini_search_engine_spark.search import anchor_texts

    docs = load_documents(spark, sf_dir)
    edges, _ = _edges(spark, sf_dir)
    return anchor_texts(docs, edges, n_tokens=3, max_anchors=64)


def q_anchor_rank(spark, sf_dir):
    """Anchor-text BM25F (search/anchor.py anchor_bm25): the link graph's
    anchor field gets its OWN index (own df/avgdl — anchor vocabularies
    are repetitive; sharing content stats would crush anchor idf) and a
    2.0 boost over the body, combined via multi_field_bm25."""
    from mini_search_engine_spark.search import anchor_bm25

    docs = load_documents(spark, sf_dir)
    edges, _ = _edges(spark, sf_dir)
    return _round_score(
        anchor_bm25(
            docs, edges, ["spark", "merge"], topk=None, analyzer=ANALYZER
        ),
        k=10,
    )


def q_substring_search(spark, sf_dir):
    """Trigram-indexed substring search (index/trigram.py — the Google
    Code Search / Zoekt structure): the literal's RAREST trigram posting
    lists are intersected for candidates, then contains() verifies exactly
    on the candidate-pruned corpus only. 'fast key order' has 12 trigrams
    → the max_grams=8 rarest-first pruning path is exercised."""
    from mini_search_engine_spark.index.trigram import (
        build_trigram_index,
        substring_search,
    )

    docs = load_documents(spark, sf_dir)
    idx = build_trigram_index(docs)
    return substring_search(idx, docs, "fast key order")


def q_index_stats(spark, sf_dir):
    """One-row index health report from the sidecar tables only."""
    from mini_search_engine_spark.index.build import index_stats

    return index_stats(_index(spark, sf_dir))


def q_import_rank(spark, sf_dir):
    """File-dependency PageRank (ops/symbols.py import extraction →
    module-name join → search/pagerank.py): each doc declares module
    m<id> and imports two others; edges come from STRING extraction +
    name resolution, not arithmetic — the real pipeline a repo corpus
    needs for 'most-depended-on file' ranking."""
    from mini_search_engine_spark.ops import import_edges

    docs = load_documents(spark, sf_dir)
    n = docs.count()
    decl = F.concat(
        F.lit("module m"), F.col("docid"),
        F.lit(" import m"), (F.col("docid") * 7 + 3) % n,
        F.lit(" import m"), (F.col("docid") * 13 + 5) % n,
        F.lit(" "), F.col("content"),
    )
    edges = import_edges(docs.withColumn("content", decl))
    pr = pagerank(edges, num_iter=5, nodes=docs.select("docid"))
    return pr.select("docid", F.round("pagerank", 6).alias("pagerank")).orderBy("docid")


def q_more_like_this(spark, sf_dir):
    """More-like-this for doc 0 (search/morelike.py): its 5 highest-tf·idf
    terms drive a BM25 query, source excluded — one bounded collect + one
    postings-pruned query, no doc-vector self-join."""
    from mini_search_engine_spark.search import more_like_this

    docs = load_documents(spark, sf_dir)
    return more_like_this(_index(spark, sf_dir), docs, 0, k=10, max_terms=5)


def q_symbols(spark, sf_dir):
    """Symbol extraction (ops/symbols.py): a python-style and a
    class-style declaration derived per doc from its first 4 words;
    regexp_extract_all pulls every declared identifier."""
    from mini_search_engine_spark.ops import extract_symbols

    docs = load_documents(spark, sf_dir)
    w = F.split(F.col("content"), " ")

    def cap(i):
        t = F.element_at(w, i)
        return F.concat(F.upper(F.substring(t, 1, 1)), F.expr(
            f"substring(element_at(split(content, ' '), {i}), 2)"
        ))

    decl = F.concat_ws(
        " ",
        F.concat(F.lit("def "), F.element_at(w, 1), F.lit("_"), F.element_at(w, 2), F.lit("():")),
        F.concat(F.lit("class "), cap(3), cap(4), F.lit(":")),
        F.col("content"),
    )
    return extract_symbols(docs.withColumn("content", decl)).orderBy("docid", "symbol")


def q_facets(spark, sf_dir):
    """Faceted result counts (search/facets.py): per-(lang, source) match
    counts for the keyword 'spark' — index prunes the match set, the
    corpus is semi-joined down to it, one groupBy produces the UI strip."""
    from mini_search_engine_spark.search import facet_counts

    docs = load_documents(spark, sf_dir)
    res = search_keyword(_index(spark, sf_dir), "spark")
    return facet_counts(res, docs, ["lang", "source"])


def q_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval (search/hybrid.py): RRF fusion (k0=60) of BM25
    top-20 for [spark, merge] with cosine top-20 around embedding 0
    (embeddings ids are docids). Both input rankings use the rounded-
    score + docid ordering so ranks are reproducible cross-engine."""
    from mini_search_engine_spark.ops.ann import cosine_scores
    from mini_search_engine_spark.search import rrf_fuse
    from mini_search_engine_spark.search.ranking import bm25_scores

    idx = _index(spark, sf_dir)
    lex = _round_score(bm25_scores(idx, ["spark", "merge"]), k=20)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    vec = (
        cosine_scores(emb, list(qv))
        .withColumnRenamed("vec_id", "docid")
        .withColumn("cosine", F.round("cosine", 6))
        .orderBy(F.desc("cosine"), F.asc("docid"))
        .limit(20)
    )
    return rrf_fuse([(lex, "score"), (vec, "cosine")], topk=10)


def q_did_you_mean(spark, sf_dir):
    """Spell correction for the typo 'spakr': closest dictionary terms by
    (edit distance, df desc). Vocab-sidecar only."""
    from mini_search_engine_spark.search import did_you_mean

    return did_you_mean(_index(spark, sf_dir), "spakr", max_edits=2, k=3)


def q_regex_search(spark, sf_dir):
    """Trigram-pruned REGEX search (index/trigram.py regex_search — the
    Cox/Google-Code-Search reduction): '(fast|slow) key order\\w*' has the
    required literal ' key order'; its trigram AND prunes candidates, the
    real regex verifies only those. The alternation contributes nothing to
    pruning and everything to verification."""
    from mini_search_engine_spark.index.trigram import (
        build_trigram_index,
        regex_search,
    )

    docs = load_documents(spark, sf_dir)
    idx = build_trigram_index(docs)
    return regex_search(idx, docs, r"(fast|slow) key order\w*")


def q_suggest(spark, sf_dir):
    """Search-as-you-type: top-10 dictionary terms for prefix 's' by df
    (ties lexical). Termstats-sidecar only — corpus-size-independent."""
    from mini_search_engine_spark.search import suggest

    return suggest(_index(spark, sf_dir), "s", k=10)


def q_tfidf(spark, sf_dir):
    return _round_score(
        search_tfidf(_index(spark, sf_dir), ["spark", "merge"], topk=None), k=10
    )


def q_bm25(spark, sf_dir):
    # widen before rounding+re-limiting so rounded ties resolve by docid
    raw = bm25_topk(_index(spark, sf_dir), ["spark", "merge"], topk=50)
    return _round_score(raw, k=10)


def q_bm25_fused_cold(spark, sf_dir):
    """The warm-serving cold-term BM25 path (VERDICT r3 item 6): a
    ``warm()``-pinned index with an EMPTY df memo routes through
    ``_bm25_topk_fused_cold`` — df recovered inside the scoring job via a
    tid-window over the per-block n, one driver round trip. Shares the
    bm25_topk oracle: the fused plan must be score-identical to the
    probe+literal plan (and to DuckDB)."""
    idx = build_index(
        load_documents(spark, sf_dir),
        analyzer=ANALYZER,
        block_span=BLOCK_SPAN,
        compress=True,
    ).warm()
    assert idx.df_cache == {}  # cold: the fused path is the one exercised
    raw = bm25_topk(idx, ["spark", "merge"], topk=50)
    return _round_score(raw, k=10)


BM25_BATCH = {
    "qa": ["spark", "merge"],
    "qb": ["filter", "join", "scan"],
    "qc": ["fast", "key", "order"],
    "qd": ["zzzunseen"],  # absent term → contributes no rows
}


def q_bm25_batch(spark, sf_dir):
    """Batched multi-query BM25 (search/ranking.py bm25_topk_batch): all
    four queries scored in ONE job — union-tid postings scan + broadcast
    (qid, tid, w) join + per-qid window top-k. Scores must equal the
    per-query bm25_topk path (and DuckDB) exactly."""
    from pyspark.sql import Window

    from mini_search_engine_spark.search import bm25_topk_batch

    raw = bm25_topk_batch(_index(spark, sf_dir), BM25_BATCH, topk=50)
    r = raw.withColumn("score", F.round("score", 6))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        r.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 10)
        .select("qid", "docid", "score", "rank")
    )


def q_bm25_page2(spark, sf_dir):
    """Keyset pagination (search/ranking.py bm25_page): page 2 of 5 is
    fetched THROUGH the search_after cursor taken from page 1's last row
    (a bounded 5-row collect), never via OFFSET — per-page cost stays
    constant in page depth. Oracle = rows ranked 6-10 of the same BM25."""
    from mini_search_engine_spark.search import bm25_page

    idx = _index(spark, sf_dir)
    page1 = bm25_page(idx, ["spark", "merge"], page_size=5).collect()
    cursor = (page1[-1]["score"], page1[-1]["docid"])
    return _round_score(bm25_page(idx, ["spark", "merge"], 5, after=cursor))


def q_bm25_filtered(spark, sf_dir):
    """Structured + fulltext (search/structured.py bm25_topk_filtered):
    BM25 over the index restricted to a corpus predicate applied BEFORE
    the semi-join (it reaches the parquet scan as PushedFilters) — the
    true top-k OF the filtered set, not a filtered page."""
    from mini_search_engine_spark.search import bm25_topk_filtered

    out = bm25_topk_filtered(
        _index(spark, sf_dir),
        load_documents(spark, sf_dir),
        ["spark", "merge"],
        "n_chars >= 300 AND source IN ('src3', 'src7', 'src13')",
        topk=10,
    )
    return _round_score(out)


def q_collapse_by_source(spark, sf_dir):
    """Field collapsing (search/structured.py collapse_results): best hit
    per corpus `source`, then global top-10 — the dedup-by-field search-UI
    contract; the window runs on the term-pruned scored frame, never the
    corpus."""
    from mini_search_engine_spark.search import collapse_results
    from mini_search_engine_spark.search.ranking import bm25_scores

    idx = _index(spark, sf_dir)
    out = collapse_results(
        bm25_scores(idx, ["spark", "merge"]),
        load_documents(spark, sf_dir),
        "source",
        per_group=1,
        topk=10,
    )
    return out.withColumn("score", F.round("score", 6))


def q_bm25_explain(spark, sf_dir):
    """Score explain (search/structured.py bm25_explain): per-(doc, term)
    tf / df / idf / saturation / contribution rows for the top-3 result
    docs — contributions sum to the result score; the explain pass
    re-reads only the term-pruned blocks the query touched."""
    from mini_search_engine_spark.search import bm25_explain

    idx = _index(spark, sf_dir)
    top3 = [r["docid"] for r in bm25_topk(idx, ["spark", "merge"], 3).collect()]
    return bm25_explain(idx, ["spark", "merge"], top3)


def q_synonym_query(spark, sf_dir):
    """Query-time synonym expansion (search/querylang.py expand_synonyms):
    AST rewrite OR-expanding term leaves before the single-scan evaluate —
    synonyms just widen the tid pushdown set."""
    from mini_search_engine_spark.search import search_query

    return search_query(
        _index(spark, sf_dir), "spark AND merge", synonyms={"merge": ["flush"]}
    )


def q_doc_deletes_bm25(spark, sf_dir):
    """Doc-level merge-on-read deletes (index/deletes.py — the Iceberg
    equality-delete analog the reference lacks): tombstone every docid ≡ 3
    (mod 7) WITHOUT rewriting the index, then BM25 over the merged view.
    The oracle builds from scratch on the survivors — so df, n_docs, avgdl
    and every per-block array must all shift exactly."""
    from mini_search_engine_spark.index.deletes import apply_deletes

    idx = _index(spark, sf_dir)
    tomb = load_documents(spark, sf_dir).select("docid").filter(F.col("docid") % 7 == 3)
    raw = bm25_topk(apply_deletes(idx, tomb), ["spark", "merge"], topk=50)
    return _round_score(raw, k=10)


def q_upsert_bm25(spark, sf_dir):
    """Atomic on-disk upsert (streaming/ingest.upsert_docs — the Iceberg
    MERGE commit; the reference's only mutation is append): commit the
    base index, then ONE snapshot both appends the revised docs (fresh
    content-addressed docids) and tombstones the superseded ids in an
    equality-delete file; BM25 runs on the merged-on-read view. The
    oracle builds from scratch on the post-upsert corpus, so df, n_docs,
    avgdl and every posting block must shift exactly."""
    import os

    from mini_search_engine_spark.streaming import (
        read_segmented_index,
        upsert_docs,
        write_segment,
    )

    docs = load_documents(spark, sf_dir)
    # scratch path keyed by corpus dir AND app id (see q_ann_ivf)
    path = "/tmp/mse_upsert_idx_{}_{}".format(
        os.path.basename(os.path.normpath(sf_dir)),
        spark.sparkContext.applicationId,
    )
    write_segment(
        build_index(docs, analyzer=ANALYZER, block_span=BLOCK_SPAN), path, "base"
    )
    old = docs.filter(F.col("docid") % 11 == 4)
    revised = old.select(
        (F.col("docid") + 100000000).alias("docid"),
        F.concat(F.col("content"), F.lit(" upsert probe merge")).alias("content"),
    )
    upsert_docs(
        spark, path, revised, old.select("docid"),
        analyzer=ANALYZER, block_span=BLOCK_SPAN, seg_id="u1",
    )
    idx = read_segmented_index(spark, path, analyzer=ANALYZER, block_span=BLOCK_SPAN)
    return _round_score(bm25_topk(idx, ["spark", "merge"], topk=50), k=10)


def q_time_travel_bm25(spark, sf_dir):
    """Snapshot-isolation proof (Iceberg ``VERSION AS OF``): commit the
    base index (snapshot 0), run the SAME upsert as ``upsert_bm25``
    (snapshot 1: appended revised docs + equality-delete tombstones),
    then read the index PINNED AT SNAPSHOT 0 and score BM25. The oracle
    is the plain from-scratch BM25 over the UNMODIFIED corpus — so the
    time-travel view must be bit-exact to the pre-upsert state (segment
    list AND tombstone set), with zero leakage from the later commit."""
    import os

    from mini_search_engine_spark.streaming import (
        read_segmented_index,
        upsert_docs,
        write_segment,
    )

    docs = load_documents(spark, sf_dir)
    path = "/tmp/mse_timetravel_idx_{}_{}".format(
        os.path.basename(os.path.normpath(sf_dir)),
        spark.sparkContext.applicationId,
    )
    write_segment(
        build_index(docs, analyzer=ANALYZER, block_span=BLOCK_SPAN), path, "base"
    )
    old = docs.filter(F.col("docid") % 11 == 4)
    revised = old.select(
        (F.col("docid") + 100000000).alias("docid"),
        F.concat(F.col("content"), F.lit(" upsert probe merge")).alias("content"),
    )
    upsert_docs(
        spark, path, revised, old.select("docid"),
        analyzer=ANALYZER, block_span=BLOCK_SPAN, seg_id="u1",
    )
    idx = read_segmented_index(
        spark, path, analyzer=ANALYZER, block_span=BLOCK_SPAN, snapshot_id=0
    )
    return _round_score(bm25_topk(idx, ["spark", "merge"], topk=50), k=10)


def q_bm25_pruned(spark, sf_dir):
    raw = bm25_topk(
        _index(spark, sf_dir), ["filter", "join", "scan"], topk=50, prune=True
    )
    return _round_score(raw, k=10)


def q_term_df(spark, sf_dir):
    idx = _index(spark, sf_dir)
    return idx.termstats.select("term", "df")


def q_doclens(spark, sf_dir):
    idx = _index(spark, sf_dir)
    return idx.doclens.select("docid", F.col("dl").cast("long").alias("dl"))


def q_postings_blocks(spark, sf_dir):
    """Codec roundtrip + blocking check: build compressed, decode, emit block
    stats. Postings are tid-encoded; the term string comes from a broadcast
    join against the (vocabulary-sized) termstats dictionary sidecar —
    exactly how any user-facing term-labelled output is produced."""
    docs = load_documents(spark, sf_dir)
    idx = build_index(docs, analyzer=ANALYZER, block_span=BLOCK_SPAN, compress=True)
    return (
        idx.decoded()
        .postings.join(F.broadcast(idx.termstats.select("tid", "term")), "tid")
        .select("term", "block", F.size("docids").cast("long").alias("n"))
    )


def _edges(spark, sf_dir):
    docs = load_documents(spark, sf_dir)
    n = docs.count()
    return (
        docs.select(F.col("docid").alias("src"), ((F.col("docid") * 7 + 3) % n).alias("dst"))
        .unionByName(
            docs.select(
                F.col("docid").alias("src"), ((F.col("docid") * 13 + 5) % n).alias("dst")
            )
        )
    ), docs.select("docid")


def q_pagerank(spark, sf_dir):
    edges, nodes = _edges(spark, sf_dir)
    pr = pagerank(edges, num_iter=5, nodes=nodes)
    return pr.select("docid", F.round("pagerank", 6).alias("pagerank")).orderBy("docid")


def q_combined(spark, sf_dir):
    idx = _index(spark, sf_dir)
    scored = search_tfidf(idx, ["spark"], topk=None)
    edges, nodes = _edges(spark, sf_dir)
    pr = pagerank(edges, num_iter=5, nodes=nodes)
    out = combined_search(scored, pr, weight=1.0, topk=None)
    return (
        out.withColumn("combined", F.round("combined", 6))
        .select("docid", "combined")
        .orderBy(F.desc("combined"), F.asc("docid"))
        .limit(10)
    )


def q_dedup_exact(spark, sf_dir):
    return exact_dedup(load_documents(spark, sf_dir))


def q_minhash(spark, sf_dir):
    sigs = minhash_signatures(load_documents(spark, sf_dir))
    return sigs.select("docid", F.posexplode("sig").alias("j", "minhash"))


def q_minhash_pairs(spark, sf_dir):
    return minhash_candidate_pairs(load_documents(spark, sf_dir))


def _scratch(prefix: str, spark, sf_dir) -> str:
    import os

    return "/tmp/{}_{}_{}".format(
        prefix,
        os.path.basename(os.path.normpath(sf_dir)),
        spark.sparkContext.applicationId,
    )


def q_incremental_dedup(spark, sf_dir):
    """Nightly incremental near-dedup THROUGH STORAGE: corpus docs with
    docid % 4 != 0 play the existing (already-deduped) corpus — their LSH
    band keys are written to a Hive-partitioned parquet store — and docs
    with docid % 4 == 0 play the incoming batch, deduped against the store
    plus within themselves. The store streams once under broadcast probes
    (no store shuffle; plan asserted in tests/test_incremental.py)."""
    from mini_search_engine_spark.ops import (
        incremental_minhash_flags,
        read_minhash_store,
        write_minhash_store,
    )

    docs = load_documents(spark, sf_dir)
    path = _scratch("mse_mh_store", spark, sf_dir)
    write_minhash_store(docs.filter(F.col("docid") % 4 != 0), path)
    store = read_minhash_store(spark, path)
    batch = docs.filter(F.col("docid") % 4 == 0)
    out = incremental_minhash_flags(batch, store)
    # presentation only: -1 sentinel for "no match" so the gate's
    # order-insensitive tuple sort never compares int with NULL
    return out.select(
        "docid",
        F.coalesce("store_match", F.lit(-1)).alias("store_match"),
        F.coalesce("batch_match", F.lit(-1)).alias("batch_match"),
        "is_dup",
    ).orderBy("docid")


def q_incremental_exact(spark, sf_dir):
    """Exact-content incremental dedup against a persisted (sha,
    canonical_docid) store; same batch/corpus split and broadcast-probe
    plan shape as incremental_dedup."""
    from mini_search_engine_spark.ops import (
        incremental_exact_flags,
        read_exact_store,
        write_exact_store,
    )

    docs = load_documents(spark, sf_dir)
    path = _scratch("mse_sha_store", spark, sf_dir)
    write_exact_store(docs.filter(F.col("docid") % 4 != 0), path)
    store = read_exact_store(spark, path)
    batch = docs.filter(F.col("docid") % 4 == 0)
    out = incremental_exact_flags(batch, store)
    return out.select(
        "docid",
        F.coalesce("store_canonical", F.lit(-1)).alias("store_canonical"),
        F.coalesce("batch_dup_of", F.lit(-1)).alias("batch_dup_of"),
        "is_dup",
    ).orderBy("docid")


def q_duplicate_spans(spark, sf_dir):
    """Exact duplicate-span detection (ops/dedup.py duplicate_spans):
    8-token windows appearing verbatim in ≥2 docs, with per-doc duplicated
    token coverage (interval union, overlaps not double-counted)."""
    from mini_search_engine_spark.ops import duplicate_spans

    return duplicate_spans(load_documents(spark, sf_dir), window=8).orderBy("docid")


def q_remove_spans(spark, sf_dir):
    """Span REMOVAL (ops/dedup.py remove_duplicate_spans): cross-doc
    8-token runs are cut everywhere except their canonical (min-docid)
    doc; every doc passes through with its cleaned token stream + counts."""
    from mini_search_engine_spark.ops import remove_duplicate_spans

    return remove_duplicate_spans(load_documents(spark, sf_dir), window=8).orderBy("docid")


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (ops/dedup.py decontaminate): docs with
    docid % 10 == 0 play the eval set; every other doc sharing a verbatim
    8-token window with it is flagged with its contaminated-token
    coverage. Train side shuffles nothing — the eval window-hash set is
    broadcast and the semi-join runs map-side."""
    from mini_search_engine_spark.ops import decontaminate

    docs = load_documents(spark, sf_dir)
    ev = docs.filter(F.col("docid") % 10 == 0)
    tr = docs.filter(F.col("docid") % 10 != 0)
    return decontaminate(tr, ev, window=8).orderBy("docid")


def q_dedup_clusters(spark, sf_dir):
    """Connected components over MinHash-LSH candidate pairs
    (ops/cluster.py min-label propagation): every document mapped to its
    near-dup cluster id (= min docid in the component; singletons keep
    their own docid). The DuckDB oracle recomputes components with a
    recursive reachability CTE — the iterative Spark loop must land on
    the identical fixed point."""
    from mini_search_engine_spark.ops import dedup_clusters

    return dedup_clusters(load_documents(spark, sf_dir)).orderBy("docid")


def q_simhash(spark, sf_dir):
    return simhash(load_documents(spark, sf_dir))


def q_jaccard(spark, sf_dir):
    out = ngram_jaccard_pairs(load_documents(spark, sf_dir), threshold=0.2)
    return out.withColumn("jaccard", F.round("jaccard", 6))


def q_ann_cosine(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    out = cosine_topk(emb, list(q), k=10)
    return out.select("vec_id", F.round("cosine", 6).alias("cosine")).orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )


def q_mmr_rerank(spark, sf_dir):
    """MMR diversification (ops/ann.py mmr_rerank): cluster does the
    exact distributed top-fetch_k; the inherently sequential greedy runs
    driver-side over that page-sized survivor set (lam=0.5 keeps both
    MMR weights exactly representable so the DuckDB unrolled-greedy
    oracle is bit-comparable at 6dp)."""
    from mini_search_engine_spark.ops import mmr_rerank

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # query = perturbed vec 0 (0.9·v + 0.1), NOT vec 0 itself: a query
    # equal to a corpus vector makes every post-first-pick MMR score
    # exactly 0 (rel ≡ max_sim), leaving ranks to float noise
    q = [
        0.9 * float(x) + 0.1
        for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    out = mmr_rerank(emb, q, k=5, fetch_k=50, lam=0.5)
    return out.select(
        "vec_id",
        F.round("cosine", 6).alias("cosine"),
        F.round("mmr_score", 6).alias("mmr_score"),
        "rank",
    )


def q_embed_neardup(spark, sf_dir):
    """Exact all-pairs cosine near-dup — the CORRECTNESS HARNESS entry
    (ADVICE r2 item 4): it matches the (equally quadratic) DuckDB oracle by
    construction at any scale factor, so the oracle gate can never flake on
    a probabilistic LSH miss. The SHIPPING scale path is the separate
    ``embed_neardup_lsh`` entry below; never run this plan at real scale."""
    from mini_search_engine_spark.ops.ann import cosine_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_pairs(emb, threshold=0.35)


def q_embed_neardup_lsh(spark, sf_dir):
    """The SHIPPING near-dup plan: banded hyperplane LSH candidates (4 bits
    × 96 bands, deterministic seed) + exact cosine on candidates only
    (VERDICT r1 item 1). Shares the exact oracle: per-pair miss probability
    is < 4e-7 at cosine 0.35, and for the FIXED test corpora + seed the
    outcome is deterministic — pytest asserts losslessness vs the quadratic
    plan at sf0.001, sf0.01 AND sf0.1, covering every sf the driver runs."""
    from mini_search_engine_spark.ops.ann import lsh_cosine_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return lsh_cosine_pairs(emb, threshold=0.35)


def q_ann_ivf(spark, sf_dir):
    """IVF index path end-to-end THROUGH STORAGE (VERDICT r2 item 5): fit
    quantizer → assign lists → write Hive-partitioned by ``ivf_list`` →
    read back → probe. Both probe plans below run against the on-disk
    index, so the ``ivf_list IN (...)`` probe filter lands in the scan's
    PartitionFilters — asserted here for a genuinely pruned ``nprobe=2``
    probe AND for the returned query itself. The RETURNED result probes
    ALL lists, which is provably the exact scan, so it shares the
    ann_cosine oracle; result-equivalence of pruned probes is covered by
    ``tests/test_ops.py::test_ivf_partition_pruning``."""
    import os

    from mini_search_engine_spark.ops.ann import (
        ivf_assign,
        ivf_cosine_topk,
        ivf_fit_centroids,
        read_ivf_index,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = list(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    cent = ivf_fit_centroids(emb, n_centroids=8, n_iter=4)
    # scratch path keyed by corpus dir AND Spark application id: two
    # concurrent runs over same-named corpus dirs must not overwrite each
    # other's on-disk index while the returned DataFrame is still lazily
    # read (per-app suffix also bounds /tmp growth: one dir per app run,
    # overwritten across repeated calls within the app)
    path = "/tmp/mse_ivf_index_{}_{}".format(
        os.path.basename(os.path.normpath(sf_dir)), spark.sparkContext.applicationId
    )
    write_ivf_index(ivf_assign(emb, cent), path)
    disk = read_ivf_index(spark, path)

    def _assert_partition_filters(df):
        # non-vacuous check: 'ivf_list' must appear INSIDE a non-empty
        # PartitionFilters [...] list (every parquet scan prints a
        # 'PartitionFilters:' header even when pruning regressed to '[]',
        # and 'ivf_list' alone also matches ordinary post-scan Filters)
        import re

        plan = df._jdf.queryExecution().executedPlan().toString()
        pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert any("ivf_list" in body for body in pf), plan

    _assert_partition_filters(ivf_cosine_topk(disk, cent, q, k=10, nprobe=2))
    out = ivf_cosine_topk(disk, cent, q, k=10, nprobe=8)
    out = out.select("vec_id", F.round("cosine", 6).alias("cosine")).orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    _assert_partition_filters(out)
    return out


def q_langid(spark, sf_dir):
    return language_id(load_documents(spark, sf_dir))


def q_quality(spark, sf_dir):
    return quality_scores(load_documents(spark, sf_dir))


def q_token_counts(spark, sf_dir):
    return token_counts(load_documents(spark, sf_dir))


def q_fingerprint(spark, sf_dir):
    return fingerprints(load_documents(spark, sf_dir))


def q_frequent_ngrams(spark, sf_dir):
    """Frequent trigram mining (ops/textstats.py frequent_ngrams): grams
    generated natively per doc (transform over start offsets, slice +
    array_join — no positional self-join), one hash agg, min_count=5
    tail cut before the top-50."""
    from mini_search_engine_spark.ops import frequent_ngrams

    return frequent_ngrams(load_documents(spark, sf_dir), n=3, min_count=5, topk=50)


def q_doc_vectors(spark, sf_dir):
    """Sparse tf-idf doc-vector export (ops/vectors.py doc_vectors):
    (docid, tid, weight) triplets with the portable 60-bit term id — the
    ML-feature export path; the oracle re-derives the SAME ids via
    DuckDB's md5, hash-checking cross-engine id parity itself."""
    from mini_search_engine_spark.ops import doc_vectors

    out = doc_vectors(_index(spark, sf_dir))
    return out.select("docid", "tid", F.round("weight", 6).alias("weight")).orderBy(
        "docid", "tid"
    )


def q_next_words(spark, sf_dir):
    """Next-word continuation for 'fast' (ops/textstats.py next_words):
    the bigram half of type-ahead — anchor filter lands BEFORE the
    aggregation, so only the anchor's successors are ever counted."""
    from mini_search_engine_spark.ops import next_words

    return next_words(load_documents(spark, sf_dir), "fast", topk=10)


def q_collocations(spark, sf_dir):
    """Top bigram collocations by PMI (ops/textstats.py collocations):
    bigrams generated natively per doc (arrays_zip of the token array
    against its 1-shift — no positional self-join), min_count tail prune
    BEFORE the unigram joins."""
    from mini_search_engine_spark.ops import collocations

    return collocations(load_documents(spark, sf_dir), min_count=5, topk=50)


def q_doc_chunks(spark, sf_dir):
    """Overlapping token-window chunking (ops/chunk.py) — the pre-training
    split step. Pure narrow Catalyst: split, sequence-of-starts, explode,
    slice; no shuffle, no Python."""
    from mini_search_engine_spark.ops import chunk_documents

    return chunk_documents(
        load_documents(spark, sf_dir), chunk_size=16, overlap=4, text_col="content"
    )


def q_media_features(spark, sf_dir):
    """REAL multimodal decode end-to-end (ops/multimodal.py): synthesize
    valid binary PPM / PCM WAV payloads per doc, decode them with the
    stdlib parsers inside the Arrow mapInPandas pass, and reconstruct the
    header fields FROM THE DECODED FEATURES. The oracle recomputes the
    same fields from the synthesis formulas — a hash match proves the
    payload bytes really round-tripped through the decoder."""
    from mini_search_engine_spark.ops import extract_features, synthesize_real_media

    feats = extract_features(synthesize_real_media(load_documents(spark, sf_dir)))
    is_img = F.col("media_type") == "image"
    is_aud = F.col("media_type") == "audio"
    f = lambda i: F.element_at("features", i)  # noqa: E731
    return feats.select(
        "docid",
        "media_type",
        F.when(is_img, F.round(f(1) * 1e4).cast("long")).alias("width"),
        F.when(is_img, F.round(f(2) * 1e4).cast("long")).alias("height"),
        F.when(is_aud, F.round(f(1) * 1e5).cast("long")).alias("sample_rate"),
        F.when(is_aud, F.round(f(2) * 1e6).cast("long")).alias("n_samples"),
    )


def q_bpe_counts(spark, sf_dir):
    """Honest subword token counting (ops/bpe.py): deterministic greedy
    BPE fit driver-side on a bounded corpus sample, applied distributed
    with a per-pre-token memoized pandas kernel. No SQL oracle exists for
    learned merges (rows-only driver check); the correctness evidence is
    tests/test_bpe.py's naive-recount and merge-replay references."""
    from mini_search_engine_spark.ops import bpe_token_counts, train_bpe_corpus

    docs = load_documents(spark, sf_dir)
    merges = train_bpe_corpus(docs, n_merges=256, sample_docs=500)
    return bpe_token_counts(docs, merges)


def q_nb_classify(spark, sf_dir):
    """Distributed multinomial Naive Bayes (ops/classify.py) — the quality/
    language classifier stage of a training-data pipeline (fastText's role
    in CCNet / GPT-3 app. A quality filtering). Self-train on the documents
    table with lang as the label, classify every doc. Train = one
    groupBy(label, token) + one pivot; score = one broadcast model join +
    one groupBy(docid). The oracle replicates the exact Laplace-smoothed
    log-probability decomposition (prior + n*floor + sum ln(c+1))."""
    from mini_search_engine_spark.ops import nb_classify

    return nb_classify(load_documents(spark, sf_dir), content_col="content", label_col="lang")


def q_lm_perplexity(spark, sf_dir):
    """Bigram-LM perplexity quality scoring (ops/lm.py) — the CCNet /
    Gopher perplexity-filter stage. Self-train an add-one bigram model
    (ONE groupBy(prev, cur); context totals + vocab derive from it), score
    every doc's cross-entropy + perplexity via two broadcast model joins +
    one groupBy(docid). Oracle replicates the exact smoothed decomposition
    ln(C(prev,cur)+1) - ln(C(prev)+V) in DuckDB."""
    from mini_search_engine_spark.ops import lm_perplexity

    return lm_perplexity(load_documents(spark, sf_dir))


def q_ltr_features(spark, sf_dir):
    """LTR feature export (search/ltr.py): per (query, candidate) rows with
    bm25 + reference tfidf dot + matched_terms/sum_tf/dl + pagerank, one
    postings scan for the whole batch (bm25_topk_batch design), per-query
    BM25 top-20 cut before the (small) pagerank join."""
    from mini_search_engine_spark.search import ltr_features

    idx = _index(spark, sf_dir)
    edges, nodes = _edges(spark, sf_dir)
    pr = pagerank(edges, num_iter=5, nodes=nodes).select(
        "docid", F.round("pagerank", 6).alias("pagerank")
    )
    out = ltr_features(
        idx,
        {k: v for k, v in BM25_BATCH.items() if k != "qd"},
        pagerank_df=pr,
        topk=20,
    )
    return out.select(
        "qid",
        "docid",
        F.round("bm25", 6).alias("bm25"),
        F.round("tfidf_dot", 6).alias("tfidf_dot"),
        "matched_terms",
        "sum_tf",
        "dl",
        "pagerank",
    ).orderBy("qid", "docid")


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (ops/dsir.py, Xie 2302.03169): docs with
    docid % 7 == 0 play the high-quality target set, the rest the raw
    crawl; hashed-bigram bucket models (K=2048, Laplace) on both sides,
    per-doc log importance = Σ ln(P_t/P_r) over its features. Bucket
    tables collapse to ≤K rows (bounded driver fold), the log-ratio table
    broadcasts back."""
    from mini_search_engine_spark.ops import dsir_log_weights

    docs = load_documents(spark, sf_dir)
    out = dsir_log_weights(
        docs.filter(F.col("docid") % 7 != 0),
        docs.filter(F.col("docid") % 7 == 0),
        buckets=2048,
    )
    return out.select(
        "docid", "n_features", F.round("log_weight", 6).alias("log_weight")
    ).orderBy("docid")


def q_dsir_select(spark, sf_dir):
    """Gumbel-top-k importance resampling over the dsir_weights split:
    deterministic salted-hash Gumbel noise, scores rounded to 6dp before
    the rank cut so the selected set is engine-exact."""
    from mini_search_engine_spark.ops import dsir_select

    docs = load_documents(spark, sf_dir)
    return dsir_select(
        docs.filter(F.col("docid") % 7 != 0),
        docs.filter(F.col("docid") % 7 == 0),
        k=150,
        buckets=2048,
    ).orderBy(F.desc("score"), F.asc("docid"))


def q_perplexity_buckets(spark, sf_dir):
    """CCNet §4.4 perplexity bucketing: head/middle/tail at per-language
    perplexity terciles over the lm_perplexity scores; short docs land in
    'unscored'. Scores AND cut points rounded to 6dp before the comparison
    (pq.py DIST_ROUND pattern) so buckets are engine-reproducible; the
    quantile rows broadcast back — no extra corpus shuffle."""
    from mini_search_engine_spark.ops import perplexity_buckets

    out = perplexity_buckets(load_documents(spark, sf_dir), lang_col="lang")
    return out.select(
        "docid",
        "lang",
        F.coalesce("perplexity", F.lit(-1.0)).alias("perplexity"),
        "bucket",
    ).orderBy("docid")


def q_source_stats(spark, sf_dir):
    """Per-source curation report (ops/domains.py) — the RefinedWeb /
    Gopher host-level filtering stage: ONE groupBy(source) over row-local
    sha256 + quality expressions; keep thresholds applied to the rounded
    aggregates. min_avg_tokens=55 splits this corpus's sources
    non-degenerately (avg_tokens spans ~48-66)."""
    from mini_search_engine_spark.ops import source_stats

    return source_stats(load_documents(spark, sf_dir), min_avg_tokens=55.0)


def q_source_filtered(spark, sf_dir):
    """Docs surviving the source-level filter — proves the O(#sources)
    verdict broadcasts back onto the corpus as a left-semi join."""
    from mini_search_engine_spark.ops import source_filter

    return source_filter(load_documents(spark, sf_dir), min_avg_tokens=55.0).select(
        "docid", "source"
    )


_CURATE_KW = dict(
    min_avg_tokens=55.0,  # source gate: splits this corpus ~half
    min_doc_tokens=55,  # doc gate: ~half the docs
    window=8,
    max_contam_frac=0.0,  # any shared 8-token window with eval drops
    sample_rate=0.9,
    salt="curate-v1",
)


def _curate_io(spark, sf_dir):
    docs = load_documents(spark, sf_dir)
    ev = docs.filter(F.col("docid") % 10 == 0)
    tr = docs.filter(F.col("docid") % 10 != 0)
    return tr, ev


def q_curated_docs(spark, sf_dir):
    """End-to-end curation pipeline (ops/curate.py): source filter →
    exact dedup → doc token gate → decontamination vs the docid%10==0
    eval slice → deterministic 90% hash sample, as ONE lazy plan."""
    from mini_search_engine_spark.ops import curate

    tr, ev = _curate_io(spark, sf_dir)
    return curate(tr, eval_docs=ev, **_CURATE_KW).select("docid", "source")


def q_curation_funnel(spark, sf_dir):
    """Per-stage survivor counts for the same pipeline."""
    from mini_search_engine_spark.ops import curation_funnel

    tr, ev = _curate_io(spark, sf_dir)
    return curation_funnel(tr, eval_docs=ev, **_CURATE_KW)


def q_pq_codes(spark, sf_dir):
    """Product-quantization encode (ops/pq.py): every embedding → 8
    4-bit-range codes via one Arrow-batched argmin pass against the
    seeded fixture codebooks; exploded to (vec_id, sub, code) scalars for
    the cross-engine hash."""
    from mini_search_engine_spark.ops import pq_encode, seeded_codebooks

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    enc = pq_encode(emb, seeded_codebooks())
    return enc.select("vec_id", F.posexplode("codes").alias("sub", "code"))


def q_pq_adc_topk(spark, sf_dir):
    """ADC top-10 over PQ codes (ops/pq.py): query = vec_id 0's vector,
    lookup table folded over the code arrays in pure Catalyst — the float
    vectors are read once (the 1-row query fetch), never at scoring."""
    from mini_search_engine_spark.ops import pq_adc_topk, pq_encode, seeded_codebooks

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = seeded_codebooks()
    q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    return pq_adc_topk(pq_encode(emb, cb), list(q), cb, topk=10, metric="ip")


def q_ivfadc_topk(spark, sf_dir):
    """IVFADC top-10 (ops/ivfadc.py): coarse assignment + residual PQ
    codes in one Arrow pass, then nprobe=4 of 16 lists scored by the ADC
    fold + per-list constant — the FAISS billion-scale architecture.
    Seeded centroid/codebook fixtures shared with the DuckDB oracle."""
    from mini_search_engine_spark.ops import (
        ivfadc_encode,
        ivfadc_topk,
        seeded_centroids,
        seeded_codebooks,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent, cb = seeded_centroids(), seeded_codebooks()
    q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    enc = ivfadc_encode(emb, cent, cb)
    return ivfadc_topk(enc, cent, cb, list(q), k=10, nprobe=4)


def _with_synthetic_pii(docs: DataFrame) -> DataFrame:
    """Append deterministic PII (email + phone + IPv4 derived from docid)
    to every document's content — the corpus itself is digit-free, so
    without this the redaction oracle would trivially hash-match on
    unchanged text. Both sides (Spark here, DuckDB in oracle_sql) build
    the identical string, so the redactor is exercised on real matches."""
    return docs.withColumn(
        "content",
        F.concat(
            F.col("content"),
            F.lit(" mail user"),
            F.col("docid").cast("string"),
            F.lit("@ex-ample.co call 415-555-"),
            F.lpad((F.col("docid") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10.0."),
            (F.col("docid") % 256).cast("string"),
            F.lit(".7"),
        ),
    )


def q_pii_redact(spark, sf_dir):
    out = pii_redact(_with_synthetic_pii(load_documents(spark, sf_dir)))
    return out.select(
        "docid",
        "n_emails",
        "n_phones",
        "n_ips",
        F.md5("redacted").alias("redacted_md5"),
    ).orderBy("docid")


def q_repetition(spark, sf_dir):
    out = repetition_scores(load_documents(spark, sf_dir))
    return out.withColumn("keep", F.col("keep").cast("int")).orderBy("docid")


STRAT_RATES = {"de": 0.2, "en": 0.5, "es": 0.25, "fr": 0.1, "zh": 0.35}


def q_strat_sample(spark, sf_dir):
    docs = load_documents(spark, sf_dir)
    return (
        stratified_hash_sample(docs, STRAT_RATES, salt="mix-v1")
        .select("docid", "lang")
        .orderBy("docid")
    )


EPOCH_WEIGHTS = {"en": 2.5, "de": 1.25, "zh": 1.0, "fr": 0.5}  # es → default 1.0


def q_epoch_mix(spark, sf_dir):
    """Training-mix up-sampling: each doc appears floor(w) + Bernoulli(frac(w))
    times for its language's weight (ops.epoch_mix) — expected epochs == w,
    deterministic via the shared 60-bit hash."""
    from mini_search_engine_spark.ops import epoch_mix

    docs = load_documents(spark, sf_dir)
    return (
        epoch_mix(docs, EPOCH_WEIGHTS, salt="mix-v2")
        .select("docid", "lang", "epoch")
        .orderBy("docid", "epoch")
    )


def q_events_window(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def q_session_stats(spark, sf_dir):
    """Gap-based sessionization (30-min timeout): one hash exchange on
    user_id, boundaries + ids via two window functions over the same
    partition-local sort (ops/sessions.py)."""
    from mini_search_engine_spark.ops import session_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_stats(ev, gap_minutes=30.0)


def q_asof_enrich(spark, sf_dir):
    """As-of join (ops/asof.py union-merge pattern, one exchange): every
    event carries the user's most recent purchase at-or-before it.
    Timestamps interleave within each user, so matches genuinely vary
    through time (unlike a latest-row join)."""
    from mini_search_engine_spark.ops import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("last_purchase_id"),
        F.col("value").alias("last_purchase_value"),
    )
    res = asof_join(
        ev.select("event_id", "user_id", "ts", "event_type"),
        purch,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["last_purchase_id", "last_purchase_value"],
        tie_break="last_purchase_id",
    )
    return res.select(
        "event_id",
        "user_id",
        "event_type",
        "last_purchase_id",
        F.round("last_purchase_value", 6).alias("last_purchase_value"),
    )


def q_window_rank(spark, sf_dir):
    """Window-function coverage (§2.6): top-3 longest docs per lang via
    row_number over a partitioned ordered window."""
    from pyspark.sql import Window

    docs = load_documents(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.desc(F.length("content")), F.asc("docid")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "docid", F.col("rn").cast("long").alias("rn"))
    )


def q_relational_agg(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
                "sum_disc_price"
            ),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def q_rollup_agg(spark, sf_dir):
    """Hierarchical subtotals via ROLLUP (§2.6): per (flag, status), per
    flag, and grand total in ONE pass — Catalyst expands the grouping
    sets map-side, no extra shuffle per level."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    r = li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.count("*").cast("long").alias("n"),
        F.grouping_id().cast("long").alias("lvl"),
    )
    # subtotal NULLs → 'ALL' (grouping_id disambiguates; also keeps the
    # oracle hash comparator away from NULL-vs-str sort)
    return r.select(
        F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
        F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
        "sum_qty",
        "n",
        "lvl",
    )


def q_doclen_percentiles(spark, sf_dir):
    """Exact linear-interpolation percentiles of doc length per language —
    corpus profiling for chunk-size / packing decisions."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pcts = [0.25, 0.5, 0.75, 0.99]
    qs = F.percentile("n_chars", F.lit(pcts))
    return docs.groupBy("lang").agg(
        *[F.round(F.element_at(qs, i + 1), 6).alias(f"p{int(p * 100)}") for i, p in enumerate(pcts)],
        F.count("*").cast("long").alias("n_docs"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over the sf0.001 documents corpus."""
    return q_bm25(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering is deliberate (r5 verdict item 1): the driver's correctness
    # gate checks the first 50 entries in registry order, so the entries
    # whose last driver row is OLDEST lead — the 17 last checked in r1-r3,
    # then the 44 last checked in r4 (61 stale total; the ~11 past the cap
    # lead again next round), with the 50 r5-checked entries at the tail.
    # All 111 entries pass tools/check_oracle.py against current code.
    return {
        # --- last driver row r3 or earlier ---
        "combined_rank": q_combined,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash,
        "minhash_pairs": q_minhash_pairs,
        "simhash": q_simhash,
        "ngram_jaccard": q_jaccard,
        "ann_cosine": q_ann_cosine,
        "ann_ivf": q_ann_ivf,
        "embed_neardup": q_embed_neardup,
        "embed_neardup_lsh": q_embed_neardup_lsh,
        "language_id": q_langid,
        "quality_scores": q_quality,
        "token_counts": q_token_counts,
        "fingerprint": q_fingerprint,
        "events_window": q_events_window,
        "window_rank": q_window_rank,
        "relational_agg": q_relational_agg,
        # --- last driver row r4 ---
        "keyword_search": q_keyword,
        "and_search": q_and,
        "and_search_segments": q_and_segments,
        "or_search": q_or,
        "phrase_search": q_phrase,
        "near_search": q_near,
        "window_search": q_window_search,
        "boolean_query": q_boolean_query,
        "boolean_query_universe": q_boolean_query_universe,
        "prefix_search": q_prefix_search,
        "wildcard_search": q_wildcard_search,
        "fuzzy_search": q_fuzzy_search,
        "tfidf_topk": q_tfidf,
        "bm25_batch": q_bm25_batch,
        "bm25_page2": q_bm25_page2,
        "bm25_filtered": q_bm25_filtered,
        "collapse_by_source": q_collapse_by_source,
        "bm25_explain": q_bm25_explain,
        "synonym_query": q_synonym_query,
        "bm25_topk_pruned": q_bm25_pruned,
        "doc_deletes_bm25": q_doc_deletes_bm25,
        "snippets": q_snippets,
        "suggest": q_suggest,
        "fielded_bm25": q_fielded_bm25,
        "fielded_dismax": q_fielded_dismax,
        "anchor_texts": q_anchor_texts,
        "anchor_rank": q_anchor_rank,
        "hits_rank": q_hits_rank,
        "link_distance": q_link_distance,
        "personalized_pagerank": q_personalized_pagerank,
        "cocitation": q_cocitation,
        "related_docs": q_related_docs,
        "bm25_prf": q_bm25_prf,
        "search_eval": q_search_eval,
        "search_eval_macro": q_search_eval_macro,
        "significant_terms": q_significant_terms,
        "index_diff": q_index_diff,
        "did_you_mean": q_did_you_mean,
        "hybrid_rrf": q_hybrid_rrf,
        "facets": q_facets,
        "symbols": q_symbols,
        "more_like_this": q_more_like_this,
        "import_rank": q_import_rank,
        "index_stats": q_index_stats,
        # --- driver-green in r5 (CORRECTNESS_r05.json) ---
        "rescore_topk": q_rescore_topk,
        "incremental_dedup": q_incremental_dedup,
        "incremental_exact": q_incremental_exact,
        "perplexity_buckets": q_perplexity_buckets,
        "ltr_features": q_ltr_features,
        "dsir_weights": q_dsir_weights,
        "dsir_select": q_dsir_select,
        "upsert_bm25": q_upsert_bm25,
        "time_travel_bm25": q_time_travel_bm25,
        "nb_classify": q_nb_classify,
        "lm_perplexity": q_lm_perplexity,
        "source_stats": q_source_stats,
        "source_filtered_docs": q_source_filtered,
        "curated_docs": q_curated_docs,
        "curation_funnel": q_curation_funnel,
        "pq_codes": q_pq_codes,
        "pq_adc_topk": q_pq_adc_topk,
        "ivfadc_topk": q_ivfadc_topk,
        "media_features": q_media_features,
        "bpe_token_counts": q_bpe_counts,
        "percolate": q_percolate,
        "bm25_topk": q_bm25,
        "bm25_topk_fused_cold": q_bm25_fused_cold,
        "champion_bm25": q_champion_bm25,
        "substring_search": q_substring_search,
        "regex_search": q_regex_search,
        "code_term_df": q_code_term_df,
        "code_search": q_code_search,
        "dedup_clusters": q_dedup_clusters,
        "duplicate_spans": q_duplicate_spans,
        "decontaminate": q_decontaminate,
        "remove_duplicate_spans": q_remove_spans,
        "mmr_rerank": q_mmr_rerank,
        "collocations": q_collocations,
        "frequent_ngrams": q_frequent_ngrams,
        "next_words": q_next_words,
        "doc_vectors": q_doc_vectors,
        "doc_chunks": q_doc_chunks,
        "pii_redact": q_pii_redact,
        "repetition_scores": q_repetition,
        "stratified_sample": q_strat_sample,
        "epoch_mix": q_epoch_mix,
        "session_stats": q_session_stats,
        "asof_enrich": q_asof_enrich,
        "rollup_agg": q_rollup_agg,
        "doclen_percentiles": q_doclen_percentiles,
        "term_df": q_term_df,
        "doclens": q_doclens,
        "postings_blocks": q_postings_blocks,
        "pagerank": q_pagerank,
    }


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

def _hash60(expr: str) -> str:
    return f"('0x' || substring(md5({expr}), 1, 15))::BIGINT"


_SHINGLES = _WS + """,
shl AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks) - 1)]
              ELSE [array_to_string(toks, ' ')] END AS shs
  FROM wtl
),
shx AS (SELECT doc_id, unnest(shs) AS sh FROM shl)"""

_MINHASH = _SHINGLES + f""",
js AS (SELECT unnest(range(16)) AS j),
mh AS (
  SELECT doc_id, j, min({_hash60("j::VARCHAR || '|' || sh")}) AS minhash
  FROM shx CROSS JOIN js
  GROUP BY doc_id, j
)"""

_BANDS = _MINHASH + f""",
bands AS (
  SELECT doc_id, j // 2 AS band,
         {_hash60("string_agg(minhash::VARCHAR, ',' ORDER BY j)")} AS band_key
  FROM mh GROUP BY doc_id, j // 2
)"""

_PAIRS = _BANDS + """,
pairs AS (
  SELECT DISTINCT a.doc_id AS docid_a, b.doc_id AS docid_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
)"""


def _edges_sql() -> str:
    return """
nn AS (SELECT count(*) AS c FROM documents),
e AS (
  SELECT doc_id AS src, (doc_id * 7 + 3) % c AS dst FROM documents, nn
  UNION ALL
  SELECT doc_id AS src, (doc_id * 13 + 5) % c AS dst FROM documents, nn
),
odeg AS (SELECT src, count(*) AS od FROM e GROUP BY src)"""


def _pagerank_sql(iters: int = 5) -> str:
    parts = [_edges_sql(), ",\nr0 AS (SELECT doc_id AS id, 1.0::DOUBLE AS pr FROM documents)"]
    for i in range(1, iters + 1):
        parts.append(
            f""",
r{i} AS (
  SELECT d.doc_id AS id,
         0.15 + 0.85 * coalesce(s.m, 0.0) AS pr
  FROM documents d
  LEFT JOIN (
    SELECT e.dst, sum(r{i-1}.pr / odeg.od) AS m
    FROM e JOIN r{i-1} ON e.src = r{i-1}.id JOIN odeg ON odeg.src = e.src
    GROUP BY e.dst
  ) s ON s.dst = d.doc_id
)"""
        )
    return "WITH " + "".join(parts)


_TFIDF_CORE = f"""{_TOK},
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
q(term, mult) AS (VALUES ('spark', 1.0), ('merge', 1.0)),
contrib AS (
  SELECT tf.doc_id,
         tf.tf * (nn.n / dfreq.df) AS tfidf,
         q.mult * (nn.n / dfreq.df) AS qw
  FROM tf JOIN q USING (term) JOIN dfreq USING (term) CROSS JOIN nn
),
s AS (SELECT doc_id, sum(tfidf * qw) AS dot, sum(tfidf * tfidf) AS len2
      FROM contrib GROUP BY doc_id)"""


def _bm25_sql(terms: list[str], k: int = 10, doc_where: str | None = None) -> str:
    vals = ", ".join(f"('{t}', 1.0)" for t in terms)
    sql = f"""WITH {_TOK},
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, len(toks)::INT AS dl FROM tl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
gl AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
              (SELECT avg(dl) FROM dl)::DOUBLE AS avgdl),
q(term, qw) AS (VALUES {vals}),
contrib AS (
  SELECT tf.doc_id,
         q.qw * ln(1.0 + (gl.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * (tf.tf * (1.2 + 1.0))
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / gl.avgdl)) AS sc
  FROM tf JOIN q USING (term) JOIN dfreq USING (term)
       JOIN dl USING (doc_id) CROSS JOIN gl
),
s AS (SELECT doc_id, sum(sc) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id AS docid, round(score, 6) AS score
FROM s ORDER BY round(score, 6) DESC, docid LIMIT {k}"""
    if doc_where:
        # restrict the corpus everywhere it is scanned (the tokenize CTE and
        # the global doc count) — models a post-delete from-scratch build
        sql = sql.replace("FROM documents", f"FROM documents WHERE {doc_where}")
    return sql


def oracle_sql() -> dict[str, str]:
    sqls: dict[str, str] = {}

    # media_features: the Spark side RECONSTRUCTS these fields from real
    # stdlib decoding of synthesized PPM/WAV payloads; the oracle recomputes
    # them from the synthesis formulas (multimodal.synthesize_real_media).
    # bpe_token_counts has NO oracle (learned merges aren't SQL) — rows-only.
    sqls["media_features"] = """SELECT doc_id AS docid,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
  CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 16 END AS width,
  CASE WHEN doc_id % 3 = 0 THEN 12 + doc_id % 8 END AS height,
  CASE WHEN doc_id % 3 = 1 THEN 16000 END AS sample_rate,
  CASE WHEN doc_id % 3 = 1 THEN 512 + (doc_id % 8) * 128 END AS n_samples
FROM documents ORDER BY docid"""

    sqls["keyword_search"] = f"""WITH {_TOK}
SELECT DISTINCT doc_id AS docid FROM tok WHERE term = 'spark' ORDER BY docid"""

    sqls["and_search"] = f"""WITH {_TOK}
SELECT doc_id AS docid FROM tok WHERE term IN ('spark', 'merge')
GROUP BY doc_id HAVING count(DISTINCT term) = 2 ORDER BY docid"""

    # per-segment AND provably equals corpus-wide AND (a matching doc's own
    # postings put every conjunct into its segment's dictionary) — the
    # entry exists to hash-check that equivalence
    sqls["and_search_segments"] = sqls["and_search"]

    # the trigram index is a pruning structure; its contract is exactly
    # substring containment, which IS the oracle
    sqls["substring_search"] = """SELECT doc_id AS docid FROM documents
WHERE contains(lower(text), 'fast key order') ORDER BY doc_id"""

    sqls["index_stats"] = f"""WITH {_TOK},
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, len(toks) AS dl FROM tl)
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       (SELECT count(*) FROM dfreq)::BIGINT AS vocab_size,
       (SELECT sum(df) FROM dfreq)::BIGINT AS total_postings,
       (SELECT max(df) FROM dfreq)::BIGINT AS max_df,
       (SELECT sum(dl) FROM dl)::BIGINT AS total_tokens,
       round((SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents), 6) AS avgdl"""

    # import-graph pagerank: edges from string extraction + module-name
    # join (DISTINCT — unlike the synthetic id-graph, resolution dedups)
    _imp_parts = [r"""
nn AS (SELECT count(*) AS c FROM documents),
cd AS (
  SELECT doc_id,
         'module m' || doc_id
           || ' import m' || ((doc_id * 7 + 3) % c)
           || ' import m' || ((doc_id * 13 + 5) % c)
           || ' ' || text AS content
  FROM documents, nn
),
imp AS (
  SELECT doc_id AS src,
         unnest(regexp_extract_all(content,
           '(?:import|from|include|require|use)\s+([A-Za-z_][A-Za-z0-9_.]*)', 1)) AS tgt
  FROM cd
),
decl AS (SELECT doc_id AS dst,
                regexp_extract(content, 'module\s+([A-Za-z_][A-Za-z0-9_.]*)', 1) AS module
         FROM cd),
e AS (SELECT DISTINCT src, dst FROM imp JOIN decl ON imp.tgt = decl.module),
odeg AS (SELECT src, count(*) AS od FROM e GROUP BY src),
r0 AS (SELECT doc_id AS id, 1.0::DOUBLE AS pr FROM documents)"""]
    for _i in range(1, 6):
        _imp_parts.append(f""",
r{_i} AS (
  SELECT d.doc_id AS id,
         0.15 + 0.85 * coalesce(s.m, 0.0) AS pr
  FROM documents d
  LEFT JOIN (
    SELECT e.dst, sum(r{_i-1}.pr / odeg.od) AS m
    FROM e JOIN r{_i-1} ON e.src = r{_i-1}.id JOIN odeg ON odeg.src = e.src
    GROUP BY e.dst
  ) s ON s.dst = d.doc_id
)""")
    sqls["import_rank"] = (
        "WITH " + "".join(_imp_parts)
        + "\nSELECT id AS docid, round(pr, 6) AS pagerank FROM r5 ORDER BY docid"
    )

    # MLT: doc 0's top-5 terms by round(tf·idf,6) (ties lexical) become
    # unit-weight BM25 query terms; source excluded
    sqls["more_like_this"] = f"""WITH {_TOK},
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, len(toks)::INT AS dl FROM tl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
gl AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
              (SELECT avg(dl) FROM dl)::DOUBLE AS avgdl),
mt AS (
  SELECT tf.term FROM tf JOIN dfreq USING (term) CROSS JOIN gl
  WHERE tf.doc_id = 0
  ORDER BY round(tf.tf * ln(1.0 + (gl.n - dfreq.df + 0.5) / (dfreq.df + 0.5)), 6)
           DESC, tf.term
  LIMIT 5
),
q AS (SELECT term, 1.0 AS qw FROM mt),
contrib AS (
  SELECT tf.doc_id,
         q.qw * ln(1.0 + (gl.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * (tf.tf * (1.2 + 1.0))
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / gl.avgdl)) AS sc
  FROM tf JOIN q USING (term) JOIN dfreq USING (term)
       JOIN dl USING (doc_id) CROSS JOIN gl
),
s AS (SELECT doc_id, round(sum(sc), 6) AS score FROM contrib
      WHERE doc_id <> 0 GROUP BY doc_id)
SELECT doc_id AS docid, score FROM s ORDER BY score DESC, docid LIMIT 10"""

    sqls["symbols"] = r"""WITH cw AS (
  SELECT doc_id, string_split(text, ' ') AS t, text FROM documents
),
cd AS (
  SELECT doc_id, concat_ws(' ',
           'def ' || t[1] || '_' || t[2] || '():',
           'class ' || upper(substr(t[3],1,1)) || substr(t[3],2)
                    || upper(substr(t[4],1,1)) || substr(t[4],2) || ':',
           text) AS content
  FROM cw
)
SELECT doc_id AS docid,
       unnest(regexp_extract_all(content,
         '(?:def|fn|func|function|class|interface|enum|struct|trait|object)\s+([A-Za-z_][A-Za-z0-9_]*)',
         1)) AS symbol
FROM cd ORDER BY docid, symbol"""

    sqls["facets"] = f"""WITH {_TOK},
m AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'spark')
SELECT d.lang, d.source, count(*)::BIGINT AS n_docs
FROM documents d JOIN m USING (doc_id)
GROUP BY d.lang, d.source ORDER BY n_docs DESC, lang, source"""

    # RRF: ranks from the same rounded-score+id ordering on both sides
    sqls["hybrid_rrf"] = f"""WITH {_TOK},
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, len(toks)::INT AS dl FROM tl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
gl AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
              (SELECT avg(dl) FROM dl)::DOUBLE AS avgdl),
qq(term, qw) AS (VALUES ('spark', 1.0), ('merge', 1.0)),
contrib AS (
  SELECT tf.doc_id,
         qq.qw * ln(1.0 + (gl.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / gl.avgdl)) AS sc
  FROM tf JOIN qq USING (term) JOIN dfreq USING (term)
       JOIN dl USING (doc_id) CROSS JOIN gl
),
s AS (SELECT doc_id, round(sum(sc), 6) AS score FROM contrib GROUP BY doc_id),
lex20 AS (SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 20),
lex AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM lex20),
qv AS (
  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS qv
  FROM embeddings WHERE vec_id = 0
),
ev AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
dv AS (
  SELECT ev.vec_id AS doc_id,
         round(sum(ev.v * qv.qv) / (sqrt(sum(ev.v * ev.v)) * sqrt(sum(qv.qv * qv.qv))), 6) AS c
  FROM ev JOIN qv USING (i) GROUP BY ev.vec_id
),
vec20 AS (SELECT doc_id, c FROM dv ORDER BY c DESC, doc_id LIMIT 20),
vec AS (SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id) AS r FROM vec20),
u AS (SELECT doc_id, 1.0 / (60 + r) AS c FROM lex
      UNION ALL SELECT doc_id, 1.0 / (60 + r) FROM vec),
f AS (SELECT doc_id, round(sum(c), 6) AS rrf FROM u GROUP BY doc_id)
SELECT doc_id AS docid, rrf FROM f ORDER BY rrf DESC, docid LIMIT 10"""

    sqls["did_you_mean"] = f"""WITH {_TOK},
v AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term)
SELECT term, df, levenshtein(term, 'spakr')::BIGINT AS dist FROM v
WHERE levenshtein(term, 'spakr') <= 2
ORDER BY dist, df DESC, term LIMIT 3"""

    sqls["regex_search"] = r"""SELECT doc_id AS docid FROM documents
WHERE regexp_matches(text, '(?i)(fast|slow) key order\w*') ORDER BY doc_id"""

    sqls["suggest"] = f"""WITH {_TOK}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok
WHERE term LIKE 's%' GROUP BY term ORDER BY df DESC, term LIMIT 10"""

    # snippet semantics replicated: first hit position via list_position
    # (0 when absent → nullif; least() ignores NULLs), 7-token inclusive
    # slice, CASE-highlighting, single-space join
    sqls["snippets"] = f"""WITH {_TL},
p AS (
  SELECT doc_id, toks,
         least(nullif(list_position(toks, 'spark'), 0),
               nullif(list_position(toks, 'merge'), 0)) AS pos
  FROM tl
),
s AS (
  SELECT doc_id, pos,
         toks[greatest(1, pos - 3) : greatest(1, pos - 3) + 6] AS win
  FROM p WHERE pos IS NOT NULL
)
SELECT doc_id AS docid, pos::BIGINT AS pos,
       array_to_string(list_transform(win,
         x -> CASE WHEN x IN ('spark', 'merge') THEN '[' || x || ']' ELSE x END),
         ' ') AS snippet
FROM s ORDER BY docid"""

    # code-analyzer oracles: same derived corpus + the DuckDB twin of the
    # CODE_* regex spec (two boundary rules, lower, split, drop empties)
    _CAP1 = "upper(substr(t[1],1,1)) || substr(t[1],2)"
    _CAP2 = "upper(substr(t[2],1,1)) || substr(t[2],2)"
    _CODE_TOK = f"""cw AS (
  SELECT doc_id, string_split(text, ' ') AS t, text FROM documents
),
cd AS (
  SELECT doc_id,
         concat_ws(' ',
           'get' || {_CAP1} || {_CAP2},
           t[3] || '_' || t[4] || '_count',
           'HTTP' || {_CAP1} || '42',
           text) AS content
  FROM cw
),
ctok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(
           regexp_replace(regexp_replace(content, '([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'),
                          '([a-z0-9])([A-Z])', '\\1 \\2', 'g')),
           '[^a-z0-9]+'), x -> x <> '')) AS term
  FROM cd
)"""

    sqls["code_term_df"] = f"""WITH {_CODE_TOK}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM ctok GROUP BY term"""

    sqls["code_search"] = f"""WITH {_CODE_TOK}
SELECT doc_id AS docid FROM ctok WHERE term IN ('get', 'window', 'count')
GROUP BY doc_id HAVING count(DISTINCT term) = 3 ORDER BY docid"""

    sqls["or_search"] = f"""WITH {_TOK}
SELECT DISTINCT doc_id AS docid FROM tok WHERE term IN ('vector', 'window') ORDER BY docid"""

    sqls["phrase_search"] = f"""WITH {_TL},
p AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tl)
SELECT DISTINCT a.doc_id AS docid
FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'batch' AND b.term = 'batch' ORDER BY docid"""

    sqls["near_search"] = f"""WITH {_TL},
p AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tl)
SELECT DISTINCT a.doc_id AS docid
FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + 3
WHERE a.term = 'spark' AND b.term = 'merge' ORDER BY docid"""

    # unordered window=4 over 2 terms ≡ pairwise position distance ≤ 3
    sqls["window_search"] = f"""WITH {_TL},
p AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tl)
SELECT DISTINCT a.doc_id AS docid
FROM p a JOIN p b ON a.doc_id = b.doc_id
WHERE a.term = 'spark' AND b.term = 'merge' AND abs(a.pos - b.pos) <= 3
ORDER BY docid"""

    # boolean query language: set algebra over the same tokenization —
    # INTERSECT binds tighter than EXCEPT in DuckDB, matching the query's
    # (spark OR merge) AND "fast key" AND NOT scan nesting
    sqls["boolean_query"] = f"""WITH {_TL},
p AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM tl)
SELECT docid FROM (
  SELECT DISTINCT doc_id AS docid FROM p WHERE term IN ('spark', 'merge')
  INTERSECT
  SELECT DISTINCT a.doc_id FROM p a
  JOIN p b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'fast' AND b.term = 'key'
  EXCEPT
  SELECT DISTINCT doc_id FROM p WHERE term = 'scan'
) ORDER BY docid"""

    sqls["boolean_query_universe"] = f"""WITH {_TOK}
SELECT docid FROM (
  SELECT doc_id AS docid FROM documents
  EXCEPT
  SELECT doc_id FROM tok WHERE term IN ('spark', 'merge')
) ORDER BY docid"""

    sqls["prefix_search"] = f"""WITH {_TOK}
SELECT DISTINCT doc_id AS docid FROM tok WHERE term LIKE 'par%' ORDER BY docid"""

    # glob s?ar* == SQL LIKE 's_ar%'
    sqls["wildcard_search"] = f"""WITH {_TOK}
SELECT DISTINCT doc_id AS docid FROM tok WHERE term LIKE 's_ar%' ORDER BY docid"""

    sqls["fuzzy_search"] = f"""WITH {_TOK}
SELECT DISTINCT doc_id AS docid FROM tok WHERE levenshtein(term, 'spank') <= 1 ORDER BY docid"""

    sqls["tfidf_topk"] = f"""WITH {_TFIDF_CORE}
SELECT doc_id AS docid, round(dot / sqrt(len2), 6) AS score
FROM s ORDER BY round(dot / sqrt(len2), 6) DESC, docid LIMIT 10"""

    # fielded BM25: title = first 4 analyzed tokens, its own df/avgdl;
    # score = 2·BM25_title + 1·BM25_body (formula text identical to
    # _bm25_sql per field)
    _FIELDED = f"""WITH {_TL},
tt AS (SELECT doc_id, toks[1:4] AS toks FROM tl),
q(term, qw) AS (VALUES ('spark', 1.0), ('merge', 1.0)),
n0 AS (SELECT count(*)::DOUBLE AS n FROM documents),
btok AS (SELECT doc_id, unnest(toks) AS term FROM tl),
btf AS (SELECT doc_id, term, count(*)::INT AS tf FROM btok GROUP BY doc_id, term),
bdl AS (SELECT doc_id, len(toks)::INT AS dl FROM tl),
bdf AS (SELECT term, count(*)::BIGINT AS df FROM btf GROUP BY term),
bavg AS (SELECT avg(dl)::DOUBLE AS avgdl FROM bdl),
ttok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
ttf AS (SELECT doc_id, term, count(*)::INT AS tf FROM ttok GROUP BY doc_id, term),
tdl AS (SELECT doc_id, len(toks)::INT AS dl FROM tt),
tdf AS (SELECT term, count(*)::BIGINT AS df FROM ttf GROUP BY term),
tavg AS (SELECT avg(dl)::DOUBLE AS avgdl FROM tdl),
bc AS (
  SELECT btf.doc_id,
         1.0 * q.qw * ln(1.0 + (n0.n - bdf.df + 0.5) / (bdf.df + 0.5))
             * (btf.tf * (1.2 + 1.0))
             / (btf.tf + 1.2 * (1.0 - 0.75 + 0.75 * bdl.dl / bavg.avgdl)) AS sc
  FROM btf JOIN q USING (term) JOIN bdf USING (term)
       JOIN bdl USING (doc_id) CROSS JOIN bavg CROSS JOIN n0
),
tc AS (
  SELECT ttf.doc_id,
         2.0 * q.qw * ln(1.0 + (n0.n - tdf.df + 0.5) / (tdf.df + 0.5))
             * (ttf.tf * (1.2 + 1.0))
             / (ttf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tdl.dl / tavg.avgdl)) AS sc
  FROM ttf JOIN q USING (term) JOIN tdf USING (term)
       JOIN tdl USING (doc_id) CROSS JOIN tavg CROSS JOIN n0
)"""
    sqls["fielded_bm25"] = _FIELDED + """,
s AS (SELECT doc_id, sum(sc) AS score
      FROM (SELECT * FROM bc UNION ALL SELECT * FROM tc) GROUP BY doc_id)
SELECT doc_id AS docid, round(score, 6) AS score
FROM s ORDER BY round(score, 6) DESC, docid LIMIT 10"""

    # dis-max ("best_fields"): per-FIELD per-doc scores first, then
    # max + 0.3·(sum − max) — exactly multi_field_bm25_dismax
    sqls["fielded_dismax"] = _FIELDED + """,
bs AS (SELECT doc_id, sum(sc) AS score FROM bc GROUP BY doc_id),
ts AS (SELECT doc_id, sum(sc) AS score FROM tc GROUP BY doc_id),
u AS (SELECT * FROM bs UNION ALL SELECT * FROM ts),
s AS (SELECT doc_id,
             max(score) + 0.3 * (sum(score) - max(score)) AS score
      FROM u GROUP BY doc_id)
SELECT doc_id AS docid, round(score, 6) AS score
FROM s ORDER BY round(score, 6) DESC, docid LIMIT 10"""

    # HITS: 3 iterations unrolled; each half-step is msgs → coalesce-0 over
    # the node set → L2 normalize (exactly search/pagerank.py hits)
    _hits_parts = [
        _edges_sql(),
        """,
nodesd AS (SELECT src AS docid FROM e UNION SELECT dst FROM e),
h0 AS (SELECT docid, 1.0::DOUBLE AS v FROM nodesd)""",
    ]
    for i in range(1, 4):
        _hits_parts.append(f""",
a{i}r AS (
  SELECT n.docid, coalesce(s.v, 0.0) AS v FROM nodesd n
  LEFT JOIN (SELECT e.dst AS docid, sum(h.v) AS v FROM e
             JOIN h{i-1} h ON h.docid = e.src GROUP BY e.dst) s USING (docid)
),
a{i}n AS (SELECT sqrt(sum(v * v)) AS nrm FROM a{i}r),
a{i} AS (SELECT docid, CASE WHEN nrm > 0 THEN v / nrm ELSE 0.0 END AS v
         FROM a{i}r CROSS JOIN a{i}n),
h{i}r AS (
  SELECT n.docid, coalesce(s.v, 0.0) AS v FROM nodesd n
  LEFT JOIN (SELECT e.src AS docid, sum(a.v) AS v FROM e
             JOIN a{i} a ON a.docid = e.dst GROUP BY e.src) s USING (docid)
),
h{i}n AS (SELECT sqrt(sum(v * v)) AS nrm FROM h{i}r),
h{i} AS (SELECT docid, CASE WHEN nrm > 0 THEN v / nrm ELSE 0.0 END AS v
         FROM h{i}r CROSS JOIN h{i}n)""")
    sqls["hits_rank"] = (
        "WITH "
        + "".join(_hits_parts)
        + """
SELECT a.docid, round(a.v, 6) AS authority, round(h.v, 6) AS hub
FROM a3 a JOIN h3 h USING (docid)"""
    )

    # personalized PageRank: 5 iterations unrolled; base = (1-d) on seeds,
    # 0 elsewhere; init 1.0 on seeds (exactly personalized_pagerank)
    _ppr_parts = [
        _edges_sql(),
        """,
p0 AS (SELECT doc_id AS id,
              CASE WHEN doc_id IN (0, 1) THEN 1.0::DOUBLE ELSE 0.0 END AS pr
       FROM documents)""",
    ]
    for i in range(1, 6):
        _ppr_parts.append(f""",
p{i} AS (
  SELECT d.doc_id AS id,
         CASE WHEN d.doc_id IN (0, 1) THEN 0.15 ELSE 0.0 END
           + 0.85 * coalesce(s.m, 0.0) AS pr
  FROM documents d
  LEFT JOIN (
    SELECT e.dst, sum(p{i-1}.pr / odeg.od) AS m
    FROM e JOIN p{i-1} ON e.src = p{i-1}.id JOIN odeg ON odeg.src = e.src
    GROUP BY e.dst
  ) s ON s.dst = d.doc_id
)""")
    sqls["personalized_pagerank"] = (
        "WITH "
        + "".join(_ppr_parts)
        + "\nSELECT id AS docid, round(pr, 6) AS ppr FROM p5 ORDER BY id"
    )

    # BFS link distance: 4 hops unrolled; hop i's frontier is hop i-1's
    # NEW set (exactly search/pagerank.py link_distance)
    _bfs_parts = [
        _edges_sql(),
        """,
d0(docid, dist) AS (VALUES (0::BIGINT, 0), (1::BIGINT, 0))""",
    ]
    for i in range(1, 5):
        prev_f = "d0" if i == 1 else f"f{i-1}"
        _bfs_parts.append(f""",
f{i} AS (SELECT DISTINCT e.dst AS docid FROM e JOIN {prev_f} p ON e.src = p.docid
         WHERE e.dst NOT IN (SELECT docid FROM d{i-1})),
d{i} AS (SELECT docid, dist FROM d{i-1} UNION ALL SELECT docid, {i} FROM f{i})""")
    sqls["link_distance"] = (
        "WITH " + "".join(_bfs_parts) + "\nSELECT docid, dist FROM d4 ORDER BY docid"
    )

    # co-citation: DISTINCT edge self-join on src; Jaccard over full
    # in-neighbor sets (min_common=1, no outdeg cap → exact semantics)
    sqls["cocitation"] = f"""WITH {_edges_sql()},
ed AS (SELECT DISTINCT src, dst FROM e),
ind AS (SELECT dst, count(*)::BIGINT AS indeg FROM ed GROUP BY dst),
cm AS (SELECT a.dst AS d1, b.dst AS d2, count(*)::BIGINT AS common
       FROM ed a JOIN ed b ON a.src = b.src AND a.dst < b.dst
       GROUP BY 1, 2)
SELECT cm.d1, cm.d2, cm.common,
       round(cm.common::DOUBLE / (i1.indeg + i2.indeg - cm.common), 6) AS jaccard
FROM cm JOIN ind i1 ON i1.dst = cm.d1 JOIN ind i2 ON i2.dst = cm.d2
ORDER BY cm.d1, cm.d2"""

    # all-pairs tf-idf cosine neighbors: w = tf·ln(N/df) over terms with
    # df ≤ N/10, pairs per shared term, top-3 per doc on (round6 DESC,
    # neighbor ASC) — exactly search/related.py related_docs
    sqls["related_docs"] = f"""WITH {_TOK},
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
nn AS (SELECT count(*)::DOUBLE AS n, count(*)::BIGINT AS ceil FROM documents),
w AS (SELECT tf.doc_id, tf.term, tf.tf * ln(nn.n / dfreq.df) AS w
      FROM tf JOIN dfreq USING (term) CROSS JOIN nn
      WHERE dfreq.df <= nn.ceil AND dfreq.df < nn.n),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id),
dt AS (SELECT a.doc_id AS d1, b.doc_id AS d2, sum(a.w * b.w) AS dot
       FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
       GROUP BY 1, 2),
cs AS (SELECT d1, d2, dot / (n1.nrm * n2.nrm) AS sim
       FROM dt JOIN nrm n1 ON n1.doc_id = dt.d1 JOIN nrm n2 ON n2.doc_id = dt.d2),
sym AS (SELECT d1 AS docid, d2 AS neighbor, sim FROM cs
        UNION ALL SELECT d2, d1, sim FROM cs),
rk AS (SELECT docid, neighbor, round(sim, 6) AS sim,
              row_number() OVER (PARTITION BY docid
                                 ORDER BY round(sim, 6) DESC, neighbor) AS rank
       FROM sym)
SELECT docid, neighbor, sim, rank FROM rk WHERE rank <= 3 ORDER BY docid, rank"""

    # PRF: base BM25 → top-5 fb docs → top-5 non-query terms by
    # round6(Σtf·idf) → re-score with originals at 1.0 + expansions at 0.4
    sqls["bm25_prf"] = f"""WITH {_TOK},
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, len(toks)::INT AS dl FROM tl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
gl AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
              (SELECT avg(dl) FROM dl)::DOUBLE AS avgdl),
q0(term, qw) AS (VALUES ('spark', 1.0), ('merge', 1.0)),
c0 AS (
  SELECT tf.doc_id,
         q0.qw * ln(1.0 + (gl.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (tf.tf * (1.2 + 1.0))
               / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / gl.avgdl)) AS sc
  FROM tf JOIN q0 USING (term) JOIN dfreq USING (term)
       JOIN dl USING (doc_id) CROSS JOIN gl
),
s0 AS (SELECT doc_id, sum(sc) AS score FROM c0 GROUP BY doc_id),
fb AS (SELECT doc_id FROM s0 ORDER BY round(score, 6) DESC, doc_id LIMIT 5),
cand AS (SELECT tf.term, sum(tf.tf)::BIGINT AS tfsum
         FROM tf JOIN fb USING (doc_id)
         WHERE tf.term NOT IN ('spark', 'merge')
         GROUP BY tf.term),
fbs AS (SELECT cand.term,
               round(cand.tfsum * ln(1.0 + (gl.n - dfreq.df + 0.5) / (dfreq.df + 0.5)), 6) AS fb_score
        FROM cand JOIN dfreq USING (term) CROSS JOIN gl),
top5 AS (SELECT term FROM fbs ORDER BY fb_score DESC, term LIMIT 5),
q AS (SELECT term, qw FROM q0 UNION ALL SELECT term, 0.4::DOUBLE FROM top5),
contrib AS (
  SELECT tf.doc_id,
         q.qw * ln(1.0 + (gl.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * (tf.tf * (1.2 + 1.0))
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / gl.avgdl)) AS sc
  FROM tf JOIN q USING (term) JOIN dfreq USING (term)
       JOIN dl USING (doc_id) CROSS JOIN gl
),
s AS (SELECT doc_id, sum(sc) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id AS docid, round(score, 6) AS score
FROM s ORDER BY round(score, 6) DESC, docid LIMIT 10"""

    # percolation: AND semantics = matched distinct terms == query's
    # distinct term count; same tokenizer on both relations
    _perc_vals = ", ".join(f"({q}, '{s}')" for q, s in PERC_QUERIES)
    sqls["percolate"] = f"""WITH {_TOK},
dterm AS (SELECT DISTINCT doc_id, term FROM tok),
qraw(qid, query) AS (VALUES {_perc_vals}),
qtd AS (SELECT DISTINCT qid, unnest(list_filter(
          regexp_split_to_array(lower(trim(query)), '{PUNCT_SPLIT_PATTERN}'),
          x -> x <> '' AND x NOT IN ({_STOP_IN}))) AS term
        FROM qraw),
qn AS (SELECT qid, count(*)::BIGINT AS nterms FROM qtd GROUP BY qid),
hits AS (SELECT d.doc_id AS docid, q.qid, count(*)::BIGINT AS matched
         FROM dterm d JOIN qtd q USING (term) GROUP BY 1, 2)
SELECT h.docid, h.qid, h.matched, qn.nterms
FROM hits h JOIN qn USING (qid) WHERE h.matched >= qn.nterms
ORDER BY h.docid, h.qid"""

    # eval metrics over the bm25_batch run; qrels grade = number of
    # distinct query terms the doc contains
    _qt_vals = ", ".join(
        f"('{qid}', '{t}', {len(set(ts))})"
        for qid, ts in sorted(BM25_BATCH.items())
        for t in sorted(set(ts))
    )
    _run_sql = "\nUNION ALL\n".join(
        f"SELECT '{qid}' AS qid, docid, score,\n"
        f"       row_number() OVER (ORDER BY score DESC, docid)::BIGINT AS rank\n"
        f"FROM ({_bm25_sql(terms)})"
        for qid, terms in sorted(BM25_BATCH.items())
    )
    sqls["search_eval"] = f"""WITH run AS ({_run_sql}),{_TOK},
qt(qid, term, nterms) AS (VALUES {_qt_vals}),
dtf AS (SELECT doc_id, term, count(*)::INT AS tf FROM tok GROUP BY doc_id, term),
qrels AS (SELECT qid, docid, grade FROM (
            SELECT qt.qid, dtf.doc_id AS docid,
                   least(3, sum(dtf.tf) - 3 * max(qt.nterms))::INT AS grade
            FROM dtf JOIN qt USING (term)
            GROUP BY qt.qid, dtf.doc_id
            HAVING count(*) = max(qt.nterms)
          ) WHERE grade > 0),
j AS (SELECT run.qid, run.rank, coalesce(q.grade, 0) AS grade
      FROM run LEFT JOIN qrels q ON q.qid = run.qid AND q.docid = run.docid
      WHERE run.rank <= 10),
ag AS (SELECT qid,
              sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END) AS hits,
              sum((pow(2.0, grade) - 1.0) / log2(rank + 1.0)) AS dcg,
              coalesce(max(CASE WHEN grade > 0 THEN 1.0 / rank END), 0.0) AS rr
       FROM j GROUP BY qid),
irk AS (SELECT qid, grade, docid,
               row_number() OVER (PARTITION BY qid ORDER BY grade DESC, docid) AS irank
        FROM qrels),
idcg AS (SELECT qid, sum((pow(2.0, grade) - 1.0) / log2(irank + 1.0)) AS idcg
         FROM irk WHERE irank <= 10 GROUP BY qid),
nrel AS (SELECT qid, count(*)::BIGINT AS n_rel FROM qrels GROUP BY qid)
SELECT ag.qid,
       round(ag.hits / 10.0, 6) AS p_at_k,
       round(CASE WHEN coalesce(nrel.n_rel, 0) > 0
                  THEN ag.hits::DOUBLE / nrel.n_rel ELSE 0.0 END, 6) AS recall_at_k,
       round(ag.rr, 6) AS rr,
       round(CASE WHEN coalesce(idcg.idcg, 0.0) > 0
                  THEN ag.dcg / idcg.idcg ELSE 0.0 END, 6) AS ndcg_at_k,
       coalesce(nrel.n_rel, 0)::BIGINT AS n_rel
FROM ag LEFT JOIN idcg USING (qid) LEFT JOIN nrel USING (qid)
ORDER BY ag.qid"""

    sqls["search_eval_macro"] = f"""SELECT
  count(*)::BIGINT AS n_queries,
  round(avg(p_at_k), 6) AS mean_p_at_k,
  round(avg(recall_at_k), 6) AS mean_recall_at_k,
  round(avg(rr), 6) AS mrr,
  round(avg(ndcg_at_k), 6) AS mean_ndcg_at_k
FROM ({sqls["search_eval"]})"""

    sqls["significant_terms"] = f"""WITH {_TOK},
dterm AS (SELECT DISTINCT doc_id, term FROM tok),
fg AS (SELECT doc_id FROM documents WHERE lang = 'de'),
fgn AS (SELECT count(*)::DOUBLE AS n FROM fg),
nn AS (SELECT count(*)::DOUBLE AS n FROM documents),
fdf AS (SELECT term, count(*)::BIGINT AS fg_df FROM dterm JOIN fg USING (doc_id)
        GROUP BY term HAVING count(*) >= 2),
bdf AS (SELECT term, count(*)::BIGINT AS bg_df FROM dterm GROUP BY term)
SELECT fdf.term, fdf.fg_df, bdf.bg_df,
       round(ln((fdf.fg_df / fgn.n) / (bdf.bg_df / nn.n)), 6) AS score
FROM fdf JOIN bdf USING (term) CROSS JOIN fgn CROSS JOIN nn
ORDER BY score DESC, fdf.term LIMIT 20"""

    # index diff: df per term of the even-docid half vs the full corpus
    sqls["index_diff"] = f"""WITH {_TOK},
otl AS (
  SELECT doc_id,
         list_filter(
           regexp_split_to_array(lower({_JTRIM}), '{PUNCT_SPLIT_PATTERN}'),
           x -> x <> '' AND x NOT IN ({_STOP_IN})
         ) AS toks
  FROM documents WHERE doc_id % 2 = 0
),
otok AS (SELECT doc_id, unnest(toks) AS term FROM otl),
odf AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM otok GROUP BY term),
ndf AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term)
SELECT coalesce(o.term, n.term) AS term,
       coalesce(o.df, 0)::BIGINT AS df_old,
       coalesce(n.df, 0)::BIGINT AS df_new,
       (coalesce(n.df, 0) - coalesce(o.df, 0))::BIGINT AS delta,
       CASE WHEN o.term IS NULL THEN 'added'
            WHEN n.term IS NULL THEN 'removed'
            WHEN n.df > o.df THEN 'grown'
            WHEN n.df < o.df THEN 'shrunk'
            ELSE 'same' END AS status
FROM odf o FULL OUTER JOIN ndf n USING (term)
ORDER BY coalesce(o.term, n.term)"""

    # champion tier: per term keep top-8 postings by impact order
    # (tf DESC, dl ASC, docid ASC); GLOBAL df/avgdl — surviving docs
    # score exactly as unpruned
    sqls["champion_bm25"] = f"""WITH {_TOK},
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, len(toks)::INT AS dl FROM tl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
gl AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
              (SELECT avg(dl) FROM dl)::DOUBLE AS avgdl),
q(term, qw) AS (VALUES ('spark', 1.0), ('merge', 1.0)),
champ AS (SELECT doc_id, term, tf FROM (
            SELECT tf.*, row_number() OVER (PARTITION BY term
                                            ORDER BY tf DESC, dl.dl, doc_id) AS r
            FROM tf JOIN dl USING (doc_id)) WHERE r <= 8),
contrib AS (
  SELECT c.doc_id,
         q.qw * ln(1.0 + (gl.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * (c.tf * (1.2 + 1.0))
              / (c.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / gl.avgdl)) AS sc
  FROM champ c JOIN q USING (term) JOIN dfreq USING (term)
       JOIN dl USING (doc_id) CROSS JOIN gl
),
s AS (SELECT doc_id, sum(sc) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id AS docid, round(score, 6) AS score
FROM s ORDER BY round(score, 6) DESC, docid LIMIT 10"""

    # two-phase retrieval: champion-tier candidates (rounded-score cut,
    # docid tie-break) → exact rescore on the full tf table
    sqls["rescore_topk"] = f"""WITH {_TOK},
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, len(toks)::INT AS dl FROM tl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
gl AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
              (SELECT avg(dl) FROM dl)::DOUBLE AS avgdl),
q(term, qw) AS (VALUES ('spark', 1.0), ('merge', 1.0)),
champ AS (SELECT doc_id, term, tf FROM (
            SELECT tf.*, row_number() OVER (PARTITION BY term
                                            ORDER BY tf DESC, dl.dl, doc_id) AS r
            FROM tf JOIN dl USING (doc_id)) WHERE r <= 8),
ccontrib AS (
  SELECT c.doc_id,
         q.qw * ln(1.0 + (gl.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * (c.tf * (1.2 + 1.0))
              / (c.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / gl.avgdl)) AS sc
  FROM champ c JOIN q USING (term) JOIN dfreq USING (term)
       JOIN dl USING (doc_id) CROSS JOIN gl
),
cand AS (SELECT doc_id FROM (
           SELECT doc_id, round(sum(sc), 6) AS cscore FROM ccontrib GROUP BY doc_id)
         ORDER BY cscore DESC, doc_id LIMIT 30),
contrib AS (
  SELECT tf.doc_id,
         q.qw * ln(1.0 + (gl.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * (tf.tf * (1.2 + 1.0))
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / gl.avgdl)) AS sc
  FROM tf JOIN q USING (term) JOIN dfreq USING (term)
       JOIN dl USING (doc_id) CROSS JOIN gl
),
s AS (SELECT doc_id, sum(sc) AS score FROM contrib
      WHERE doc_id IN (SELECT doc_id FROM cand) GROUP BY doc_id)
SELECT doc_id AS docid, round(score, 6) AS score
FROM s ORDER BY round(score, 6) DESC, docid LIMIT 10"""

    # anchor field: distinct synthetic edges, first-3-whitespace-token
    # snippets, ascending-src aggregation (== array_sort(struct(src,snip)))
    _ANCHOR = f"""{_WS},
nn AS (SELECT count(*) AS c FROM documents),
e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT doc_id AS src, (doc_id * 7 + 3) % c AS dst FROM documents, nn
    UNION ALL
    SELECT doc_id AS src, (doc_id * 13 + 5) % c AS dst FROM documents, nn
  )
),
snip AS (SELECT doc_id AS src, array_to_string(toks[1:3], ' ') AS sn FROM wtl),
an AS (
  SELECT dst AS doc_id, string_agg(sn, ' ' ORDER BY src) AS atext
  FROM e JOIN snip USING (src) GROUP BY dst
)"""

    sqls["anchor_texts"] = f"""WITH {_ANCHOR}
SELECT doc_id AS docid, atext AS anchor_text FROM an ORDER BY docid"""

    _AJTRIM = "regexp_replace(atext, '^[\\x00-\\x20]+|[\\x00-\\x20]+$', '', 'g')"
    sqls["anchor_rank"] = f"""WITH {_ANCHOR},
tl AS (
  SELECT doc_id,
         list_filter(
           regexp_split_to_array(lower({_JTRIM}), '{PUNCT_SPLIT_PATTERN}'),
           x -> x <> '' AND x NOT IN ({_STOP_IN})
         ) AS toks
  FROM documents
),
atl AS (
  SELECT doc_id,
         list_filter(
           regexp_split_to_array(lower({_AJTRIM}), '{PUNCT_SPLIT_PATTERN}'),
           x -> x <> '' AND x NOT IN ({_STOP_IN})
         ) AS toks
  FROM an
),
q(term, qw) AS (VALUES ('spark', 1.0), ('merge', 1.0)),
n0 AS (SELECT count(*)::DOUBLE AS n FROM documents),
n0a AS (SELECT count(*)::DOUBLE AS n FROM an),
btok AS (SELECT doc_id, unnest(toks) AS term FROM tl),
btf AS (SELECT doc_id, term, count(*)::INT AS tf FROM btok GROUP BY doc_id, term),
bdl AS (SELECT doc_id, len(toks)::INT AS dl FROM tl),
bdf AS (SELECT term, count(*)::BIGINT AS df FROM btf GROUP BY term),
bavg AS (SELECT avg(dl)::DOUBLE AS avgdl FROM bdl),
atok AS (SELECT doc_id, unnest(toks) AS term FROM atl),
atf AS (SELECT doc_id, term, count(*)::INT AS tf FROM atok GROUP BY doc_id, term),
adl AS (SELECT doc_id, len(toks)::INT AS dl FROM atl),
adf AS (SELECT term, count(*)::BIGINT AS df FROM atf GROUP BY term),
aavg AS (SELECT avg(dl)::DOUBLE AS avgdl FROM adl),
bc AS (
  SELECT btf.doc_id,
         1.0 * q.qw * ln(1.0 + (n0.n - bdf.df + 0.5) / (bdf.df + 0.5))
             * (btf.tf * (1.2 + 1.0))
             / (btf.tf + 1.2 * (1.0 - 0.75 + 0.75 * bdl.dl / bavg.avgdl)) AS sc
  FROM btf JOIN q USING (term) JOIN bdf USING (term)
       JOIN bdl USING (doc_id) CROSS JOIN bavg CROSS JOIN n0
),
ac AS (
  SELECT atf.doc_id,
         2.0 * q.qw * ln(1.0 + (n0a.n - adf.df + 0.5) / (adf.df + 0.5))
             * (atf.tf * (1.2 + 1.0))
             / (atf.tf + 1.2 * (1.0 - 0.75 + 0.75 * adl.dl / aavg.avgdl)) AS sc
  FROM atf JOIN q USING (term) JOIN adf USING (term)
       JOIN adl USING (doc_id) CROSS JOIN aavg CROSS JOIN n0a
),
s AS (SELECT doc_id, sum(sc) AS score
      FROM (SELECT * FROM bc UNION ALL SELECT * FROM ac) GROUP BY doc_id)
SELECT doc_id AS docid, round(score, 6) AS score
FROM s ORDER BY round(score, 6) DESC, docid LIMIT 10"""

    sqls["bm25_topk"] = _bm25_sql(["spark", "merge"])
    sqls["bm25_batch"] = "\nUNION ALL\n".join(
        f"SELECT '{qid}' AS qid, docid, score,\n"
        f"       row_number() OVER (ORDER BY score DESC, docid)::BIGINT AS rank\n"
        f"FROM ({_bm25_sql(terms)})"
        for qid, terms in sorted(BM25_BATCH.items())
    )
    # page 2 of 5 = ranked rows 6-10; DuckDB expresses the keyset cursor's
    # result set as LIMIT/OFFSET over the identical (score DESC, docid)
    # ordering — the cursor-vs-offset distinction is a COST property
    sqls["bm25_page2"] = _bm25_sql(["spark", "merge"], k=10).replace(
        "LIMIT 10", "LIMIT 5 OFFSET 5"
    )
    # filtered search: index stats stay GLOBAL (unlike doc_deletes_bm25's
    # rebuilt-corpus doc_where); only the final result set is restricted
    sqls["bm25_filtered"] = (
        _bm25_sql(["spark", "merge"], k=10)
        .replace("SELECT doc_id AS docid, round", "SELECT s.doc_id AS docid, round")
        .replace(
            "FROM s ORDER BY",
            "FROM s JOIN documents d ON d.doc_id = s.doc_id\n"
            "WHERE d.n_chars >= 300 AND d.source IN ('src3', 'src7', 'src13')\n"
            "ORDER BY",
        )
    )

    _BM25_CORE = _bm25_sql(["spark", "merge"]).split("\nSELECT doc_id AS docid")[0]
    sqls["collapse_by_source"] = (
        _BM25_CORE
        + """,
j AS (SELECT s.doc_id, s.score, d.source
      FROM s JOIN documents d ON d.doc_id = s.doc_id),
r AS (SELECT doc_id, score, source,
             row_number() OVER (PARTITION BY source ORDER BY score DESC, doc_id) AS rn
      FROM j)
SELECT doc_id AS docid, round(score, 6) AS score, source
FROM r WHERE rn = 1 ORDER BY round(score, 6) DESC, doc_id LIMIT 10"""
    )

    sqls["bm25_explain"] = f"""WITH {_TOK},
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, len(toks)::INT AS dl FROM tl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
gl AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
              (SELECT avg(dl) FROM dl)::DOUBLE AS avgdl),
q(term, qtf) AS (VALUES ('spark', 1.0), ('merge', 1.0)),
contrib AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         ln(1.0 + (gl.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) AS idf,
         (tf.tf * (1.2 + 1.0))
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / gl.avgdl)) AS tff,
         q.qtf
  FROM tf JOIN q USING (term) JOIN dfreq USING (term)
       JOIN dl USING (doc_id) CROSS JOIN gl
),
s AS (SELECT doc_id, sum(qtf * idf * tff) AS score FROM contrib GROUP BY doc_id),
top3 AS (SELECT doc_id FROM s ORDER BY round(score, 6) DESC, doc_id LIMIT 3)
SELECT c.doc_id AS docid, c.term, c.tf::BIGINT AS tf, c.df::BIGINT AS df,
       round(c.idf, 6) AS idf, round(c.tff, 6) AS tf_factor,
       round(c.qtf * c.idf * c.tff, 6) AS contribution
FROM contrib c JOIN top3 USING (doc_id)
ORDER BY docid, term"""

    sqls["synonym_query"] = f"""WITH {_TOK}
SELECT docid FROM (
  SELECT DISTINCT doc_id AS docid FROM tok WHERE term = 'spark'
  INTERSECT
  SELECT DISTINCT doc_id FROM tok WHERE term IN ('merge', 'flush')
) ORDER BY docid"""

    sqls["bm25_topk_fused_cold"] = _bm25_sql(["spark", "merge"])
    sqls["bm25_topk_pruned"] = _bm25_sql(["filter", "join", "scan"])
    sqls["doc_deletes_bm25"] = _bm25_sql(["spark", "merge"], doc_where="doc_id % 7 <> 3")

    # upsert: BM25 over the post-upsert corpus built from scratch — docs with
    # doc_id % 11 = 4 replaced by revised rows under fresh docids (+1e8).
    # Replace every corpus scan in the BM25 template with the modified
    # relation FIRST, then prepend the CTE (whose own FROM documents is the
    # one legitimate raw scan).
    _upsert_mod = """docs_mod AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 4
  UNION ALL
  SELECT doc_id + 100000000 AS doc_id, text || ' upsert probe merge' AS text
  FROM documents WHERE doc_id % 11 = 4
)"""
    sqls["upsert_bm25"] = _bm25_sql(["spark", "merge"]).replace(
        "FROM documents", "FROM docs_mod"
    ).replace("WITH ", "WITH " + _upsert_mod + ",\n", 1)

    # time travel: after the upsert commit, the snapshot-0 view must equal a
    # from-scratch build on the UNMODIFIED corpus — the plain BM25 oracle.
    sqls["time_travel_bm25"] = _bm25_sql(["spark", "merge"])

    sqls["term_df"] = f"""WITH {_TOK}
SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term"""

    sqls["doclens"] = f"""WITH {_TL}
SELECT doc_id AS docid, len(toks)::BIGINT AS dl FROM tl"""

    sqls["postings_blocks"] = f"""WITH {_TOK}
SELECT term, doc_id // {BLOCK_SPAN} AS block, count(DISTINCT doc_id)::BIGINT AS n
FROM tok GROUP BY term, doc_id // {BLOCK_SPAN}"""

    sqls["pagerank"] = (
        _pagerank_sql(5)
        + "\nSELECT id AS docid, round(pr, 6) AS pagerank FROM r5 ORDER BY docid"
    )

    # combined = tfidf(spark) + 1.0 * pagerank (5 iters)
    tfidf_one = f"""{_TOK},
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
nn2 AS (SELECT count(*)::DOUBLE AS n FROM documents),
contrib AS (
  SELECT tf.doc_id, tf.tf * (nn2.n / dfreq.df) AS tfidf, (nn2.n / dfreq.df) AS qw
  FROM tf JOIN dfreq USING (term) CROSS JOIN nn2 WHERE tf.term = 'spark'
),
s AS (SELECT doc_id, sum(tfidf * qw) / sqrt(sum(tfidf * tfidf)) AS score
      FROM contrib GROUP BY doc_id)"""
    sqls["combined_rank"] = (
        _pagerank_sql(5)
        + ",\n"
        + tfidf_one
        + """
SELECT s.doc_id AS docid, round(s.score + 1.0 * r5.pr, 6) AS combined
FROM s JOIN r5 ON r5.id = s.doc_id
ORDER BY round(s.score + 1.0 * r5.pr, 6) DESC, docid LIMIT 10"""
    )

    sqls["dedup_exact"] = """
SELECT sha256(text) AS sha, count(*)::BIGINT AS n_dups, min(doc_id) AS canonical_docid
FROM documents GROUP BY sha256(text)"""

    sqls["minhash_signatures"] = (
        "WITH " + _MINHASH + "\nSELECT doc_id AS docid, j::INT AS j, minhash FROM mh"
    )

    sqls["minhash_pairs"] = "WITH " + _PAIRS + "\nSELECT docid_a, docid_b FROM pairs"

    # LTR feature export: BM25 + reference tfidf dot + counts/lengths per
    # (query, candidate), top-20 by rounded bm25, joined to the synthetic
    # id-graph pagerank (same unrolled CTEs as the pagerank entry).
    _ltr_vals = ", ".join(
        f"('{qid}', '{t}', 1.0)"
        for qid, terms in sorted(BM25_BATCH.items())
        if qid != "qd"
        for t in terms
    )
    _pr_parts = _pagerank_sql(5)[len("WITH "):]
    sqls["ltr_features"] = f"""WITH {_TOK},
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM tok GROUP BY doc_id, term),
dlx AS (SELECT doc_id, len(toks)::INT AS dl FROM tl),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
gl AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
              (SELECT avg(dl) FROM dlx)::DOUBLE AS avgdl),
q(qid, term, qtf) AS (VALUES {_ltr_vals}),
contrib AS (
  SELECT q.qid, tf.doc_id,
         q.qtf * ln(1.0 + (gl.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * (tf.tf * (1.2 + 1.0))
              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dlx.dl / gl.avgdl)) AS bm25c,
         tf.tf * (gl.n / dfreq.df) * (q.qtf * (gl.n / dfreq.df)) AS tfidfc,
         tf.tf AS tfv, dlx.dl AS dlv
  FROM tf JOIN q USING (term) JOIN dfreq USING (term)
       JOIN dlx USING (doc_id) CROSS JOIN gl
),
s AS (SELECT qid, doc_id,
             sum(bm25c) AS bm25, sum(tfidfc) AS tfidf_dot,
             count(*)::BIGINT AS matched_terms, sum(tfv)::BIGINT AS sum_tf,
             max(dlv)::BIGINT AS dl
      FROM contrib GROUP BY qid, doc_id),
top AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY round(bm25, 6) DESC, doc_id) AS rnk
        FROM s),{_pr_parts}
SELECT top.qid, top.doc_id AS docid,
       round(top.bm25, 6) AS bm25, round(top.tfidf_dot, 6) AS tfidf_dot,
       top.matched_terms, top.sum_tf, top.dl,
       round(r5.pr, 6) AS pagerank
FROM top JOIN r5 ON r5.id = top.doc_id
WHERE top.rnk <= 20 ORDER BY top.qid, top.doc_id"""

    # incremental dedup: bands CTE computed over ALL docs (same formulas as
    # minhash_pairs), then split into the persisted-corpus half (doc_id%4<>0)
    # and the incoming batch (doc_id%4=0) exactly as the Spark entry does.
    sqls["incremental_dedup"] = "WITH " + _BANDS + """,
base AS (SELECT doc_id, band, band_key FROM bands WHERE doc_id % 4 <> 0),
batch AS (SELECT doc_id, band, band_key FROM bands WHERE doc_id % 4 = 0),
sm AS (
  SELECT n.doc_id, min(s.doc_id) AS store_match
  FROM batch n JOIN base s ON n.band = s.band AND n.band_key = s.band_key
  GROUP BY n.doc_id
),
bmin AS (SELECT band, band_key, min(doc_id) AS m FROM batch GROUP BY band, band_key),
bm AS (
  SELECT n.doc_id, min(b.m) AS batch_match
  FROM batch n JOIN bmin b ON n.band = b.band AND n.band_key = b.band_key
  WHERE b.m < n.doc_id
  GROUP BY n.doc_id
)
SELECT d.doc_id AS docid,
       coalesce(sm.store_match, -1) AS store_match,
       coalesce(bm.batch_match, -1) AS batch_match,
       CAST(sm.store_match IS NOT NULL OR bm.batch_match IS NOT NULL AS INT) AS is_dup
FROM (SELECT doc_id FROM documents WHERE doc_id % 4 = 0) d
LEFT JOIN sm ON d.doc_id = sm.doc_id
LEFT JOIN bm ON d.doc_id = bm.doc_id
ORDER BY docid"""

    # exact incremental dedup: DuckDB groups on raw text (equivalent to the
    # engine's sha256 key — the hash only partitions identical contents).
    sqls["incremental_exact"] = """WITH
b AS (SELECT doc_id, text FROM documents WHERE doc_id % 4 = 0),
s AS (SELECT text, min(doc_id) AS store_canonical
      FROM documents WHERE doc_id % 4 <> 0 GROUP BY text),
m AS (SELECT text, min(doc_id) AS batch_canonical FROM b GROUP BY text)
SELECT b.doc_id AS docid,
       coalesce(s.store_canonical, -1) AS store_canonical,
       coalesce(CASE WHEN m.batch_canonical < b.doc_id THEN m.batch_canonical END, -1) AS batch_dup_of,
       CAST(s.store_canonical IS NOT NULL OR m.batch_canonical < b.doc_id AS INT) AS is_dup
FROM b LEFT JOIN s ON b.text = s.text JOIN m ON b.text = m.text
ORDER BY docid"""

    # W=8; DuckDB slice [a : a+7] is inclusive (8 tokens), range() stop is
    # exclusive (starts 1..n-7); interval-union via lag works because W is
    # constant (prev running max end == lag(start)+W under sorted starts)
    sqls["duplicate_spans"] = f"""WITH wt AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
nz AS (SELECT doc_id, toks, len(toks) AS n FROM wt WHERE len(toks) >= 8),
w AS (SELECT doc_id, n, toks, unnest(range(1, n - 6)) AS start FROM nz),
h AS (SELECT doc_id, n, start,
             {_hash60("array_to_string(toks[start : start + 7], ' ')")} AS h
      FROM w),
d AS (SELECT h FROM h GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
f AS (SELECT doc_id, n, start FROM h WHERE h IN (SELECT h FROM d)),
c AS (SELECT doc_id, n, start,
             coalesce(8 - least(8, greatest(0,
               lag(start) OVER (PARTITION BY doc_id ORDER BY start) + 8 - start)), 8) AS add
      FROM f)
SELECT doc_id AS docid,
       (max(n) - 7)::BIGINT AS n_windows,
       count(*)::BIGINT AS n_dup_windows,
       sum(add)::BIGINT AS dup_tokens,
       round(sum(add)::DOUBLE / max(n), 6) AS dup_frac
FROM c GROUP BY doc_id ORDER BY docid"""

    # removal: flagged starts expand to covered token indices (start+0..7),
    # kept tokens re-agg in position order; docs with no flags pass through
    sqls["remove_duplicate_spans"] = f"""WITH wt AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
nz AS (SELECT doc_id, toks, len(toks) AS n FROM wt WHERE len(toks) >= 8),
w AS (SELECT doc_id, n, toks, unnest(range(1, n - 6)) AS start FROM nz),
h AS (SELECT doc_id, n, start,
             {_hash60("array_to_string(toks[start : start + 7], ' ')")} AS h
      FROM w),
canon AS (SELECT h, min(doc_id) AS canon FROM h
          GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
fl AS (SELECT h.doc_id, h.start FROM h JOIN canon USING (h)
       WHERE h.doc_id <> canon.canon),
cov AS (SELECT DISTINCT fl.doc_id, fl.start + g.g AS i
        FROM fl, (SELECT unnest(range(0, 8)) AS g) g),
ti AS (SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS i
       FROM wt),
kept AS (SELECT t.doc_id, t.tok, t.i FROM ti t
         ANTI JOIN cov c ON t.doc_id = c.doc_id AND t.i = c.i),
agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS clean_text,
               count(*) AS kept_n
        FROM kept GROUP BY doc_id)
SELECT w.doc_id AS docid,
       coalesce(a.clean_text, '') AS clean_text,
       len(w.toks)::BIGINT AS n_tokens,
       (len(w.toks) - coalesce(a.kept_n, 0))::BIGINT AS removed_tokens
FROM wt w LEFT JOIN agg a ON w.doc_id = a.doc_id ORDER BY docid"""

    # same window machinery; eval = doc_id % 10 == 0, train = the rest
    sqls["decontaminate"] = f"""WITH wt AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
  FROM documents
),
nz AS (SELECT doc_id, toks, len(toks) AS n FROM wt WHERE len(toks) >= 8),
w AS (SELECT doc_id, n, toks, unnest(range(1, n - 6)) AS start FROM nz),
h AS (SELECT doc_id, n, start,
             {_hash60("array_to_string(toks[start : start + 7], ' ')")} AS h
      FROM w),
evh AS (SELECT DISTINCT h FROM h WHERE doc_id % 10 = 0),
f AS (SELECT doc_id, n, start FROM h
      WHERE doc_id % 10 <> 0 AND h IN (SELECT h FROM evh)),
c AS (SELECT doc_id, n, start,
             coalesce(8 - least(8, greatest(0,
               lag(start) OVER (PARTITION BY doc_id ORDER BY start) + 8 - start)), 8) AS add
      FROM f)
SELECT doc_id AS docid,
       (max(n) - 7)::BIGINT AS n_windows,
       count(*)::BIGINT AS n_contam_windows,
       sum(add)::BIGINT AS contam_tokens,
       round(sum(add)::DOUBLE / max(n), 6) AS contam_frac
FROM c GROUP BY doc_id ORDER BY docid"""

    # min-docid-reachable per node via recursive CTE == the fixed point of
    # the engine's min-label propagation; singletons fall back to their own
    # docid through the left join
    sqls["dedup_clusters"] = (
        "WITH RECURSIVE "
        + _PAIRS
        + """,
edges AS (
  SELECT docid_a AS src, docid_b AS dst FROM pairs
  UNION
  SELECT docid_b AS src, docid_a AS dst FROM pairs
),
reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
),
comp AS (SELECT node, min(r) AS cluster FROM reach GROUP BY node)
SELECT d.doc_id AS docid, coalesce(comp.cluster, d.doc_id)::BIGINT AS cluster
FROM documents d LEFT JOIN comp ON comp.node = d.doc_id
ORDER BY docid"""
    )

    sqls["simhash"] = f"""WITH {_WS},
tok AS (SELECT doc_id, unnest(toks) AS tok FROM wtl),
tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, tok),
th AS (SELECT doc_id, tf, {_hash60("tok")} AS h FROM tf),
bits AS (SELECT unnest(range(60)) AS b),
w AS (SELECT doc_id, b, tf * (((h >> b) & 1) * 2 - 1) AS w FROM th CROSS JOIN bits),
bs AS (SELECT doc_id, b, sum(w) AS s FROM w GROUP BY doc_id, b)
SELECT doc_id AS docid,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
FROM bs GROUP BY doc_id"""

    sqls["ngram_jaccard"] = (
        "WITH "
        + _PAIRS
        + """,
dsh AS (SELECT DISTINCT doc_id, sh FROM shx),
sizes AS (SELECT doc_id, count(*)::BIGINT AS nsh FROM dsh GROUP BY doc_id),
common AS (
  SELECT p.docid_a, p.docid_b, count(*)::BIGINT AS n_common
  FROM pairs p
  JOIN dsh a ON a.doc_id = p.docid_a
  JOIN dsh b ON b.doc_id = p.docid_b AND b.sh = a.sh
  GROUP BY p.docid_a, p.docid_b
)
SELECT c.docid_a, c.docid_b,
       round(n_common::DOUBLE / (sa.nsh + sb.nsh - n_common), 6) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.docid_a
JOIN sizes sb ON sb.doc_id = c.docid_b
WHERE n_common::DOUBLE / (sa.nsh + sb.nsh - n_common) >= 0.2"""
    )

    sqls["ann_cosine"] = """
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS qv
  FROM embeddings WHERE vec_id = 0
),
e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
d AS (
  SELECT e.vec_id, sum(e.v * q.qv) AS dot, sum(e.v * e.v) AS n2, sum(q.qv * q.qv) AS q2
  FROM e JOIN q USING (i) GROUP BY e.vec_id
)
SELECT vec_id, round(dot / (sqrt(n2) * sqrt(q2)), 6) AS cosine
FROM d ORDER BY round(dot / (sqrt(n2) * sqrt(q2)), 6) DESC, vec_id LIMIT 10"""

    # IVF with nprobe == n_centroids is the exact scan by construction —
    # same oracle; the entry hash-checks the fit/assign/probe plumbing
    sqls["ann_ivf"] = sqls["ann_cosine"]

    # MMR: the k=5 greedy unrolled as chained CTEs — sel_i picks the
    # argmax of 0.5·rel − 0.5·max-sim-to-selected, rem_i folds the new
    # pick's similarity into the running max (exactly mmr_rerank's loop)
    _mmr = [
        """cand AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         list_cosine_similarity(embedding::DOUBLE[],
           (SELECT list_transform(embedding::DOUBLE[], x -> 0.9 * x + 0.1)
            FROM embeddings WHERE vec_id = 0)) AS rel
  FROM embeddings ORDER BY rel DESC, vec_id LIMIT 50)""",
        "sel1 AS (SELECT vec_id, e, rel, 0.5 * rel AS mmr FROM cand "
        "ORDER BY mmr DESC, vec_id LIMIT 1)",
    ]
    for i in range(1, 5):
        src = "cand c" if i == 1 else f"rem{i-1} c"
        ms = (
            "list_cosine_similarity(c.e, s.e)"
            if i == 1
            else "greatest(c.ms, list_cosine_similarity(c.e, s.e))"
        )
        _mmr.append(
            f"rem{i} AS (SELECT c.vec_id, c.e, c.rel, {ms} AS ms "
            f"FROM {src} CROSS JOIN sel{i} s WHERE c.vec_id <> s.vec_id)"
        )
        _mmr.append(
            f"sel{i+1} AS (SELECT vec_id, e, rel, 0.5 * rel - 0.5 * ms AS mmr "
            f"FROM rem{i} ORDER BY mmr DESC, vec_id LIMIT 1)"
        )
    sqls["mmr_rerank"] = (
        "WITH "
        + ",\n".join(_mmr)
        + "\n"
        + "\nUNION ALL\n".join(
            f"SELECT vec_id, round(rel, 6) AS cosine, round(mmr, 6) AS mmr_score,"
            f" {i}::BIGINT AS rank FROM sel{i}"
            for i in range(1, 6)
        )
    )

    sqls["embed_neardup"] = """
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS n FROM e GROUP BY vec_id),
d AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.v * b.v) AS dot
  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY a.vec_id, b.vec_id
)
SELECT d.vec_a, d.vec_b, round(d.dot / (x.n * y.n), 6) AS cosine
FROM d JOIN nrm x ON x.vec_id = d.vec_a JOIN nrm y ON y.vec_id = d.vec_b
WHERE round(d.dot / (x.n * y.n), 6) >= 0.35"""

    # LSH candidates + exact cosine is lossless on the fixed corpora/seed
    # (pytest-asserted at sf0.001/0.01/0.1) — same exact-pairs oracle
    sqls["embed_neardup_lsh"] = sqls["embed_neardup"]

    sqls["language_id"] = f"""WITH {_WS},
st AS (
  SELECT doc_id, len(toks) AS n,
         len(list_filter(toks, x -> x IN ({_STOP_IN}))) AS n_stop
  FROM wtl
),
r AS (
  SELECT d.doc_id,
         CASE WHEN st.n > 0 THEN st.n_stop::DOUBLE / st.n ELSE 0.0 END AS stop_ratio,
         CASE WHEN length(d.text) > 0
              THEN length(regexp_replace(d.text, '[\\x00-\\x7F]', '', 'g'))::DOUBLE / length(d.text)
              ELSE 0.0 END AS na_ratio
  FROM documents d JOIN st ON st.doc_id = d.doc_id
)
SELECT doc_id AS docid,
       CASE WHEN stop_ratio >= 0.15 THEN 'en'
            WHEN na_ratio >= 0.05 THEN 'other'
            ELSE 'code' END AS lang_guess
FROM r"""

    # Multinomial NB self-train + classify, exact Laplace decomposition:
    # score(d,y) = ln(n_docs(y)/N) + n_d * (-ln(tot(y)+V)) + sum ln(c(t,y)+1).
    # Tie-break mirrors the engine: highest score, then smallest label.
    sqls["nb_classify"] = """WITH
toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS token
  FROM documents
),
counts AS (SELECT lang AS y, token, count(*)::DOUBLE AS c FROM toks GROUP BY y, token),
labels AS (SELECT lang AS y, count(*)::DOUBLE AS n_docs FROM documents GROUP BY lang),
tot AS (SELECT count(*)::DOUBLE AS n FROM documents),
totals AS (SELECT y, sum(c) AS t FROM counts GROUP BY y),
vocab AS (SELECT count(DISTINCT token)::DOUBLE AS v FROM toks),
params AS (
  SELECT l.y, ln(l.n_docs / tot.n) AS prior, -ln(t.t + vocab.v) AS floor
  FROM labels l
  JOIN totals t ON t.y = l.y
  CROSS JOIN tot CROSS JOIN vocab
),
ntok AS (SELECT doc_id, count(*)::DOUBLE AS n FROM toks GROUP BY doc_id),
hits AS (
  SELECT tk.doc_id, c.y, sum(ln(c.c + 1)) AS s
  FROM toks tk JOIN counts c ON c.token = tk.token
  GROUP BY tk.doc_id, c.y
),
scores AS (
  SELECT d.doc_id, d.lang, p.y,
         p.prior + coalesce(nt.n, 0) * p.floor + coalesce(h.s, 0.0) AS score
  FROM documents d
  CROSS JOIN params p
  LEFT JOIN ntok nt ON nt.doc_id = d.doc_id
  LEFT JOIN hits h ON h.doc_id = d.doc_id AND h.y = p.y
)
SELECT doc_id AS docid, lang, y AS pred, score, (y = lang) AS correct
FROM scores
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, y ASC) = 1"""

    # Add-one bigram LM self-train + per-doc cross-entropy/perplexity:
    # ln P(cur|prev) = ln(C(prev,cur)+1) - ln(C(prev)+V), V = unigram vocab.
    _LM_CTES = f"""{_WS},
idx AS (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
  FROM wtl WHERE len(toks) >= 2
),
bg AS (SELECT doc_id, toks[i] AS prev, toks[i+1] AS cur FROM idx),
bgc AS (SELECT prev, cur, count(*)::DOUBLE AS c FROM bg GROUP BY prev, cur),
ctx AS (SELECT prev, sum(c) AS t FROM bgc GROUP BY prev),
vocab AS (
  SELECT count(DISTINCT tok)::DOUBLE AS v
  FROM (SELECT unnest(toks) AS tok FROM wtl)
),
lp AS (
  SELECT b.doc_id,
         ln(coalesce(bgc.c, 0) + 1) - ln(coalesce(ctx.t, 0) + vocab.v) AS lnp
  FROM bg b
  LEFT JOIN bgc ON bgc.prev = b.prev AND bgc.cur = b.cur
  LEFT JOIN ctx ON ctx.prev = b.prev
  CROSS JOIN vocab
),
h AS (
  SELECT doc_id, count(*) AS m, -avg(lnp) AS cross_entropy
  FROM lp GROUP BY doc_id
)"""

    sqls["lm_perplexity"] = f"""WITH {_LM_CTES}
SELECT d.doc_id AS docid,
       coalesce(h.m, 0)::BIGINT AS n_bigrams,
       h.cross_entropy,
       exp(h.cross_entropy) AS perplexity
FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id"""

    # DSIR: hashed-bigram bucket models over the %7 target/raw split,
    # Laplace-smoothed log ratio per bucket, per-doc feature sum; the
    # select entry adds deterministic Gumbel noise from the salted 60-bit
    # doc hash and cuts top-k on the 6dp-rounded score.
    _DSIR_CTES = f"""{_WS},
idx AS (
  SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
  FROM wtl WHERE len(toks) >= 2
),
bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g FROM idx),
fb AS (SELECT doc_id, {_hash60('g')} % 2048 AS b FROM bg),
rawb AS (SELECT doc_id, b FROM fb WHERE doc_id % 7 <> 0),
tgtb AS (SELECT b FROM fb WHERE doc_id % 7 = 0),
cr AS (SELECT b, count(*)::DOUBLE AS c FROM rawb GROUP BY b),
ct AS (SELECT b, count(*)::DOUBLE AS c FROM tgtb GROUP BY b),
tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM cr) AS tr,
               (SELECT coalesce(sum(c), 0) FROM ct) AS tt),
lr AS (
  SELECT coalesce(cr.b, ct.b) AS b,
         ln((coalesce(ct.c, 0) + 1.0) / (tot.tt + 2048))
       - ln((coalesce(cr.c, 0) + 1.0) / (tot.tr + 2048)) AS lr
  FROM cr FULL OUTER JOIN ct ON cr.b = ct.b CROSS JOIN tot
),
wsum AS (
  SELECT r.doc_id, count(*)::BIGINT AS n_features, sum(lr.lr) AS log_weight
  FROM rawb r JOIN lr ON lr.b = r.b GROUP BY r.doc_id
),
wful AS (
  SELECT d.doc_id,
         coalesce(w.n_features, 0)::BIGINT AS n_features,
         coalesce(w.log_weight, 0.0) AS log_weight
  FROM (SELECT doc_id FROM documents WHERE doc_id % 7 <> 0) d
  LEFT JOIN wsum w ON w.doc_id = d.doc_id
)"""

    sqls["dsir_weights"] = f"""WITH {_DSIR_CTES}
SELECT doc_id AS docid, n_features, round(log_weight, 6) AS log_weight
FROM wful ORDER BY docid"""

    sqls["dsir_select"] = f"""WITH {_DSIR_CTES}
SELECT doc_id AS docid,
       round(log_weight / 1.0
             + -ln(-ln(({_hash60("'dsir|' || doc_id")} + 1.0) / (power(2, 60) + 1.0))),
             6) AS score
FROM wful
ORDER BY score DESC, docid LIMIT 150"""

    # CCNet head/middle/tail: same LM CTEs; scores and tercile cuts rounded
    # to 6dp BEFORE the comparison, mirroring the engine's round_dp guard.
    sqls["perplexity_buckets"] = f"""WITH {_LM_CTES},
pplr AS (
  SELECT d.doc_id, d.lang, round(exp(h.cross_entropy), 6) AS ppl
  FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id
),
qs AS (
  SELECT lang,
         round(quantile_cont(ppl, 1.0/3.0), 6) AS q1,
         round(quantile_cont(ppl, 2.0/3.0), 6) AS q2
  FROM pplr WHERE ppl IS NOT NULL GROUP BY lang
)
SELECT p.doc_id AS docid, p.lang,
       coalesce(p.ppl, -1.0) AS perplexity,
       CASE WHEN p.ppl IS NULL THEN 'unscored'
            WHEN p.ppl <= qs.q1 THEN 'head'
            WHEN p.ppl <= qs.q2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM pplr p LEFT JOIN qs ON p.lang = qs.lang
ORDER BY docid"""

    # Per-source curation: same quality formula as quality_scores, ONE
    # group by source; keep thresholds on the ROUNDED aggregates (the
    # Spark side thresholds the same rounded columns).
    _SRC_STATS = f"""WITH {_WS},
m AS (
  SELECT d.doc_id, d.source,
         len(wtl.toks) AS n,
         sha256(d.text) AS sha,
         CASE WHEN len(wtl.toks) > 0
              THEN length(array_to_string(wtl.toks, ''))::DOUBLE / len(wtl.toks)
              ELSE 0.0 END AS mean_len,
         CASE WHEN len(wtl.toks) > 0
              THEN len(list_filter(wtl.toks, x -> x IN ({_STOP_IN})))::DOUBLE / len(wtl.toks)
              ELSE 0.0 END AS stop_ratio,
         CASE WHEN length(d.text) > 0
              THEN length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(d.text)
              ELSE 0.0 END AS alpha_ratio
  FROM documents d JOIN wtl ON wtl.doc_id = d.doc_id
),
q AS (
  SELECT doc_id, source, n, sha,
         (CASE WHEN mean_len >= 3 AND mean_len <= 10 THEN 0.4 ELSE 0.0 END)
       + (CASE WHEN stop_ratio <= 0.5 THEN 0.3 ELSE 0.0 END)
       + (CASE WHEN alpha_ratio >= 0.6 THEN 0.3 ELSE 0.0 END) AS quality
  FROM m
),
agg AS (
  SELECT source,
         count(*)::BIGINT AS n_docs,
         count(DISTINCT sha)::BIGINT AS n_unique,
         round(avg(n::DOUBLE), 4) AS avg_tokens,
         round(avg(quality), 4) AS avg_quality
  FROM q GROUP BY source
),
rep AS (
  SELECT source, n_docs, n_unique,
         round(1.0 - n_unique::DOUBLE / n_docs, 6) AS dup_frac,
         avg_tokens, avg_quality,
         (n_docs >= 1 AND round(1.0 - n_unique::DOUBLE / n_docs, 6) <= 1.0
          AND avg_quality >= 0.0 AND avg_tokens >= 55.0) AS keep
  FROM agg
)"""

    sqls["source_stats"] = _SRC_STATS + """
SELECT source, n_docs, n_unique, dup_frac, avg_tokens, avg_quality, keep FROM rep"""

    sqls["source_filtered_docs"] = _SRC_STATS + """
SELECT d.doc_id AS docid, d.source
FROM documents d JOIN rep ON rep.source = d.source AND rep.keep"""

    # End-to-end curation pipeline: train = doc_id%10<>0, eval = %10=0.
    # Thresholds mirror _CURATE_KW: the quality gates (min_source_quality,
    # min_quality) default to 0.0 and are trivially true, so the oracle
    # reduces them away; the discriminating gates are avg_tokens>=55
    # (source), n_tokens>=55 (doc), any-shared-8-window (decontaminate),
    # and the 90% md5 hash sample.
    _W8 = _hash60("array_to_string(toks[start : start + 7], ' ')")
    _CURATE = f"""WITH {_WS},
tr AS (
  SELECT d.doc_id, d.source, d.text, wtl.toks, len(wtl.toks) AS n
  FROM documents d JOIN wtl ON wtl.doc_id = d.doc_id
  WHERE d.doc_id % 10 <> 0
),
src AS (
  SELECT source FROM (
    SELECT source, round(avg(n::DOUBLE), 4) AS at FROM tr GROUP BY source
  ) WHERE at >= 55.0
),
s1 AS (SELECT * FROM tr WHERE source IN (SELECT source FROM src)),
s2 AS (
  SELECT * FROM s1
  QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1
),
s3 AS (SELECT * FROM s2 WHERE n >= 55),
ev AS (
  SELECT d.doc_id, wtl.toks, len(wtl.toks) AS n
  FROM documents d JOIN wtl ON wtl.doc_id = d.doc_id
  WHERE d.doc_id % 10 = 0 AND len(wtl.toks) >= 8
),
evw AS (
  SELECT DISTINCT {_W8} AS h
  FROM (SELECT doc_id, toks, unnest(range(1, n - 6)) AS start FROM ev)
),
flag AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, toks, unnest(range(1, n - 6)) AS start
        FROM s3 WHERE n >= 8)
  WHERE {_W8} IN (SELECT h FROM evw)
),
s4 AS (SELECT * FROM s3 WHERE doc_id NOT IN (SELECT doc_id FROM flag)),
s5 AS (
  SELECT * FROM s4
  WHERE {_hash60("'curate-v1|' || doc_id::VARCHAR")} % 1000000 < 900000
)"""

    sqls["curated_docs"] = _CURATE + """
SELECT doc_id AS docid, source FROM s5"""

    sqls["curation_funnel"] = _CURATE + """
SELECT 0 AS stage_idx, 'input' AS stage, (SELECT count(*) FROM tr)::BIGINT AS n_docs
UNION ALL SELECT 1, 'source_filter', (SELECT count(*) FROM s1)::BIGINT
UNION ALL SELECT 2, 'exact_dedup', (SELECT count(*) FROM s2)::BIGINT
UNION ALL SELECT 3, 'doc_gates', (SELECT count(*) FROM s3)::BIGINT
UNION ALL SELECT 4, 'decontaminate', (SELECT count(*) FROM s4)::BIGINT
UNION ALL SELECT 5, 'sample', (SELECT count(*) FROM s5)::BIGINT"""

    # Product quantization: the SAME seeded codebooks the Spark entries
    # use, embedded as a 128-row VALUES literal; code assignment =
    # first-min over distances rounded to pq.DIST_ROUND (argmin tie rule =
    # lowest code, matching numpy's first-occurrence argmin); ADC score =
    # sum of lut[sub][code] rounded to 6.
    from mini_search_engine_spark.ops.pq import DIST_ROUND, seeded_codebooks

    _cb = seeded_codebooks()
    _cb_rows = ", ".join(
        f"({j}, {c}, [{', '.join(repr(float(v)) for v in _cb[j, c])}])"
        for j in range(_cb.shape[0])
        for c in range(_cb.shape[1])
    )
    _SUB = _cb.shape[2]
    _PQ = f"""WITH cbt AS (
  SELECT * FROM (VALUES {_cb_rows}) AS t(sub, code, cent)
),
d AS (
  SELECT e.vec_id, cbt.sub, cbt.code,
         round(list_sum(list_transform(range(1, {_SUB + 1}),
           i -> (cbt.cent[i] - e.embedding[cbt.sub * {_SUB} + i])
              * (cbt.cent[i] - e.embedding[cbt.sub * {_SUB} + i]))), {DIST_ROUND}) AS dist
  FROM embeddings e CROSS JOIN cbt
),
codes AS (
  SELECT vec_id, sub, code FROM d
  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist ASC, code ASC) = 1
)"""

    sqls["pq_codes"] = _PQ + """
SELECT vec_id, sub::INT AS sub, code::INT AS code FROM codes"""

    sqls["pq_adc_topk"] = _PQ + f""",
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
lut AS (
  SELECT cbt.sub, cbt.code,
         list_sum(list_transform(range(1, {_SUB + 1}),
           i -> q.qe[cbt.sub * {_SUB} + i] * cbt.cent[i])) AS v
  FROM cbt CROSS JOIN q
)
SELECT c.vec_id, round(sum(l.v), 6) AS score
FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
GROUP BY c.vec_id
ORDER BY score DESC, c.vec_id ASC
LIMIT 10"""

    # IVFADC: coarse assignment (rounded ip argmax, ties -> lowest list),
    # residual PQ codes (same rounding/tie rules as pq_codes), probe the
    # nprobe best lists by rounded ip(q, centroid), score = per-list
    # constant + ADC fold. Same seeded fixtures as the Spark entry.
    from mini_search_engine_spark.ops.ivfadc import seeded_centroids

    _cent = seeded_centroids()
    _cvt_rows = ", ".join(
        f"({p}, [{', '.join(repr(float(v)) for v in _cent[p])}])"
        for p in range(_cent.shape[0])
    )
    _DIM = _cent.shape[1]
    sqls["ivfadc_topk"] = f"""WITH cvt AS (
  SELECT * FROM (VALUES {_cvt_rows}) AS t(lst, cvec)
),
cbt AS (
  SELECT * FROM (VALUES {_cb_rows}) AS t(sub, code, cent)
),
adot AS (
  SELECT e.vec_id, cvt.lst,
         round(list_sum(list_transform(range(1, {_DIM + 1}),
           i -> e.embedding[i] * cvt.cvec[i])), {DIST_ROUND}) AS d
  FROM embeddings e CROSS JOIN cvt
),
asg AS (
  SELECT vec_id, lst FROM adot
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, lst ASC) = 1
),
res AS (
  SELECT e.vec_id, asg.lst,
         list_transform(range(1, {_DIM + 1}), i -> e.embedding[i] - cvt.cvec[i]) AS r
  FROM embeddings e JOIN asg ON asg.vec_id = e.vec_id
  JOIN cvt ON cvt.lst = asg.lst
),
rd AS (
  SELECT res.vec_id, res.lst, cbt.sub, cbt.code,
         round(list_sum(list_transform(range(1, {_SUB + 1}),
           i -> (cbt.cent[i] - res.r[cbt.sub * {_SUB} + i])
              * (cbt.cent[i] - res.r[cbt.sub * {_SUB} + i]))), {DIST_ROUND}) AS dist
  FROM res CROSS JOIN cbt
),
codes AS (
  SELECT vec_id, lst, sub, code FROM rd
  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist ASC, code ASC) = 1
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
probes AS (
  SELECT cvt.lst,
         round(list_sum(list_transform(range(1, {_DIM + 1}),
           i -> q.qe[i] * cvt.cvec[i])), {DIST_ROUND}) AS qc
  FROM cvt CROSS JOIN q
  ORDER BY qc DESC, lst ASC LIMIT 4
),
lut AS (
  SELECT cbt.sub, cbt.code,
         list_sum(list_transform(range(1, {_SUB + 1}),
           i -> q.qe[cbt.sub * {_SUB} + i] * cbt.cent[i])) AS v
  FROM cbt CROSS JOIN q
)
SELECT c.vec_id, round(any_value(p.qc) + sum(l.v), 6) AS score
FROM codes c
JOIN probes p ON p.lst = c.lst
JOIN lut l ON l.sub = c.sub AND l.code = c.code
GROUP BY c.vec_id
ORDER BY score DESC, c.vec_id ASC
LIMIT 10"""

    sqls["quality_scores"] = f"""WITH {_WS},
b AS (
  SELECT d.doc_id, wtl.toks, d.text,
         len(wtl.toks) AS n,
         len(list_filter(wtl.toks, x -> x IN ({_STOP_IN}))) AS n_stop,
         length(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) AS alpha_chars
  FROM documents d JOIN wtl ON wtl.doc_id = d.doc_id
),
m AS (
  SELECT doc_id, n,
         CASE WHEN n > 0 THEN length(array_to_string(toks, ''))::DOUBLE / n ELSE 0.0 END AS mean_len,
         CASE WHEN n > 0 THEN n_stop::DOUBLE / n ELSE 0.0 END AS stop_ratio,
         CASE WHEN length(text) > 0 THEN alpha_chars::DOUBLE / length(text) ELSE 0.0 END AS alpha_ratio
  FROM b
)
SELECT doc_id AS docid, n::BIGINT AS n_tokens,
       round(mean_len, 6) AS mean_token_len,
       round(stop_ratio, 6) AS stopword_ratio,
       round(alpha_ratio, 6) AS alpha_ratio,
       round((CASE WHEN mean_len >= 3 AND mean_len <= 10 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN stop_ratio <= 0.5 THEN 0.3 ELSE 0.0 END)
           + (CASE WHEN alpha_ratio >= 0.6 THEN 0.3 ELSE 0.0 END), 6) AS quality
FROM m"""

    sqls["token_counts"] = f"""WITH {_WS}
SELECT d.doc_id AS docid,
       len(wtl.toks)::BIGINT AS ws_tokens,
       len(regexp_extract_all(d.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT AS bpe_tokens,
       length(d.text)::BIGINT AS n_chars_seen
FROM documents d JOIN wtl ON wtl.doc_id = d.doc_id"""

    sqls["collocations"] = f"""WITH {_WS},
tokp AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM wtl),
bi AS (SELECT a.term AS a, b.term AS b
       FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
bc AS (SELECT a, b, count(*)::BIGINT AS n_ab FROM bi GROUP BY a, b HAVING count(*) >= 5),
uc AS (SELECT term, count(*)::BIGINT AS n FROM tokp GROUP BY term),
tot AS (SELECT (SELECT count(*) FROM bi)::DOUBLE AS nb,
               (SELECT count(*) FROM tokp)::DOUBLE AS nu)
SELECT bc.a, bc.b, bc.n_ab,
       round(ln((bc.n_ab / tot.nb) / ((ua.n / tot.nu) * (ub.n / tot.nu))), 6) AS pmi
FROM bc JOIN uc ua ON bc.a = ua.term JOIN uc ub ON bc.b = ub.term CROSS JOIN tot
ORDER BY pmi DESC, bc.a, bc.b LIMIT 50"""

    # frequent trigrams: positional self-join ×2 (the oracle-side dual of
    # the engine's native slice+array_join generation)
    sqls["frequent_ngrams"] = f"""WITH {_WS},
tokp AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM wtl),
tri AS (SELECT a.term || ' ' || b.term || ' ' || c.term AS gram
        FROM tokp a
        JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        JOIN tokp c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2)
SELECT gram, count(*)::BIGINT AS n_occ FROM tri GROUP BY gram
HAVING count(*) >= 5 ORDER BY n_occ DESC, gram LIMIT 50"""

    sqls["next_words"] = f"""WITH {_WS},
tokp AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM wtl),
nx AS (SELECT b.term AS next FROM tokp a
       JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       WHERE a.term = 'fast')
SELECT next, count(*)::BIGINT AS n_occ FROM nx GROUP BY next
ORDER BY n_occ DESC, next LIMIT 10"""

    # sparse tf-idf export: the oracle re-derives the 60-bit term id from
    # md5 — value-hash match IS a cross-engine id-parity check
    sqls["doc_vectors"] = f"""WITH {_TOK},
tf AS (SELECT doc_id, term, count(*)::INT AS tf FROM tok GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
nn AS (SELECT count(*)::DOUBLE AS n FROM documents)
SELECT tf.doc_id AS docid,
       {_hash60("tf.term")} AS tid,
       round(tf.tf * ln(nn.n / dfreq.df), 6) AS weight
FROM tf JOIN dfreq USING (term) CROSS JOIN nn
WHERE dfreq.df < nn.n
ORDER BY docid, tid"""

    sqls["fingerprint"] = f"""
SELECT doc_id AS docid,
       list_min([{_hash60("substring(text, i, 5)")}
                 for i in range(1, greatest(length(text) - 4, 1) + 1)]) AS fingerprint
FROM documents"""

    # PII redaction — identical synthetic PII suffix built on both sides
    # (see _with_synthetic_pii); patterns injected verbatim from
    # ops/pipeline.py constants (Java-regex == RE2 for these). No f-string
    # here: the patterns contain {m,n} quantifiers.
    from mini_search_engine_spark.ops.pipeline import (
        EMAIL_PATTERN,
        IPV4_PATTERN,
        PHONE_PATTERN,
    )

    _pii_synth = (
        "synth AS (\n"
        "  SELECT doc_id,\n"
        "         text || ' mail user' || doc_id::VARCHAR || '@ex-ample.co call 415-555-'\n"
        "              || lpad((doc_id % 10000)::VARCHAR, 4, '0')\n"
        "              || ' from 10.0.' || (doc_id % 256)::VARCHAR || '.7' AS t\n"
        "  FROM documents\n"
        ")"
    )
    # chunk_size=16, overlap=4, step=12; DuckDB list slice [a:b] is 1-based
    # inclusive, range() stop is exclusive — both match the Spark
    # sequence/slice semantics exactly
    sqls["doc_chunks"] = r"""WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
  FROM documents
),
nz AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
s AS (SELECT doc_id, toks, unnest(range(0, greatest(n - 4, 1), 12)) AS start FROM nz)
SELECT doc_id AS docid,
       (start // 12)::BIGINT AS chunk_id,
       len(toks[start + 1 : start + 16])::BIGINT AS n_tokens,
       array_to_string(toks[start + 1 : start + 16], ' ') AS chunk
FROM s ORDER BY docid, chunk_id"""

    sqls["pii_redact"] = (
        "WITH " + _pii_synth + "\n"
        "SELECT doc_id AS docid,\n"
        "       len(regexp_extract_all(t, '" + EMAIL_PATTERN + "'))::BIGINT AS n_emails,\n"
        "       len(regexp_extract_all(t, '" + PHONE_PATTERN + "'))::BIGINT AS n_phones,\n"
        "       len(regexp_extract_all(t, '" + IPV4_PATTERN + "'))::BIGINT AS n_ips,\n"
        "       md5(regexp_replace(regexp_replace(regexp_replace(t,\n"
        "           '" + EMAIL_PATTERN + "', '<EMAIL>', 'g'),\n"
        "           '" + PHONE_PATTERN + "', '<PHONE>', 'g'),\n"
        "           '" + IPV4_PATTERN + "', '<IP>', 'g')) AS redacted_md5\n"
        "FROM synth ORDER BY docid"
    )

    # Gopher-style repetition signals; `keep` thresholds applied on the
    # UNROUNDED fractions, exactly as ops/pipeline.repetition_scores does
    sqls["repetition_scores"] = f"""WITH {_WS},
tokx AS (SELECT doc_id, unnest(toks) AS tok FROM wtl),
cnt AS (SELECT doc_id, tok, count(*) AS c FROM tokx GROUP BY doc_id, tok),
agg AS (SELECT doc_id, sum(c) AS n, count(*) AS nd, max(c) AS topc FROM cnt GROUP BY doc_id),
big AS (
  SELECT doc_id, [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS bgs
  FROM wtl WHERE len(toks) >= 2
),
bigx AS (SELECT doc_id, unnest(bgs) AS bg FROM big),
bcnt AS (SELECT doc_id, bg, count(*) AS c FROM bigx GROUP BY doc_id, bg),
bagg AS (SELECT doc_id, sum(c) AS nb, max(c) AS topb FROM bcnt GROUP BY doc_id),
fr AS (
  SELECT d.doc_id,
         coalesce(a.n, 0) AS n,
         CASE WHEN coalesce(a.n, 0) > 0 THEN (a.n - a.nd)::DOUBLE / a.n ELSE 0.0 END AS dupf,
         CASE WHEN coalesce(a.n, 0) > 0 THEN a.topc::DOUBLE / a.n ELSE 0.0 END AS topt,
         CASE WHEN coalesce(b.nb, 0) > 0 THEN b.topb::DOUBLE / b.nb ELSE 0.0 END AS topb
  FROM documents d
  LEFT JOIN agg a ON a.doc_id = d.doc_id
  LEFT JOIN bagg b ON b.doc_id = d.doc_id
)
SELECT doc_id AS docid, n::BIGINT AS n_tokens,
       round(dupf, 6) AS dup_token_frac,
       round(topt, 6) AS top_token_frac,
       round(topb, 6) AS top_bigram_frac,
       (dupf <= 0.75 AND topt <= 0.30 AND topb <= 0.18)::INTEGER AS keep
FROM fr ORDER BY docid"""

    # deterministic stratified sample — same 60-bit md5-prefix hash,
    # same per-lang thresholds as STRAT_RATES / salt "mix-v1"
    _strat_thresh = "CASE " + " ".join(
        f"WHEN lang = '{k}' THEN {int(v * 1_000_000)}"
        for k, v in sorted(STRAT_RATES.items())
    ) + " ELSE 0 END"
    sqls["stratified_sample"] = f"""
SELECT doc_id AS docid, lang
FROM documents
WHERE {_hash60("'mix-v1|' || doc_id::VARCHAR")} % 1000000 < {_strat_thresh}
ORDER BY docid"""

    # epoch mixing: n_copies = floor(w) + (hash < frac(w)); generated from
    # the same EPOCH_WEIGHTS dict the Spark entry uses (default weight 1.0)
    _w_int = "CASE " + " ".join(
        f"WHEN lang = '{k}' THEN {int(v)}" for k, v in sorted(EPOCH_WEIGHTS.items())
    ) + " ELSE 1 END"
    _w_frac = "CASE " + " ".join(
        f"WHEN lang = '{k}' THEN {int(round((v - int(v)) * 1_000_000))}"
        for k, v in sorted(EPOCH_WEIGHTS.items())
    ) + " ELSE 0 END"
    sqls["epoch_mix"] = f"""
WITH c AS (
  SELECT doc_id, lang,
         ({_w_int}) + (CASE WHEN {_hash60("'mix-v2|' || doc_id::VARCHAR")} % 1000000
                            < ({_w_frac}) THEN 1 ELSE 0 END) AS n
  FROM documents
)
SELECT doc_id AS docid, lang, unnest(range(n))::BIGINT AS epoch
FROM c WHERE n > 0 ORDER BY docid, epoch"""

    sqls["events_window"] = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY date_trunc('hour', ts), event_type"""

    # gap-based sessionization: lag + running sum of boundary flags, exact
    # integer microseconds on both engines (unix_micros / epoch_us)
    sqls["session_stats"] = """
WITH g AS (
  SELECT user_id, event_id, ts, event_type,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
), s AS (
  SELECT *,
         sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)::BIGINT AS session_no
  FROM g
)
SELECT user_id, session_no,
       count(*)::BIGINT AS n_events,
       floor((max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000)::BIGINT AS duration_s,
       count(DISTINCT event_type)::BIGINT AS n_types
FROM s GROUP BY user_id, session_no ORDER BY user_id, session_no"""

    # as-of join: DuckDB's native ASOF LEFT JOIN is the oracle for the
    # union-merge implementation; right side deduped per (key, ts) by max
    # event_id exactly as ops.asof_join's tie_break pins it
    sqls["asof_enrich"] = """
WITH p AS (
  SELECT user_id, ts, event_id AS last_purchase_id, value AS last_purchase_value,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
)
SELECT e.event_id, e.user_id, e.event_type,
       p.last_purchase_id,
       round(p.last_purchase_value, 6) AS last_purchase_value
FROM events e ASOF LEFT JOIN (SELECT * FROM p WHERE rn = 1) p
  ON e.user_id = p.user_id AND e.ts >= p.ts"""

    sqls["rollup_agg"] = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       count(*)::BIGINT AS n,
       grouping_id(l_returnflag, l_linestatus)::BIGINT AS lvl
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""

    sqls["doclen_percentiles"] = """
SELECT lang,
       round(quantile_cont(n_chars, 0.25), 6) AS p25,
       round(quantile_cont(n_chars, 0.50), 6) AS p50,
       round(quantile_cont(n_chars, 0.75), 6) AS p75,
       round(quantile_cont(n_chars, 0.99), 6) AS p99,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY lang"""

    sqls["window_rank"] = """
WITH r AS (
  SELECT lang, doc_id AS docid,
         row_number() OVER (PARTITION BY lang ORDER BY length(text) DESC, doc_id) AS rn
  FROM documents
)
SELECT lang, docid, rn::BIGINT AS rn FROM r WHERE rn <= 3"""

    sqls["relational_agg"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
       count(*)::BIGINT AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus"""

    return sqls
