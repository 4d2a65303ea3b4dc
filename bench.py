"""Benchmark harness: index-build throughput + query latencies.

Runs the headline pipeline at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline flow mirrors the north_star: build the full positional Porter
index (analyze → blocked postings → compress → write parquet), then run
the reference query set shapes (keyword/and/or/phrase/tfidf) plus BM25
top-10 exact and block-max-pruned, PageRank, MinHash-LSH dedup and ANN.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mini_search_engine_spark.corpus import load_documents  # noqa: E402
from mini_search_engine_spark.index.build import build_index, read_index, write_index  # noqa: E402
from mini_search_engine_spark.ops import minhash_candidate_pairs, cosine_topk  # noqa: E402
from mini_search_engine_spark.search import (  # noqa: E402
    bm25_topk,
    search_and,
    search_keyword,
    search_or,
    search_phrase,
    search_tfidf,
)
from mini_search_engine_spark.search.pagerank import pagerank  # noqa: E402
from mini_search_engine_spark.session import get_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

QUERY_TERMS = ["spark", "merge"]
QUERY_TERMS2 = ["filter", "join", "scan"]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(
        app_name="mse-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    idx_path = os.path.join(tempfile.gettempdir(), f"mse_bench_idx_{cpus}")
    shutil.rmtree(idx_path, ignore_errors=True)

    timings: dict[str, float] = {}
    reps: dict[str, list[float]] = {}  # per-rep wall times → extra (jitter evidence)
    REPS = 3

    def record(name, sec):
        reps.setdefault(name, []).append(sec)
        timings[name] = min(reps[name])

    # single small parquet file → 1 input split; spread it across cores once
    # (at real scale the input arrives already split)
    docs = load_documents(spark, sf_dir).repartition(cpus).cache()
    n_files = docs.count()

    # ---- index build (timed end-to-end incl. codec + write) ----
    # block_span auto-sizes to the corpus (index.build.auto_block_span).
    # Protocol (VERDICT r3 item 4 — the repo's interleaved protocol, now
    # driver-facing): one untimed warmup build per variant spins up the
    # Python worker pool + JIT (cold first-build time reported in extra),
    # then the exchange and fused variants' repetitions INTERLEAVE
    # (e f e f e f) so a box-noise window hits both variants alike instead
    # of being misread as a code regression in whichever ran inside it;
    # min-of-3 per variant, all reps exported.
    ranged = docs.repartitionByRange(cpus, "docid").cache()
    ranged.count()
    fpath = idx_path + "_fused"

    # check_tid_collisions=False on the timed path: the detector is one
    # fixed vocab-agg job (A/B at sf0.01: 2.48 s vs 2.26 s steady-state,
    # ~+0.2 s) that production runs amortize over the whole build but a
    # throughput microbenchmark pays per rep (VERDICT r3 item 5 sanctions
    # gating exactly here; the default everywhere else is ON)
    def exchange_build():
        idx = build_index(
            docs, analyzer="porter", positional=True, compress=True,
            check_tid_collisions=False,
        )
        write_index(idx, idx_path)
        return idx

    def fused_build():
        idx = build_index(
            ranged, analyzer="porter", positional=True, compress=True,
            local_blocks=True, check_tid_collisions=False,
        )
        write_index(idx, fpath)
        return idx

    t0 = time.time()
    exchange_build().unpersist()
    cold_build_sec = time.time() - t0
    fused_build().unpersist()
    for _ in range(REPS):
        for name, path, fn in (
            ("index_build", idx_path, exchange_build),
            ("index_build_fused", fpath, fused_build),
        ):
            shutil.rmtree(path, ignore_errors=True)
            t0 = time.time()
            idx = fn()
            record(name, time.time() - t0)
            # release EVERY iteration's caches — the serving measurements
            # below re-read the index from disk, and a leaked index cache
            # would compete with them for executor memory
            idx.unpersist()
    ranged.unpersist()
    shutil.rmtree(fpath, ignore_errors=True)

    # serving mode: decode once, pin decoded postings + stats (see
    # InvertedIndex.warm) — queries run pure JVM with no codec round trip
    idx = read_index(spark, idx_path).warm()

    def timed(name, fn):
        # min-of-3: this box's wall times jitter up to ~2.8x in noise
        # windows (BENCH/BASELINE.md); a single sample regularly
        # misattributes that noise to the query. All reps are exported in
        # extra.reps so the JSON carries its own jitter evidence.
        for _ in range(REPS):
            t = time.time()
            fn()
            record(name, time.time() - t)

    # warmup: spin up the Python UDF worker pool once (untimed) so the
    # reported latencies are steady-state serving numbers
    bm25_topk(idx, ["warmup"], 1).collect()
    bm25_topk(idx, QUERY_TERMS, 10).collect()

    timed("bm25_top10", lambda: bm25_topk(idx, QUERY_TERMS, 10).collect())
    timed("bm25_top10_pruned", lambda: bm25_topk(idx, QUERY_TERMS2, 10, prune=True).collect())
    timed("keyword", lambda: search_keyword(idx, "spark").count())
    timed("and_query", lambda: search_and(idx, QUERY_TERMS).count())
    timed("or_query", lambda: search_or(idx, QUERY_TERMS).count())
    timed("phrase", lambda: search_phrase(idx, "batch batch").count())
    timed("tfidf_top10", lambda: search_tfidf(idx, QUERY_TERMS, 10).collect())

    # ---- training-data ops ----
    timed("minhash_pairs", lambda: minhash_candidate_pairs(docs).count())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.limit(1).collect()[0]["embedding"]
    timed("ann_cosine_top10", lambda: cosine_topk(emb, list(qv), 10).collect())

    edges = docs.select(
        F.col("docid").alias("src"), ((F.col("docid") * 7 + 3) % n_files).alias("dst")
    )
    timed("pagerank_10it", lambda: pagerank(edges, num_iter=10).count())

    # ---- round-4 operators: timed the same way but reported under
    # extra.extended and NOT summed into the headline value, so the suite
    # total stays comparable across rounds ----
    ext: dict[str, list[float]] = {}

    def timed_ext(name, fn):
        for _ in range(REPS):
            t = time.time()
            fn()
            ext.setdefault(name, []).append(round(time.time() - t, 3))

    from mini_search_engine_spark.index.trigram import (
        build_trigram_index,
        regex_search,
        substring_search,
    )
    from mini_search_engine_spark.ops import duplicate_spans
    from mini_search_engine_spark.search import suggest

    t0 = time.time()
    tri = build_trigram_index(docs)
    tri.postings.count()
    ext["trigram_build"] = [round(time.time() - t0, 3)]
    timed_ext("substring_search", lambda: substring_search(tri, docs, "fast key order").count())
    timed_ext("regex_search", lambda: regex_search(tri, docs, r"(fast|slow) key order\w*").count())
    tri.unpersist()
    timed_ext("duplicate_spans", lambda: duplicate_spans(docs, window=8).count())
    timed_ext("suggest", lambda: suggest(idx, "s", 10).collect())

    from mini_search_engine_spark.ops import asof_join, epoch_mix, session_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").cache()
    ev.count()
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("p_id"), F.col("value").alias("p_value"),
    )
    timed_ext("session_stats", lambda: session_stats(ev).count())
    timed_ext(
        "asof_join",
        lambda: asof_join(
            ev.select("event_id", "user_id", "ts"), purch,
            on="user_id", left_ts="ts", right_ts="ts",
            payload=["p_id", "p_value"], tie_break="p_id",
        ).count(),
    )
    ev.unpersist()
    timed_ext(
        "epoch_mix",
        lambda: epoch_mix(docs, {"en": 2.5, "de": 1.25, "fr": 0.5}).count(),
    )

    # batched multi-query BM25: 16 queries in one job vs 16 waves —
    # report the batch wall AND the per-query sequential wall for the
    # same query set so the JSON carries the amortization evidence
    from mini_search_engine_spark.search import bm25_topk_batch

    _batch_terms = [
        ["spark", "merge"], ["filter", "join"], ["scan", "index"],
        ["fast", "key"], ["order", "by"], ["group", "agg"],
        ["read", "write"], ["cache", "memory"], ["disk", "spill"],
        ["hash", "sort"], ["code", "gen"], ["plan", "cost"],
        ["row", "column"], ["batch", "stream"], ["table", "view"],
        ["query", "result"],
    ]
    batch_q = {f"q{i}": t for i, t in enumerate(_batch_terms)}
    timed_ext("bm25_batch16", lambda: bm25_topk_batch(idx, batch_q, 10).collect())

    def _seq16():
        for t in _batch_terms:
            bm25_topk(idx, t, 10).collect()

    timed_ext("bm25_seq16", _seq16)

    # 16 CONCURRENT callers through the micro-batching facade — the
    # serving-tier deployment shape (coalesces to ~1-2 jobs per window)
    def _micro16():
        from concurrent.futures import ThreadPoolExecutor

        from mini_search_engine_spark.search import Bm25MicroBatcher

        mb = Bm25MicroBatcher(idx, topk=10, window_ms=15)
        with ThreadPoolExecutor(16) as pool:
            list(pool.map(mb.bm25_topk, _batch_terms))

    timed_ext("bm25_micro16", _micro16)

    # boolean query language, collocations, structured serving
    from mini_search_engine_spark.ops import collocations
    from mini_search_engine_spark.search import (
        bm25_page,
        bm25_topk_filtered,
        collapse_results,
        search_query,
    )
    from mini_search_engine_spark.search.ranking import bm25_scores

    timed_ext(
        "boolean_query",
        lambda: search_query(
            idx, "(spark OR merge) AND filter AND NOT unheard"
        ).count(),
    )
    timed_ext("collocations", lambda: collocations(docs, min_count=5, topk=50).collect())
    timed_ext(
        "bm25_filtered",
        lambda: bm25_topk_filtered(
            idx, docs, ["spark", "merge"], "n_chars >= 300"
        ).collect(),
    )
    timed_ext(
        "collapse_by_source",
        lambda: collapse_results(
            bm25_scores(idx, ["spark", "merge"]), docs, "source"
        ).collect(),
    )
    timed_ext(
        "bm25_page_deep",
        lambda: bm25_page(
            idx, ["spark", "merge"], 10, after=(0.05, 1 << 40)
        ).collect(),
    )

    # round-4 second wave: graph ranking, reverse search, champion tier
    from mini_search_engine_spark.index.prune import champion_index
    from mini_search_engine_spark.search import hits, link_distance, percolate

    timed_ext("hits_3it", lambda: hits(edges, num_iter=3).count())
    timed_ext(
        "link_distance_4hop",
        lambda: link_distance(edges, seeds=[0, 1], max_hops=4).count(),
    )
    perc_q = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(_batch_terms[:8])],
        "qid long, query string",
    )
    timed_ext(
        "percolate_8q",
        lambda: percolate(docs, perc_q, analyzer="porter").count(),
    )
    # the streaming shape: queries compiled ONCE, per-batch cost = the
    # kernel pass only (percolate_8q above re-compiles per call — the
    # one-shot convenience path)
    from mini_search_engine_spark.search import Percolator

    _perc = Percolator(perc_q, analyzer="porter")
    _perc.match(docs.limit(64)).count()  # build the routing index untimed
    timed_ext("percolate_8q_compiled", lambda: _perc.match(docs).count())
    t0 = time.time()
    champ = champion_index(idx, n_per_term=128)
    champ.postings.persist().count()
    ext["champion_build"] = [round(time.time() - t0, 3)]
    timed_ext("champion_bm25_top10", lambda: bm25_topk(champ, QUERY_TERMS, 10).collect())
    # two-phase serving: champion candidates -> exact rescore on the full
    # index (fetch_k=100 nominations, exact top-10 back)
    from mini_search_engine_spark.search import rescore_topk

    timed_ext(
        "rescore_top10",
        lambda: rescore_topk(idx, champ, QUERY_TERMS, fetch_k=100, topk=10).collect(),
    )
    champ.postings.unpersist()

    # round-5 operators: LM scoring, domain curation, end-to-end pipeline,
    # PQ. Actions are aggregates over computed columns (NOT bare count())
    # so Catalyst cannot prune the operator under test out of the plan.
    from mini_search_engine_spark.ops import (
        curate,
        lm_perplexity,
        nb_classify,
        pq_adc_topk,
        pq_encode,
        seeded_codebooks,
        source_stats,
    )

    timed_ext(
        "lm_perplexity",
        lambda: lm_perplexity(docs).agg(F.sum("n_bigrams")).collect(),
    )
    timed_ext(
        "nb_classify_lang",
        lambda: nb_classify(docs, content_col="content", label_col="lang")
        .agg(F.sum("score"))
        .collect(),
    )
    timed_ext("source_stats", lambda: source_stats(docs).collect())
    _ev5 = docs.filter(F.col("docid") % 10 == 0)
    _tr5 = docs.filter(F.col("docid") % 10 != 0)
    timed_ext(
        "curate_pipeline",
        lambda: curate(
            _tr5, eval_docs=_ev5, min_avg_tokens=55.0, min_doc_tokens=55,
            sample_rate=0.9,
        ).count(),
    )
    _cb5 = seeded_codebooks()
    timed_ext(
        "pq_encode",
        lambda: pq_encode(emb, _cb5)
        .agg(F.sum(F.element_at("codes", 1)))
        .collect(),
    )
    timed_ext(
        "pq_adc_top10",
        lambda: pq_adc_topk(pq_encode(emb, _cb5), list(qv), _cb5, 10).collect(),
    )
    from mini_search_engine_spark.ops import ivfadc_encode, ivfadc_topk, seeded_centroids

    _cent5 = seeded_centroids()
    timed_ext(
        "ivfadc_top10",
        lambda: ivfadc_topk(
            ivfadc_encode(emb, _cent5, _cb5), _cent5, _cb5, list(qv), 10, nprobe=4
        ).collect(),
    )

    # DSIR importance weights over the %7 target/raw split (agg over the
    # computed columns so the weight pipeline cannot be pruned)
    from mini_search_engine_spark.ops import dsir_log_weights

    timed_ext(
        "dsir_weights",
        lambda: dsir_log_weights(
            docs.filter(F.col("docid") % 7 != 0),
            docs.filter(F.col("docid") % 7 == 0),
            buckets=2048,
        )
        .agg(F.sum("n_features"), F.sum("log_weight"))
        .collect(),
    )

    # LTR feature export: 3 queries' features in one scan (agg over a
    # computed column so the feature pipeline cannot be pruned)
    from mini_search_engine_spark.search import ltr_features

    timed_ext(
        "ltr_features_3q",
        lambda: ltr_features(
            idx,
            {"qa": ["spark", "merge"], "qb": ["filter", "join"], "qc": ["fast", "key"]},
            topk=100,
        )
        .agg(F.sum("bm25"), F.sum("tfidf_dot"))
        .collect(),
    )

    # incremental dedup: store BUILD is one-time setup (timed separately);
    # the nightly job is the batch-vs-store flags pass
    from mini_search_engine_spark.ops import (
        incremental_minhash_flags,
        read_minhash_store,
        write_minhash_store,
    )

    _store = os.path.join(tempfile.gettempdir(), f"bench_incr_store_{os.getpid()}")
    t0 = time.time()
    write_minhash_store(docs.filter(F.col("docid") % 4 != 0), _store)
    ext["incr_store_build"] = [round(time.time() - t0, 3)]
    timed_ext(
        "incremental_dedup",
        lambda: incremental_minhash_flags(
            docs.filter(F.col("docid") % 4 == 0), read_minhash_store(spark, _store)
        )
        .agg(F.sum("is_dup"))
        .collect(),
    )
    shutil.rmtree(_store, ignore_errors=True)

    total = sum(timings.values())
    out = {
        "metric": "headline_suite_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "extra": {
            "n_files": n_files,
            "cpus": cpus,
            "build_files_per_sec": round(n_files / timings["index_build"], 1),
            "fused_build_files_per_sec": round(
                n_files / timings["index_build_fused"], 1
            ),
            "cold_first_build_sec": round(cold_build_sec, 3),
            # per-rep wall times (same order as executed): the spread IS the
            # box-noise evidence — compare max/min per query before reading
            # any cross-round delta as a regression
            "reps": {k: [round(x, 3) for x in v] for k, v in reps.items()},
            # round-4 operators (min-of-reps would hide spread; raw reps):
            # timed identically but excluded from the headline total so
            # suite values stay comparable across rounds
            "extended": ext,
        },
    }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(idx_path, ignore_errors=True)


if __name__ == "__main__":
    main()
