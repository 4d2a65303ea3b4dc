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

    # single small parquet file → 1 input split; spread it across cores once
    # (at real scale the input arrives already split)
    docs = load_documents(spark, sf_dir).repartition(cpus).cache()
    n_files = docs.count()

    # ---- index build (timed end-to-end incl. codec + write) ----
    # block_span auto-sizes to the corpus (index.build.auto_block_span).
    # Protocol matches tools/build_bench.py: one untimed warmup build spins
    # up the Python worker pool + JIT (cold first-build time reported in
    # extra), then the steady-state build is timed.
    t0 = time.time()
    warm = build_index(docs, analyzer="porter", positional=True, compress=True)
    write_index(warm, idx_path)
    cold_build_sec = time.time() - t0
    warm.unpersist()
    shutil.rmtree(idx_path, ignore_errors=True)
    build_sec = float("inf")
    for _ in range(2):
        shutil.rmtree(idx_path, ignore_errors=True)
        t0 = time.time()
        idx = build_index(docs, analyzer="porter", positional=True, compress=True)
        write_index(idx, idx_path)
        build_sec = min(build_sec, time.time() - t0)
        # release EVERY iteration's caches — the serving measurements below
        # re-read the index from disk, and a leaked full index cache would
        # compete with them for executor memory
        idx.unpersist()
    timings["index_build"] = build_sec

    # flagship scale path: the SAME positional+compressed index via the
    # fused shuffle-free build over docid-range partitions (see
    # index.build._fused_blocked_postings)
    ranged = docs.repartitionByRange(cpus, "docid").cache()
    ranged.count()
    fpath = idx_path + "_fused"
    fwarm = build_index(
        ranged, analyzer="porter", positional=True, compress=True, local_blocks=True
    )
    write_index(fwarm, fpath)
    fwarm.unpersist()
    shutil.rmtree(fpath, ignore_errors=True)
    fsec = float("inf")
    for _ in range(2):
        shutil.rmtree(fpath, ignore_errors=True)
        t0 = time.time()
        fidx = build_index(
            ranged, analyzer="porter", positional=True, compress=True, local_blocks=True
        )
        write_index(fidx, fpath)
        fsec = min(fsec, time.time() - t0)
        fidx.unpersist()
    timings["index_build_fused"] = fsec
    ranged.unpersist()
    shutil.rmtree(fpath, ignore_errors=True)

    # serving mode: decode once, pin decoded postings + stats (see
    # InvertedIndex.warm) — queries run pure JVM with no codec round trip
    idx = read_index(spark, idx_path).warm()

    def timed(name, fn):
        # min-of-2: this box's wall times jitter up to 2x in noise windows;
        # a single sample regularly misattributes that noise to the query
        best = float("inf")
        for _ in range(2):
            t = time.time()
            fn()
            best = min(best, time.time() - t)
        timings[name] = best

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
            "build_files_per_sec": round(n_files / build_sec, 1),
            "fused_build_files_per_sec": round(
                n_files / timings["index_build_fused"], 1
            ),
            "cold_first_build_sec": round(cold_build_sec, 3),
        },
    }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(idx_path, ignore_errors=True)


if __name__ == "__main__":
    main()
