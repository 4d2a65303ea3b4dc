"""Two-parallelism scaling evidence for the r5 pipeline operators
(north-rule style): lm_perplexity (bigram-LM quality scoring) and the
composed curation pipeline over the SAME generated corpus at N and 4N
cores; throughput at both + efficiency.

Usage: python tools/pipeline_scaling.py [n_docs] [n_lo] [rounds] [ops] [gen]
       (defaults 1_000_000 docs, 2→8 cores, 2 interleaved rounds,
       ops = comma list from {lm,curate,incr,nb,ann,mh} (default lm,curate),
       gen = fast | zipf corpus generator)

Generator choice matters for CURATE's invariant: the uniform `fast`
generator's word index collapses mod the ~4.3k vocabulary, so ~n/V docs
per residue class share IDENTICAL token streams — every train doc then
shares an 8-window with some eval doc and decontamination (correctly)
drops the whole corpus (survivors=0: honest work, degenerate funnel).
The `zipf` twin draws ranks from a 62-bit hash with no such collapse, so
the funnel stays populated end-to-end.

Protocol per BENCH/BASELINE.md: fresh taskset-pinned JVM per
measurement, levels interleaved, min-of-rounds, one FULL untimed warm
run per op (codegen/JIT), corpus read from storage (parquet decode is
CPU work that scales — an in-memory cache turns the job memory-bus-
bound; see percolate_scaling.py).

Config notes:
* lm_perplexity runs with broadcast_model=False + min_count=5 — at this
  vocabulary (~4.3k terms) the bigram table is millions of rows, which
  is the SHUFFLE-join regime a 100 TB corpus would be in; broadcasting
  it would measure the wrong design (and OOM the driver at scale).
* curate runs the full funnel config: source gate (repo axis), exact
  dedup, min_doc_tokens=45 (doc lengths are 30..90 — splits the corpus),
  decontamination vs the docid%101==0 slice, 90% hash sample. The
  survivor count is the cross-level invariant.
* nb times the self-train nb_classify job (train = one groupBy(label,
  token) + pivot, score = one broadcast model join + one groupBy(docid));
  min_count=5 bounds the model the way a hashed-vocab deployment would.
  Invariant: (docs scored, correct predictions).
* ann times the IVFADC ENCODE job — the nightly build step of a
  billion-scale ANN index: one Arrow pass doing coarse assignment +
  residual PQ codes over dim-64 vectors (seeded quantizers, 64 lists,
  m=8 codebooks), nothing shuffles. Vectors are generated ONCE by the
  parent (hash-derived from vec_id, Catalyst-native) so every level
  encodes identical input. Invariant: (n, Σ ivf_list, Σ codes[0]).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.path.join(tempfile.gettempdir(), "pipeline_scaling_corpus")
STORE = os.path.join(tempfile.gettempdir(), "pipeline_scaling_store")
VECS = os.path.join(tempfile.gettempdir(), "pipeline_scaling_vecs")


def child(cpus: int, ops: str = "lm,curate") -> None:
    import time

    from pyspark.sql import functions as F

    from mini_search_engine_spark.corpus import load_corpus
    from mini_search_engine_spark.ops import (
        curate,
        incremental_minhash_flags,
        lm_perplexity,
        read_minhash_store,
    )
    from mini_search_engine_spark.session import get_spark

    spark = get_spark(
        app_name=f"pipe-scale-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=32,  # FIXED across core counts (see percolate_scaling)
    )
    spark.sparkContext.setLogLevel("ERROR")
    raw = spark.read.parquet(CORPUS)
    # docid must be PARALLELISM-INDEPENDENT for the cross-level invariants
    # (assign_docids stamps partition offsets, and scan splits vary with
    # core count) — the generator encodes the original id in the path.
    docs = (
        load_corpus(raw)
        .withColumn("source", F.col("repo"))
        .withColumn("docid", F.regexp_extract("path", r"f(\d+)\.java", 1).cast("long"))
    )

    def run_lm():
        out = lm_perplexity(docs, min_count=5, broadcast_model=False)
        row = out.agg(
            F.count("*").alias("n"), F.sum("n_bigrams").alias("bg")
        ).collect()[0]
        return int(row["n"]), int(row["bg"])

    def run_curate():
        ev = docs.filter(F.col("docid") % 101 == 0)
        tr = docs.filter(F.col("docid") % 101 != 0)
        return curate(
            tr,
            eval_docs=ev,
            min_avg_tokens=1.0,
            min_doc_tokens=45,
            window=8,
            sample_rate=0.9,
            salt="soak-v1",
        ).count()

    wanted = set(ops.split(","))

    # incr: nightly incremental dedup — the 75% docid%4!=0 slice plays the
    # persisted corpus (store BUILD is one-time setup, untimed, done ONCE
    # by the parent at full parallelism so every level reads the identical
    # store files), the 25% batch is the timed nightly job: batch-vs-store
    # + within-batch flags. Timed work = batch signatures + one streamed
    # store pass under broadcast probes (the design claim this measures).
    store_path = STORE

    def run_incr():
        out = incremental_minhash_flags(
            docs.filter(F.col("docid") % 4 == 0),
            read_minhash_store(spark, store_path),
        )
        row = out.agg(
            F.count("*").alias("n"), F.sum("is_dup").alias("d")
        ).collect()[0]
        return int(row["n"]), int(row["d"])

    def run_nb():
        from mini_search_engine_spark.ops import nb_classify

        out = nb_classify(docs, label_col="lang", min_count=5)
        row = out.agg(
            F.count("*").alias("n"), F.sum(F.col("correct").cast("long")).alias("c")
        ).collect()[0]
        return int(row["n"]), int(row["c"])

    def run_mh():
        # the headline-suite dedup op: MinHash signatures -> banded LSH ->
        # intra-bucket pair enumeration (one groupBy downstream of the
        # signatures, max_bucket guard on degenerate buckets)
        from mini_search_engine_spark.ops import minhash_candidate_pairs

        out = minhash_candidate_pairs(docs, max_bucket=256)
        row = out.agg(
            F.count("*").alias("n"),
            F.sum(F.col("docid_a") + F.col("docid_b")).alias("s"),
        ).collect()[0]
        return int(row["n"]), int(row["s"])

    def run_ann():
        from mini_search_engine_spark.ops import ivfadc_encode
        from mini_search_engine_spark.ops.ivfadc import seeded_centroids
        from mini_search_engine_spark.ops.pq import seeded_codebooks

        enc = ivfadc_encode(
            spark.read.parquet(VECS),
            seeded_centroids(n_lists=64, dim=64),
            seeded_codebooks(m=8, k=16, sub=8),
        )
        row = enc.agg(
            F.count("*").alias("n"),
            F.sum("ivf_list").alias("l"),
            F.sum(F.element_at("codes", 1)).alias("c0"),
        ).collect()[0]
        return int(row["n"]), int(row["l"]), int(row["c0"])

    results = {}
    for name, fn in (
        ("lm", run_lm),
        ("curate", run_curate),
        ("incr", run_incr),
        ("nb", run_nb),
        ("ann", run_ann),
        ("mh", run_mh),
    ):
        if name not in wanted:
            continue
        fn()  # full untimed warm run (JIT + codegen + footer reads)
        t0 = time.time()
        results[f"{name}_inv"] = fn()
        results[f"{name}_sec"] = round(time.time() - t0, 2)
    print(json.dumps(results))
    spark.stop()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_hi = 4 * n_lo
    ops_arg = sys.argv[4] if len(sys.argv) > 4 else "lm,curate"
    gen_name = sys.argv[5] if len(sys.argv) > 5 else "fast"

    from mini_search_engine_spark.session import get_spark
    from tools.soak_bench import fast_synthetic_corpus, zipf_synthetic_corpus

    gen = fast_synthetic_corpus if gen_name == "fast" else zipf_synthetic_corpus
    spark = get_spark(app_name="pipe-scale-gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(CORPUS, ignore_errors=True)
    gen(spark, n_docs, 128).write.mode("overwrite").parquet(CORPUS)
    if "incr" in ops_arg.split(","):
        # one-time untimed setup at full parallelism; children only read it
        from pyspark.sql import functions as F

        from mini_search_engine_spark.corpus import load_corpus
        from mini_search_engine_spark.ops import write_minhash_store

        docs = load_corpus(spark.read.parquet(CORPUS)).withColumn(
            "docid", F.regexp_extract("path", r"f(\d+)\.java", 1).cast("long")
        )
        shutil.rmtree(STORE, ignore_errors=True)
        write_minhash_store(docs.filter(F.col("docid") % 4 != 0), STORE)
    if "ann" in ops_arg.split(","):
        # hash-derived dim-64 unit-scale vectors, Catalyst-native, written
        # once so both levels encode byte-identical input
        from pyspark.sql import functions as F

        shutil.rmtree(VECS, ignore_errors=True)
        (
            spark.range(n_docs, numPartitions=128)
            .select(
                F.col("id").alias("vec_id"),
                F.expr(
                    "transform(sequence(0, 63), j ->"
                    " (pmod(hash(id * 64 + j), 2001) - 1000) / 1000.0)"
                ).alias("embedding"),
            )
            .write.mode("overwrite")
            .parquet(VECS)
        )
    spark.stop()

    def run(cpus: int) -> dict:
        cmd = [
            "taskset", "-c", f"0-{cpus - 1}", sys.executable,
            os.path.abspath(__file__), "child", str(cpus), ops_arg,
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    # try/finally: a failed child (subprocess.run(check=True) raises) must
    # not strand the multi-GB CORPUS/STORE/VECS temp dirs across runs
    try:
        ops = tuple(ops_arg.split(","))
        samples: dict[str, dict[int, list[float]]] = {
            o: {n_lo: [], n_hi: []} for o in ops
        }
        inv: dict[str, object] = {}
        for _ in range(rounds):
            for cpus in (n_lo, n_hi):
                r = run(cpus)
                for o in ops:
                    samples[o][cpus].append(r[f"{o}_sec"])
                    key = f"{o}_inv"
                    assert inv.get(key) in (None, r[key]), f"{key} must be invariant"
                    inv[key] = r[key]
        out = {
            "n_docs": n_docs,
            "pair": f"{n_lo}->{n_hi}",
            "gen": gen_name,
            "invariants": inv,
        }
        for o in ops:
            t_lo, t_hi = min(samples[o][n_lo]), min(samples[o][n_hi])
            out[o] = {
                "sec_lo": t_lo,
                "sec_hi": t_hi,
                "docs_per_sec_hi": round(n_docs / t_hi, 1),
                "speedup": round(t_lo / t_hi, 3),
                "efficiency": round((t_lo / t_hi) / (n_hi / n_lo), 3),
                "samples": samples[o],
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(CORPUS, ignore_errors=True)
        shutil.rmtree(STORE, ignore_errors=True)
        shutil.rmtree(VECS, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else "lm,curate")
    else:
        main()
