"""Two-parallelism scaling evidence for percolation (north-rule style):
run the SAME 1,024-stored-query percolate job over the SAME generated
corpus at N and 4N cores and report throughput at both + efficiency.

Usage: python tools/percolate_scaling.py [n_docs] [n_lo] [rounds]
       (defaults 250_000 docs, 2→8 cores, 2 interleaved rounds)

Protocol per BENCH/BASELINE.md: each measurement is a FRESH JVM
`taskset`-pinned to exactly its core budget, N and 4N runs interleaved
(lo hi lo hi …) so a box-noise window hits both alike, min-of-rounds per
level. 2→8 is the box's cluster-faithful pair (the single memory bus
saturates near 16 cores — see the kernel-ceiling calibration).

Run with mode=child (internal): one pinned measurement, prints seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.path.join(tempfile.gettempdir(), "percolate_scaling_corpus")


def child(cpus: int) -> None:
    import time

    from mini_search_engine_spark.corpus import _ENGLISH, _KEYWORDS, load_corpus
    from mini_search_engine_spark.search import percolate
    from mini_search_engine_spark.session import get_spark

    # shuffle_partitions FIXED across core counts (not = cpus): the
    # comparison must vary parallelism only — with partitions = cpus the
    # low-core run gets 4× LARGER shuffle partitions (more spill/GC per
    # task), which reads as false coordination loss in the efficiency
    spark = get_spark(
        app_name=f"perc-scale-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # deliberately NOT persisted: an alert job reads its batch from
    # storage, and parquet-decode is CPU work that scales with cores,
    # whereas a deserialized in-memory cache turns the read into pure
    # memory-bus traffic — measured 0.44 vs 0.61 efficiency on the 2→8
    # pair for the SAME job (r5). Cluster-faithful = read from storage.
    docs = load_corpus(spark.read.parquet(CORPUS))
    vocab = _KEYWORDS + _ENGLISH
    qrows = [
        (i, f"{vocab[(3 * i) % len(vocab)]} {vocab[(7 * i + 1) % len(vocab)]}")
        for i in range(1024)
    ]
    queries = spark.createDataFrame(qrows, "qid long, query string")
    # warm with ONE FULL untimed run: a limit()-warmup leaves the real
    # scan's codegen units cold, and at r5 job sizes (seconds, not
    # minutes) the ~2.5s of first-execution JIT would dominate the
    # measurement. Steady-state throughput is what an alert pipeline
    # (same job every micro-batch) actually runs at.
    percolate(docs, queries, analyzer="porter").count()
    t0 = time.time()
    n = percolate(docs, queries, analyzer="porter").count()
    one_shot = round(time.time() - t0, 2)
    # the compiled path (percolate_stream's shape): query analysis +
    # routing probe paid ONCE, per-batch cost = kernel pass only — this
    # isolates the part that must scale with the corpus
    from mini_search_engine_spark.search import Percolator

    perc = Percolator(queries, analyzer="porter")
    perc.match(docs).count()  # builds + warms the compiled index
    t0 = time.time()
    n2 = perc.match(docs).count()
    compiled = round(time.time() - t0, 2)
    assert n2 == n
    print(json.dumps({"sec": one_shot, "sec_compiled": compiled, "alerts": n}))
    spark.stop()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_hi = 4 * n_lo

    from mini_search_engine_spark.session import get_spark
    from tools.soak_bench import fast_synthetic_corpus

    spark = get_spark(app_name="perc-scale-gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(CORPUS, ignore_errors=True)
    fast_synthetic_corpus(spark, n_docs, 128).write.mode("overwrite").parquet(CORPUS)
    spark.stop()

    def run(cpus: int) -> dict:
        cmd = [
            "taskset", "-c", f"0-{cpus - 1}", sys.executable,
            os.path.abspath(__file__), "child", str(cpus),
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    samples: dict[int, list[float]] = {n_lo: [], n_hi: []}
    samples_c: dict[int, list[float]] = {n_lo: [], n_hi: []}
    alerts = None
    for _ in range(rounds):  # interleave lo/hi so noise windows hit both
        for cpus in (n_lo, n_hi):
            r = run(cpus)
            samples[cpus].append(r["sec"])
            samples_c[cpus].append(r["sec_compiled"])
            assert alerts in (None, r["alerts"]), "alert count must be invariant"
            alerts = r["alerts"]
    t_lo, t_hi = min(samples[n_lo]), min(samples[n_hi])
    c_lo, c_hi = min(samples_c[n_lo]), min(samples_c[n_hi])
    eff = (t_lo / t_hi) / (n_hi / n_lo)
    out = {
        "op": "percolate_1024q",
        "n_docs": n_docs,
        "alerts": alerts,
        "pair": f"{n_lo}->{n_hi}",
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "docs_per_sec_lo": round(n_docs / t_lo, 1),
        "docs_per_sec_hi": round(n_docs / t_hi, 1),
        "speedup": round(t_lo / t_hi, 3),
        "efficiency": round(eff, 3),
        "compiled_sec_lo": c_lo,
        "compiled_sec_hi": c_hi,
        "compiled_efficiency": round((c_lo / c_hi) / (n_hi / n_lo), 3),
        "samples": samples,
        "samples_compiled": samples_c,
    }
    print(json.dumps(out))
    shutil.rmtree(CORPUS, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(int(sys.argv[2]))
    else:
        main()
