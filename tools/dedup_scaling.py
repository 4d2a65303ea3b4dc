"""Two-parallelism scaling evidence for duplicate_spans (the dedup op a
100 TB training-data pipeline runs nightly): the SAME span-dedup job over
the SAME generated corpus at N and 4N cores, throughput at both +
efficiency — the percolate_scaling.py protocol (fresh taskset-pinned JVM
per measurement, interleaved levels, min-of-rounds, ONE FULL untimed
warm run per JVM so first-execution JIT stays out of the measurement).

Usage: python tools/dedup_scaling.py [n_docs] [n_lo] [rounds]
       (defaults 1_000_000 docs, 2→8 cores, 2 rounds)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = os.path.join(tempfile.gettempdir(), "dedup_scaling_corpus")
WINDOW = 16


def child(cpus: int) -> None:
    import time

    from mini_search_engine_spark.corpus import load_corpus
    from mini_search_engine_spark.ops.dedup import duplicate_spans
    from mini_search_engine_spark.session import get_spark

    # shuffle partitions fixed across levels (vary parallelism ONLY);
    # corpus read from storage, not cache (parquet decode scales with
    # cores; a deserialized cache is pure bus traffic) — both choices
    # per BENCH/PERCOLATE_SCALING.md's measured findings
    spark = get_spark(
        app_name=f"dedup-scale-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_corpus(spark.read.parquet(CORPUS))
    duplicate_spans(docs, window=WINDOW).count()  # full untimed warm run
    t0 = time.time()
    n = duplicate_spans(docs, window=WINDOW).count()
    print(json.dumps({"sec": round(time.time() - t0, 2), "flagged_docs": n}))
    spark.stop()


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_hi = 4 * n_lo

    from mini_search_engine_spark.session import get_spark
    from tools.soak_bench import fast_synthetic_corpus

    spark = get_spark(app_name="dedup-scale-gen", master="local[32]", shuffle_partitions=32)
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
    flagged = None
    for _ in range(rounds):
        for cpus in (n_lo, n_hi):
            r = run(cpus)
            samples[cpus].append(r["sec"])
            assert flagged in (None, r["flagged_docs"]), "result must be invariant"
            flagged = r["flagged_docs"]
    t_lo, t_hi = min(samples[n_lo]), min(samples[n_hi])
    print(
        json.dumps(
            {
                "op": f"duplicate_spans_w{WINDOW}",
                "n_docs": n_docs,
                "flagged_docs": flagged,
                "pair": f"{n_lo}->{n_hi}",
                "sec_lo": t_lo,
                "sec_hi": t_hi,
                "docs_per_sec_lo": round(n_docs / t_lo, 1),
                "docs_per_sec_hi": round(n_docs / t_hi, 1),
                "speedup": round(t_lo / t_hi, 3),
                "efficiency": round((t_lo / t_hi) / (n_hi / n_lo), 3),
                "samples": samples,
            }
        )
    )
    shutil.rmtree(CORPUS, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(int(sys.argv[2]))
    else:
        main()
