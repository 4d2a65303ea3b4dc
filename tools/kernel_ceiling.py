"""Standalone-kernel scaling ceilings for THIS BOX (no Spark involved).

The two-parallelism scaling evidence (tools/scaling_bench.py) divides out
against a hardware ceiling: all local[N] levels share ONE memory bus, so
even embarrassingly parallel work stops scaling once the bus saturates.
This tool measures that ceiling directly: K OS processes, each pinned to
its own core, each running a fixed amount of kernel work with ZERO
coordination — any efficiency loss N→4N is the box, not the engine.

Kernels:
* ``arith``    — pure-python integer arithmetic loop (cache-resident; the
                 most scalable thing CPython can do).
* ``tokstem``  — the engine's actual per-doc hot loop: punctuation
                 tokenize + stopword filter + Porter stem over synthetic
                 source-code content (string-heavy → memory-bus-bound).

Usage: python tools/kernel_ceiling.py [procs_csv]   (default "2,8,16,32")
Prints one JSON line; the table goes into BENCH/BASELINE.md next to the
measured build ratios.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARITH_ITERS = 12_000_000
TOKSTEM_DOCS = 3_000


def _content(i: int) -> str:
    # deterministic synthetic source-ish content, ~400 chars
    words = (
        "import spark merge tokenizer index public static void return "
        "class segment compress varint posting block stream batch "
    ).split()
    return " ".join(words[(i + j) % len(words)] for j in range(60))


def _worker(kernel: str, core: int, out_q) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    if kernel == "arith":
        t0 = time.time()
        acc = 0
        for i in range(ARITH_ITERS):
            acc = (acc + i * 7) & 0xFFFFFFFF
        out_q.put(time.time() - t0)
    else:
        from mini_search_engine_spark.analysis.udfs import analyze_query

        docs = [_content(i) for i in range(TOKSTEM_DOCS)]
        t0 = time.time()
        n = 0
        for d in docs:
            n += len(analyze_query(d, "porter"))
        out_q.put(time.time() - t0)


def run_level(kernel: str, procs: int) -> float:
    """→ aggregate work-units/sec with `procs` pinned processes.

    Throughput uses the SLOWEST worker's self-reported kernel time — not
    the parent's wall — so process fork and the pyspark import tax are
    excluded (they would otherwise dominate at small work sizes and make
    low-proc levels look slower than they are)."""
    q = mp.Queue()
    ps = [
        mp.Process(target=_worker, args=(kernel, c, q)) for c in range(procs)
    ]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    kernel_secs = [q.get() for _ in ps]
    work = ARITH_ITERS if kernel == "arith" else TOKSTEM_DOCS
    return procs * work / max(kernel_secs)


def main():
    levels = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "2,8,16,32").split(",")]
    out: dict = {"levels": levels, "kernels": {}}
    for kernel in ("arith", "tokstem"):
        # warmup (JIT the imports / page in the dictionaries)
        run_level(kernel, 2)
        tp = {n: max(run_level(kernel, n) for _ in range(2)) for n in levels}
        effs = {}
        for n in levels:
            if 4 * n in tp:
                effs[f"{n}to{4*n}"] = round(tp[4 * n] / (4 * tp[n]), 3)
        out["kernels"][kernel] = {
            "throughput": {str(n): round(v, 1) for n, v in tp.items()},
            "efficiency": effs,
        }
    print(json.dumps(out))
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/kernel_ceiling.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
