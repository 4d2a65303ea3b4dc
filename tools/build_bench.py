"""Index-build throughput probe: time build_index+write over a corpus
parquet at local[$SPARK_GRAFT_CPUS]. Prints one JSON line.

Used by tools/scaling_bench.py at N and 4N cores for the north_rule's
two-cluster-size scaling evidence.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mini_search_engine_spark.corpus import load_corpus  # noqa: E402
from mini_search_engine_spark.index.build import build_index, write_index  # noqa: E402
from mini_search_engine_spark.search import bm25_topk  # noqa: E402
from mini_search_engine_spark.session import get_spark  # noqa: E402


def main():
    corpus_path = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    positional = os.environ.get("SPARK_GRAFT_POSITIONAL", "0") == "1"
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(
        app_name=f"mse-build-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        # tmpfs shuffle dirs: a real cluster has per-node shuffle disks; on
        # this single sandbox box the one shared disk would otherwise be
        # the scaling ceiling rather than the engine.
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Spread the corpus across 2×cores before caching: a few hundred MB of
    # parquet coalesces to ~3 input splits at the default 128MB
    # maxPartitionBytes, which would serialize the analyzer UDF regardless
    # of core count. (On a real cluster the input arrives pre-split.)
    docs = load_corpus(spark.read.parquet(corpus_path)).repartition(cpus * 2).cache()
    n_files = docs.count()
    idx_path = os.path.join(tempfile.gettempdir(), f"mse_scale_idx_{cpus}")
    shutil.rmtree(idx_path, ignore_errors=True)

    # steady-state: spawn the Python UDF worker pool before the timed window
    from mini_search_engine_spark.index.build import tokenize_docs

    tokenize_docs(docs.limit(256), analyzer="porter").count()

    t0 = time.time()
    idx = build_index(docs, analyzer="porter", positional=positional, compress=True)
    write_index(idx, idx_path)
    build_sec = time.time() - t0

    # warm query latency on the built index
    t1 = time.time()
    bm25_topk(idx, ["import", "merge"], 10).collect()
    q_sec = time.time() - t1

    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_files": n_files,
                "build_sec": round(build_sec, 3),
                "files_per_sec": round(n_files / build_sec, 2),
                "bm25_top10_sec": round(q_sec, 3),
            }
        )
    )
    spark.stop()
    shutil.rmtree(idx_path, ignore_errors=True)


if __name__ == "__main__":
    main()
