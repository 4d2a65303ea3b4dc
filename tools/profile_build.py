"""Phase-level timing of one index build+write: quantifies the fixed
(driver/scheduling/sequential) cost vs the core-scaling cost — the Amdahl
split that bounds measured N→4N efficiency.

Usage: SPARK_GRAFT_CPUS=N python tools/profile_build.py <corpus_parquet>
Prints one JSON line with per-phase seconds.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from mini_search_engine_spark.corpus import load_corpus  # noqa: E402
from mini_search_engine_spark.index.build import build_index, write_index  # noqa: E402
from mini_search_engine_spark.session import get_spark  # noqa: E402


def main():
    corpus_path = sys.argv[1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(
        app_name=f"mse-profile-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_corpus(spark.read.parquet(corpus_path), num_partitions=cpus * 2).cache()
    n = docs.count()
    idx_path = f"/dev/shm/mse_profile_idx_{cpus}"

    # untimed warmup build (worker pool + JIT + page faults)
    shutil.rmtree(idx_path, ignore_errors=True)
    idx = build_index(docs, analyzer="porter", compress=True)
    write_index(idx, idx_path)
    idx.unpersist()

    phases: dict[str, float] = {}

    def mark(name, t0):
        phases[name] = round(time.time() - t0, 3)
        return time.time()

    shutil.rmtree(idx_path, ignore_errors=True)
    t = t0 = time.time()
    n_docs = docs.count()
    t = mark("docs_count", t)
    idx = build_index(docs, analyzer="porter", compress=True)
    t = mark("build_index_eager_part", t)  # tf materialization + stats agg
    idx.postings.write.mode("overwrite").parquet(f"{idx_path}/postings")
    t = mark("postings_write", t)
    idx.doclens.sortWithinPartitions("docid").write.mode("overwrite").parquet(
        f"{idx_path}/doclens"
    )
    t = mark("doclens_write", t)
    idx.termstats.write.mode("overwrite").parquet(f"{idx_path}/termstats")
    t = mark("termstats_write", t)
    total = round(time.time() - t0, 3)
    idx.unpersist()

    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_docs": n_docs,
                "total_sec": total,
                "files_per_sec": round(n / total, 1),
                "phases": phases,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
