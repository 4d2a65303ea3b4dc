"""Interleaved A/B for the r6 first-band minhash pair emission (guide §1).

Old: bucket_pairs(bands) + trailing .distinct() over the pair multiset.
New: first-colliding-band emission (exact path of minhash_candidate_pairs)
     — no distinct, count() shuffles zero pairs.

Also verifies SET equality (exceptAll both ways) between the two
formulations at the measurement scale before timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mini_search_engine_spark.corpus import load_documents
from mini_search_engine_spark.ops.dedup import (
    bucket_pairs,
    minhash_bands,
    minhash_candidate_pairs,
)
from mini_search_engine_spark.session import get_spark


def old_pairs(docs):
    bands = minhash_bands(docs)
    return bucket_pairs(bands, ["band", "band_key"], "docid", "docid_a", "docid_b")


def timed(name, fn, reps=3):
    spark.sparkContext.setJobDescription(name)
    best = None
    for _ in range(reps):
        t = time.time()
        fn()
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
    print(f"{name:34s} {best:7.3f}s")
    spark.sparkContext.setJobDescription(None)
    return best


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark(
        app_name="pairs-ab", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_documents(spark, sf_dir).repartition(cpus).cache()
    print("docs:", docs.count())

    o = old_pairs(docs)
    n = minhash_candidate_pairs(docs)
    extra_new = n.exceptAll(o.distinct()).count()
    # old is already distinct; new must emit each pair exactly once
    extra_old = o.exceptAll(n).count()
    print(f"set check: new-minus-old={extra_new} old-minus-new={extra_old}")
    assert extra_new == 0 and extra_old == 0, "PAIR SETS DIFFER"

    # interleaved rounds, min-of-N per side
    for r in range(rounds):
        timed(f"old_pairs_count_r{r}", lambda: old_pairs(docs).count(), reps=1)
        timed(
            f"new_pairs_count_r{r}",
            lambda: minhash_candidate_pairs(docs).count(),
            reps=1,
        )
    print("-- min-of-3 each, interleaved --")
    a = timed("old_pairs_count", lambda: old_pairs(docs).count())
    b = timed("new_pairs_count", lambda: minhash_candidate_pairs(docs).count())
    print(f"speedup: {a / b:.3f}x")
