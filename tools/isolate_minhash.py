"""Stage isolation for minhash_candidate_pairs (guide §1.4: noop sink).

Times each sub-stage of the minhash pipeline separately plus candidate
variants, so the optimization targets the measured hot stage, not a guess.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mini_search_engine_spark.corpus import load_documents
from mini_search_engine_spark.ops.dedup import (
    bucket_pairs,
    md5_long,
    minhash_bands,
    minhash_candidate_pairs,
    minhash_signatures,
    shingles,
)
from mini_search_engine_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn, reps=3):
    spark.sparkContext.setJobDescription(name)
    best = None
    for _ in range(reps):
        t = time.time()
        fn()
        dt = time.time() - t
        best = dt if best is None else min(best, dt)
    print(f"{name:40s} {best:7.3f}s")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="mh-isolate", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_documents(spark, sf_dir).repartition(cpus).cache()
    n = docs.count()
    print("docs:", n)

    sh = docs.select("docid", F.explode(shingles(F.col("content"), 3)).alias("sh"))
    print("shingle rows:", sh.count())
    timed("A_shingle_explode_noop", lambda: noop(sh))
    sh1 = sh.select("docid", md5_long(F.concat(F.lit("0|"), F.col("sh"))).alias("h0"))
    timed("B_explode_plus_1md5_noop", lambda: noop(sh1))
    sh16 = sh.select(
        "docid",
        *[
            md5_long(F.concat(F.lit(f"{j}|"), F.col("sh"))).alias(f"h{j}")
            for j in range(16)
        ],
    )
    timed("C_explode_plus_16md5_noop", lambda: noop(sh16))
    sigs = minhash_signatures(docs)
    timed("D_signatures_noop", lambda: noop(sigs))
    bands = minhash_bands(docs)
    timed("E_bands_noop", lambda: noop(bands))
    timed("F_pairs_count", lambda: minhash_candidate_pairs(docs).count())

    # variant: dedup shingles within doc before hashing (min-invariant)
    shd = docs.select(
        "docid", F.explode(F.array_distinct(shingles(F.col("content"), 3))).alias("sh")
    )
    print("distinct shingle rows:", shd.count())
    timed("G_distinct_explode_noop", lambda: noop(shd))
    aggs = [
        F.min(md5_long(F.concat(F.lit(f"{j}|"), F.col("sh")))).alias(f"h{j}")
        for j in range(16)
    ]
    sigs_d = shd.groupBy("docid").agg(*aggs)
    timed("H_signatures_distinct_noop", lambda: noop(sigs_d))
    spark.stop()
