"""Capture .explain('formatted') before/after plans for every query the
r6 optimization round touched → plans/r06/<name>_{before,after}.txt.

'before' pipelines are the r5 formulations reconstructed inline (the
code they came from is in git history); 'after' is the current library
code. Run from the repo root: python tools/capture_plans_r06.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mini_search_engine_spark.corpus import load_documents
from mini_search_engine_spark.session import get_spark

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
os.makedirs(OUT, exist_ok=True)


def dump(name, df):
    s = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    with open(os.path.join(OUT, name + ".txt"), "w") as f:
        f.write(s)
    print("wrote", name, len(s.splitlines()), "lines")


def main():
    spark = get_spark(app_name="plans-r06", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = load_documents(spark, sf_dir).repartition(8).cache()
    docs.count()

    # ---- minhash_pairs ----
    from mini_search_engine_spark.ops.dedup import (
        bucket_pairs,
        md5_long,
        minhash_candidate_pairs,
        shingles,
    )

    def old_minhash_bands(docs, num_hashes=16, band_size=2, shingle_k=3):
        sh = docs.select(
            "docid", F.explode(shingles(F.col("content"), shingle_k)).alias("sh")
        )
        aggs = [
            F.min(md5_long(F.concat(F.lit(f"{j}|"), F.col("sh")))).alias(f"h{j}")
            for j in range(num_hashes)
        ]
        sigs = sh.groupBy("docid").agg(*aggs).select(
            "docid",
            F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig"),
        )
        n_bands = num_hashes // band_size
        rows = []
        for b in range(n_bands):
            key = md5_long(
                F.concat_ws(
                    ",",
                    *[
                        F.col("sig")[b * band_size + i].cast("string")
                        for i in range(band_size)
                    ],
                )
            )
            rows.append(F.struct(F.lit(b).alias("band"), key.alias("band_key")))
        return sigs.select("docid", F.explode(F.array(*rows)).alias("bk")).select(
            "docid", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
        )

    dump(
        "minhash_pairs_before",
        bucket_pairs(old_minhash_bands(docs), ["band", "band_key"], "docid", "docid_a", "docid_b"),
    )
    # mid-round formulation: Arrow signature kernel but still
    # bucket_pairs + trailing distinct over the pair multiset
    from mini_search_engine_spark.ops.dedup import minhash_bands

    dump(
        "minhash_pairs_mid_kernel_distinct",
        bucket_pairs(minhash_bands(docs), ["band", "band_key"], "docid", "docid_a", "docid_b"),
    )
    dump("minhash_pairs_after", minhash_candidate_pairs(docs))

    # ---- trigram gram rows ----
    from mini_search_engine_spark.index.trigram import _gram_rows, _trigrams_col

    old_rows = docs.select(
        "docid", F.explode(_trigrams_col("content")).alias("gram")
    ).select("docid", md5_long(F.col("gram")).alias("tid"))
    dump("trigram_gram_rows_before", old_rows)
    dump("trigram_gram_rows_after", _gram_rows(docs, "content"))

    # ---- duplicate_spans window-hash rows ----
    from mini_search_engine_spark.ops.dedup import _tokens, _window_hash_rows, duplicate_spans

    def old_window_rows(docs, window=8):
        toks = _tokens(F.col("content"))
        base = (
            docs.select("docid", toks.alias("_toks"))
            .withColumn("_n", F.size("_toks"))
            .filter(F.col("_n") >= window)
        )
        win_structs = F.transform(
            F.sequence(F.lit(1), F.col("_n") - window + 1),
            lambda i: F.struct(
                i.alias("start"),
                md5_long(F.array_join(F.slice(F.col("_toks"), i, window), " ")).alias("h"),
            ),
        )
        return base.select("docid", "_n", F.explode(win_structs).alias("w")).select(
            "docid", "_n", F.col("w.start").alias("start"), F.col("w.h").alias("h")
        )

    dump("window_hash_rows_before", old_window_rows(docs))
    dump("window_hash_rows_after", _window_hash_rows(docs, 8, "content"))
    dump("duplicate_spans_after", duplicate_spans(docs, window=8))

    # ---- index build: postings encode pipeline + queries ----
    from mini_search_engine_spark.index import compress as C
    from mini_search_engine_spark.index.build import (
        auto_block_span,
        build_index,
        tokenize_docs,
    )
    from mini_search_engine_spark.index.termid import term_id_col

    n = docs.count()
    span = auto_block_span(n)
    tf = tokenize_docs(docs, "porter", True).withColumn("tid", term_id_col(F.col("term")))
    blocked = tf.withColumn("block", (F.col("docid") / span).cast("long"))
    plist = F.sort_array(
        F.collect_list(F.struct(F.col("docid"), F.col("tf"), F.col("dl"), F.col("positions")))
    )
    agg = blocked.groupBy("tid", "block").agg(
        F.min("term").alias("term"),
        plist.alias("plist"),
        F.count("*").cast("int").alias("n"),
        F.min("docid").alias("min_docid"),
        F.max("docid").alias("max_docid"),
        F.max("tf").alias("max_tf"),
        F.min("dl").alias("min_dl"),
    )
    cols = [
        "tid", "term", "block", "n",
        F.transform("plist", lambda x: x["docid"]).alias("docids"),
        F.transform("plist", lambda x: x["tf"]).alias("tfs"),
        F.transform("plist", lambda x: x["dl"]).alias("dls"),
        F.transform("plist", lambda x: x["positions"]).alias("positions"),
        "min_docid", "max_docid", "max_tf", "min_dl",
    ]
    posts = agg.select(*cols)
    enc_old = (
        posts.withColumn("_enc", C.encode_block_udf("docids", "tfs", "dls"))
        .withColumn("docids_bytes", F.col("_enc.docids_bytes"))
        .withColumn("tfs_bytes", F.col("_enc.tfs_bytes"))
        .withColumn("dls_bytes", F.col("_enc.dls_bytes"))
        .drop("docids", "tfs", "dls", "_enc")
        .withColumn("positions_bytes", C.encode_positions_udf("positions"))
        .drop("positions")
    )
    dump("postings_encode_before", enc_old)
    dump("postings_encode_after", C.encode_blocks_arrow(posts, True))

    idx = build_index(
        docs, analyzer="porter", positional=True, compress=True, check_tid_collisions=False
    )
    from mini_search_engine_spark.search import bm25_topk, search_and

    widx = idx.decoded()

    # bm25 pruned: before = two-phase forced; after = the cost-gated exact plan
    dump(
        "bm25_pruned_before_phase1ub",
        bm25_topk(widx, ["filter", "join", "scan"], 10, prune=True,
                  prune_min_blocks=0, prune_min_postings=0),
    )
    dump("bm25_pruned_after", bm25_topk(widx, ["filter", "join", "scan"], 10, prune=True))

    # search_and: before = count_distinct; after = bit_or
    from mini_search_engine_spark.search.boolean import _postings_for
    from mini_search_engine_spark.analysis.udfs import analyze_query

    terms = sorted({t for k in ["spark", "merge"] for t in analyze_query(k, "porter")})
    and_old = (
        _postings_for(widx, terms)
        .select("tid", F.explode("docids").alias("docid"))
        .groupBy("docid")
        .agg(F.count_distinct("tid").alias("nt"))
        .filter(F.col("nt") == len(terms))
        .select("docid")
        .orderBy("docid")
    )
    dump("and_query_before", and_old)
    dump("and_query_after", search_and(widx, ["spark", "merge"]))

    # ---- cosine ----
    from mini_search_engine_spark.ops.ann import _dot, _norm2, cosine_scores

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = list(emb.limit(1).collect()[0]["embedding"])
    q = F.array(*[F.lit(float(x)) for x in qv])
    cos_old = emb.select(
        "vec_id",
        (_dot(F.col("embedding"), q) / (F.sqrt(_norm2(F.col("embedding"))) * F.sqrt(_norm2(q)))).alias("cosine"),
    )
    dump("cosine_scores_before", cos_old)
    dump("cosine_scores_after", cosine_scores(emb, qv))

    # ---- nb train model table ----
    import math
    from mini_search_engine_spark.ops.classify import _token_key, nb_train
    from mini_search_engine_spark.ops.textstats import _ws_tokens

    labeled = docs.filter(F.col("lang").isNotNull())
    toks = labeled.select(
        F.col("lang").alias("_y"), F.explode(_ws_tokens(F.col("content"))).alias("_tok")
    ).select("_y", _token_key(F.col("_tok"), None).alias("token"))
    counts = toks.groupBy("_y", "token").count()
    labels = sorted(r["lang"] for r in labeled.select("lang").distinct().collect())
    pivot_old = counts.groupBy("token").pivot("_y", labels).agg(F.sum("count"))
    dump("nb_train_pivot", pivot_old)  # shape unchanged; job COUNT differs (3 corpus jobs -> 1)

    # ---- hits (sparse intermediates) ----
    # before: r5 half-step with the nodes LEFT JOIN zero-fill inside every
    # checkpointed frame; after: library hits() — sparse half-steps, full
    # vertex set restored once at the end. The interesting diff is the
    # PER-HALF-STEP job plan (one join fewer) plus the final restore join.
    from mini_search_engine_spark.search import hits as hits_new
    from mini_search_engine_spark.search.pagerank import _free_local_checkpoint

    def hits_old(edges, num_iter=3):
        nodes = (
            edges.select(F.col("src").alias("docid"))
            .unionByName(edges.select(F.col("dst").alias("docid")))
            .distinct()
        ).persist()
        e = edges.select("src", "dst").persist()
        ckpts = []

        def half(scores, score_col, join_on, group_on, out_col):
            msgs = (
                e.join(scores.withColumnRenamed("docid", join_on), join_on)
                .groupBy(group_on)
                .agg(F.sum(score_col).alias(out_col))
                .withColumnRenamed(group_on, "docid")
            )
            raw = nodes.join(msgs, "docid", "left").select(
                "docid", F.coalesce(F.col(out_col), F.lit(0.0)).alias(out_col)
            )
            pre = raw  # pre-checkpoint plan of the half-step job
            raw = raw.localCheckpoint()
            ckpts.append(raw)
            nrm = raw.agg(F.sqrt(F.sum(F.col(out_col) * F.col(out_col))).alias("nrm"))
            return pre, raw.crossJoin(F.broadcast(nrm)).select(
                "docid",
                F.when(F.col("nrm") > 0, F.col(out_col) / F.col("nrm"))
                .otherwise(F.lit(0.0))
                .alias(out_col),
            )

        hub = nodes.select("docid", F.lit(1.0).alias("hub"))
        pre1, auth = half(hub, "hub", "src", "dst", "authority")
        _, hub = half(auth, "authority", "dst", "src", "hub")
        out = auth.join(hub, "docid").select("docid", "authority", "hub")
        for df in ckpts:
            _free_local_checkpoint(df)
        e.unpersist(); nodes.unpersist()
        return pre1, out

    graph = docs.select(
        F.col("docid").alias("src"), ((F.col("docid") * 7 + 3) % 500).alias("dst")
    )
    pre_old, out_old = hits_old(graph)
    dump("hits_half_step_before", pre_old)
    dump("hits_rank_before", out_old)
    # the new half-step plan: reproduce the first checkpoint job's plan
    nodes_n = (
        graph.select(F.col("src").alias("docid"))
        .unionByName(graph.select(F.col("dst").alias("docid")))
        .distinct()
    )
    hub0 = nodes_n.select("docid", F.lit(1.0).alias("hub"))
    half_new = (
        graph.join(hub0.withColumnRenamed("docid", "src"), "src")
        .groupBy("dst")
        .agg(F.sum("hub").alias("authority"))
        .withColumnRenamed("dst", "docid")
    )
    dump("hits_half_step_after", half_new)
    dump("hits_rank_after", hits_new(graph, num_iter=3))

    idx.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
