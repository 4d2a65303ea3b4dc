"""r6 optimization round: the Arrow kernels that replaced Catalyst
pipelines must stay EXACTLY equivalent to the formulations they replaced.

Each test reconstructs the r5 Catalyst pipeline inline (the reference
implementation) and asserts multiset equality — including the float/byte
level where the oracle depends on it — over a corpus with the edge cases
the kernels special-case (null / empty / whitespace-only / short docs,
unicode case mapping, Java-\\s-only whitespace variants).
"""

import pytest
from pyspark.sql import functions as F

EDGE_ROWS = [
    (0, None),
    (1, ""),
    (2, "   \t\n"),
    (3, "one"),
    (4, "one two"),
    (5, "one two three four five six seven eight nine ten"),
    (6, "Tab\there\nnewline\x0bvt\x0cff\rcr mixed  runs"),
    (7, "İstanbul ÅNGSTRÖM ΣΙΓΜΑΣ Mixed CASE words here and there"),
    (8, "a  b   c d e f g h i j k l m n o p"),
    (9, "the fast key order sort table scan merge the fast key order sort"),
    (10, "dup dup dup dup dup dup dup dup dup dup"),
]


@pytest.fixture(scope="module")
def edge_docs(spark):
    return spark.createDataFrame(EDGE_ROWS, "docid long, content string")


def test_minhash_kernel_matches_catalyst(edge_docs):
    from mini_search_engine_spark.ops.dedup import md5_long, minhash_signatures, shingles

    nh = 6
    sh = edge_docs.select(
        "docid", F.explode(shingles(F.col("content"), 3)).alias("sh")
    )
    aggs = [
        F.min(md5_long(F.concat(F.lit(f"{j}|"), F.col("sh")))).alias(f"h{j}")
        for j in range(nh)
    ]
    ref = (
        sh.groupBy("docid")
        .agg(*aggs)
        .select("docid", F.array(*[F.col(f"h{j}") for j in range(nh)]).alias("sig"))
    )
    got = {r["docid"]: r["sig"] for r in minhash_signatures(edge_docs, num_hashes=nh).collect()}
    exp = {r["docid"]: r["sig"] for r in ref.collect()}
    # null-content docs: the kernel emits an all-null sig row; the Catalyst
    # groupBy emits one too (the null shingle row survives the explode)
    assert got == exp


def test_window_hash_kernel_matches_catalyst(edge_docs):
    from mini_search_engine_spark.ops.dedup import _tokens, _window_hash_rows, md5_long

    w = 3
    toks = _tokens(F.col("content"))
    base = (
        edge_docs.select("docid", toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .filter(F.col("_n") >= w)
    )
    win_structs = F.transform(
        F.sequence(F.lit(1), F.col("_n") - w + 1),
        lambda i: F.struct(
            i.alias("start"),
            md5_long(F.array_join(F.slice(F.col("_toks"), i, w), " ")).alias("h"),
        ),
    )
    ref = base.select("docid", "_n", F.explode(win_structs).alias("x")).select(
        "docid", "_n", F.col("x.start").alias("start"), F.col("x.h").alias("h")
    )
    new = _window_hash_rows(edge_docs, w, "content")
    assert ref.exceptAll(new).count() == 0
    assert new.exceptAll(ref).count() == 0


def test_trigram_gram_rows_match_catalyst(edge_docs):
    from mini_search_engine_spark.index.trigram import _gram_rows, _trigrams_col
    from mini_search_engine_spark.ops.dedup import md5_long

    ref = edge_docs.select(
        "docid", F.explode(_trigrams_col("content")).alias("gram")
    ).select("docid", md5_long(F.col("gram")).alias("tid"))
    new = _gram_rows(edge_docs, "content")
    assert ref.exceptAll(new).count() == 0
    assert new.exceptAll(ref).count() == 0


def test_cosine_kernel_bit_exact(spark):
    from mini_search_engine_spark.ops.ann import _dot, _norm2, cosine_scores

    rows = [
        (1, [1.0, 2.0, 3.0, 4.5]),
        (2, [0.1, -0.2, 0.3, -0.4]),
        (3, None),
        (4, [1.0, 2.0]),  # wrong length -> NULL, like the padding fold
        (5, [9.25, -3.5, 0.0, 1.0 / 3.0]),
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qv = [0.5, 1.25, -2.0, 3.0]
    q = F.array(*[F.lit(float(x)) for x in qv])
    ref = vecs.select(
        "vec_id",
        (
            _dot(F.col("embedding"), q)
            / (F.sqrt(_norm2(F.col("embedding"))) * F.sqrt(_norm2(q)))
        ).alias("cosine"),
    )
    # exceptAll compares raw doubles — bit-level equality, no rounding
    new = cosine_scores(vecs, qv)
    assert ref.exceptAll(new).count() == 0
    assert new.exceptAll(ref).count() == 0


def test_encode_blocks_arrow_byte_exact(spark, sf_dir):
    from mini_search_engine_spark.corpus import load_documents
    from mini_search_engine_spark.index import compress as C
    from mini_search_engine_spark.index.build import auto_block_span, tokenize_docs
    from mini_search_engine_spark.index.termid import term_id_col

    docs = load_documents(spark, sf_dir)
    tf = tokenize_docs(docs, "porter", True).withColumn(
        "tid", term_id_col(F.col("term"))
    )
    span = auto_block_span(docs.count())
    blocked = tf.withColumn("block", (F.col("docid") / span).cast("long"))
    plist = F.sort_array(
        F.collect_list(
            F.struct(F.col("docid"), F.col("tf"), F.col("dl"), F.col("positions"))
        )
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
    posts = agg.select(
        "tid", "term", "block", "n",
        F.transform("plist", lambda x: x["docid"]).alias("docids"),
        F.transform("plist", lambda x: x["tf"]).alias("tfs"),
        F.transform("plist", lambda x: x["dl"]).alias("dls"),
        F.transform("plist", lambda x: x["positions"]).alias("positions"),
        "min_docid", "max_docid", "max_tf", "min_dl",
    )
    ref = (
        posts.withColumn("_enc", C.encode_block_udf("docids", "tfs", "dls"))
        .withColumn("docids_bytes", F.col("_enc.docids_bytes"))
        .withColumn("tfs_bytes", F.col("_enc.tfs_bytes"))
        .withColumn("dls_bytes", F.col("_enc.dls_bytes"))
        .drop("docids", "tfs", "dls", "_enc")
        .withColumn("positions_bytes", C.encode_positions_udf("positions"))
        .drop("positions")
    )
    new = C.encode_blocks_arrow(posts, True)
    sel = [
        "tid", "block", "n", "docids_bytes", "tfs_bytes", "dls_bytes",
        "positions_bytes", "min_docid", "max_docid", "max_tf", "min_dl",
    ]
    assert ref.select(*sel).exceptAll(new.select(*sel)).count() == 0
    assert new.select(*sel).exceptAll(ref.select(*sel)).count() == 0


def test_search_and_bitmask_matches_count_distinct(spark, tiny_corpus):
    from mini_search_engine_spark.corpus import load_corpus
    from mini_search_engine_spark.index.build import build_index
    from mini_search_engine_spark.search import search_and
    from mini_search_engine_spark.search.boolean import _postings_for
    from mini_search_engine_spark.analysis.udfs import analyze_query

    docs = load_corpus(tiny_corpus)
    idx = build_index(docs, analyzer="porter", check_tid_collisions=False)
    for kws in (["information", "retrieval"], ["the quick", "fox"], ["cat dog", "dog"]):
        terms = sorted({t for k in kws for t in analyze_query(k, "porter")})
        ref = (
            _postings_for(idx, terms)
            .select("tid", F.explode("docids").alias("docid"))
            .groupBy("docid")
            .agg(F.count_distinct("tid").alias("nt"))
            .filter(F.col("nt") == len(terms))
            .select("docid")
        )
        got = sorted(r["docid"] for r in search_and(idx, kws).collect())
        exp = sorted(r["docid"] for r in ref.collect())
        assert got == exp
    idx.unpersist()
