"""Inverted-index build: docid-range-blocked posting lists + statistics.

Reference pipeline: ``addDocument`` (analyze, count tokens, insert into
per-term sorted docid list — ``InvertedIndexManager.java:162-209``) →
``flush`` to an on-disk segment (``:230-298``) → LSM pairwise
``mergeAllSegments`` (``:327-440``). The Spark-first re-expression is a
single declarative plan:

    corpus → posexplode(analyze(content)) → groupBy(term, docid)
           → groupBy(term, block) → sorted posting arrays (+codec) → write

**Blocking = deterministic salt + block-max unit.** ``block =
docid // block_span`` bounds every aggregation group to at most
``block_span`` postings, so a stopword-grade hot term ("import" in code)
fans out across ``n_docs / block_span`` groups instead of collapsing onto
one reducer — this is the explicit skew handling the north_star asks for
(a docid-range salt rather than a random one, so the salt doubles as the
block-max WAND skip unit: every block carries ``max_tf`` / docid bounds,
and blocks are disjoint docid ranges ACROSS terms, which makes block-level
upper-bound pruning sound — see search/ranking.py).

Statistics (``getNumDocuments`` / ``getDocumentFrequency``,
``InvertedIndexManager.java:1494-1528``) generalize to: ``termstats(term,
df)``, ``doclens(docid, dl)``, scalars ``n_docs`` / ``avgdl`` — the inputs
BM25 needs.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mini_search_engine_spark.analysis.udfs import analyze_col
from mini_search_engine_spark.index import compress as C

DEFAULT_BLOCK_SPAN = 1 << 16  # docids per block


@dataclass
class InvertedIndex:
    """Handle to the built index DataFrames + collection statistics."""

    postings: DataFrame  # term, block, n, docids, tfs[, positions], min_docid, max_docid, max_tf
    doclens: DataFrame  # docid, dl
    termstats: DataFrame  # term, df
    n_docs: int
    avgdl: float
    analyzer: str
    block_span: int
    positional: bool
    compressed: bool = False

    def decoded(self) -> "InvertedIndex":
        """Return a view with docids/tfs decoded from the codec columns."""
        if not self.compressed:
            return self
        p = (
            self.postings.withColumn(
                "_dec", C.decode_block_udf("docids_bytes", "tfs_bytes", "dls_bytes")
            )
            .withColumn("docids", F.col("_dec.docids"))
            .withColumn("tfs", F.col("_dec.tfs"))
            .withColumn("dls", F.col("_dec.dls"))
            .drop("_dec")
        )
        return replace(self, postings=p, compressed=False)


def tokenize_docs(
    docs: DataFrame, analyzer: str = "porter", positional: bool = False
) -> DataFrame:
    """corpus → (docid, term, tf, dl[, positions]) with NO shuffle.

    Token positions are 0-based indices into the analyzed stream, matching
    ``utils/Utils.java:186-201``; tf = raw occurrence count
    (``InvertedIndexManager.java:196-209``).

    (term, docid) pairs are doc-local, so per-term counting is a WITHIN-ROW
    aggregation — doing it inside the Arrow pass (Counter per doc) instead
    of ``explode → groupBy(term, docid)`` removes an exchange of one row
    per posting (~50M rows/million docs) from the build; the only shuffle
    left in the whole pipeline is the (term, block) aggregation.

    Analyzers with a native Catalyst path keep it (tokens computed
    JVM-side, then one explode + doc-local pandas-free aggregation is
    still needed → for those we explode and count in a mapInPandas over
    already-tokenized rows to stay shuffle-free as well).
    """
    from mini_search_engine_spark.analysis.udfs import ANALYZERS

    out_fields = [
        T.StructField("docid", T.LongType(), False),
        T.StructField("dl", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
    ]
    if positional:
        out_fields.append(T.StructField("positions", T.ArrayType(T.IntegerType()), False))
    schema = T.StructType(out_fields)

    # JVM-side tokenization whenever possible (punct split + stopword
    # filter stay in whole-stage codegen); Python then only stems (memoized
    # dict hit for all but the first occurrence of a surface form) and
    # counts. The reference 'porter' analyzer = PunctuationTokenizer +
    # PorterStemmer, so its token stream is exactly the native punct stream
    # stemmed element-wise.
    native = analyzer in ("punct_nostem", "naive", "porter")
    stem = analyzer == "porter"
    if native:
        base = "punct_nostem" if stem else analyzer
        src = docs.select("docid", ANALYZERS[base](F.col("content")).alias("toks"))
    else:
        src = docs.select("docid", "content")

    def count_tokens(batches):
        import pandas as pd

        from mini_search_engine_spark.analysis.tokenizers import _stem_cached
        from mini_search_engine_spark.analysis.tokenizers import analyze as _an

        for pdf in batches:
            if len(pdf) == 0:
                continue
            docids, dls, terms, tfs, poss = [], [], [], [], []
            if native and stem:
                toks_iter = (
                    [_stem_cached(t) for t in toks] for toks in pdf["toks"]
                )
            elif native:
                toks_iter = pdf["toks"]
            else:
                toks_iter = pdf["content"].map(lambda c: _an(c, tokenizer=analyzer))
            for docid, toks in zip(pdf["docid"], toks_iter):
                dl = len(toks)
                if positional:
                    by_term: dict = {}
                    for p, t in enumerate(toks):
                        by_term.setdefault(t, []).append(p)
                    for t, plist in by_term.items():
                        docids.append(docid)
                        dls.append(dl)
                        terms.append(t)
                        tfs.append(len(plist))
                        poss.append(plist)
                else:
                    by_term = {}
                    for t in toks:
                        by_term[t] = by_term.get(t, 0) + 1
                    for t, c in by_term.items():
                        docids.append(docid)
                        dls.append(dl)
                        terms.append(t)
                        tfs.append(c)
            data = {"docid": docids, "dl": dls, "term": terms, "tf": tfs}
            if positional:
                data["positions"] = poss
            yield pd.DataFrame(data)

    return src.mapInPandas(count_tokens, schema=schema)


def doc_lengths(docs: DataFrame, analyzer: str = "porter") -> DataFrame:
    """docid → analyzed token count (dl). Cheap native size() — no shuffle."""
    return docs.select(
        "docid", F.size(analyze_col(F.col("content"), analyzer)).alias("dl")
    )


def build_index(
    docs: DataFrame,
    analyzer: str = "porter",
    positional: bool = False,
    block_span: int = DEFAULT_BLOCK_SPAN,
    compress: bool = False,
) -> InvertedIndex:
    """Build the blocked postings table + stats from a canonical corpus.

    The plan is fully Catalyst until the optional codec UDF: explode →
    partial/final hash agg on (term, docid) → partial/final hash agg on
    (term, block). Per-block ``ub`` (BM25 upper bound from max_tf) is
    precomputed for query-time block pruning.
    """
    # One analyzer pass: tf carries dl (Lucene-norms style denormalization),
    # so BM25 needs no query-time doclens join — only broadcast scalars/df.
    # Persisted: postings, doclens and the stats action all reuse it.
    tf = tokenize_docs(docs, analyzer=analyzer, positional=positional).persist()
    blocked = tf.withColumn("block", (F.col("docid") / block_span).cast("long"))

    plist_fields = [F.col("docid"), F.col("tf"), F.col("dl")]
    if positional:
        plist_fields.append(F.col("positions"))
    plist = F.sort_array(F.collect_list(F.struct(*plist_fields)))

    agg = blocked.groupBy("term", "block").agg(
        plist.alias("plist"),
        F.count("*").cast("int").alias("n"),
        F.min("docid").alias("min_docid"),
        F.max("docid").alias("max_docid"),
        F.max("tf").alias("max_tf"),
        F.min("dl").alias("min_dl"),
    )
    cols = [
        "term",
        "block",
        "n",
        F.transform("plist", lambda x: x["docid"]).alias("docids"),
        F.transform("plist", lambda x: x["tf"]).alias("tfs"),
        F.transform("plist", lambda x: x["dl"]).alias("dls"),
        "min_docid",
        "max_docid",
        "max_tf",
        "min_dl",
    ]
    if positional:
        cols.insert(6, F.transform("plist", lambda x: x["positions"]).alias("positions"))
    postings = agg.select(*cols)

    if compress:
        postings = (
            postings.withColumn("_enc", C.encode_block_udf("docids", "tfs", "dls"))
            .withColumn("docids_bytes", F.col("_enc.docids_bytes"))
            .withColumn("tfs_bytes", F.col("_enc.tfs_bytes"))
            .withColumn("dls_bytes", F.col("_enc.dls_bytes"))
            .drop("docids", "tfs", "dls", "_enc")
        )
    postings = postings.persist()

    # doclens derived from the cached tf (no second analyzer pass); docs
    # with zero tokens are restored with dl=0 via a left join on the corpus.
    dl_nonzero = tf.groupBy("docid").agg(F.max("dl").alias("dl"))
    doclens = docs.select("docid").join(dl_nonzero, "docid", "left").na.fill(0, ["dl"])
    n_docs = docs.count()
    total_tokens = tf.agg(F.sum(F.col("tf").cast("long"))).collect()[0][0] or 0
    avgdl = (total_tokens / n_docs) if n_docs else 0.0

    termstats = postings.groupBy("term").agg(F.sum("n").cast("long").alias("df"))

    return InvertedIndex(
        postings=postings,
        doclens=doclens,
        termstats=termstats,
        n_docs=int(n_docs),
        avgdl=float(avgdl),
        analyzer=analyzer,
        block_span=block_span,
        positional=positional,
        compressed=compress,
    )


def write_index(index: InvertedIndex, path: str, mode: str = "overwrite") -> None:
    """Persist the index: postings hash-distributed + sorted by term so
    term-equality predicates prune Parquet row groups (replaces the
    reference's dictionary-first lookup, ``InvertedIndexManager.java:757-766``)."""
    spark = index.postings.sparkSession
    # The (term, block) aggregation already hash-distributed the rows; a
    # partition-local sort is enough for term-predicate row-group pruning —
    # re-shuffling GBs of posting arrays by term would double the write cost.
    (
        index.postings.sortWithinPartitions("term", "block")
        .write.mode(mode)
        .parquet(f"{path}/postings")
    )
    index.doclens.sortWithinPartitions("docid").write.mode(mode).parquet(
        f"{path}/doclens"
    )
    index.termstats.write.mode(mode).parquet(f"{path}/termstats")
    meta = spark.createDataFrame(
        [
            (
                index.n_docs,
                index.avgdl,
                index.analyzer,
                index.block_span,
                index.positional,
                index.compressed,
            )
        ],
        "n_docs long, avgdl double, analyzer string, block_span long, positional boolean, compressed boolean",
    )
    meta.coalesce(1).write.mode(mode).parquet(f"{path}/meta")


def read_index(spark: SparkSession, path: str) -> InvertedIndex:
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    return InvertedIndex(
        postings=spark.read.parquet(f"{path}/postings"),
        doclens=spark.read.parquet(f"{path}/doclens"),
        termstats=spark.read.parquet(f"{path}/termstats"),
        n_docs=meta["n_docs"],
        avgdl=meta["avgdl"],
        analyzer=meta["analyzer"],
        block_span=meta["block_span"],
        positional=meta["positional"],
        compressed=meta["compressed"],
    )
