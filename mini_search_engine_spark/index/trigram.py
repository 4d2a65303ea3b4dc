"""Character-trigram index + verified substring search.

The canonical code-search structure (Google Code Search's trigram posting
lists; Zoekt/Hound use the same design): substring/regex queries over raw
source text can't be answered by a word-tokenized inverted index — they
need an index over CHARACTER n-grams of the unanalyzed content. A query
literal is reduced to its trigrams, the (small, rarest-first) trigram
posting lists are intersected for a candidate superset, and an exact
``contains`` verification runs ONLY on the candidates. The reference
engine has no such operator; this is the "beyond the reference" surface a
source-repo corpus (BASELINE.json input_hint) actually needs.

Spark-first shape:

* **Build** — trigram extraction is a within-row array transform
  (`sequence` + `substring`), deduped per doc before the explode, so the
  exploded row count is Σ distinct-grams-per-doc, not Σ chars. One
  groupBy((gram-hash, docid-block)) with map-side partials produces
  blocked, sorted docid arrays. Blocking by docid range caps the row size
  of stopword-grade grams ("e ", "th" appear in nearly every doc): a
  100 TB corpus never materializes a single all-docs array row.
* **Query** — gram stats (a trigram-vocabulary-sized sidecar, ≤ ~26³·k
  rows regardless of corpus size) rank the literal's grams by df;
  only the ``max_grams`` RAREST are intersected (Zoekt's trick: the AND
  of the two-three rarest grams is already a tiny candidate set, and
  verification repairs any looseness). The intersect is one int-keyed
  filter + explode + groupBy-count; candidates then BROADCAST-semi-join
  the corpus, and ``contains`` verifies exactly. The corpus is scanned
  once, filtered to candidates — never regex-scanned in full.
* Gram ids are the same portable 60-bit md5-prefix hash the term
  dictionary uses (`index/termid.py` rationale): int shuffles/filters,
  strings never leave the build scan.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BLOCK_SPAN = 1 << 16


def _gram_hash_py(gram: str) -> int:
    """Driver-side twin of ops.dedup.md5_long (60-bit md5 prefix)."""
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16)


def _trigrams_col(content_col: str):
    """Distinct character trigrams of lower(content) as an array column —
    a within-row transform, no explode until after the dedup."""
    low = F.lower(F.coalesce(F.col(content_col), F.lit("")))
    grams = F.transform(
        F.sequence(F.lit(1), F.length(low) - 2),
        lambda i: low.substr(i, F.lit(3)),
    )
    # sequence(1, len-2) is DESCENDING ([1, 0], [1, 0, -1], ...) for content
    # shorter than 3 chars, which would emit bogus sub-3-char "trigrams" into
    # the postings and df stats — short docs must contribute no grams at all.
    return F.when(F.length(low) >= 3, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


@dataclass
class TrigramIndex:
    """Handle to the trigram posting frames (persisted)."""

    postings: DataFrame  # tid, block, docids (sorted array<long>)
    gramstats: DataFrame  # tid, df — trigram-vocabulary-sized sidecar
    block_span: int
    n_docs: int

    def unpersist(self) -> None:
        self.postings.unpersist()
        self.gramstats.unpersist()


def _gram_rows(docs: DataFrame, content_col: str) -> DataFrame:
    """corpus → (docid, tid): one row per DISTINCT trigram of each doc,
    via one ``mapInArrow`` pass (r6). The Catalyst form (interpreted
    higher-order ``substr`` transform + ``array_distinct`` + explode +
    one jvm md5 per exploded row) cost ~2 s of the 3.4 s trigram build at
    sf1.0 local[32]; here the per-doc gram set is plain str slicing into a
    set, and a capped per-task memo (gram → 60-bit md5 id) collapses the
    md5 count to one per distinct gram — the trigram vocabulary is tiny
    (≤ charset³), so the memo hit rate is near-total at any scale.
    Python slicing indexes code points exactly like Spark's ``substring``
    and ``str.lower`` matches the full-Unicode jvm ``lower`` (the same
    parity the build/minhash kernels rely on)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("docid", T.LongType(), False),
            T.StructField("tid", T.LongType(), False),
        ]
    )
    src = docs.select("docid", F.col(content_col).alias("content"))

    def kernel(batches):
        import hashlib

        import pyarrow as pa

        md5 = hashlib.md5
        memo: dict = {}
        MEMO_CAP = 1 << 20

        for rb in batches:
            if rb.num_rows == 0:
                continue
            docids = rb.column("docid").to_pylist()
            texts = rb.column("content").to_pylist()
            out_doc: list = []
            out_tid: list = []
            for d, c in zip(docids, texts):
                s = (c or "").lower()
                if len(s) < 3:
                    continue
                for g in {s[i : i + 3] for i in range(len(s) - 2)}:
                    t = memo.get(g)
                    if t is None:
                        t = int(md5(g.encode()).hexdigest()[:15], 16)
                        if len(memo) < MEMO_CAP:
                            memo[g] = t
                    out_doc.append(d)
                    out_tid.append(t)
            if out_doc:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(out_doc, pa.int64()), pa.array(out_tid, pa.int64())],
                    ["docid", "tid"],
                )

    return src.mapInArrow(kernel, schema=schema)


def build_trigram_index(
    docs: DataFrame, content_col: str = "content", block_span: int = DEFAULT_BLOCK_SPAN
) -> TrigramIndex:
    """One pass: per-doc distinct trigrams (Arrow kernel, memoized gram
    ids) → ONE groupBy on (gram-hash, docid-block) into sorted docid
    arrays + a df sidecar."""
    n_docs = docs.count()
    rows = _gram_rows(docs, content_col).select(
        "docid",
        "tid",
        (F.col("docid") / block_span).cast("long").alias("block"),
    )
    postings = (
        rows.groupBy("tid", "block")
        .agg(F.sort_array(F.collect_list("docid")).alias("docids"))
        .persist()
    )
    gramstats = (
        postings.groupBy("tid")
        .agg(F.sum(F.size("docids")).cast("long").alias("df"))
        .persist()
    )
    return TrigramIndex(
        postings=postings, gramstats=gramstats, block_span=block_span, n_docs=n_docs
    )


def _query_grams(q: str) -> list[str]:
    qn = q.lower()
    return sorted({qn[i : i + 3] for i in range(len(qn) - 2)})


def substring_search(
    index: TrigramIndex,
    docs: DataFrame,
    query: str,
    content_col: str = "content",
    max_grams: int = 8,
) -> DataFrame:
    """Docids whose raw content contains ``query`` (case-insensitive).

    Candidate generation intersects only the ``max_grams`` RAREST of the
    query's trigrams (ranked on the gramstats sidecar — one tiny job);
    the final ``contains(lower(content), query)`` verification makes the
    result exact regardless of how loose the pruned AND is. Queries
    shorter than 3 chars have no trigram and raise — at 100 TB a 2-char
    substring scan is a full-corpus scan dressed as a query (callers who
    mean it can use search.full_scan_search)."""
    grams = _query_grams(query)
    if not grams:
        raise ValueError("substring query must be at least 3 chars")
    all_tids = [_gram_hash_py(g) for g in grams]

    # ONE tiny job over the trigram-vocab sidecar: per-gram dfs. A query
    # gram absent from the dictionary occurs in no doc → empty result
    # without touching postings or corpus.
    stats = sorted(
        (r["df"], r["tid"])
        for r in index.gramstats.filter(F.col("tid").isin(all_tids)).collect()
    )
    if len(stats) < len(all_tids):
        return docs.sparkSession.range(0).select(F.col("id").alias("docid"))
    tids = [t for _, t in stats[:max_grams]]  # rarest-first pruning

    n = len(tids)
    cand = (
        index.postings.filter(F.col("tid").isin(tids))
        .select("tid", F.explode("docids").alias("docid"))
        .groupBy("docid")
        .agg(F.count_distinct("tid").alias("_ng"))
        .filter(F.col("_ng") == n)
        .select("docid")
    )
    # candidate cardinality ≤ the rarest gram's df — known from the stats
    # we already collected, so the broadcast decision is cost-based, not
    # hoped-for: tiny candidate sets broadcast (no corpus shuffle), a
    # pathological common-substring query falls back to a shuffled
    # semi-join instead of OOMing the driver.
    min_df = stats[0][0]
    if min_df <= 2_000_000:
        cand = F.broadcast(cand)
    qlit = F.lit(query.lower())
    return (
        docs.join(cand, "docid", "semi")
        .filter(F.contains(F.lower(F.coalesce(F.col(content_col), F.lit(""))), qlit))
        .select("docid")
        .orderBy("docid")
    )


def required_literals(pattern: str) -> list[str]:
    """Literal substrings every match of ``pattern`` MUST contain —
    the index-pruning step of regex search (Cox, "Regular Expression
    Matching with a Trigram Index", the Google Code Search design:
    reduce the regex to required trigrams, intersect posting lists,
    run the real regex only on candidates).

    Conservative by construction: walks the top-level concatenation (and
    required subgroups / min≥1 repeats of them), accumulating maximal
    LITERAL runs; anything uncertain (alternation, classes, optional
    parts) just breaks the run — the result may be an under-approximation
    but never claims a literal a match could lack. Lowercased to match
    the (lowercased) trigram index."""
    import re._parser as sre

    runs: list[str] = []
    cur: list[str] = []

    def flush():
        if cur:
            runs.append("".join(cur))
            cur.clear()

    def walk(items):
        for op, arg in items:
            name = str(op)
            if name == "LITERAL":
                cur.append(chr(arg).lower())
            elif name == "SUBPATTERN":
                # (group, add_flags, del_flags, items) — required in a
                # concatenation, but its edges don't extend neighbors'
                # runs (the group may match at a different offset class)
                flush()
                walk(arg[3])
                flush()
            elif name == "MAX_REPEAT" and arg[0] >= 1:
                # x{1,}/x+ : ONE copy is required
                flush()
                walk(arg[2])
                flush()
            else:
                flush()

    walk(sre.parse(pattern))
    flush()
    return [r for r in runs if len(r) >= 3]


def regex_search(
    index: TrigramIndex,
    docs: DataFrame,
    pattern: str,
    content_col: str = "content",
    max_grams: int = 8,
    allow_full_scan: bool = False,
) -> DataFrame:
    """Docids whose content matches ``pattern`` (case-insensitive).

    Candidates come from the trigram AND over the grams of every REQUIRED
    literal of the pattern (rarest-first, ≤ ``max_grams``); the exact
    ``(?i)pattern`` regexp then runs only on candidates. A pattern with no
    ≥3-char required literal cannot be index-pruned: it either raises
    (default — at 100 TB an unprunable regex is a full-corpus scan someone
    should have to say they meant) or, with ``allow_full_scan``, scans.

    Note the verification regex runs under Java's engine (`rlike`), the
    extraction under Python's parser — both interpret the common code-
    search syntax (literals, classes, \\w/\\s, repeats, groups,
    alternation) identically; exotic Python-only constructs will have
    parsed, so extraction stays sound, but verification semantics follow
    Java."""
    lits = required_literals(pattern)
    verify = F.col(content_col).rlike("(?i)" + pattern)
    if not lits:
        if not allow_full_scan:
            raise ValueError(
                f"pattern {pattern!r} has no >=3-char required literal; "
                "pass allow_full_scan=True to regex-scan the corpus"
            )
        return docs.filter(verify).select("docid").orderBy("docid")

    grams = sorted({g for lit in lits for g in _query_grams(lit)})
    by_df = sorted(
        (r["df"], r["tid"])
        for r in index.gramstats.filter(
            F.col("tid").isin([_gram_hash_py(g) for g in grams])
        ).collect()
    )
    if len(by_df) < len(grams):  # some required gram occurs in no doc
        return docs.sparkSession.range(0).select(F.col("id").alias("docid"))
    tids = [t for _, t in by_df[:max_grams]]
    cand = (
        index.postings.filter(F.col("tid").isin(tids))
        .select("tid", F.explode("docids").alias("docid"))
        .groupBy("docid")
        .agg(F.count_distinct("tid").alias("_ng"))
        .filter(F.col("_ng") == len(tids))
        .select("docid")
    )
    if by_df[0][0] <= 2_000_000:
        cand = F.broadcast(cand)
    return (
        docs.join(cand, "docid", "semi").filter(verify).select("docid").orderBy("docid")
    )


def write_trigram_index(index: TrigramIndex, path: str, mode: str = "overwrite") -> None:
    """Persist postings tid-sorted within partitions (the same layout
    rationale as ``index.build.write_index``: int gram-id predicates prune
    Parquet row groups via column min/max stats) + the gramstats sidecar +
    a tiny JSON meta."""
    import json

    from mini_search_engine_spark.index.build import _write_sidecar

    (
        index.postings.sortWithinPartitions("tid", "block")
        .write.mode(mode)
        .parquet(f"{path}/trigram_postings")
    )
    index.gramstats.sortWithinPartitions("tid").write.mode(mode).parquet(
        f"{path}/trigram_stats"
    )
    _write_sidecar(
        index.postings.sparkSession,
        f"{path}/trigram_meta.json",
        json.dumps({"block_span": index.block_span, "n_docs": index.n_docs}),
        mode,
    )


def read_trigram_index(spark, path: str) -> TrigramIndex:
    import json

    from mini_search_engine_spark.index.build import _read_sidecar

    meta = json.loads(_read_sidecar(spark, f"{path}/trigram_meta.json"))
    return TrigramIndex(
        postings=spark.read.parquet(f"{path}/trigram_postings"),
        gramstats=spark.read.parquet(f"{path}/trigram_stats"),
        block_span=meta["block_span"],
        n_docs=meta["n_docs"],
    )
