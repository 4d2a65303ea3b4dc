"""Incremental cross-batch dedup (ops/incremental.py): brute-force parity,
store roundtrip, broadcast-only plan shape, and two-batch sequencing."""

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.ops import (
    append_exact_store,
    append_minhash_store,
    compact_exact_store,
    compact_minhash_store,
    incremental_exact_flags,
    incremental_minhash_flags,
    read_exact_store,
    read_minhash_store,
    write_exact_store,
    write_minhash_store,
)
from mini_search_engine_spark.ops.dedup import minhash_bands


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "docid long, content string")


@pytest.fixture(scope="module")
def corpus(spark):
    """24 docs with planted exact dups, near dups (1-word edits), and
    uniques, spread across the %4 batch/base split."""
    texts = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "spark builds distributed inverted indexes with partition local postings",
        "information retrieval systems rank documents by term frequency scores",
        "a completely different document about cooking pasta with fresh basil",
    ]
    rows = []
    for i in range(24):
        fam = i % 4
        t = texts[fam]
        if i >= 8 and i % 3 == 0:
            # near dup: one-word edit of the family text
            t = t.replace(t.split()[2], "WORD%d" % (i // 12))
        elif i >= 16 and fam == 3:
            t = "unique tail doc number %d with its own words entirely" % i
        rows.append((i, t))
    return rows


def _brute_flags(spark, rows):
    """Independent reference: collect band keys and brute-force the
    store/batch matches in Python."""
    docs = _mk_docs(spark, rows)
    bands = {
        r["docid"]: set()
        for r in docs.select("docid").collect()
    }
    for r in minhash_bands(docs).collect():
        bands[r["docid"]].add((r["band"], r["band_key"]))
    base = sorted(d for d in bands if d % 4 != 0)
    batch = sorted(d for d in bands if d % 4 == 0)
    expected = {}
    for d in batch:
        sm = [b for b in base if bands[b] & bands[d]]
        bm = [b for b in batch if b < d and bands[b] & bands[d]]
        expected[d] = (
            min(sm) if sm else None,
            min(bm) if bm else None,
            1 if (sm or bm) else 0,
        )
    return expected


def test_incremental_minhash_matches_bruteforce(spark, corpus, tmp_path):
    docs = _mk_docs(spark, corpus)
    path = str(tmp_path / "mh_store")
    write_minhash_store(docs.filter(F.col("docid") % 4 != 0), path)
    store = read_minhash_store(spark, path)
    out = incremental_minhash_flags(docs.filter(F.col("docid") % 4 == 0), store)
    got = {
        r["docid"]: (r["store_match"], r["batch_match"], r["is_dup"])
        for r in out.collect()
    }
    assert got == _brute_flags(spark, corpus)


def test_incremental_minhash_on_sf_corpus(spark, sf_dir, tmp_path):
    """Same parity at sf0.001 (the entry's own split) — guards the oracle."""
    from mini_search_engine_spark.corpus import load_documents

    docs = load_documents(spark, sf_dir)
    rows = [(r["docid"], r["content"]) for r in docs.collect()]
    path = str(tmp_path / "mh_store_sf")
    write_minhash_store(docs.filter(F.col("docid") % 4 != 0), path)
    out = incremental_minhash_flags(
        docs.filter(F.col("docid") % 4 == 0), read_minhash_store(spark, path)
    )
    got = {
        r["docid"]: (r["store_match"], r["batch_match"], r["is_dup"])
        for r in out.collect()
    }
    assert got == _brute_flags(spark, rows)


def test_incremental_exact_matches_bruteforce(spark, corpus, tmp_path):
    docs = _mk_docs(spark, corpus)
    path = str(tmp_path / "sha_store")
    write_exact_store(docs.filter(F.col("docid") % 4 != 0), path)
    out = incremental_exact_flags(
        docs.filter(F.col("docid") % 4 == 0), read_exact_store(spark, path)
    )
    text = dict(corpus)
    base = sorted(d for d, _ in corpus if d % 4 != 0)
    batch = sorted(d for d, _ in corpus if d % 4 == 0)
    got = {
        r["docid"]: (r["store_canonical"], r["batch_dup_of"], r["is_dup"])
        for r in out.collect()
    }
    assert sorted(got) == batch
    for d in batch:
        sc = [b for b in base if text[b] == text[d]]
        bd = [b for b in batch if b < d and text[b] == text[d]]
        assert got[d] == (
            min(sc) if sc else None,
            min(bd) if bd else None,
            1 if (sc or bd) else 0,
        ), d


def test_plan_streams_store_without_shuffle(spark, corpus, tmp_path):
    """The 100 TB contract: every join is a BroadcastHashJoin (store side
    streamed), no SortMergeJoin / ShuffledHashJoin anywhere in the final
    adaptive plan."""
    docs = _mk_docs(spark, corpus)
    path = str(tmp_path / "mh_store_plan")
    write_minhash_store(docs.filter(F.col("docid") % 4 != 0), path)
    out = incremental_minhash_flags(
        docs.filter(F.col("docid") % 4 == 0), read_minhash_store(spark, path)
    )
    out.collect()  # finalize AQE
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_two_batch_sequencing(spark, tmp_path):
    """Append survivors' bands after batch 1; an identical doc arriving in
    batch 2 must be flagged against the store, and batch-2 docs identical to
    a batch-1 DUP (whose bands were not appended) must still be flagged via
    the dup's canonical, which IS in the store."""
    t_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t_b = "one two three four five six seven eight nine ten eleven twelve"
    base = [(1, t_a)]
    batch1 = [(4, t_a), (8, t_b)]  # 4 dups store; 8 unique -> survivor
    batch2 = [(12, t_b), (16, t_a)]  # both must flag against the store
    path = str(tmp_path / "mh_store_seq")
    write_minhash_store(_mk_docs(spark, base), path)

    f1 = incremental_minhash_flags(
        _mk_docs(spark, batch1), read_minhash_store(spark, path)
    ).collect()
    flags1 = {r["docid"]: r["is_dup"] for r in f1}
    assert flags1 == {4: 1, 8: 0}
    survivors = [r for r in batch1 if flags1[r[0]] == 0]
    append_minhash_store(_mk_docs(spark, survivors), path, batch_id=1)

    f2 = incremental_minhash_flags(
        _mk_docs(spark, batch2), read_minhash_store(spark, path)
    ).collect()
    got2 = {r["docid"]: (r["store_match"], r["is_dup"]) for r in f2}
    assert got2 == {12: (8, 1), 16: (1, 1)}


def test_store_layout_partitioned_by_batch_and_band(spark, corpus, tmp_path):
    docs = _mk_docs(spark, corpus)
    path = str(tmp_path / "mh_layout")
    write_minhash_store(docs, path)
    import os

    assert sorted(p for p in os.listdir(path) if p.startswith("batch=")) == ["batch=0"]
    parts = sorted(
        p for p in os.listdir(os.path.join(path, "batch=0")) if p.startswith("band=")
    )
    assert parts == ["band=%d" % b for b in range(8)]
    # roundtrip preserves every (docid, band, band_key) row
    back = read_minhash_store(spark, path)
    orig = minhash_bands(docs)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orig.collect()))


def test_append_idempotent_under_replay(spark, corpus, tmp_path):
    """Re-running an append with the same batch_id (crash-replayed
    micro-batch) rewrites its batch partition instead of duplicating."""
    docs = _mk_docs(spark, corpus)
    path = str(tmp_path / "mh_replay")
    write_minhash_store(docs.filter(F.col("docid") % 4 != 0), path)
    batch = docs.filter(F.col("docid") % 4 == 0)
    n0 = read_minhash_store(spark, path).count()
    append_minhash_store(batch, path, batch_id=7)
    n1 = read_minhash_store(spark, path).count()
    append_minhash_store(batch, path, batch_id=7)
    n2 = read_minhash_store(spark, path).count()
    assert n1 == n2 > n0


def test_self_exclusion_keeps_verdicts_stable(spark, corpus, tmp_path):
    """After appending the batch's own survivors (the dirty-replay store
    state), is_dup verdicts are unchanged and survivors still match
    nothing (self-matches excluded); only a within-batch dup's attribution
    may shift from batch_match to store_match."""
    docs = _mk_docs(spark, corpus)
    path = str(tmp_path / "mh_selfex")
    write_minhash_store(docs.filter(F.col("docid") % 4 != 0), path)
    batch = docs.filter(F.col("docid") % 4 == 0)
    before = {
        r["docid"]: r
        for r in incremental_minhash_flags(
            batch, read_minhash_store(spark, path)
        ).collect()
    }
    keep = [d for d, r in before.items() if r["is_dup"] == 0]
    append_minhash_store(
        batch.filter(F.col("docid").isin(keep)), path, batch_id=1
    )
    after = {
        r["docid"]: r
        for r in incremental_minhash_flags(
            batch, read_minhash_store(spark, path)
        ).collect()
    }
    assert {d: r["is_dup"] for d, r in after.items()} == {
        d: r["is_dup"] for d, r in before.items()
    }
    for d in keep:
        assert tuple(after[d]) == tuple(before[d])


def test_exact_append_idempotent_under_replay(spark, corpus, tmp_path):
    """Exact-store twin of the minhash replay test: same batch_id rewrites
    its partition instead of appending duplicate (sha, canonical) rows."""
    docs = _mk_docs(spark, corpus)
    path = str(tmp_path / "sha_replay")
    write_exact_store(docs.filter(F.col("docid") % 4 != 0), path)
    batch = docs.filter(F.col("docid") % 4 == 0)
    n0 = read_exact_store(spark, path).count()
    append_exact_store(batch, path, batch_id=7)
    n1 = read_exact_store(spark, path).count()
    append_exact_store(batch, path, batch_id=7)
    n2 = read_exact_store(spark, path).count()
    assert n1 == n2 > n0


def test_exact_self_exclusion_keeps_verdicts_stable(spark, corpus, tmp_path):
    """Dirty-replay store state for the EXACT path: after the batch's own
    survivors land in the store, is_dup verdicts are unchanged — without
    the canonical_docid != docid guard every survivor would match itself
    and the whole batch would be flagged."""
    docs = _mk_docs(spark, corpus)
    path = str(tmp_path / "sha_selfex")
    write_exact_store(docs.filter(F.col("docid") % 4 != 0), path)
    batch = docs.filter(F.col("docid") % 4 == 0)
    before = {
        r["docid"]: r
        for r in incremental_exact_flags(
            batch, read_exact_store(spark, path)
        ).collect()
    }
    keep = [d for d, r in before.items() if r["is_dup"] == 0]
    assert keep, "corpus fixture must leave some exact survivors"
    append_exact_store(batch.filter(F.col("docid").isin(keep)), path, batch_id=1)
    after = {
        r["docid"]: r
        for r in incremental_exact_flags(
            batch, read_exact_store(spark, path)
        ).collect()
    }
    assert {d: r["is_dup"] for d, r in after.items()} == {
        d: r["is_dup"] for d, r in before.items()
    }
    for d in keep:
        assert tuple(after[d]) == tuple(before[d])


def test_compact_store_preserves_flags(spark, corpus, tmp_path):
    """Folding all batch partitions into one changes no row and no verdict;
    the superseded batch dirs are gone afterwards."""
    import os

    docs = _mk_docs(spark, corpus)
    path = str(tmp_path / "mh_compact")
    write_minhash_store(docs.filter(F.col("docid") % 4 == 1), path)
    append_minhash_store(docs.filter(F.col("docid") % 4 == 2), path, batch_id=1)
    append_minhash_store(docs.filter(F.col("docid") % 4 == 3), path, batch_id=2)
    batch = docs.filter(F.col("docid") % 4 == 0)
    rows_before = sorted(
        map(tuple, read_minhash_store(spark, path).collect())
    )
    before = sorted(
        map(tuple, incremental_minhash_flags(
            batch, read_minhash_store(spark, path)).collect())
    )
    new_b = compact_minhash_store(spark, path)
    parts = [d for d in os.listdir(path) if d.startswith("batch=")]
    assert parts == ["batch=%d" % new_b]
    assert sorted(map(tuple, read_minhash_store(spark, path).collect())) == rows_before
    after = sorted(
        map(tuple, incremental_minhash_flags(
            batch, read_minhash_store(spark, path)).collect())
    )
    assert after == before


def test_purge_docids_stops_store_matches(spark, corpus, tmp_path):
    """The takedown path: after purging a store doc's band rows, it no
    longer matches incoming batches (no ghost dedup verdicts); unrelated
    rows survive. Exact-store twin purges by canonical docid."""
    docs = _mk_docs(spark, corpus)
    mh = str(tmp_path / "mh_purge")
    ex = str(tmp_path / "sha_purge")
    # split ACROSS the %4 text families (the %4 split would leave the
    # store and batch with disjoint families — no store matches to purge)
    base = docs.filter(F.col("docid") < 16)
    write_minhash_store(base, mh)
    write_exact_store(base, ex)
    batch = docs.filter(F.col("docid") >= 16)
    before = {
        r["docid"]: r["store_match"]
        for r in incremental_minhash_flags(
            batch, read_minhash_store(spark, mh)).collect()
    }
    victims = sorted({m for m in before.values() if m is not None})
    assert victims, "fixture must produce at least one store match"
    gone = spark.createDataFrame([(v,) for v in victims], "docid long")
    compact_minhash_store(spark, mh, remove_docids=gone)
    left = read_minhash_store(spark, mh)
    assert left.filter(F.col("docid").isin(victims)).count() == 0
    assert left.count() > 0
    compact_exact_store(spark, ex, remove_docids=gone)
    assert (
        read_exact_store(spark, ex)
        .filter(F.col("canonical_docid").isin(victims)).count() == 0
    )


# ---------------------------------------------------------------------------
# randomized property: any corpus, any split
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
doc_strategy = st.lists(st.sampled_from(WORDS), min_size=0, max_size=6)


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(doc_strategy, min_size=2, max_size=12),
    mod=st.sampled_from([2, 3, 4]),
)
def test_incremental_flags_property(spark_holder, tmp_path_factory, docs, mod):
    """For ANY corpus (incl. empty/one-word docs — the degenerate-shingle
    path) and ANY residue split, flags equal the brute-force reference."""
    spark = spark_holder
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = _mk_docs(spark, rows)
    path = str(tmp_path_factory.mktemp("mh_prop") / "store")
    write_minhash_store(df.filter(F.col("docid") % mod != 0), path)
    out = incremental_minhash_flags(
        df.filter(F.col("docid") % mod == 0), read_minhash_store(spark, path)
    )
    got = {
        r["docid"]: (r["store_match"], r["batch_match"], r["is_dup"])
        for r in out.collect()
    }
    # brute force with the same split
    bands = {i: set() for i, _ in rows}
    for r in minhash_bands(df).collect():
        bands[r["docid"]].add((r["band"], r["band_key"]))
    base = sorted(d for d in bands if d % mod != 0)
    batch = sorted(d for d in bands if d % mod == 0)
    expect = {}
    for d in batch:
        sm = [b for b in base if bands[b] & bands[d]]
        bm = [b for b in batch if b < d and bands[b] & bands[d]]
        expect[d] = (
            min(sm) if sm else None,
            min(bm) if bm else None,
            1 if (sm or bm) else 0,
        )
    assert got == expect


@pytest.fixture(scope="module")
def spark_holder(spark):
    return spark
