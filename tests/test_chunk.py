"""Chunking + packing (ops/chunk.py) vs plain-python references, plus the
determinism-under-repartitioning property packing promises."""

import re

import pytest
from pyspark.sql import functions as F

from mini_search_engine_spark.ops import chunk_documents, pack_sequences

SCHEMA = "docid long, text string"


def _ref_chunks(text, cs, ov):
    toks = [t for t in re.split(r"\s+", text) if t]
    if not toks:
        return []
    step = cs - ov
    starts = range(0, max(len(toks) - ov, 1), step)
    return [
        (i, len(toks[s : s + cs]), " ".join(toks[s : s + cs]))
        for i, s in enumerate(starts)
    ]


def _ref_pack(rows, max_tokens):
    """rows: [(docid, chunk_id, n_tokens)] pre-sorted; returns the greedy
    first-fit bins as [(n_tokens, [(docid, chunk_id), ...])]."""
    bins, used = [], 0
    for d, c, n in rows:
        if not bins or (used > 0 and used + n > max_tokens):
            bins.append([0, []])
            used = 0
        used += n
        bins[-1][0] += n
        bins[-1][1].append((d, c))
    return [(n, parts) for n, parts in bins]


@pytest.fixture(scope="module")
def docs(spark):
    words = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))  # noqa: E731
    rows = [
        (0, words(40, "a")),
        (1, words(16, "b")),        # exactly one window
        (2, words(17, "c")),        # one token past a window
        (3, "single"),
        (4, "   "),                 # zero tokens → no chunks
        (5, words(5, "e")),
        (6, "x  y\t z\n w"),        # mixed whitespace runs
        (7, words(100, "g")),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_chunks_match_python_reference(spark, docs):
    got = {
        (r["docid"], r["chunk_id"]): (r["n_tokens"], r["chunk"])
        for r in chunk_documents(docs, chunk_size=16, overlap=4).collect()
    }
    want = {}
    for d, text in docs.collect():
        for cid, n, chunk in _ref_chunks(text, 16, 4):
            want[(d, cid)] = (n, chunk)
    assert got == want
    assert not any(d == 4 for d, _ in got)  # whitespace-only doc: nothing


def test_chunk_overlap_property(spark, docs):
    # consecutive full windows share exactly `overlap` tokens
    rows = sorted(
        chunk_documents(docs.filter("docid = 7"), chunk_size=16, overlap=4).collect(),
        key=lambda r: r["chunk_id"],
    )
    for a, b in zip(rows, rows[1:]):
        ta, tb = a["chunk"].split(" "), b["chunk"].split(" ")
        assert ta[-4:] == tb[:4]


def test_chunk_zero_overlap_partitions_exactly(spark, docs):
    rows = chunk_documents(docs.filter("docid = 0"), chunk_size=8, overlap=0).collect()
    toks = [t for r in sorted(rows, key=lambda r: r["chunk_id"]) for t in r["chunk"].split(" ")]
    assert toks == [f"a{i}" for i in range(40)]


def test_chunk_validates_params(spark, docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=8, overlap=8)


def test_pack_matches_python_reference(spark, docs):
    chunks = chunk_documents(docs, chunk_size=16, overlap=4)
    got = pack_sequences(chunks, max_tokens=40, n_buckets=4).collect()
    by_bucket = {}
    for r in chunks.withColumn(
        "bucket", F.pmod(F.xxhash64("docid"), F.lit(4))
    ).collect():
        by_bucket.setdefault(r["bucket"], []).append(
            (r["docid"], r["chunk_id"], r["n_tokens"])
        )
    want = set()
    for b, rows in by_bucket.items():
        for seq_id, (n, parts) in enumerate(_ref_pack(sorted(rows), 40)):
            want.add((b, seq_id, n, tuple(parts)))
    assert {
        (r["bucket"], r["seq_id"], r["n_tokens"],
         tuple((p["docid"], p["chunk_id"]) for p in r["parts"]))
        for r in got
    } == want
    # every sequence respects the budget unless it is a single oversize chunk
    for r in got:
        assert r["n_tokens"] <= 40 or len(r["parts"]) == 1


def test_pack_deterministic_under_repartitioning(spark, docs):
    chunks = chunk_documents(docs, chunk_size=16, overlap=4)

    def canon(df):
        return sorted(
            (r["bucket"], r["seq_id"], r["n_tokens"],
             tuple((p["docid"], p["chunk_id"]) for p in r["parts"]))
            for r in df.collect()
        )

    a = canon(pack_sequences(chunks.repartition(7), max_tokens=64, n_buckets=8))
    b = canon(pack_sequences(chunks.coalesce(1), max_tokens=64, n_buckets=8))
    assert a == b
    # coverage: every chunk appears in exactly one sequence
    all_parts = [p for _, _, _, parts in a for p in parts]
    assert len(all_parts) == len(set(all_parts)) == chunks.count()
