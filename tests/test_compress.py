"""Codec parity: exact byte goldens from the reference compressor test
suite plus batch-kernel/scalar-kernel equivalence.

Sources: ``Team1CompressorTest.java:26-140`` (delta+varint byte goldens,
decode∘encode identity), ``NaiveCompressor.java:11-29`` (4-byte
big-endian). The Spark-side block codec (``encode_block_udf`` /
``encode_flat_segments``) must be byte-identical to the scalar reference
port, which these goldens pin.
"""

import random

import numpy as np
import pandas as pd
import pytest

from mini_search_engine_spark.index.compress import (
    _decode_batch,
    _encode_batch,
    delta_varint_decode,
    delta_varint_encode,
    encode_flat_segments,
    naive_decode,
    naive_encode,
    varint_decode,
    varint_encode,
)

# Team1CompressorTest.java:46-75 — exact (values → bytes) pairs. The
# reference encodes GAPS, so these are delta_varint goldens.
GOLDENS = [
    ([0], bytes([0x00])),
    ([2**31 - 1], bytes([0x87, 0xFF, 0xFF, 0xFF, 0x7F])),
    ([2**31 - 1, 2**31 - 1], bytes([0x87, 0xFF, 0xFF, 0xFF, 0x7F, 0x00])),
    ([0, 2**31 - 1], bytes([0x00, 0x87, 0xFF, 0xFF, 0xFF, 0x7F])),
    ([1, 1, 1], bytes([0x01, 0x00, 0x00])),
    ([1, 2, 3], bytes([0x01, 0x01, 0x01])),
    (
        [3, 3, 7, 23, 23, 65, 294, 2190, 238923],
        bytes([0x03, 0x00, 0x04, 0x10, 0x00, 0x2A, 0x81, 0x65, 0x8E, 0x68, 0x8E, 0xB9, 0x3D]),
    ),
]


@pytest.mark.parametrize("values,expected", GOLDENS)
def test_delta_varint_byte_goldens(values, expected):
    assert delta_varint_encode(values) == expected
    assert list(delta_varint_decode(expected)) == values


def test_single_byte_goldens():
    # Team1CompressorTest.java:82-90 — 0..127 each encode to one byte
    for i in range(128):
        assert delta_varint_encode([i]) == bytes([i])


def test_multi_byte_goldens():
    # Team1CompressorTest.java:95-110
    assert delta_varint_encode([128]) == bytes([0b10000001, 0b00000000])
    assert delta_varint_encode([16384]) == bytes([0b10000001, 0b10000000, 0b00000000])


def test_naive_codec_4byte_be():
    # NaiveCompressor.java:11-29 — 4-byte big-endian ints, no compression
    assert naive_encode([1, 256]) == bytes([0, 0, 0, 1, 0, 0, 1, 0])
    assert list(naive_decode(bytes([0, 0, 0, 1, 0, 0, 1, 0]))) == [1, 256]


def test_roundtrip_property():
    rng = random.Random(1234)
    for _ in range(50):
        n = rng.choice([0, 1, 2, 3, 17, 400])
        vals = sorted(rng.sample(range(2**40), n))
        assert list(delta_varint_decode(delta_varint_encode(vals))) == vals
        unsorted = [rng.randrange(2**40) for _ in range(n)]
        assert list(varint_decode(varint_encode(unsorted))) == unsorted


def test_batch_kernels_match_scalar():
    """The Arrow-batch segmented kernels must be byte-identical to the
    scalar reference port for every row."""
    rng = random.Random(7)
    arrays = []
    for _ in range(300):
        n = rng.choice([0, 1, 2, 5, 50, 1000])
        arrays.append(sorted(rng.sample(range(10**7), n)))
    s = pd.Series(arrays, dtype=object)
    enc = _encode_batch(s, delta=True)
    assert enc == [delta_varint_encode(a) for a in arrays]
    dec = _decode_batch(pd.Series(enc), delta=True)
    for a, d in zip(arrays, dec):
        assert list(d) == a

    flats = [[rng.randrange(2**40) for _ in range(rng.choice([0, 1, 3, 100]))] for _ in range(300)]
    s2 = pd.Series(flats, dtype=object)
    enc2 = _encode_batch(s2, delta=False)
    assert enc2 == [varint_encode(a) for a in flats]
    dec2 = _decode_batch(pd.Series(enc2), delta=False)
    for a, d in zip(flats, dec2):
        assert list(d) == a


def test_flat_segments_match_per_array():
    """encode_flat_segments over tiled boundaries == per-array encode."""
    rng = random.Random(99)
    arrays = [sorted(rng.sample(range(10**6), rng.choice([1, 4, 64]))) for _ in range(100)]
    lens = np.array([len(a) for a in arrays], dtype=np.int64)
    flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in arrays])
    ends = np.cumsum(lens)
    starts = ends - lens
    got = encode_flat_segments(flat, starts, ends, delta=True)
    assert got == [delta_varint_encode(a) for a in arrays]


def test_encode_rejects_bad_input():
    with pytest.raises(ValueError):
        delta_varint_encode([5, 3])  # decreasing → negative gap
    with pytest.raises(ValueError):
        _encode_batch(pd.Series([[3, 1]], dtype=object), delta=True)


def test_positions_codec_roundtrip():
    from mini_search_engine_spark.index.compress import (
        _decode_positions_batch,
        _encode_positions_batch,
    )

    rng = random.Random(5)
    rows, tfs = [], []
    for _ in range(80):
        nposts = rng.choice([0, 1, 3, 20])
        row = [sorted(rng.sample(range(5000), rng.randrange(1, 9))) for _ in range(nposts)]
        rows.append(row)
        tfs.append([len(p) for p in row])
    enc = _encode_positions_batch(pd.Series(rows, dtype=object))
    dec = _decode_positions_batch(pd.Series(enc), pd.Series(tfs, dtype=object))
    for row, got in zip(rows, dec):
        assert [list(g) for g in got] == row


def test_compressed_positional_phrase_equal(spark, tiny_corpus):
    from mini_search_engine_spark.corpus import load_corpus
    from mini_search_engine_spark.index.build import build_index
    from mini_search_engine_spark.search import search_phrase

    corpus = load_corpus(tiny_corpus)
    plain = build_index(corpus, analyzer="porter", positional=True, block_span=4)
    comp = build_index(corpus, analyzer="porter", positional=True, block_span=4, compress=True)
    assert "positions_bytes" in comp.postings.columns
    for phrase in ("information retrieval", "cat dog", "quick brown fox"):
        a = [r["docid"] for r in search_phrase(plain, phrase).collect()]
        b = [r["docid"] for r in search_phrase(comp, phrase).collect()]
        assert a == b, (phrase, a, b)
    # compression actually shrinks the positions payload vs 4-byte naive
    import pyspark.sql.functions as F

    sz = comp.postings.agg(F.sum(F.octet_length("positions_bytes"))).collect()[0][0]
    n_positions = comp.decoded().postings.select(
        F.sum(F.aggregate(F.transform("positions", lambda p: F.size(p)), F.lit(0), lambda acc, x: acc + x))
    ).collect()[0][0]
    assert sz < 4 * n_positions
