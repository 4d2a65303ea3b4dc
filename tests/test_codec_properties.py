"""Hypothesis property tests for the codec kernels — the generalization of
the reference's decode∘encode = identity checks (Team1CompressorTest):
arbitrary inputs, not fixed samples. Pure numpy kernels, no Spark session.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mini_search_engine_spark.index.compress import (
    delta_varint_decode,
    delta_varint_encode,
    encode_flat_segments,
    encode_flat_segments_grouped,
    varint_decode,
    varint_encode,
)

non_neg = st.integers(min_value=0, max_value=2**45)


@settings(max_examples=200, deadline=None)
@given(st.lists(non_neg, max_size=200))
def test_varint_roundtrip(vals):
    assert list(varint_decode(varint_encode(vals))) == vals


@settings(max_examples=200, deadline=None)
@given(st.lists(non_neg, max_size=200))
def test_delta_varint_roundtrip_sorted(vals):
    vals = sorted(vals)
    assert list(delta_varint_decode(delta_varint_encode(vals))) == vals


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.lists(non_neg, min_size=0, max_size=40), min_size=1, max_size=30),
    st.randoms(use_true_random=False),
)
def test_grouped_encoder_equals_joined_segments(arrays, rnd):
    """encode_flat_segments_grouped must produce, per group, exactly the
    concatenation of its member segments' individual encodings — for ANY
    grouping of consecutive segments (this is the invariant the fused
    positional build relies on)."""
    arrays = [sorted(a) for a in arrays]
    lens = np.array([len(a) for a in arrays], dtype=np.int64)
    flat = (
        np.concatenate([np.asarray(a, dtype=np.int64) for a in arrays])
        if lens.sum()
        else np.empty(0, dtype=np.int64)
    )
    ends = np.cumsum(lens)
    starts = ends - lens
    per_seg = encode_flat_segments(flat, starts, ends, delta=True)

    # random consecutive grouping of the segments
    cuts = sorted(rnd.sample(range(1, len(arrays)), rnd.randint(0, len(arrays) - 1))) if len(arrays) > 1 else []
    bounds = [0] + cuts + [len(arrays)]
    gstarts = np.array(bounds[:-1], dtype=np.int64)
    gends = np.array(bounds[1:], dtype=np.int64)

    grouped = encode_flat_segments_grouped(flat, starts, ends, gstarts, gends, delta=True)
    expected = [b"".join(per_seg[a:b]) for a, b in zip(gstarts, gends)]
    assert grouped == expected
