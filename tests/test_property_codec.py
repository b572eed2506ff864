"""Property-based tests (hypothesis) for the codec + quantization core."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from whoosh_novo_ray.codec import (
    decode_positions_flat,
    delta_encode_with_resets,
    encode_positions,
    varint_decode,
    varint_encode,
)
from whoosh_novo_ray.lengths import LENGTH_TABLE, bytes_to_lengths, lengths_to_bytes

u64s = st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=300)


@settings(max_examples=150, deadline=None)
@given(u64s)
def test_varint_roundtrip(vals):
    v = np.array(vals, np.uint64)
    buf, nb = varint_encode(v)
    assert int(nb.sum()) == len(buf)
    out = varint_decode(buf.tobytes(), len(v))
    assert (out == v).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500),
    st.integers(min_value=1, max_value=64),
)
def test_delta_block_roundtrip(ids_raw, block):
    ids = np.unique(np.array(ids_raw, np.uint64))
    resets = np.zeros(len(ids), bool)
    resets[::block] = True
    d = delta_encode_with_resets(ids, resets)
    bounds = np.flatnonzero(resets).tolist() + [len(ids)]
    rec = np.concatenate(
        [np.cumsum(d[a:b], dtype=np.uint64) for a, b in zip(bounds[:-1], bounds[1:])]
    )
    assert (rec == ids).all()


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=0, max_value=10**6), min_size=0, max_size=20
        ),
        min_size=1,
        max_size=60,
    )
)
def test_positions_roundtrip(ragged):
    lists = [np.unique(np.array(r, np.uint64)) for r in ragged]
    counts = np.array([len(x) for x in lists], np.int64)
    flat = (
        np.concatenate(lists) if counts.sum() else np.empty(0, np.uint64)
    )
    buf, per = encode_positions(flat, counts)
    got_flat, got_counts = decode_positions_flat(buf.tobytes(), counts)
    assert (got_counts == counts).all()
    assert (got_flat == flat).all()
    assert int(per.sum()) == len(buf)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=10**8))
def test_length_quantization_properties(length):
    b = int(lengths_to_bytes(np.array([length]))[0])
    assert 0 <= b <= 255
    decoded = int(bytes_to_lengths(np.array([b]))[0])
    # decoded is the smallest table entry >= length (bisect_left), capped
    if length >= int(LENGTH_TABLE[255]):
        assert decoded == int(LENGTH_TABLE[255])
    else:
        assert decoded >= length
        if b > 0:
            assert int(LENGTH_TABLE[b - 1]) < length


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=200))
def test_length_quantization_monotone(lengths):
    arr = np.sort(np.array(lengths, np.int64))
    bs = lengths_to_bytes(arr)
    assert (np.diff(bs.astype(np.int16)) >= 0).all()
