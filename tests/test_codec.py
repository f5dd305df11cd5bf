"""Posting-codec invariants (SURVEY.md §5.3): encode->decode identity,
block-max metadata correctness, varint round-trips."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from solrplugins_spark.index.codec import (
    BLOCK,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=50, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    enc = varint_encode(arr)
    dec, end = varint_decode(enc)
    assert end == len(enc)
    np.testing.assert_array_equal(dec, arr)


@given(
    st.lists(
        st.tuples(st.integers(0, 10**12), st.integers(1, 1000)),
        min_size=0,
        max_size=500,
        unique_by=lambda x: x[0],
    )
)
@settings(max_examples=50, deadline=None)
def test_postings_roundtrip(pairs):
    pairs.sort()
    docs = np.array([p[0] for p in pairs], dtype=np.int64)
    tfs = np.array([p[1] for p in pairs], dtype=np.int64)
    data, block_last, block_max, block_off = encode_postings(docs, tfs)
    d2, t2 = decode_postings(data)
    np.testing.assert_array_equal(d2, docs)
    np.testing.assert_array_equal(t2, tfs)
    # block metadata
    n = len(docs)
    assert len(block_last) == (n + BLOCK - 1) // BLOCK
    for i in range(len(block_last)):
        lo, hi = i * BLOCK, min((i + 1) * BLOCK, n)
        assert block_last[i] == docs[hi - 1]
        assert block_max[i] == tfs[lo:hi].max()
    # block-addressed decode: every subset of blocks round-trips
    if n:
        from solrplugins_spark.index.codec import decode_blocks
        ids = np.arange(len(block_last))
        for subset in (ids[::2], ids[1::2], ids):
            bd, bt = decode_blocks(data, subset, block_off, block_last, n)
            want_docs = np.concatenate(
                [docs[i * BLOCK : (i + 1) * BLOCK] for i in subset]
            ) if len(subset) else np.zeros(0, np.int64)
            np.testing.assert_array_equal(bd, want_docs)


def test_empty_postings():
    data, bl, bm, bo = encode_postings(np.array([], np.int64), np.array([], np.int64))
    d, t = decode_postings(data)
    assert len(d) == 0 and len(t) == 0 and len(bl) == 0
