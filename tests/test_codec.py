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


# ---- property tests (hypothesis) ---------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=0, max_size=500
    )
)
def test_varint_roundtrip_property(vals):
    import numpy as np

    from solrplugins_spark.index.codec import varint_decode, varint_encode

    arr = np.array(vals, dtype=np.uint64)
    got, end = varint_decode(varint_encode(arr))
    assert np.array_equal(got, arr)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=100000),  # doc gap
            st.integers(min_value=1, max_value=1000),    # tf
        ),
        min_size=1,
        max_size=400,
    )
)
def test_postings_roundtrip_property(gaps_tfs):
    import numpy as np

    from solrplugins_spark.index.codec import decode_postings, encode_postings

    gaps = np.array([g for g, _ in gaps_tfs], dtype=np.int64)
    docs = np.cumsum(gaps)
    tfs = np.array([t for _, t in gaps_tfs], dtype=np.int64)
    data, block_last, block_max, block_off = encode_postings(docs, tfs)
    gd, gt = decode_postings(data)
    assert np.array_equal(gd, docs) and np.array_equal(gt, tfs)
    # block metadata invariants
    assert block_last[-1] == docs[-1]
    assert all(m >= 1 for m in block_max)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=300),
    st.randoms(use_true_random=False),
)
def test_positions_roundtrip_property(tfs_list, rnd):
    import numpy as np

    from solrplugins_spark.index.codec import decode_positions, encode_positions

    tfs = np.array(tfs_list, dtype=np.int64)
    pos_lists = []
    for t in tfs:
        start = rnd.randrange(0, 10000)
        gaps = [rnd.randrange(1, 50) for _ in range(int(t))]
        pos_lists.append(np.cumsum([start] + gaps)[:-1] + 0)
    data, pos_off = encode_positions(pos_lists, tfs)
    flat = decode_positions(data, tfs)
    assert np.array_equal(flat, np.concatenate(pos_lists))


def test_decode_block_positions_matches_full():
    """Pruned per-block position decode == the corresponding slice of
    the full decode, for every block subset."""
    import numpy as np

    from solrplugins_spark.index.codec import (
        BLOCK,
        decode_block_positions,
        decode_blocks,
        decode_positions,
        encode_positions,
        encode_postings,
    )

    rng = np.random.default_rng(9)
    n = 400  # 4 blocks (128*3 + 16)
    docs = np.cumsum(rng.integers(1, 30, size=n))
    tfs = rng.integers(1, 6, size=n)
    pos_lists = [np.cumsum(rng.integers(1, 40, size=int(t))) for t in tfs]
    data, block_last, block_max, block_off = encode_postings(docs, tfs)
    pos_data, pos_off = encode_positions(pos_lists, tfs)
    full = decode_positions(pos_data, tfs)

    bounds = np.zeros(n + 1, np.int64)
    np.cumsum(tfs, out=bounds[1:])
    for need in ([0], [1, 3], [2], [0, 1, 2, 3]):
        need = np.asarray(need)
        bdocs, btfs = decode_blocks(data, need, block_off, block_last, n)
        counts = [min(BLOCK, n - int(i) * BLOCK) for i in need]
        cb = np.cumsum([0] + counts)
        tfs_by_block = [btfs[cb[j]:cb[j + 1]] for j in range(len(need))]
        got = decode_block_positions(pos_data, need, pos_off, tfs_by_block)
        want = np.concatenate(
            [
                full[bounds[int(i) * BLOCK]: bounds[min((int(i) + 1) * BLOCK, n)]]
                for i in need
            ]
        )
        assert np.array_equal(got, want), need


def test_encode_bytes_identical_to_per_block_reference():
    """r07 vectorized encode_postings must be byte-identical to the
    original per-block loop (the on-disk format is frozen: resumable
    builds diff bytes), and the range-based block decode must match
    full decode on every block subset shape."""
    import numpy as np

    from solrplugins_spark.index.codec import (
        BLOCK,
        decode_blocks,
        decode_postings,
        encode_postings,
        varint_encode,
    )

    def encode_ref(doc_ids, tfs):
        doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
        tfs = np.ascontiguousarray(tfs, dtype=np.int64)
        n = doc_ids.size
        deltas = np.empty(n, np.uint64)
        if n:
            deltas[0] = np.uint64(doc_ids[0])
            deltas[1:] = np.diff(doc_ids).astype(np.uint64)
        nblocks = (n + BLOCK - 1) // BLOCK
        header = varint_encode(np.array([n], np.uint64))
        parts = [header]
        bl = np.empty(nblocks, np.int64)
        bm = np.empty(nblocks, np.int32)
        bo = np.empty(nblocks, np.int64)
        pos = header.size
        for i in range(nblocks):
            lo, hi = i * BLOCK, min((i + 1) * BLOCK, n)
            bl[i] = doc_ids[hi - 1]
            bm[i] = tfs[lo:hi].max()
            bo[i] = pos
            ed = varint_encode(deltas[lo:hi])
            et = varint_encode(tfs[lo:hi].astype(np.uint64))
            parts.append(ed)
            parts.append(et)
            pos += ed.size + et.size
        return np.concatenate(parts).tobytes(), bl, bm, bo

    rng = np.random.default_rng(7)
    for n in (1, 127, 128, 129, 1000, 20000):
        docs = np.sort(
            rng.choice(5_000_000, size=n, replace=False)
        ).astype(np.int64)
        tfs = rng.integers(1, 300, size=n).astype(np.int64)
        d_new, bl_n, bm_n, bo_n = encode_postings(docs, tfs)
        d_old, bl_o, bm_o, bo_o = encode_ref(docs, tfs)
        assert d_new == d_old, n
        assert np.array_equal(bl_n, bl_o)
        assert np.array_equal(bm_n, bm_o)
        assert np.array_equal(bo_n, bo_o)
        dd, tt = decode_postings(d_new)
        assert np.array_equal(dd, docs) and np.array_equal(tt, tfs)
        nb = len(bl_n)
        for ids in (
            np.array([0]),
            np.array([nb - 1]),
            np.arange(nb),
            np.unique(rng.integers(0, nb, size=min(nb, 5))),
        ):
            got_d, got_t = decode_blocks(d_new, ids, bo_n, bl_n, n)
            exp_d = np.concatenate(
                [docs[i * BLOCK:(i + 1) * BLOCK] for i in ids]
            )
            exp_t = np.concatenate(
                [tfs[i * BLOCK:(i + 1) * BLOCK] for i in ids]
            )
            assert np.array_equal(got_d, exp_d), (n, ids)
            assert np.array_equal(got_t, exp_t), (n, ids)
