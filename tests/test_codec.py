"""Codec round-trip tests (reference analog: DiffByteUtilsTest.java)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gazetteer_spark.index.codec import (
    BLOCK,
    _varbyte_decode,
    _varbyte_encode,
    decode_block_meta,
    decode_blocks,
    decode_postings,
    encode_blocks_grouped,
    encode_postings,
)

CASES = [
    ([5], [1]),                                           # single posting
    (list(range(1000)), [1] * 1000),                      # dense delta=1, 8 blocks
    ([0, 2**40, 2**62, 2**62 + 1], [1, 2, 3, 2**31 - 1]),  # sparse 64-bit gaps
    ([-(2**62), -5, 0, 7], [1, 1, 1, 1]),                 # negative docids (xxhash64)
    ([-(2**63), 2**63 - 1], [1, 1]),                      # extreme range
    (list(range(0, 2**40, 2**33))[:300], [7] * 128),      # multi-block big gaps
]
CASES[-1] = (CASES[-1][0][:128], [7] * 128)  # exactly one full block


@pytest.mark.parametrize("docids,tfs", CASES)
def test_roundtrip(docids, tfs):
    tfs = tfs[: len(docids)]
    buf, meta = encode_postings(np.array(docids), np.array(tfs))
    d, t = decode_postings(buf)
    assert d.tolist() == docids
    assert t.tolist() == tfs


def test_empty():
    buf, meta = encode_postings(np.array([], dtype=np.int64), np.array([]))
    assert buf == b"" and meta == b""
    d, t = decode_postings(b"")
    assert len(d) == 0 and len(t) == 0


def test_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_postings(np.array([3, 1]), np.array([1, 1]))


def test_compression_beats_naive():
    docids = np.arange(10_000, dtype=np.int64) * 3 + 1_000_000
    tfs = np.ones(10_000, dtype=np.int64)
    buf, meta = encode_postings(docids, tfs)
    assert len(buf) + len(meta) < 10_000 * 12  # naive = 8B docid + 4B tf


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1, max_size=400, unique=True,
    ),
    st.data(),
)
def test_roundtrip_property(docids, data):
    docids = sorted(docids)
    tfs = [data.draw(st.integers(min_value=1, max_value=2**31 - 1)) for _ in docids]
    buf, meta = encode_postings(np.array(docids, dtype=np.int64), np.array(tfs))
    d, t = decode_postings(buf)
    assert d.tolist() == docids
    assert t.tolist() == tfs


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varbyte_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert _varbyte_decode(_varbyte_encode(arr)).tolist() == vals


def test_block_meta_and_selective_decode():
    n = BLOCK * 2 + 10
    docids = np.arange(n, dtype=np.int64) * 5
    tfs = np.arange(1, n + 1, dtype=np.int64)
    dls = np.arange(100, 100 + n, dtype=np.int64)
    buf, meta = encode_postings(docids, tfs, dls)
    last, max_tf, min_dl, ends = decode_block_meta(meta)
    assert last.tolist() == [(BLOCK - 1) * 5, (2 * BLOCK - 1) * 5, (n - 1) * 5]
    assert max_tf.tolist() == [BLOCK, 2 * BLOCK, n]
    assert min_dl.tolist() == [100, 100 + BLOCK, 100 + 2 * BLOCK]
    assert ends[-1] == len(buf)
    # decode only block 1
    d, t = decode_blocks(buf, ends, np.array([1]))
    assert d.tolist() == docids[BLOCK : 2 * BLOCK].tolist()
    assert t.tolist() == tfs[BLOCK : 2 * BLOCK].tolist()
    # blocks 0 and 2
    d, t = decode_blocks(buf, ends, np.array([0, 2]))
    expect = np.concatenate([docids[:BLOCK], docids[2 * BLOCK :]])
    assert d.tolist() == expect.tolist()


def test_grouped_encode_equals_per_list():
    rng = np.random.RandomState(7)
    lists = []
    for ln in (1, 3, 130, 256, 300, 77):
        pool = np.unique(rng.randint(0, 10**9, size=ln * 3).astype(np.int64))
        ids = np.sort(rng.permutation(pool)[:ln])
        tfs = rng.randint(1, 50, size=ln).astype(np.int64)
        dls = rng.randint(10, 500, size=ln).astype(np.int64)
        lists.append((ids, tfs, dls))
    cat_ids = np.concatenate([x[0] for x in lists])
    cat_tfs = np.concatenate([x[1] for x in lists])
    cat_dls = np.concatenate([x[2] for x in lists])
    lens = np.array([len(x[0]) for x in lists])
    ends = np.cumsum(lens)
    starts = ends - lens
    posts, metas = encode_blocks_grouped(cat_ids, cat_tfs, cat_dls, starts, ends)
    for (ids, tfs, dls), p, m in zip(lists, posts, metas):
        p1, m1 = encode_postings(ids, tfs, dls)
        assert p == p1 and m == m1
        d, t = decode_postings(p)
        assert d.tolist() == ids.tolist() and t.tolist() == tfs.tolist()


def test_positions_encode_rejects_maxpos_overflow():
    """A document with ≥ 2^21 analyzed tokens must be rejected at positional
    encode time — silently encoding it would alias the packed
    rank*MAXPOS+pos keys the phrase/NEAR executors rely on."""
    from gazetteer_spark.index.codec import MAXPOS, encode_positions_grouped

    positions = np.array([0, 5, MAXPOS], dtype=np.int64)  # one run of 3
    tfs = np.array([3], dtype=np.int64)
    with pytest.raises(ValueError, match="MAXPOS"):
        encode_positions_grouped(
            positions, tfs, np.array([0], np.int64), np.array([1], np.int64)
        )
    # one below the cap encodes fine
    ok = encode_positions_grouped(
        np.array([0, 5, MAXPOS - 1], dtype=np.int64), tfs,
        np.array([0], np.int64), np.array([1], np.int64)
    )
    assert len(ok) == 1 and len(ok[0]) > 0


def test_delindex_merges_duplicate_generations():
    """One generation may contribute MULTIPLE dels buffers (per-shard dels
    rows replicated into a term-layout bucket) — they merge instead of
    falling into ambiguous ndarray comparison on the gen tie."""
    from gazetteer_spark.index.codec import DelIndex

    b1, _ = encode_postings(np.array([3, 7]), np.array([1, 1]))
    b2, _ = encode_postings(np.array([5, 7]), np.array([1, 1]))
    b3, _ = encode_postings(np.array([9]), np.array([1]))
    d = DelIndex([(2, b1), (2, b2), (4, b3)])
    assert d.mask_for(1).tolist() == [3, 5, 7, 9]   # both gen-2 + gen-4
    assert d.mask_for(3).tolist() == [9]            # only newer gen masks
    keep = d.keep_mask(1, np.array([1, 3, 5, 8, 9]))
    assert keep.tolist() == [True, False, False, True, False]
