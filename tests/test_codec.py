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
    block_meta,
    decode_block_meta,
    decode_postings,
    encode_postings,
)

CASES = [
    ([5], [1]),                                           # single posting
    (list(range(1000)), [1] * 1000),                      # dense delta=1
    ([0, 2**40, 2**62, 2**62 + 1], [1, 2, 3, 2**31 - 1]),  # sparse 64-bit gaps
    ([-(2**62), -5, 0, 7], [1, 1, 1, 1]),                 # negative docids (xxhash64)
    ([-(2**63), 2**63 - 1], [1, 1]),                      # extreme range
]


@pytest.mark.parametrize("docids,tfs", CASES)
def test_roundtrip(docids, tfs):
    buf = encode_postings(np.array(docids), np.array(tfs))
    d, t = decode_postings(buf)
    assert d.tolist() == docids
    assert t.tolist() == tfs


def test_empty():
    assert encode_postings(np.array([], dtype=np.int64), np.array([])) == b""
    d, t = decode_postings(b"")
    assert len(d) == 0 and len(t) == 0


def test_rejects_unsorted():
    with pytest.raises(ValueError):
        encode_postings(np.array([3, 1]), np.array([1, 1]))


def test_compression_beats_naive():
    docids = np.arange(10_000, dtype=np.int64) * 3 + 1_000_000
    tfs = np.ones(10_000, dtype=np.int64)
    buf = encode_postings(docids, tfs)
    assert len(buf) < 10_000 * 12  # naive = 8B docid + 4B tf


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1, max_size=300, unique=True,
    ),
    st.data(),
)
def test_roundtrip_property(docids, data):
    docids = sorted(docids)
    tfs = [data.draw(st.integers(min_value=1, max_value=2**31 - 1)) for _ in docids]
    buf = encode_postings(np.array(docids, dtype=np.int64), np.array(tfs))
    d, t = decode_postings(buf)
    assert d.tolist() == docids
    assert t.tolist() == tfs


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=200))
def test_varbyte_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert _varbyte_decode(_varbyte_encode(arr)).tolist() == vals


def test_block_meta():
    n = BLOCK * 2 + 10
    docids = np.arange(n, dtype=np.int64)
    tfs = np.arange(1, n + 1, dtype=np.int64)
    dls = np.arange(100, 100 + n, dtype=np.int64)
    last, max_tf, min_dl = decode_block_meta(block_meta(docids, tfs, dls))
    assert last.tolist() == [BLOCK - 1, 2 * BLOCK - 1, n - 1]
    assert max_tf.tolist() == [BLOCK, 2 * BLOCK, n]
    assert min_dl.tolist() == [100, 100 + BLOCK, 100 + 2 * BLOCK]
