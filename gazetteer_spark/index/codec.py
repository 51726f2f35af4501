"""Delta + varbyte posting-list codec, vectorized in numpy.

Reference parity: gazetteer's compact bit-packed ID codec with
length-prefixed structure (`diff/indx/ByteUtils.java:155-218` encode,
`292-315` dictionary tails) — ours is the classic IR posting codec:
sorted docids → zigzag first value + unsigned deltas → 7-bit varbyte;
tfs → varbyte. Block-max metadata (block=128 postings) stores per block
the last docid and the maximum BM25 tf-normalization
``tf*(k1+1)/(tf + k1*(1-b+b*doclen/avgdl))`` as float64, so a query-time
upper bound ``idf * block_max`` is exact-safe (same float ops as scoring).

Everything is numpy array-at-a-time — no per-element Python in encode or
decode (BASELINE input_hint: vectorized throughout).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128

_THRESHOLDS = [np.uint64(1) << np.uint64(7 * i) for i in range(1, 10)]


def _varbyte_encode(values: np.ndarray) -> bytes:
    """values: uint64 array → varbyte bytes (7 data bits, MSB=continuation)."""
    v = values.astype(np.uint64, copy=False)
    n = len(v)
    if n == 0:
        return b""
    nbytes = np.ones(n, dtype=np.int64)
    for t in _THRESHOLDS:
        nbytes += (v >= t).astype(np.int64)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    out = np.zeros(total, dtype=np.uint8)
    for j in range(10):
        mask = nbytes > j
        if not mask.any():
            break
        pos = starts[mask] + j
        chunk = (v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nbytes[mask] - 1 > j).astype(np.uint8) << 7
        out[pos] = chunk.astype(np.uint8) | cont
    return out.tobytes()


def _varbyte_decode(buf: bytes) -> np.ndarray:
    """varbyte bytes → uint64 array (vectorized segmented shift-or)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    # value id for each byte: 0-based index of the value it belongs to
    vid = np.zeros(len(b), dtype=np.int64)
    vid[1:] = np.cumsum(is_last[:-1])
    nvals = int(vid[-1]) + 1
    # byte position within its value
    starts = np.zeros(nvals, dtype=np.int64)
    starts[1:] = np.nonzero(is_last[:-1])[0] + 1
    bytepos = np.arange(len(b), dtype=np.int64) - starts[vid]
    out = np.zeros(nvals, dtype=np.uint64)
    np.bitwise_or.at(
        out, vid, (b & np.uint8(0x7F)).astype(np.uint64) << (7 * bytepos).astype(np.uint64)
    )
    return out


def _zigzag(v: np.int64) -> np.uint64:
    return np.uint64((int(v) << 1) ^ (int(v) >> 63)) & np.uint64(0xFFFFFFFFFFFFFFFF)


def _unzigzag(u: np.uint64) -> int:
    u = int(u)
    return (u >> 1) ^ -(u & 1)


def encode_postings(docids: np.ndarray, tfs: np.ndarray) -> bytes:
    """docids: sorted int64 (strictly increasing), tfs: int. → bytes.

    Layout: varbyte[ zigzag(docid0), delta1.., tf0.., tf(n-1) ] — a single
    varbyte stream of 2n values (deltas then tfs would split cache-friendly;
    we interleave sections: first n are docid deltas, next n are tfs).
    """
    d = np.asarray(docids, dtype=np.int64)
    t = np.asarray(tfs, dtype=np.int64)
    if len(d) == 0:
        return b""
    if len(d) > 1 and not (d[1:] > d[:-1]).all():
        raise ValueError("docids must be strictly increasing")
    deltas = np.empty(len(d), dtype=np.uint64)
    deltas[0] = _zigzag(d[0])
    if len(d) > 1:
        deltas[1:] = (d[1:] - d[:-1]).astype(np.uint64)
    stream = np.concatenate([deltas, t.astype(np.uint64)])
    return _varbyte_encode(stream)


def decode_postings(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """bytes → (docids int64 sorted, tfs int32)."""
    stream = _varbyte_decode(buf)
    if len(stream) == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int32)
    n = len(stream) // 2
    deltas, tfs = stream[:n], stream[n:]
    first = _unzigzag(deltas[0])
    gaps = np.zeros(n, dtype=np.int64)
    gaps[1:] = deltas[1:].astype(np.int64)
    docids = first + np.cumsum(gaps)
    return docids.astype(np.int64), tfs.astype(np.int32)


def block_meta(docids: np.ndarray, tfnorm: np.ndarray) -> bytes:
    """Per-block (last_docid int64, max_tfnorm float64), block=128 postings."""
    n = len(docids)
    if n == 0:
        return b""
    nblocks = (n + BLOCK - 1) // BLOCK
    last = np.empty(nblocks, dtype=np.int64)
    mx = np.empty(nblocks, dtype=np.float64)
    for bi in range(nblocks):
        sl = slice(bi * BLOCK, min((bi + 1) * BLOCK, n))
        last[bi] = docids[sl][-1]
        mx[bi] = tfnorm[sl].max()
    out = np.empty(nblocks, dtype=[("last", "<i8"), ("max", "<f8")])
    out["last"] = last
    out["max"] = mx
    return out.tobytes()


def decode_block_meta(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    arr = np.frombuffer(buf, dtype=[("last", "<i8"), ("max", "<f8")])
    return arr["last"].copy(), arr["max"].copy()
