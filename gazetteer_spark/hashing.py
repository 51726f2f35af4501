"""Driver-side twin of Spark's ``xxhash64`` for metadata-scale inputs.

Bucket/shard routing throughout the engine is ``pmod(xxhash64(col), n)``.
Pruned layout reads only need the bucket ids of a handful of QUERY terms,
but Spark exposes xxhash64 exclusively as a Column expression — computing
ids used to cost one tiny Spark job per read path (createDataFrame +
collect). This module implements the identical hash in pure Python so
bucket ids are plain driver arithmetic (a few microseconds), removing
that job from every layout query.

Algorithm: standard XXH64 (Yann Collet's xxHash, public spec) with
Spark's fixed seed 42, over the UTF-8 bytes of the string — exactly what
``org.apache.spark.sql.catalyst.expressions.XxHash64`` computes for a
string column (its XXH64.hashUnsafeBytes follows the reference layout:
32-byte stripes, then 8/4/1-byte tails, little-endian). Agreement with
the JVM expression is property-tested (tests/test_hashing.py) — if Spark
ever changed the semantics, those tests fail loudly.

Pure Python is fine here: inputs are query terms (tens of bytes, tens of
terms); this is never on a data path.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1

SPARK_SEED = 42  # XxHash64's fixed default seed in Spark


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Unsigned 64-bit XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            for _ in (0,):  # keep the unrolled reads obvious
                k1 = int.from_bytes(data[i : i + 8], "little")
                k2 = int.from_bytes(data[i + 8 : i + 16], "little")
                k3 = int.from_bytes(data[i + 16 : i + 24], "little")
                k4 = int.from_bytes(data[i + 24 : i + 32], "little")
            v1 = (_rotl((v1 + k1 * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + k2 * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + k3 * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + k4 * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((k * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        k = int.from_bytes(data[i : i + 4], "little")
        h ^= (k * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def spark_xxhash64_str(s: str) -> int:
    """Signed 64-bit value equal to Spark's ``xxhash64(string_col)``."""
    h = xxh64(s.encode("utf-8"))
    return h - (1 << 64) if h >= (1 << 63) else h


def term_bucket(term: str, n_buckets: int) -> int:
    """Driver twin of ``termindex.term_bucket_expr`` — pmod semantics."""
    return spark_xxhash64_str(term) % n_buckets
