"""Pure-Python XXH64 — the independent twin of Spark's ``xxhash64``.

Spark's ``F.xxhash64`` (org.apache.spark.sql.catalyst.expressions.XxHash64)
is the standard public XXH64 algorithm (Yann Collet, BSD-licensed xxHash)
with default seed 42: string columns hash their UTF-8 bytes, long columns
hash their 8-byte value via the single-word finalization, and multi-column
calls chain the running hash as the next column's seed.  This module
re-derives those values OUTSIDE Spark so the driver-oracle goldens for the
xxhash64-based production dedup paths (q28 MinHash, q29 SimHash) come from
an independent implementation, the same way q20's golden comes from stdlib
``uuid.uuid5`` — parity with the engine is pinned by
tests/test_dedup_ops.py::test_xxh64_matches_spark.

Scale note: this is a driver-side oracle helper (golden generation, tests)
— the engine's hot paths always use the JVM ``F.xxhash64`` expression.
"""

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1

SPARK_SEED = 42  # XxHash64's default seed in Spark's hash() family


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Standard XXH64 of ``data``; returns a SIGNED 64-bit int (Spark's
    long convention)."""
    seed &= _M64
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, struct.unpack_from("<Q", data, i)[0])
            v2 = _round(v2, struct.unpack_from("<Q", data, i + 8)[0])
            v3 = _round(v3, struct.unpack_from("<Q", data, i + 16)[0])
            v4 = _round(v4, struct.unpack_from("<Q", data, i + 24)[0])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _round(0, struct.unpack_from("<Q", data, i)[0])
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (struct.unpack_from("<I", data, i)[0] * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    h = _fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Spark ``F.xxhash64(string_col)``: XXH64 over the UTF-8 bytes."""
    return xxh64(s.encode("utf-8"), seed)


def xxh64_long(v: int, seed: int = SPARK_SEED) -> int:
    """Spark ``F.xxhash64(long_col)``: the single-8-byte-word form, i.e.
    XXH64 of the value's little-endian two's-complement bytes."""
    return xxh64(struct.pack("<q", v), seed)
