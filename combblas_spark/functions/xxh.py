"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` (seed 42).

Spark's XxHash64 expression hashes a string column's UTF-8 bytes with
the standard XXH64 algorithm (public spec, github.com/Cyan4973/xxHash)
and default seed 42, returning the result as a *signed* int64.  This
reference implementation exists so pytest can pin the JVM-side
MinHash/SimHash signatures byte-exactly without any Python running in
the Spark hot path (the engine never calls this at scale — it is a
test oracle, the analogue of the reference's golden-output files).
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return ((h * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Unsigned 64-bit XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k1
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Signed int64 view — what ``F.xxhash64`` returns."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= 1 << 63 else h


def spark_xxhash64_str(s: str) -> int:
    """Reference for ``F.xxhash64(string_col)`` on one string."""
    return xxh64_signed(s.encode("utf-8"))


def spark_xxhash64_longs(*values: int, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Reference for ``F.xxhash64(long_col, long_col, ...)``: each long
    is hashed as its 8 little-endian bytes with the running result as
    the next seed (Spark chains multi-argument hashes this way)."""
    h = seed & _M
    for v in values:
        h = xxh64(struct.pack("<q", v), h)
    return h - (1 << 64) if h >= 1 << 63 else h
