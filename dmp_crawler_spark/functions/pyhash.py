"""Pure-Python replica of Spark's xxhash64 expression (XXH64, seed 42).

Spark's `F.xxhash64(c1, c2, ...)` chains per-column hashes: the running
hash starts at the seed (42) and each column's hash value becomes the
seed for the next column. Strings hash their UTF-8 bytes through the full
XXH64 body; int/long columns use the specialized hashInt/hashLong forms
(catalyst XXH64.java). This module replicates exactly that, so literal
plan constants (e.g. LSH hyperplane weights) can be computed driver-side
without launching a Spark job — bit-identical to the in-plan expression
(parity-tested in tests/test_operators.py).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """XXH64 of raw bytes (unsigned 64-bit result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little") * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little") * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little") * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little") * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k1 = (_rotl((int.from_bytes(data[i:i + 8], "little") * _P2) & _M, 31) * _P1) & _M
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _hash_int(value: int, seed: int) -> int:
    """catalyst XXH64.hashInt: 4-byte specialized form."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def _hash_long(value: int, seed: int) -> int:
    """catalyst XXH64.hashLong: 8-byte specialized form."""
    h = (seed + _P5 + 8) & _M
    k1 = (_rotl(((value & _M) * _P2) & _M, 31) * _P1) & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def spark_xxhash64(*cols: str | int, seed: int = 42) -> int:
    """F.xxhash64(...) replica: str columns hash UTF-8 bytes, Python ints
    hash as Spark IntegerType (hashInt). Returns the SIGNED 64-bit value
    Spark's expression yields."""
    h = seed & _M
    for c in cols:
        if isinstance(c, str):
            h = xxh64_bytes(c.encode("utf-8"), h)
        else:
            h = _hash_int(int(c), h)
    return _to_signed(h)


def spark_xxhash64_long(*cols: str | int, seed: int = 42) -> int:
    """Like spark_xxhash64 but int args hash as LongType (hashLong)."""
    h = seed & _M
    for c in cols:
        if isinstance(c, str):
            h = xxh64_bytes(c.encode("utf-8"), h)
        else:
            h = _hash_long(int(c), h)
    return _to_signed(h)


def java_rem(a: int, b: int) -> int:
    """Java/Spark `%`: remainder carrying the DIVIDEND's sign (Python's
    `%` carries the divisor's)."""
    r = abs(a) % abs(b)
    return -r if a < 0 else r
