"""Independent pure-Python XXH64 — the oracle-side twin of Spark's
``org.apache.spark.sql.catalyst.expressions.XXH64``.

Implemented from the public XXH64 specification (Yann Collet,
github.com/Cyan4973/xxHash, BSD-2) — NOT from Spark source — so it can
serve as an *independent* oracle for queries whose semantics depend on
``F.xxhash64``.  Spark's byte hashing is bit-compatible with canonical
XXH64 on little-endian platforms; longs use the dedicated 8-byte-length
path (equivalent to hashing the 8 little-endian bytes of the value).

Spark's multi-argument ``xxhash64(c1, c2, ...)`` chains: starting from
seed 42, ``h = hash(c_i, seed=h)`` for each column in order.  Helpers
below mirror that for the (string), (string, long) shapes the engine
uses.  ``tests/test_hash_oracle.py`` cross-checks every helper against
Spark's own output.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def xxh64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """Unsigned XXH64 of a byte string (canonical algorithm)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        limit = n - 32
        while i <= limit:
            v1 = (_rotl((v1 + int.from_bytes(data[i : i + 8], "little") * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i : i + 8], "little") * _P2) & _M, 31) * _P1) & _M
        h ^= k
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def xxh64_int(value: int, seed: int = SPARK_SEED) -> int:
    """Unsigned XXH64 of one 32-bit integer (4-byte-length fast path) —
    what Spark uses for IntegerType columns/literals (e.g. ``F.lit(i)``)."""
    seed &= _M
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def xxh64_long(value: int, seed: int = SPARK_SEED) -> int:
    """Unsigned XXH64 of one 64-bit integer (8-byte-length fast path)."""
    seed &= _M
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl(((value & _M) * _P2) & _M, 31) * _P1) & _M
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


# ------------------------- Spark-shaped helpers (signed-long results) ------


def spark_xxhash64_str(s: str) -> int:
    """= F.xxhash64(string_col) — signed."""
    return _signed(xxh64_bytes(s.encode("utf-8"), SPARK_SEED))


def spark_xxhash64_str_long(s: str, v: int) -> int:
    """= F.xxhash64(string_col, long_col) — chained, signed."""
    return _signed(xxh64_long(v, xxh64_bytes(s.encode("utf-8"), SPARK_SEED)))


def spark_xxhash64_str_int(s: str, v: int) -> int:
    """= F.xxhash64(string_col, F.lit(int)) — chained via the int path."""
    return _signed(xxh64_int(v, xxh64_bytes(s.encode("utf-8"), SPARK_SEED)))


def spark_xxhash64_long(v: int) -> int:
    """= F.xxhash64(long_col) — signed."""
    return _signed(xxh64_long(v, SPARK_SEED))
