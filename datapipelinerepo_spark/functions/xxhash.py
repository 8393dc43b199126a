"""Pure-Python Spark-compatible xxHash64 — the driver-side bucket
router.

``TableStore.lookup`` needs pmod(xxhash64(key), n_buckets) for a
handful of PROBE VALUES; launching a Spark job over a one-row frame to
learn one integer is the classic serving-path tax. Spark's
``xxhash64`` expression is XXH64 (seed 42) over a per-type byte
normalization with per-column chaining (each column's hash seeds the
next; NULLs leave the running hash unchanged), so the routing integer
is computable on the driver in microseconds.

Byte normalizations mirrored from Spark's XxHash64 expression
(sql/catalyst hash expressions; see also the XXH64 reference spec):
- long            → hashLong(v)            (8-byte path)
- int/short/byte  → hashInt(v & 0xffffffff) (4-byte path, sign-extended
                    reinterpret like Spark's implicit widening)
- string          → hashBytes(utf-8 bytes)
- boolean         → hashInt(1/0)
- double          → hashLong(IEEE bits, with -0.0 normalized to 0.0)
- float           → hashInt(IEEE bits, -0.0 normalized)
- date            → hashInt(days since epoch)
- timestamp       → hashLong(epoch micros)

Everything here is validated against Spark's own ``F.xxhash64`` by
tests/test_quality.py::test_python_xxhash64_matches_spark — the parity
test IS the contract; any type not covered falls back to the Spark-job
path in lookup().
"""

from __future__ import annotations

import struct

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def hash_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte little-endian long (Spark's hashLong)."""
    v = value & _M
    h = (seed + _P5 + 8) & _M
    k = (v * _P2) & _M
    k = _rotl(k, 31)
    k = (k * _P1) & _M
    h ^= k
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


def hash_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte int (Spark's hashInt)."""
    v = value & 0xFFFFFFFF
    h = (seed + _P5 + 4) & _M
    h ^= (v * _P1) & _M
    h = (_rotl(h, 23) * _P2 + _P3) & _M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte buffer (Spark's hashUnsafeBytes)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            w1, w2, w3, w4 = struct.unpack_from("<QQQQ", data, i)
            v1 = (_rotl((v1 + w1 * _P2) & _M, 31) * _P1) & _M
            v2 = (_rotl((v2 + w2 * _P2) & _M, 31) * _P1) & _M
            v3 = (_rotl((v3 + w3 * _P2) & _M, 31) * _P1) & _M
            v4 = (_rotl((v4 + w4 * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            k = (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = ((h ^ k) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        (w,) = struct.unpack_from("<Q", data, i)
        k = (_rotl((w * _P2) & _M, 31) * _P1) & _M
        h ^= k
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        (w,) = struct.unpack_from("<I", data, i)
        h ^= (w * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def hash_value(value, spark_type: str, seed: int) -> int:
    """One column's contribution given its Spark simpleString type.
    Raises TypeError for unsupported types (callers fall back to the
    Spark-job path). Deliberately covers ONLY the types whose byte
    normalization is unambiguous on the driver — integers, strings,
    booleans; temporal and floating keys carry timezone/-0.0/NaN
    normalization subtleties that the Spark-job fallback handles
    definitionally."""
    t = spark_type.lower()
    if value is None:
        return seed  # NULL leaves the running hash unchanged
    if t == "bigint":
        return hash_long(int(value), seed)
    if t in ("int", "smallint", "tinyint"):
        return hash_int(int(value), seed)
    if t == "string":
        return hash_bytes(str(value).encode("utf-8"), seed)
    if t == "boolean":
        return hash_int(1 if value else 0, seed)
    raise TypeError(f"unsupported key type for python routing: {spark_type}")


def xxhash64(values, types, seed: int = 42) -> int:
    """Spark's ``xxhash64(*cols)`` for one row: chain each column's
    hash as the next one's seed. Returns the SIGNED 64-bit value Spark
    produces."""
    h = seed
    for v, t in zip(values, types):
        h = hash_value(v, t, h)
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(values, types, n_buckets: int, seed: int = 42) -> int:
    """pmod(xxhash64(key tuple), n_buckets) — the store's _kb routing,
    driver-side."""
    return xxhash64(values, types, seed) % int(n_buckets)
