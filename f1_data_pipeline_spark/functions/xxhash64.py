"""Driver-side mirror of Spark's `xxhash64` expression.

The bloom sidecar probe needs the k bit positions of a lookup value —
`pmod(xxhash64(col, lit(i)), m)` for i in 0..k — exactly as the
executors computed them at build time. Computing them with a one-row
Spark job guarantees parity but costs a full job launch per (m, k)
config, which is the wrong shape for the actual point-lookup workload
(many repeated lookups: the round-5 bench showed the probe job costing
more than the scan it saves). This module computes the same positions
driver-side in microseconds.

The implementation is the public XXH64 algorithm (Yann Collet's xxHash,
BSD-2) with Spark's type dispatch on top, mirroring
`org.apache.spark.sql.catalyst.expressions.XxHash64` /
`sql/catalyst/.../XXH64.java` (seed 42; ints/shorts/bytes/booleans/
dates hash as 32-bit, longs/timestamps as 64-bit, strings as UTF-8
bytes; multi-argument calls chain each argument's hash as the next
seed). Parity with the executors is PINNED by
tests/test_bloom_probe_parity.py, which compares every supported type
against `F.xxhash64` on live Spark — if a Spark upgrade ever changed
the hash, that test fails before any bloom could mis-prune. Types
outside the verified set (float, double, decimal, binary, nested) are
not supported here; callers fall back to the Spark-job path.

Reference parity: no counterpart (the reference has no bloom indexes);
supporting infrastructure for the manifest table format.
"""
from __future__ import annotations

import datetime as _dt

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1

_EPOCH = _dt.date(1970, 1, 1)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def hash_int32(i: int, seed: int) -> int:
    """XXH64 of one 32-bit value (Spark's hashInt)."""
    h = (seed + _P5 + 4) & _M64
    h ^= ((i & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _fmix(h)


def hash_int64(v: int, seed: int) -> int:
    """XXH64 of one 64-bit value (Spark's hashLong)."""
    v &= _M64
    h = (seed + _P5 + 8) & _M64
    h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _fmix(h)


def hash_bytes(b: bytes, seed: int) -> int:
    """XXH64 of a byte string (Spark's hashUnsafeBytes — little-endian
    words, standard tail handling)."""
    n = len(b)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            w = [
                int.from_bytes(b[i + o : i + o + 8], "little")
                for o in (0, 8, 16, 24)
            ]
            v1 = (_rotl((v1 + w[0] * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl((v2 + w[1] * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl((v3 + w[2] * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl((v4 + w[3] * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M64, 31) * _P1) & _M64
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        w = int.from_bytes(b[i : i + 8], "little")
        h ^= (_rotl((w * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i <= n - 4:
        w = int.from_bytes(b[i : i + 4], "little")
        h ^= (w * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < n:
        h ^= (b[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _fmix(h)


# DDL type name → hasher over the Python probe value. Exactly the types
# whose parity the pin test verifies; everything else must use Spark.
def _hash_value(dtype: str, v, seed: int) -> int | None:
    if dtype in ("tinyint", "smallint", "int", "integer"):
        return hash_int32(int(v), seed)
    if dtype in ("bigint", "long"):
        return hash_int64(int(v), seed)
    if dtype == "boolean":
        return hash_int32(1 if v else 0, seed)
    if dtype == "date":
        d = v if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime) \
            else None
        if d is None:
            return None
        return hash_int32((d - _EPOCH).days, seed)
    if dtype == "string":
        if not isinstance(v, str):
            return None
        return hash_bytes(v.encode("utf-8"), seed)
    return None


def spark_xxhash64(dtype: str, v, extra_ints: tuple[int, ...] = (),
                   seed: int = 42) -> int | None:
    """Spark's `xxhash64(col, lit(i)...)` for one stored-type value —
    signed 64-bit result, or None when the type isn't in the verified
    driver-side set (caller must fall back to a Spark job). NULL values
    are the caller's concern (Spark skips null arguments; blooms never
    index NULLs)."""
    h = _hash_value(dtype, v, seed)
    if h is None:
        return None
    for i in extra_ints:
        h = hash_int32(i, h)
    return h - (1 << 64) if h >= (1 << 63) else h


def bloom_positions(dtype: str, v, m: int, k: int) -> list[int] | None:
    """The k bloom bit positions Spark computes as
    `pmod(xxhash64(col, lit(i)), m)` for i in range(k) — or None when
    the type needs the Spark-job fallback."""
    base = _hash_value(dtype, v, 42)
    if base is None:
        return None
    out = []
    for i in range(k):
        h = hash_int32(i, base)
        h = h - (1 << 64) if h >= (1 << 63) else h
        out.append(h % m)  # Python % matches Spark pmod for m > 0
    return out
