"""Pure-Python XXH64, bit-identical to Spark's ``F.xxhash64`` on
strings/binary (seed 42 by default, matching the SQL function).

Why this exists: several operators derive deterministic pseudo-random
state from ``xxhash64`` of literal strings (LSH hyperplanes in
``similarity.py``, salt/sample keys elsewhere). Reproducing those
derivations OUTSIDE Spark — at oracle-build time, with no session —
lets the DuckDB differential oracles replicate the *approximate*
operators' exact semantics (bucket membership included) instead of
settling for rows-only checks.

The algorithm is the public xxHash64 spec (Yann Collet, BSD); Spark's
``XXH64.hashUnsafeBytes`` implements the same spec (verified against
PySpark 4.1.2 bytecode and a 46-case empirical sweep in
tests/test_xxh.py — stripes for >=32 bytes, 8-byte word steps, one
4-byte step, byte tail, avalanche finalizer).
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _rd(b: bytes, i: int, k: int) -> int:
    return int.from_bytes(b[i : i + k], "little")


def xxhash64(data: bytes | str, seed: int = 42) -> int:
    """Signed 64-bit hash equal to Spark's ``xxhash64(col)`` for the
    same bytes (strings are hashed as UTF-8, like Spark's StringType
    path)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    i = 0
    seed &= _MASK
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = (_rotl((v1 + _rd(data, i, 8) * _P2) & _MASK, 31) * _P1) & _MASK
            v2 = (_rotl((v2 + _rd(data, i + 8, 8) * _P2) & _MASK, 31) * _P1) & _MASK
            v3 = (_rotl((v3 + _rd(data, i + 16, 8) * _P2) & _MASK, 31) * _P1) & _MASK
            v4 = (_rotl((v4 + _rd(data, i + 24, 8) * _P2) & _MASK, 31) * _P1) & _MASK
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK
            h = (h * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        h ^= (_rotl((_rd(data, i, 8) * _P2) & _MASK, 31) * _P1) & _MASK
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (_rd(data, i, 4) * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h - (1 << 64) if h >= 1 << 63 else h
