"""Pure-Python xxHash64 bit-identical to Spark's ``xxhash64``
expression (Apache Spark's XXH64 / XxHash64Function, seed 42):

* strings hash their UTF-8 bytes through the streaming algorithm;
* longs / ints take the fixed-width fast paths (``hashLong`` /
  ``hashInt``);
* multi-argument calls chain — each argument's hash seeds the next.

Exists so DRIVER-SIDE fast paths (the small-entity dedup shortcut in
ops/dedup.py) can reproduce executor-side hash decisions exactly; a
pytest compares every helper against ``F.xxhash64`` on random inputs.
xxHash is a public algorithm (Yann Collet); constants and step order
follow the published spec, which Spark's implementation also follows.
"""

from __future__ import annotations

import struct
from typing import Iterable, Union

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def _u64(v: int) -> int:
    return v & _M64


def xxh64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """Streaming XXH64 over bytes (Spark hashUnsafeBytes). Returns the
    SIGNED 64-bit value Spark's LongType carries."""
    seed = _u64(seed)
    length = len(data)
    i = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while i <= length - 32:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, i)
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
    h = (h + length) & _M64
    while i <= length - 8:
        (k1,) = struct.unpack_from("<Q", data, i)
        h ^= (_rotl((k1 * _P2) & _M64, 31) * _P1) & _M64
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        i += 8
    if i <= length - 4:
        (k1,) = struct.unpack_from("<I", data, i)
        h ^= (k1 * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        i += 4
    while i < length:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        i += 1
    return _signed(_fmix(h))


def xxh64_string(s: str, seed: int = SPARK_SEED) -> int:
    return xxh64_bytes(s.encode("utf-8"), seed)


def xxh64_long(v: int, seed: int = SPARK_SEED) -> int:
    """XXH64.hashLong — Spark's fixed-width path for LongType."""
    seed = _u64(seed)
    h = (seed + _P5 + 8) & _M64
    k1 = (_rotl((_u64(v) * _P2) & _M64, 31) * _P1) & _M64
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M64
    return _signed(_fmix(h))


def xxh64_int(v: int, seed: int = SPARK_SEED) -> int:
    """XXH64.hashInt — Spark's fixed-width path for IntegerType."""
    seed = _u64(seed)
    h = (seed + _P5 + 4) & _M64
    h ^= ((v & 0xFFFFFFFF) * _P1) & _M64
    h = (_rotl(h, 23) * _P2 + _P3) & _M64
    return _signed(_fmix(h))


def spark_xxhash64(*values: Union[str, int], seed: int = SPARK_SEED,
                   int_width: Iterable[str] = ()) -> int:
    """Chain like Spark's variadic ``xxhash64(a, b, ...)``: each
    argument's hash becomes the next one's seed. Python ints hash as
    LONGs by default; pass ``int_width`` flags ('int'/'long', one per
    value) when an argument is a Spark IntegerType (e.g. a small
    literal)."""
    widths = list(int_width) or ["long"] * len(values)
    h = seed
    for v, w in zip(values, widths):
        if isinstance(v, str):
            h = xxh64_string(v, h)
        elif w == "int":
            h = xxh64_int(v, h)
        else:
            h = xxh64_long(v, h)
    return h
