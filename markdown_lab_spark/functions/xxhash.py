"""Pure-Python xxHash (XXH32 + XXH64), from the public algorithm spec.

Needed by the from-scratch compression codecs: zstd frames carry an
optional XXH64-low-32 content checksum (RFC 8878 §3.1.1), LZ4 frames an
XXH32 content checksum and an XXH32-derived header checksum. Nothing
here is mirrored-pair-only: XXH64 is cross-verified against Spark's own
JVM ``xxhash64`` expression (seed 42 over binary columns) and both
functions against published test vectors, so a transcription slip in
the primes or the rounds cannot hide.

Reference behavior being re-expressed: the reference engine has no
compression layer at all (it shells out to reqwest/http for bytes);
this exists for the Spark engine's Common-Crawl-style ``.warc.wet.zst``
ingest path.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1

_P64_1 = 11400714785074694791
_P64_2 = 14029467366897019727
_P64_3 = 1609587929392839161
_P64_4 = 9650029242287828579
_P64_5 = 2870177450012600261

_P32_1 = 2654435761
_P32_2 = 2246822519
_P32_3 = 3266489917
_P32_4 = 668265263
_P32_5 = 374761393


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _round64(acc: int, lane: int) -> int:
    acc = (acc + lane * _P64_2) & _M64
    return (_rotl64(acc, 31) * _P64_1) & _M64


def _merge64(acc: int, val: int) -> int:
    acc ^= _round64(0, val)
    return (acc * _P64_1 + _P64_4) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 of ``data`` — matches Spark's ``xxhash64`` at seed 42."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        while pos + 32 <= n:
            v1 = _round64(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _round64(
                v2, int.from_bytes(data[pos + 8 : pos + 16], "little")
            )
            v3 = _round64(
                v3, int.from_bytes(data[pos + 16 : pos + 24], "little")
            )
            v4 = _round64(
                v4, int.from_bytes(data[pos + 24 : pos + 32], "little")
            )
            pos += 32
        h = (
            _rotl64(v1, 1)
            + _rotl64(v2, 7)
            + _rotl64(v3, 12)
            + _rotl64(v4, 18)
        ) & _M64
        h = _merge64(h, v1)
        h = _merge64(h, v2)
        h = _merge64(h, v3)
        h = _merge64(h, v4)
    else:
        h = (seed + _P64_5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        h ^= _round64(0, int.from_bytes(data[pos : pos + 8], "little"))
        h = (_rotl64(h, 27) * _P64_1 + _P64_4) & _M64
        pos += 8
    if pos + 4 <= n:
        h ^= (int.from_bytes(data[pos : pos + 4], "little") * _P64_1) & _M64
        h = (_rotl64(h, 23) * _P64_2 + _P64_3) & _M64
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P64_5) & _M64
        h = (_rotl64(h, 11) * _P64_1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


def _round32(acc: int, lane: int) -> int:
    acc = (acc + lane * _P32_2) & _M32
    return (_rotl32(acc, 13) * _P32_1) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P32_1 + _P32_2) & _M32
        v2 = (seed + _P32_2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P32_1) & _M32
        while pos + 16 <= n:
            v1 = _round32(v1, int.from_bytes(data[pos : pos + 4], "little"))
            v2 = _round32(
                v2, int.from_bytes(data[pos + 4 : pos + 8], "little")
            )
            v3 = _round32(
                v3, int.from_bytes(data[pos + 8 : pos + 12], "little")
            )
            v4 = _round32(
                v4, int.from_bytes(data[pos + 12 : pos + 16], "little")
            )
            pos += 16
        h = (
            _rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)
        ) & _M32
    else:
        h = (seed + _P32_5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        h = (h + int.from_bytes(data[pos : pos + 4], "little") * _P32_3) & _M32
        h = (_rotl32(h, 17) * _P32_4) & _M32
        pos += 4
    while pos < n:
        h = (h + data[pos] * _P32_5) & _M32
        h = (_rotl32(h, 11) * _P32_1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P32_2) & _M32
    h ^= h >> 13
    h = (h * _P32_3) & _M32
    h ^= h >> 16
    return h
