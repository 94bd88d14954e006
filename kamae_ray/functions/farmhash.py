"""Pure-Python FarmHash64 (farmhashna::Hash64) — public-domain algorithm from
Google's FarmHash (github.com/google/farmhash, MIT).

The reference uses the ``pyfarmhash`` binding of the same C++ function for its
hash ops (reference: src/kamae/spark/utils/indexer_utils.py:25-45 safe_hash64;
user_defined_functions.py:22-43). That binding is not available in this
environment, so the algorithm is reimplemented here from the published source.
Deterministic and stable across processes/machines (unlike Python's ``hash``).

Includes the reference's null-character guard: pyfarmhash raises
ValueError("embedded null character") on NUL bytes; we replicate that.
"""

from __future__ import annotations

from functools import lru_cache

M64 = (1 << 64) - 1

k0 = 0xC3A5C85C97CB3127
k1 = 0xB492B66FBE98F273
k2 = 0x9AE16A3B2F90404F


def _fetch64(s: bytes, i: int = 0) -> int:
    return int.from_bytes(s[i : i + 8], "little")


def _fetch32(s: bytes, i: int = 0) -> int:
    return int.from_bytes(s[i : i + 4], "little")


def _rot(v: int, shift: int) -> int:
    if shift == 0:
        return v
    return ((v >> shift) | (v << (64 - shift))) & M64


def _shift_mix(v: int) -> int:
    return (v ^ (v >> 47)) & M64


def _hash_len_16(u: int, v: int, mul: int) -> int:
    a = ((u ^ v) * mul) & M64
    a ^= a >> 47
    b = ((v ^ a) * mul) & M64
    b ^= b >> 47
    b = (b * mul) & M64
    return b


def _hash_len_0_to_16(s: bytes) -> int:
    n = len(s)
    if n >= 8:
        mul = (k2 + n * 2) & M64
        a = (_fetch64(s) + k2) & M64
        b = _fetch64(s, n - 8)
        c = (_rot(b, 37) * mul + a) & M64
        d = ((_rot(a, 25) + b) * mul) & M64
        return _hash_len_16(c, d, mul)
    if n >= 4:
        mul = (k2 + n * 2) & M64
        a = _fetch32(s)
        return _hash_len_16((n + (a << 3)) & M64, _fetch32(s, n - 4), mul)
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & M64
        z = (n + (c << 2)) & M64
        return (_shift_mix((y * k2 ^ z * k0) & M64) * k2) & M64
    return k2


def _hash_len_17_to_32(s: bytes) -> int:
    n = len(s)
    mul = (k2 + n * 2) & M64
    a = (_fetch64(s) * k1) & M64
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * mul) & M64
    d = (_fetch64(s, n - 16) * k2) & M64
    return _hash_len_16(
        (_rot((a + b) & M64, 43) + _rot(c, 30) + d) & M64,
        (a + _rot((b + k2) & M64, 18) + c) & M64,
        mul,
    )


def _hash_len_33_to_64(s: bytes) -> int:
    n = len(s)
    mul = (k2 + n * 2) & M64
    a = (_fetch64(s) * k2) & M64
    b = _fetch64(s, 8)
    c = (_fetch64(s, n - 8) * mul) & M64
    d = (_fetch64(s, n - 16) * k2) & M64
    y = (_rot((a + b) & M64, 43) + _rot(c, 30) + d) & M64
    z = _hash_len_16(y, (a + _rot((b + k2) & M64, 18) + c) & M64, mul)
    e = (_fetch64(s, 16) * mul) & M64
    f = _fetch64(s, 24)
    g = ((y + _fetch64(s, n - 32)) * mul) & M64
    h = ((z + _fetch64(s, n - 24)) * mul) & M64
    return _hash_len_16(
        (_rot((e + f) & M64, 43) + _rot(g, 30) + h) & M64,
        (e + _rot((f + a) & M64, 18) + g) & M64,
        mul,
    )


def _weak_hash_32_seeds(w: int, x: int, y: int, z: int, a: int, b: int) -> tuple[int, int]:
    a = (a + w) & M64
    b = _rot((b + a + z) & M64, 21)
    c = a
    a = (a + x + y) & M64
    b = (b + _rot(a, 44)) & M64
    return (a + z) & M64, (b + c) & M64


def _weak_hash_32(s: bytes, i: int, a: int, b: int) -> tuple[int, int]:
    return _weak_hash_32_seeds(
        _fetch64(s, i), _fetch64(s, i + 8), _fetch64(s, i + 16), _fetch64(s, i + 24), a, b
    )


def farmhash64_bytes(s: bytes) -> int:
    """farmhashna::Hash64 of a byte string (unsigned 64-bit)."""
    n = len(s)
    if n <= 16:
        return _hash_len_0_to_16(s)
    if n <= 32:
        return _hash_len_17_to_32(s)
    if n <= 64:
        return _hash_len_33_to_64(s)

    seed = 81
    x = seed
    y = (seed * k1 + 113) & M64
    z = (_shift_mix((y * k2 + 113) & M64) * k2) & M64
    v = (0, 0)
    w = (0, 0)
    x = (x * k2 + _fetch64(s)) & M64

    end = ((n - 1) // 64) * 64
    last64 = end + ((n - 1) & 63) - 63
    i = 0
    while i != end:
        x = (_rot((x + y + v[0] + _fetch64(s, i + 8)) & M64, 37) * k1) & M64
        y = (_rot((y + v[1] + _fetch64(s, i + 48)) & M64, 42) * k1) & M64
        x ^= w[1]
        y = (y + v[0] + _fetch64(s, i + 40)) & M64
        z = (_rot((z + w[0]) & M64, 33) * k1) & M64
        v = _weak_hash_32(s, i, (v[1] * k1) & M64, (x + w[0]) & M64)
        w = _weak_hash_32(s, i + 32, (z + w[1]) & M64, (y + _fetch64(s, i + 16)) & M64)
        z, x = x, z
        i += 64
    mul = (k1 + ((z & 0xFF) << 1)) & M64
    i = last64
    w = ((w[0] + ((n - 1) & 63)) & M64, w[1])
    v = ((v[0] + w[0]) & M64, v[1])
    w = ((w[0] + v[0]) & M64, w[1])
    x = (_rot((x + y + v[0] + _fetch64(s, i + 8)) & M64, 37) * k1) & M64
    y = (_rot((y + v[1] + _fetch64(s, i + 48)) & M64, 42) * k1) & M64
    x ^= (w[1] * 9) & M64
    x &= M64
    y = (y + v[0] * 9 + _fetch64(s, i + 40)) & M64
    z = (_rot((z + w[0]) & M64, 33) * mul) & M64
    v = _weak_hash_32(s, i, (v[1] * mul) & M64, (x + w[0]) & M64)
    w = _weak_hash_32(s, i + 32, (z + w[1]) & M64, (y + _fetch64(s, i + 16)) & M64)
    z, x = x, z
    return _hash_len_16(
        (_hash_len_16(v[0], w[0], mul) + _shift_mix(y) * k0 + z) & M64,
        (_hash_len_16(v[1], w[1], mul) + x) & M64,
        mul,
    )


def safe_hash64(label: str) -> int:
    """Hash a string, raising on embedded NUL (reference:
    indexer_utils.py:25-45)."""
    if "\x00" in label:
        raise ValueError(
            f"Label {label!r} contains a null character. "
            "These cause issues with hashing. You should remove these from your data."
        )
    return farmhash64_bytes(label.encode("utf-8"))


@lru_cache(maxsize=1 << 16)
def cached_hash64(label: str) -> int:
    """Memoized safe_hash64 for hot repeated strings within a worker."""
    return safe_hash64(label)
