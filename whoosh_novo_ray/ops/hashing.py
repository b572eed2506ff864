"""Deterministic, SQL-reproducible hashing primitives.

Every hash here is derived from md5 so a DuckDB oracle can recompute it
exactly (``md5_number_lower(s)`` == the last 8 digest bytes, little-endian).
MinHash permutations are affine maps ``(a*x + b) mod p`` over the Mersenne
prime ``p = 2^61 - 1``: DuckDB evaluates them exactly in HUGEINT; here the
modular product is computed in pure uint64 numpy via 31-bit limb splitting
(2^61 ≡ 1 mod p makes multiplication by 2^31 a 61-bit rotation).
"""

from __future__ import annotations

import hashlib

import numpy as np

P61 = (1 << 61) - 1  # Mersenne prime 2^61 - 1
_U = np.uint64
_MASK61 = _U(P61)
_MASK31 = _U((1 << 31) - 1)
_MASK30 = _U((1 << 30) - 1)


def md5_u64(s: str) -> int:
    """uint64 from md5: last 8 digest bytes little-endian (DuckDB
    ``md5_number_lower``)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[8:16], "little")


def md5_u64_arr(strings) -> np.ndarray:
    """Vector of ``md5_u64`` over an iterable of strings."""
    out = np.empty(len(strings), np.uint64)
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(
            hashlib.md5(s.encode("utf-8")).digest()[8:16], "little"
        )
    return out


def _fold61(y: np.ndarray) -> np.ndarray:
    """Reduce y < 2^63 to [0, p) for p = 2^61-1."""
    y = (y & _MASK61) + (y >> _U(61))
    return np.where(y >= _MASK61, y - _MASK61, y)


def _rot31(y: np.ndarray) -> np.ndarray:
    """(y * 2^31) mod p for y < p: a 61-bit left-rotation by 31."""
    r = ((y & _MASK30) << _U(31)) | (y >> _U(30))
    return np.where(r >= _MASK61, r - _MASK61, r)


def mulmod61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """(a * x) mod (2^61 - 1) elementwise/broadcast, all values < p.

    31-bit limb split: a*x = a1*x1*2^62 + (a1*x0 + a0*x1)*2^31 + a0*x0 with
    every partial product < 2^62 (uint64-safe); 2^62 ≡ 2 (mod p).
    """
    a = np.asarray(a, np.uint64)
    x = np.asarray(x, np.uint64)
    a1, a0 = a >> _U(31), a & _MASK31
    x1, x0 = x >> _U(31), x & _MASK31
    hi = _fold61(a1 * x1 * _U(2))
    mid = _rot31(_fold61(a1 * x0 + a0 * x1))
    low = _fold61(a0 * x0)
    return _fold61(hi + mid + low)


def affine61(a: np.ndarray, x: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*x + b) mod (2^61 - 1); the MinHash permutation family."""
    return _fold61(mulmod61(a, x) + np.asarray(b, np.uint64))


def minhash_perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) per permutation, reproducible in SQL as
    ``md5_number_lower('mh-a-<seed>-' || i) % (p-1) + 1`` etc."""
    a = np.array(
        [md5_u64(f"mh-a-{seed}-{i}") % (P61 - 1) + 1 for i in range(num_perm)],
        np.uint64,
    )
    b = np.array(
        [md5_u64(f"mh-b-{seed}-{i}") % P61 for i in range(num_perm)], np.uint64
    )
    return a, b


def lsh_planes(dim: int, nbits: int, seed: int) -> np.ndarray:
    """(dim, nbits) float64 hyperplane matrix with entries
    md5_u64('lshp-<seed>-<bit>-<dim>')/2^64 - 0.5 — uniform in (-0.5, 0.5),
    exactly reproducible in SQL."""
    out = np.empty((dim, nbits), np.float64)
    for b in range(nbits):
        for j in range(dim):
            out[j, b] = md5_u64(f"lshp-{seed}-{b}-{j}") / 2.0**64 - 0.5
    return out
