"""64-bit Z-order (Morton) and Hilbert key interleave for (conv_id, turn_idx, ts).

The reference clusters its silver facts with Delta's
``OPTIMIZE ... ZORDER BY (series_id, date)``
(``/root/reference/ofl/transform/spark/silver.py:368-374``) — the engine is
opaque. Here the interleave is ours: three 21-bit dimensions packed into a
63-bit key, computed vectorized (numpy uint64 bit-spreading) inside
``map_batches``, with a pure-Python bit-level mirror for unit tests — the
same JVM-free-mirror discipline as the reference's window arithmetic
(``ofl/streaming/windows.py:1-28``).

Dimension layout (most- to least-significant interleave position):
  d0 = top 21 bits of a stable 64-bit hash of ``conv_id``
  d1 = ``turn_idx`` clamped to [0, 2^21)
  d2 = ``ts`` normalized to [0, 2^21) over a caller-supplied [min, max]
       epoch-microsecond range (taken from manifest-global stats so the
       key is deterministic given the table).
"""

from __future__ import annotations

import numpy as np

BITS = 21
DIM_MAX = (1 << BITS) - 1  # 2097151

_SPREAD_MASKS = (
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
)


# ---------------------------------------------------------------- pure python

def spread_bits_py(x: int) -> int:
    """Insert two zero bits between each of the low 21 bits of ``x``."""
    x &= DIM_MAX
    for shift, mask in _SPREAD_MASKS:
        x = (x | (x << shift)) & mask
    return x


def morton3_py(d0: int, d1: int, d2: int) -> int:
    """63-bit Morton code; d0 occupies the most-significant interleave slot."""
    return (spread_bits_py(d0) << 2) | (spread_bits_py(d1) << 1) | spread_bits_py(d2)


def morton3_inverse_py(z: int) -> tuple[int, int, int]:
    """Invert :func:`morton3_py` (test helper)."""

    def compact(x: int) -> int:
        x &= 0x1249249249249249
        x = (x ^ (x >> 2)) & 0x10C30C30C30C30C3
        x = (x ^ (x >> 4)) & 0x100F00F00F00F00F
        x = (x ^ (x >> 8)) & 0x1F0000FF0000FF
        x = (x ^ (x >> 16)) & 0x1F00000000FFFF
        x = (x ^ (x >> 32)) & DIM_MAX
        return x

    return compact(z >> 2), compact(z >> 1), compact(z)


# ---------------------------------------------------------------- vectorized

def spread_bits(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & np.uint64(DIM_MAX)
    for shift, mask in _SPREAD_MASKS:
        x = (x | (x << np.uint64(shift))) & np.uint64(mask)
    return x


def morton3(d0: np.ndarray, d1: np.ndarray, d2: np.ndarray) -> np.ndarray:
    return (
        (spread_bits(d0) << np.uint64(2))
        | (spread_bits(d1) << np.uint64(1))
        | spread_bits(d2)
    )


def normalize_to_bits(values: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Affine-map values in [lo, hi] to integer [0, 2^21-1] (clipped)."""
    if hi <= lo:
        return np.zeros(len(values), dtype=np.uint64)
    scaled = np.rint((values.astype(np.float64) - lo) * (DIM_MAX / (hi - lo)))
    return np.clip(scaled, 0, DIM_MAX).astype(np.uint64)


# ---------------------------------------------------------------- hilbert

def hilbert3_py(d0: int, d1: int, d2: int, bits: int = BITS) -> int:
    """3-D Hilbert index via Skilling's transpose algorithm (public
    domain: J. Skilling, "Programming the Hilbert curve", AIP 2004).
    Pure-Python mirror used to pin the vectorized version."""
    X = [d0 & DIM_MAX, d1 & DIM_MAX, d2 & DIM_MAX]
    n = 3
    M = 1 << (bits - 1)
    # inverse undo excess work
    q = M
    while q > 1:
        p = q - 1
        for i in range(n):
            if X[i] & q:
                X[0] ^= p
            else:
                t = (X[0] ^ X[i]) & p
                X[0] ^= t
                X[i] ^= t
        q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    q = M
    while q > 1:
        if X[n - 1] & q:
            t ^= q - 1
        q >>= 1
    for i in range(n):
        X[i] ^= t
    # interleave the transposed axes: bit b of axis i -> output bit (bits-1-b)*n + (n-1-i)
    out = 0
    for b in range(bits):
        for i in range(n):
            out = (out << 1) | ((X[i] >> (bits - 1 - b)) & 1)
    return out


def hilbert3(d0: np.ndarray, d1: np.ndarray, d2: np.ndarray, bits: int = BITS) -> np.ndarray:
    """Vectorized 3-D Hilbert index (same transpose algorithm, numpy
    uint64 lanes; loops are over the 21 bit positions, not the rows)."""
    n = 3
    X = [
        d0.astype(np.uint64) & np.uint64(DIM_MAX),
        d1.astype(np.uint64) & np.uint64(DIM_MAX),
        d2.astype(np.uint64) & np.uint64(DIM_MAX),
    ]
    M = np.uint64(1 << (bits - 1))
    q = int(M)
    while q > 1:
        p = np.uint64(q - 1)
        qv = np.uint64(q)
        for i in range(n):
            cond = (X[i] & qv).astype(bool)
            X[0] = np.where(cond, X[0] ^ p, X[0])
            t = np.where(cond, np.uint64(0), (X[0] ^ X[i]) & p)
            X[0] ^= t
            X[i] ^= t
        q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = np.zeros(len(X[0]), dtype=np.uint64)
    q = int(M)
    while q > 1:
        qv = np.uint64(q)
        t = np.where((X[n - 1] & qv).astype(bool), t ^ np.uint64(q - 1), t)
        q >>= 1
    for i in range(n):
        X[i] ^= t
    out = np.zeros(len(X[0]), dtype=np.uint64)
    for b in range(bits):
        for i in range(n):
            out = (out << np.uint64(1)) | ((X[i] >> np.uint64(bits - 1 - b)) & np.uint64(1))
    return out
