"""Deterministic vectorized hashing/RNG primitives (numpy, uint64).

Every random draw in the data generators is keyed by a hash of
``(seed, entity ids...)`` — never by partition id or row order — so all
generated tables are identical at any parallelism level (FIXTURES.md §1
determinism rule).
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def mix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer over a uint64 array (vectorized)."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * _M1
        x = (x ^ (x >> np.uint64(27))) * _M2
        x = x ^ (x >> np.uint64(31))
    return x


def key_hash(seed: int, *parts: np.ndarray | int) -> np.ndarray:
    """Combine a seed and integer arrays into one uint64 hash array."""
    with np.errstate(over="ignore"):
        h = mix64(np.uint64(seed) + _GOLDEN)
        for p in parts:
            p = np.asarray(p, dtype=np.uint64)
            h = mix64(h ^ (p + _GOLDEN + (h << np.uint64(6)) + (h >> np.uint64(2))))
    return h


def uniform(seed: int, *parts: np.ndarray | int) -> np.ndarray:
    """U[0,1) float64 array keyed by (seed, parts)."""
    return key_hash(seed, *parts).astype(np.float64) / 2.0**64


def randint(seed: int, lo: int, hi: int, *parts: np.ndarray | int) -> np.ndarray:
    """Integers in [lo, hi) keyed by (seed, parts)."""
    return (key_hash(seed, *parts) % np.uint64(hi - lo)).astype(np.int64) + lo


def zipf_cdf(n: int, s: float) -> np.ndarray:
    """CDF of a Zipf(s) distribution over ranks 1..n."""
    w = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    c = np.cumsum(w)
    return c / c[-1]


def zipf_draw(seed: int, cdf: np.ndarray, *parts: np.ndarray | int) -> np.ndarray:
    """Zipf-distributed ranks (0-based) keyed by (seed, parts)."""
    return np.searchsorted(cdf, uniform(seed, *parts), side="right").astype(np.int64)
