"""Count-min sketch and Bloom filter — mergeable frequency/membership
sketches for the Spark partial+final pattern.

North-rule family members (BASELINE.json: "HLL, count-min, t-digest, KLL,
Bloom"). Neither exists in the reference repo; both follow the published
constructions:

  * Count-min (Cormode & Muthukrishnan 2005): d x w counter matrix,
    row i increments position mix_i(h(x)); point estimate = min over rows;
    over-estimation only, bound e*n/w with probability 1-exp(-d).
  * Bloom (Bloom 1970): m-bit array, set/test k positions per key;
    no false negatives, false-positive rate ~(1 - e^{-kn/m})^k.

Key hashing happens JVM-side (`xxhash64`) BEFORE the sketch so build and
query agree bit-for-bit and string hashing never runs in Python; the NumPy
side only mixes the 64-bit key hash into row positions (splitmix-style,
deterministic). Merging is elementwise (+ for CM, | for Bloom) — both are
exactly mergeable, so the Spark pattern is the same partial build
(mapInPandas) + final reduce used for digests.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np


def _mix(h: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer over uint64 with a per-row seed."""
    z = h.astype(np.uint64) + np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class CountMinSketch:
    """d x w counter matrix over pre-hashed int64 keys."""

    __slots__ = ("d", "w", "counts", "n")

    def __init__(self, d: int = 5, w: int = 4096):
        self.d = int(d)
        self.w = int(w)
        self.counts = np.zeros((self.d, self.w), dtype=np.int64)
        self.n = 0

    @classmethod
    def params_for(cls, eps: float, delta: float) -> "CountMinSketch":
        """Standard sizing: w = ceil(e/eps), d = ceil(ln(1/delta))."""
        return cls(d=int(math.ceil(math.log(1.0 / delta))),
                   w=int(math.ceil(math.e / eps)))

    def update_hashes(self, hashes: Sequence[int],
                      weights: Sequence[int] = None) -> None:
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        w = (np.asarray(weights, dtype=np.int64) if weights is not None
             else np.ones(h.size, dtype=np.int64))
        self.n += int(w.sum())
        for row in range(self.d):
            pos = (_mix(h, row + 1) % np.uint64(self.w)).astype(np.int64)
            np.add.at(self.counts[row], pos, w)

    def estimate_hashes(self, hashes: Sequence[int]) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        est = np.full(h.size, np.iinfo(np.int64).max, dtype=np.int64)
        for row in range(self.d):
            pos = (_mix(h, row + 1) % np.uint64(self.w)).astype(np.int64)
            est = np.minimum(est, self.counts[row][pos])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.d, self.w) != (other.d, other.w):
            raise ValueError("cannot merge count-min sketches of different shape")
        self.counts += other.counts
        self.n += other.n
        return self

    def to_row(self):
        return self.counts.ravel().tolist(), self.d, self.w, self.n

    @classmethod
    def from_row(cls, counts, d, w, n) -> "CountMinSketch":
        s = cls(d=int(d), w=int(w))
        s.counts = np.asarray(counts, dtype=np.int64).reshape(int(d), int(w))
        s.n = int(n)
        return s


class BloomFilter:
    """m-bit filter over pre-hashed int64 keys, k probe positions each."""

    __slots__ = ("m", "k", "bits", "n")

    def __init__(self, m_bits: int = 1 << 20, k: int = 5):
        self.m = int(m_bits)
        self.k = int(k)
        self.bits = np.zeros((self.m + 63) // 64, dtype=np.uint64)
        self.n = 0

    @classmethod
    def params_for(cls, n_items: int, fpp: float) -> "BloomFilter":
        """Standard sizing: m = -n ln p / ln^2 2, k = m/n ln 2."""
        m = int(math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, int(round(m / n_items * math.log(2))))
        return cls(m_bits=m, k=k)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        # (n, k) positions via double hashing: p_i = h1 + i*h2 mod m
        h1 = _mix(h, 1) % np.uint64(self.m)
        h2 = (_mix(h, 2) % np.uint64(self.m - 1)) + np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return (h1[:, None] + i * h2[:, None]) % np.uint64(self.m)

    def add_hashes(self, hashes: Sequence[int]) -> None:
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        if h.size == 0:
            return
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        self.n += h.size

    def contains_hashes(self, hashes: Sequence[int]) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h)
        words = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (words >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("cannot merge Bloom filters of different shape")
        self.bits |= other.bits
        self.n += other.n
        return self

    def to_row(self):
        return self.bits.view(np.int64).tolist(), self.m, self.k, self.n

    @classmethod
    def from_row(cls, bits, m, k, n) -> "BloomFilter":
        f = cls(m_bits=int(m), k=int(k))
        f.bits = np.asarray(bits, dtype=np.int64).view(np.uint64)
        f.n = int(n)
        return f
