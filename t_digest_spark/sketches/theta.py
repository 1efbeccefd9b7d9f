"""Theta (bottom-k / KMV) sketch — mergeable distinct counting WITH set
algebra (union / intersection / A-not-B), the operation HLL cannot do.

Not in the reference repo (which is t-digest only); the construction follows
the published Theta-sketch framework (Dasgupta, Lang, Rhodes, Thaler,
"A Framework for Estimating Stream Expression Cardinalities", and the KMV
analysis in Beyer et al., "On Synopses for Distinct-Value Estimation Under
Multiset Operations", SIGMOD'07). We use the bottom-k member of the family:

  * Keys are hashed JVM-side (``shiftrightunsigned(xxhash64(key), 1)`` —
    uniform over [0, 2^63)); Python never hashes raw keys.
  * State = (theta, R) where R is the set of retained hash values < theta,
    |R| <= k.  Exact mode: theta = 2^63 and R is simply the distinct hash
    set.  Estimation mode: theta = the (k+1)-th smallest hash seen, R = the
    k hashes below it.
  * Estimate = |R| / (theta / 2^63).  RSE ~= 1/sqrt(k-1) in estimation mode
    (Beyer et al. Thm 1); collisions in the 63-bit space bias the estimate
    by ~n/2^63 relative — negligible even at 10^12 distinct keys.
  * Union: theta' = min(thetas), R' = bottom-k of the union of retained
    sets below theta'.  Associative and commutative, so the Spark pattern
    is the usual partial build (mapInPandas) + final merge (applyInPandas)
    with NO raw-row shuffle.
  * Intersection / A-not-B (DataSketches ``Intersection``/``AnotB``
    semantics): operate on the retained sets below min(theta); the result
    keeps the smaller theta and is itself a valid sketch.

Wire row: ``retained array<bigint>, theta bigint, k int`` with theta = -1
denoting exact mode (2^63 does not fit in a signed long).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

THETA_MAX = 1 << 63          # hash domain is [0, 2^63)
DEFAULT_K = 4096             # RSE ~= 1/sqrt(k-1) ~= 1.6% at default


class ThetaSketch:
    """Bottom-k theta sketch over pre-hashed int64 keys in [0, 2^63)."""

    __slots__ = ("k", "theta", "retained")

    def __init__(self, k: int = DEFAULT_K):
        if k < 2:
            raise ValueError("theta sketch needs k >= 2")
        self.k = int(k)
        self.theta = THETA_MAX                     # exact mode
        self.retained = np.empty(0, dtype=np.int64)  # sorted, unique, < theta

    # ------------------------------------------------------------- update

    def update_hashes(self, hashes: Sequence[int]) -> None:
        h = np.unique(np.asarray(hashes, dtype=np.int64))
        if h.size == 0:
            return
        if self.theta < THETA_MAX:
            h = h[h < self.theta]
        merged = np.union1d(self.retained, h)
        self._trim(merged)

    def _trim(self, merged: np.ndarray) -> None:
        if merged.size > self.k:
            # (k+1)-th smallest becomes the new threshold; keep the k below.
            self.theta = int(merged[self.k])
            self.retained = merged[:self.k]
        else:
            self.retained = merged

    # -------------------------------------------------------------- query

    @property
    def is_estimation(self) -> bool:
        return self.theta < THETA_MAX

    def estimate(self) -> float:
        if not self.is_estimation:
            return float(self.retained.size)
        return self.retained.size * (THETA_MAX / self.theta)

    def _rse_bound(self, num_std: float) -> float:
        if not self.is_estimation or self.retained.size < 2:
            return 0.0
        return num_std * self.estimate() / math.sqrt(self.retained.size - 1)

    def lower_bound(self, num_std: float = 2.0) -> float:
        return max(float(self.retained.size),
                   self.estimate() - self._rse_bound(num_std))

    def upper_bound(self, num_std: float = 2.0) -> float:
        return self.estimate() + self._rse_bound(num_std)

    # ---------------------------------------------------------- set algebra

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        """In-place union (associative, commutative — Spark reduce-safe)."""
        theta = min(self.theta, other.theta)
        a = self.retained[self.retained < theta]
        b = other.retained[other.retained < theta]
        self.theta = theta
        self._trim(np.union1d(a, b))
        return self

    @classmethod
    def union_all(cls, parts: Sequence["ThetaSketch"],
                  k: int = DEFAULT_K) -> "ThetaSketch":
        out = cls(k=k)
        for p in parts:
            out.merge(p)
        return out

    @classmethod
    def intersect(cls, a: "ThetaSketch", b: "ThetaSketch") -> "ThetaSketch":
        theta = min(a.theta, b.theta)
        out = cls(k=max(a.k, b.k))
        out.theta = theta
        out.retained = np.intersect1d(a.retained[a.retained < theta],
                                      b.retained[b.retained < theta])
        return out

    @classmethod
    def a_not_b(cls, a: "ThetaSketch", b: "ThetaSketch") -> "ThetaSketch":
        theta = min(a.theta, b.theta)
        out = cls(k=max(a.k, b.k))
        out.theta = theta
        out.retained = np.setdiff1d(a.retained[a.retained < theta],
                                    b.retained[b.retained < theta])
        return out

    # --------------------------------------------------------------- serde

    def to_row(self):
        theta = -1 if self.theta == THETA_MAX else int(self.theta)
        return self.retained.tolist(), theta, self.k

    @classmethod
    def from_row(cls, retained, theta, k) -> "ThetaSketch":
        s = cls(k=int(k))
        s.theta = THETA_MAX if int(theta) == -1 else int(theta)
        s.retained = np.asarray(retained, dtype=np.int64)
        return s
