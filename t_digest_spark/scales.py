"""Scale functions K_0..K_3 for the t-digest.

Formula-faithful to the reference enum (reference: core/src/main/java/com/tdunning/
math/stats/ScaleFunction.java — K_0 :34-69, K_1 :75-148, K_2 :300-362, K_3 :462-529,
limitCall clamp :930-938) but re-expressed as vectorized NumPy callables so they can
run over whole candidate windows inside the merge sweep instead of per point.

Each scale provides (matching the reference's abstract surface, ScaleFunction.java:784-850):
  k(q, normalizer)        quantile -> k index
  q(k, normalizer)        inverse
  max(q, normalizer)      maximum *relative* cluster weight at quantile q
  normalizer(delta, n)    precomputed normalization constant

All of k/q/max accept scalars or ndarrays.
"""

from __future__ import annotations

import math

import numpy as np

_EPS = 1e-15  # limitCall clamp bounds (ScaleFunction.java:930-938)


def _clip_q(q):
    return np.clip(q, _EPS, 1.0 - _EPS)


class _K0:
    """Uniform cluster sizes (ScaleFunction.java:34-69)."""

    name = "k0"

    @staticmethod
    def k(q, normalizer):
        return normalizer * np.asarray(q, dtype=np.float64)

    @staticmethod
    def q(k, normalizer):
        return np.asarray(k, dtype=np.float64) / normalizer

    @staticmethod
    def max(q, normalizer):
        return np.full_like(np.asarray(q, dtype=np.float64), 1.0 / normalizer)

    @staticmethod
    def normalizer(delta, n):
        return delta / 2.0


class _K1:
    """Cluster sizes ~ sqrt(q(1-q)) (ScaleFunction.java:75-148)."""

    name = "k1"

    @staticmethod
    def k(q, normalizer):
        q = _clip_q(q)
        return normalizer * np.arcsin(2.0 * q - 1.0)

    @staticmethod
    def q(k, normalizer):
        x = np.clip(np.asarray(k, dtype=np.float64) / normalizer, -math.pi / 2, math.pi / 2)
        return (np.sin(x) + 1.0) / 2.0

    @staticmethod
    def max(q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        inside = (q > 0) & (q < 1)
        qq = np.where(inside, q, 0.5)
        val = 2.0 * math.sin(0.5 / normalizer) * np.sqrt(qq * (1.0 - qq))
        return np.where(inside, val, 0.0)

    @staticmethod
    def normalizer(delta, n):
        return delta / (2.0 * math.pi)


class _K2:
    """Cluster sizes ~ q(1-q); constant-ish memory (ScaleFunction.java:300-362)."""

    name = "k2"

    @staticmethod
    def k(q, normalizer):
        q = _clip_q(q)
        return np.log(q / (1.0 - q)) * normalizer

    @staticmethod
    def q(k, normalizer):
        w = np.exp(np.asarray(k, dtype=np.float64) / normalizer)
        return w / (1.0 + w)

    @staticmethod
    def max(q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        return q * (1.0 - q) / normalizer

    @staticmethod
    def normalizer(delta, n):
        return delta / _K2._z(delta, n)

    @staticmethod
    def _z(delta, n):
        # Z(delta, n) = 4 ln(n/delta) + 24 (ScaleFunction.java:358-361)
        return 4.0 * math.log(max(n, 1.0) / delta) + 24.0


class _K3:
    """Cluster sizes ~ min(q, 1-q) (ScaleFunction.java:462-529)."""

    name = "k3"

    @staticmethod
    def k(q, normalizer):
        q = _clip_q(np.asarray(q, dtype=np.float64))
        lo = np.log(2.0 * np.minimum(q, 1.0 - q)) * normalizer
        return np.where(q <= 0.5, lo, -lo)

    @staticmethod
    def q(k, normalizer):
        k = np.asarray(k, dtype=np.float64)
        lo = np.exp(-np.abs(k) / normalizer) / 2.0
        return np.where(k <= 0, lo, 1.0 - lo)

    @staticmethod
    def max(q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        return np.minimum(q, 1.0 - q) / normalizer

    @staticmethod
    def normalizer(delta, n):
        # Z(delta, n) = 4 ln(n/delta) + 21 (ScaleFunction.java:525-528)
        return delta / (4.0 * math.log(max(n, 1.0) / delta) + 21.0)


SCALES = {s.name: s for s in (_K0, _K1, _K2, _K3)}


def get_scale(name: str):
    try:
        return SCALES[name.lower()]
    except KeyError:
        raise ValueError(f"unknown scale function {name!r}; choose from {sorted(SCALES)}") from None
