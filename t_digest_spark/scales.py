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
    def max_scalar(q, normalizer):
        # pure-float fast path for per-point callers (AVL add loop): the
        # array form's asarray round-trip costs ~1us per call
        return 1.0 / normalizer

    @staticmethod
    def normalizer(delta, n):
        return delta / 2.0

    normalizer_scalar = normalizer


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
    def max_scalar(q, normalizer):
        if not 0.0 < q < 1.0:
            return 0.0
        return 2.0 * math.sin(0.5 / normalizer) * math.sqrt(q * (1.0 - q))

    @staticmethod
    def normalizer(delta, n):
        return delta / (2.0 * math.pi)

    normalizer_scalar = normalizer


# fastAsin piecewise-model coefficients (ScaleFunction.java:883-886), rows:
# m0 (x<=0.1), m1 (..0.55), m2 (0.5..0.8), m3 (0.75..0.9); above 0.9 -> asin.
_ASIN_MODELS = np.array([
    [0.2955302411, 1.2221903614, 0.1488583743, 0.2422015816,
     -0.3688700895, 0.0733398445],
    [-0.0430991920, 0.9594035750, -0.0362312299, 0.1204623351,
     0.0457029620, -0.0026025285],
    [-0.034873933724, 1.054796752703, -0.194127063385, 0.283963735636,
     0.023800124916, -0.000872727381],
    [-0.37588391875, 2.61991859025, -2.48835406886, 1.48605387425,
     0.00857627492, -0.00015802871],
])


def fast_asin(x):
    """Vectorized port of ScaleFunction.fastAsin (ScaleFunction.java:861-924):
    four overlapping polynomial/rational models linearly interpolated, exact
    asin above 0.9, odd extension below 0, NaN above 1. Worst-case error vs
    asin < 1e-6 (reference ScaleFunctionTests.asinApproximation contract).

    Historical note: in Java this beats Math.asin by avoiding a libm call;
    under NumPy np.arcsin is already vectorized C, so this port exists for
    behavioral parity (K_1_FAST), not speed.
    """
    x = np.asarray(x, dtype=np.float64)
    scalar = x.ndim == 0
    a = np.abs(np.atleast_1d(x))
    # Java negates only for x < 0; fastAsin(0) takes the positive path and
    # returns the model's tiny bias (~-6.2e-8), NOT exact 0 — np.sign(0)=0
    # would silently zero it, breaking bit-parity at q=0.5
    sign = np.where(np.atleast_1d(x) < 0, -1.0, 1.0)
    out = np.full(a.shape, np.nan)
    c0_hi, c1_hi, c2_lo, c2_hi, c3_lo, c3_hi, c4_lo = \
        0.1, 0.55, 0.5, 0.8, 0.75, 0.9, 0.87
    big = (a > c3_hi) & (a <= 1.0)
    out[big] = np.arcsin(a[big])
    rest = a <= c3_hi
    xa = a[rest]
    if xa.size:
        vars_ = np.stack([np.ones_like(xa), xa, xa * xa, xa ** 3,
                          1.0 / (1.0 - xa), 1.0 / (1.0 - xa) / (1.0 - xa)])
        bound = lambda v: np.clip(v, 0.0, 1.0)
        x0 = bound((c0_hi - xa) / c0_hi)
        x1 = bound((c1_hi - xa) / (c1_hi - c2_lo))
        x2 = bound((c2_hi - xa) / (c2_hi - c3_lo))
        x3 = bound((c3_hi - xa) / (c3_hi - c4_lo))
        mixes = (x0, (1 - x0) * x1, (1 - x1) * x2, (1 - x2) * x3)
        r = np.zeros_like(xa)
        for m, mix in zip(_ASIN_MODELS, mixes):
            # ordered accumulation matches the reference's eval() loop
            ev = np.zeros_like(xa)
            for ci, c in enumerate(m):
                ev += c * vars_[ci]
            r += mix * ev
        r += (1 - x3) * np.arcsin(xa)
        out[rest] = r
    out = sign * out
    return float(out[0]) if scalar else out


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
    def max_scalar(q, normalizer):
        return q * (1.0 - q) / normalizer

    @staticmethod
    def normalizer(delta, n):
        return delta / _K2._z(delta, n)

    @staticmethod
    def normalizer_scalar(delta, n):
        # flat fast path (no _z/max call chain) for per-point callers
        return delta / (4.0 * math.log((n if n > 1.0 else 1.0) / delta) + 24.0)

    @staticmethod
    def _z(delta, n):
        # Z(delta, n) = 4 ln(n/delta) + 24 (ScaleFunction.java:358-361)
        return 4.0 * math.log(max(n, 1.0) / delta) + 24.0


class _K3:
    """Cluster sizes ~ min(q, 1-q) (ScaleFunction.java:462-529)."""

    name = "k3"

    @staticmethod
    def k(q, normalizer):
        # exact nested-limitCall semantics (ScaleFunction.java:549-561,
        # verified vs the compiled reference): the q>0.5 branch recurses
        # -k(1-q) back through the outer clamp, so the FLOAT-computed 1-q
        # is re-clamped up to 1e-15
        q = _clip_q(np.asarray(q, dtype=np.float64))
        half = np.maximum(np.minimum(q, 1.0 - q), _EPS)
        lo = np.log(2.0 * half) * normalizer
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
    def max_scalar(q, normalizer):
        return min(q, 1.0 - q) / normalizer

    @staticmethod
    def normalizer(delta, n):
        # Z(delta, n) = 4 ln(n/delta) + 21 (ScaleFunction.java:525-528)
        return delta / (4.0 * math.log(max(n, 1.0) / delta) + 21.0)

    @staticmethod
    def normalizer_scalar(delta, n):
        return delta / (4.0 * math.log((n if n > 1.0 else 1.0) / delta) + 21.0)


_SPLIT = 0.5  # glued-variant split point (ScaleFunction.java:156, :370)


class _K1Glued:
    """K_1 above the split, uniform below with a tangent glue
    (ScaleFunction.java:154-229)."""

    name = "k1_glued"
    asymmetric = True  # cluster-size law not mirror-symmetric in q

    @staticmethod
    def k(q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        s = _SPLIT
        lo = normalizer * (math.asin(2 * s - 1)
                           + (q - s) / math.sqrt(s * (1 - s)))
        hi = normalizer * np.arcsin(2.0 * np.clip(q, s, 1.0) - 1.0)
        return np.where(q <= s, lo, hi)

    @staticmethod
    def q(k, normalizer):
        k = np.asarray(k, dtype=np.float64)
        s = _SPLIT
        cut = normalizer * math.asin(2 * s - 1)
        lo = (k / normalizer - math.asin(2 * s - 1)) * math.sqrt(s * (1 - s)) + s
        hi = (np.sin(np.clip(k, cut, None) / normalizer) + 1.0) / 2.0
        return np.where(k <= cut, lo, hi)

    @staticmethod
    def max(q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        s = _SPLIT
        inside = (q > 0) & (q < 1)
        qq = np.where(inside, q, 0.5)
        hi = 2.0 * math.sin(0.5 / normalizer) * np.sqrt(qq * (1.0 - qq))
        val = np.where(qq <= s, math.sqrt(s * (1 - s)) / normalizer, hi)
        return np.where(inside, val, 0.0)

    @staticmethod
    def max_scalar(q, normalizer):
        if not 0.0 < q < 1.0:
            return 0.0
        if q <= _SPLIT:
            return math.sqrt(_SPLIT * (1 - _SPLIT)) / normalizer
        return 2.0 * math.sin(0.5 / normalizer) * math.sqrt(q * (1.0 - q))

    @staticmethod
    def normalizer(delta, n):
        return delta / (2.0 * math.pi)

    normalizer_scalar = normalizer


class _K2Glued:
    """K_2 above the split, uniform below (ScaleFunction.java:368-456)."""

    name = "k2_glued"
    asymmetric = True  # cluster-size law not mirror-symmetric in q

    @staticmethod
    def k(q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        s = _SPLIT
        ls = math.log(s / (1 - s))
        lo = ((q - s) / s / (1 - s) + ls) * normalizer
        qm = np.clip(q, s, 1.0 - _EPS)
        hi = np.log(qm / (1.0 - qm)) * normalizer
        qb = 1.0 - _EPS        # Java evaluates 2*k(1-1e-15) with the
        top = 2.0 * math.log(qb / (1.0 - qb)) * normalizer  # FLOAT 1-q
        out = np.where(q <= s, lo, hi)
        return np.where(q > 1 - _EPS, top, out)

    @staticmethod
    def q(k, normalizer):
        k = np.asarray(k, dtype=np.float64)
        s = _SPLIT
        ls = math.log(s / (1 - s))
        cut = ls * normalizer
        lo = s * (1 - s) * (k / normalizer - ls) + s
        w = np.exp(np.where(k <= cut, cut, k) / normalizer)
        hi = w / (1.0 + w)
        return np.where(k <= cut, lo, hi)

    @staticmethod
    def max(q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        s = _SPLIT
        return np.where(q <= s, s * (1 - s) / normalizer,
                        q * (1.0 - q) / normalizer)

    @staticmethod
    def max_scalar(q, normalizer):
        s = _SPLIT
        if q <= s:
            return s * (1 - s) / normalizer
        return q * (1.0 - q) / normalizer

    @staticmethod
    def normalizer(delta, n):
        return delta / (4.0 * math.log(max(n, 1.0) / delta) + 24.0)

    @staticmethod
    def normalizer_scalar(delta, n):
        return delta / (4.0 * math.log((n if n > 1.0 else 1.0) / delta) + 24.0)


class _K3Glued:
    """K_3 above the split, uniform below (ScaleFunction.java:535-602)."""

    name = "k3_glued"
    asymmetric = True  # cluster-size law not mirror-symmetric in q

    @staticmethod
    def k(q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        lo = normalizer * (2.0 * q - 1.0)
        qm = np.clip(q, 0.5, 1.0 - _EPS)
        hi = -normalizer * np.log(2.0 * (1.0 - qm))
        qb = 1.0 - _EPS        # Java evaluates 10*k(1-1e-15) with the
        top = 10.0 * (-normalizer * math.log(2.0 * (1.0 - qb)))  # FLOAT 1-q
        out = np.where(q <= 0.5, lo, hi)
        return np.where(q > 1 - _EPS, top, out)

    @staticmethod
    def q(k, normalizer):
        k = np.asarray(k, dtype=np.float64)
        lo = (k / normalizer + 1.0) / 2.0
        hi = 1.0 - np.exp(-np.clip(k, 0.0, None) / normalizer) / 2.0
        return np.where(k <= 0, lo, hi)

    @staticmethod
    def max(q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        return np.where(q <= 0.5, 0.5 / normalizer, (1.0 - q) / normalizer)

    @staticmethod
    def normalizer(delta, n):
        return delta / (4.0 * math.log(max(n, 1.0) / delta) + 21.0)


class _KQuadratic:
    """Cluster sizes ~ 1/(1+q) (ScaleFunction.java:608-644)."""

    name = "k_quadratic"
    asymmetric = True  # cluster-size law not mirror-symmetric in q

    @staticmethod
    def k(q, normalizer):
        q = np.asarray(q, dtype=np.float64)
        return normalizer * (q * q + 2.0 * q) / 3.0

    @staticmethod
    def q(k, normalizer):
        k = np.asarray(k, dtype=np.float64)
        # Out-of-domain k (k < -normalizer/3, probed by the Java-vector
        # parity sweep) makes the radicand negative; Java returns NaN
        # silently, so suppress numpy's RuntimeWarning to match.
        with np.errstate(invalid="ignore"):
            return (np.sqrt(normalizer * (normalizer + 3.0 * k))
                    / normalizer - 1.0)

    @staticmethod
    def max(q, normalizer):
        # Reference artifact kept for parity: Java's 2-arg max writes
        # "3 / 2 / normalizer" with INT division (ScaleFunction.java:634-637)
        # so the constant is 1, not 1.5 — the merge loop therefore runs
        # K_QUADRATIC with a 1.5x tighter weight limit than the 3-arg
        # variant intends. Verified vs the compiled reference.
        q = np.asarray(q, dtype=np.float64)
        return 1.0 / normalizer / (1.0 + q)

    @staticmethod
    def normalizer(delta, n):
        return delta / 2.0


class _K2NoNorm:
    """Unnormalized K_2: cluster count grows ~ log(n)
    (ScaleFunction.java:652-707; only accepted by the reference's
    setUnnormalizedScaleFunction, TDigest.java:170-180)."""

    name = "k2_no_norm"
    unnormalized = True

    k = staticmethod(_K2.k)
    q = staticmethod(_K2.q)
    max = staticmethod(_K2.max)

    @staticmethod
    def normalizer(delta, n):
        return delta


class _K3NoNorm:
    """Unnormalized K_3 (ScaleFunction.java:709-773)."""

    name = "k3_no_norm"
    unnormalized = True

    k = staticmethod(_K3.k)
    q = staticmethod(_K3.q)
    max = staticmethod(_K3.max)

    @staticmethod
    def normalizer(delta, n):
        return delta


class _K1Fast:
    """K_1 with the fastAsin approximation (ScaleFunction.java:235-294):
    same sqrt(q(1-q)) cluster law as K_1 but k() goes through the
    piecewise-model asin. q() and max() are identical to K_1 (the reference
    uses exact Math.sin there too)."""

    name = "k1_fast"

    @staticmethod
    def k(q, normalizer):
        # Java clamps to [0, 1] ONLY (limitCall(f, q, 0, 1),
        # ScaleFunction.java:247-256) — unlike K_1 there is no 1e-15 interior
        # clamp, so k(0)/k(1) hit the exact asin(+-1) = +-pi/2 branch.
        # Verified vs the compiled reference (java_parity scales vectors).
        q = np.clip(np.asarray(q, dtype=np.float64), 0.0, 1.0)
        return normalizer * fast_asin(2.0 * q - 1.0)

    @staticmethod
    def q(k, normalizer):
        # unlike K_1, the reference does NOT clamp k/normalizer to +-pi/2
        # here — out-of-range k wraps through sin (ScaleFunction.java K_1_FAST
        # 2-arg q; verified vs the compiled reference)
        return (np.sin(np.asarray(k, dtype=np.float64) / normalizer) + 1.0) / 2.0

    max = staticmethod(_K1.max)
    normalizer = staticmethod(_K1.normalizer)


SCALES = {s.name: s for s in (_K0, _K1, _K1Fast, _K2, _K3, _K1Glued,
                              _K2Glued, _K3Glued, _KQuadratic, _K2NoNorm,
                              _K3NoNorm)}


def get_scale(name: str):
    try:
        return SCALES[name.lower()]
    except KeyError:
        raise ValueError(f"unknown scale function {name!r}; choose from {sorted(SCALES)}") from None
