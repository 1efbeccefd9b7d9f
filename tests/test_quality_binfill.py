"""Cluster-fill diagnostics — the pytest analog of the reference's BinFill
harness (quality/src/test/java/com/tdunning/tdigest/quality/BinFill.java).

The Java program *plots* per-centroid k-width (dk = k(q1) - k(q0)) and
cluster weight against the scale-function limit ``n * max(f.max(q0),
f.max(q1))`` for every scale function and distribution; here the same
quantities become assertions:

  * no multi-point cluster ever exceeds its scale's weight limit
    (the merge criterion invariant, MergingDigest.java merge loop);
  * interior clusters are reasonably FULL (mean dk bounded below) —
    a digest that fragments into underfilled clusters wastes its size
    budget and the accuracy bound no longer follows from delta;
  * the BinFill.sampleFill small-data case (20-point array, delta 5/10,
    K_1/K_2/K_3): totals survive, means stay sorted inside the data range,
    and quantile(0.65) lands within the exact envelope.

The fill statistics depend only on ranks (continuous inputs with no ties
produce identical weight layouts), which the cross-distribution parameter
sweep demonstrates rather than assumes.
"""

import numpy as np
import pytest

from t_digest_spark.core import Dist, TDigest
from t_digest_spark.scales import SCALES, get_scale

N = 100_000

NORMALIZED_SCALES = [s for s in SCALES if "no_norm" not in s]


def _data(name: str, rng) -> np.ndarray:
    if name == "uniform":
        return rng.uniform(0, 1, N)
    if name == "gamma":
        return rng.gamma(0.1, 0.1, N)
    if name == "normal":
        return rng.normal(0, 1, N)
    raise ValueError(name)


@pytest.mark.parametrize("dist", ["uniform", "gamma", "normal"])
@pytest.mark.parametrize("scale", NORMALIZED_SCALES)
def test_bin_fill_invariants(scale, dist):
    rng = np.random.default_rng(42)
    data = _data(dist, rng)
    f = get_scale(scale)
    d = TDigest.from_values(data, delta=100.0, scale=scale)
    d.compress()
    n = float(np.sum(d.weights))
    nz = f.normalizer(100.0, n)

    q1s = np.cumsum(d.weights) / n
    q0s = np.r_[0.0, q1s[:-1]]
    w = d.weights

    # (1) weight-limit criterion: every MULTI-POINT cluster fits under
    # n * max(f.max(q0), f.max(q1)); only singletons may sit beyond it
    # (forced endpoint singletons / extreme-tail clusters of weight 1)
    limit = n * np.maximum(f.max(q0s, nz), f.max(q1s, nz))
    multi = w > 1
    assert np.all(w[multi] <= limit[multi] * (1 + 1e-6)), (
        scale, dist, float((w[multi] / limit[multi]).max()))

    # (2) fill quality: interior clusters average at least ~1/4 of a
    # k-unit (measured 0.34-1.0 across scales; fragmentation would sink
    # this toward 0 and waste the size budget)
    dk = f.k(q1s, nz) - f.k(q0s, nz)
    assert dk[1:-1].mean() >= 0.25, (scale, dist, float(dk[1:-1].mean()))

    # (3) interior multi-point clusters never span much more than one
    # k-unit (singletons at the extremes are exempt: k diverges there
    # for the K_2/K_3 families by design)
    interior_multi = multi.copy()
    interior_multi[[0, -1]] = False
    assert np.all(dk[interior_multi] <= 1.5), (
        scale, dist, float(dk[interior_multi].max()))

    # cross-check with the digest's own invariant checker: soft violations
    # (dk > 1 vs the PUBLIC delta) are expected under the two-level merge
    # delta; check_weights raises on egregious (dk > 4) ones
    d.check_weights()


@pytest.mark.parametrize("delta", [5.0, 10.0])
@pytest.mark.parametrize("scale", ["k1", "k2", "k3"])
def test_sample_fill_small_data(delta, scale):
    """BinFill.sampleFill (BinFill.java:40-72): the 20-point array at very
    low compression — totals, ordering, and the q=0.65 probe."""
    data = np.array([0, 0, 3, 4, 1, 6, 0, 5, 2, 0,
                     3, 3, 2, 3, 0, 2, 5, 0, 3, 1], dtype=np.float64)
    srt = np.sort(data)
    d = TDigest.from_values(data, delta=delta, scale=scale)
    d.compress()
    assert float(np.sum(d.weights)) == data.size
    assert d.min == srt[0] and d.max == srt[-1]
    # centroid means sorted, inside the data range
    assert np.all(np.diff(d.means) >= 0)
    assert d.means[0] >= srt[0] and d.means[-1] <= srt[-1]
    est = d.quantile(0.65)
    exact = Dist.quantile(0.65, srt)
    # at delta=5 a cluster holds ~1/4 of the mass: the probe may land a
    # few order statistics away, never outside the +-25%-rank envelope
    lo = Dist.quantile(0.40, srt)
    hi = Dist.quantile(0.90, srt)
    assert lo <= est <= hi, (delta, scale, est, exact)
