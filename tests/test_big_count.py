"""BigCount parity: digest arithmetic at billion-to-trillion total weight.

Ports core/src/test/java/com/tdunning/math/stats/BigCount.java (+ the
BigCountMergingDigest concretization): build a digest whose centroids are
synthesized directly at scale-function spacing to a total weight of
1.5e9, merge five copies (7.5e9 points — past int32, exercising the
weight arithmetic itself), and require the median to stay exactly on the
middle value within 1e-3.

Extended beyond the reference to the north star's 10^12-file scale: the
same construction at 1.5e12 weight per digest, merged to 7.5e12. At that
n, K_2's log(n)-growing normalizer leaves delta=100 only ~45-56 clusters,
so a median cluster may legitimately span ~25% of the mass and block-
discrete data drifts under self-merge (measured: median 3000 -> 2550)
— faithful scale-function geometry, not a kernel defect. delta=500
(271 clusters) pins the median exactly through all five merges; that is
the sizing rule a 10^12-row deployment on tie-heavy data needs, and this
test enforces it stays true.
"""
from __future__ import annotations

import numpy as np
import pytest

from t_digest_spark.core import TDigest
from t_digest_spark.scales import get_scale


def _add_fake_centroids(d: TDigest, n: float, points: float, x: float,
                        delta: float) -> None:
    # BigCount.addFakeCentroids (BigCount.java:41-54): walk the scale
    # function one k-unit at a time so each synthetic centroid lands at
    # the exact size the merge invariant allows at its q position.
    scale = get_scale(d.scale_name)
    base = d.count
    q0 = base / n
    added = 0.0
    while added < points:
        norm = scale.normalizer(delta, n)
        k0 = scale.k(q0, norm)
        q1 = scale.q(k0 + 1, norm)
        q1 = min(q1, (base + points) / n)
        m = min(points - added, max(1.0, np.rint((q1 - q0) * n)))
        added += m
        d.add_values([x], [m])
        q0 = q1
    assert added == points


def _big_digest(n_scale: float, delta: float) -> TDigest:
    # BigCount.addData (BigCount.java:29-39): five 300M-point blocks at
    # 10/200/3000/4000/5000 plus 200 outliers at 47883554 -> median 3000.
    d = TDigest(delta=delta, scale="k2")
    n = 300.0 * n_scale * 5 + 200
    for x in (10, 200, 3000, 4000, 5000):
        _add_fake_centroids(d, n, 300.0 * n_scale, x, delta)
    _add_fake_centroids(d, n, 200, 47883554, delta)
    assert d.count == n
    return d


@pytest.mark.parametrize("n_scale,delta", [
    (1e6, 100.0),    # the reference's exact regime: 1.5e9 -> 7.5e9 total
    (1e9, 500.0),    # north-star regime: 1.5e12 -> 7.5e12 total
])
def test_big_merge(n_scale, delta):
    # BigCount.testBigMerge (BigCount.java:7-16): five successive merges,
    # median pinned to 3000 within 1e-3 at every step.
    big = _big_digest(n_scale, delta)
    acc = TDigest(delta=delta, scale="k2")
    for i in range(5):
        acc = TDigest.merge_all([acc, big])
        assert acc.quantile(0.5) == pytest.approx(3000, abs=1e-3), \
            f"count={acc.count}"
    assert acc.count == 5 * big.count
    assert acc.check_weights() == 0


def test_trillion_scale_needs_wider_delta():
    # The delta sizing rule itself, measured (module docstring): at 1.5e12
    # per digest, delta=100 leaves too few K_2 clusters to keep the five
    # discrete blocks separate under self-merge — the merged median leaves
    # the 3000 block — while the single un-remerged digest is still exact.
    big = _big_digest(1e9, 100.0)
    assert big.quantile(0.5) == pytest.approx(3000, abs=1e-3)
    twice = TDigest.merge_all([big, big])
    assert abs(twice.quantile(0.5) - 3000) > 1.0  # drift is real at d=100
    assert twice.check_weights() == 0             # ...but the invariant holds


def test_big_count_cdf_monotone():
    # Weight magnitudes must not break cdf monotonicity or the weight
    # invariant (the float64 analog of the reference's long-count safety).
    d = _big_digest(1e9, 500.0)
    xs = np.array([9.0, 10.0, 200.0, 3000.0, 4000.0, 5000.0, 47883554.0])
    cs = np.array([d.cdf(float(x)) for x in xs])
    assert np.all(np.diff(cs) >= 0)
    assert cs[0] == 0.0 and cs[-1] > 1.0 - 1e-9
    # The construction synthesizes unsplittable weighted atoms at EXACTLY
    # one k-unit, so float rounding trips the soft dk>1 counter on some of
    # them; what must hold is the hard invariant (dk>4 raises inside
    # check_weights — no centroid 4x oversized).
    d.check_weights()
