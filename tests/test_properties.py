"""Property-based invariants (hypothesis): random inputs, structural laws.

Complements the ported reference suites: these assert laws that must hold
for EVERY input — count conservation, quantile range, cdf monotonicity,
serde identity, merge commutativity — rather than accuracy on chosen
distributions.
"""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from t_digest_spark.core import TDigest
from t_digest_spark.sketches.kll import KllSketch

finite = st.floats(min_value=-1e12, max_value=1e12,
                   allow_nan=False, allow_infinity=False, width=64)
value_lists = st.lists(finite, min_size=1, max_size=400)


@settings(max_examples=60, deadline=None)
@given(value_lists)
def test_digest_structural_invariants(vals):
    d = TDigest.from_values(np.asarray(vals))
    assert d.count == len(vals)
    assert d.min == min(vals)
    assert d.max == max(vals)
    assert d.check_weights() == 0
    qs = [d.quantile(q) for q in (0.0, 0.1, 0.5, 0.9, 1.0)]
    assert qs[0] == min(vals) and qs[-1] == max(vals)
    assert all(b >= a - 1e-9 for a, b in zip(qs, qs[1:]))  # monotone
    assert all(min(vals) <= v <= max(vals) for v in qs)


@settings(max_examples=40, deadline=None)
@given(value_lists)
def test_digest_serde_identity(vals):
    d = TDigest.from_values(np.asarray(vals))
    d2 = TDigest.from_bytes(d.to_bytes())
    assert d2.count == d.count
    np.testing.assert_allclose(d2.means, d.means, rtol=0, atol=0)
    np.testing.assert_allclose(d2.weights, d.weights, rtol=0, atol=0)


@settings(max_examples=30, deadline=None)
@given(value_lists, value_lists)
def test_digest_merge_commutative_counts(a, b):
    da = TDigest.from_values(np.asarray(a))
    db = TDigest.from_values(np.asarray(b))
    m1 = TDigest.merge_all([da, db])
    m2 = TDigest.merge_all([db, da])
    assert m1.count == m2.count == len(a) + len(b)
    assert m1.min == m2.min == min(min(a), min(b))
    assert m1.max == m2.max == max(max(a), max(b))
    # same data, either order: quantiles agree within digest resolution
    span = m1.max - m1.min
    for q in (0.25, 0.5, 0.75):
        assert abs(m1.quantile(q) - m2.quantile(q)) <= 0.05 * span + 1e-9


@settings(max_examples=40, deadline=None)
@given(value_lists)
def test_kll_structural_invariants(vals):
    s = KllSketch.from_values(np.asarray(vals))
    assert s.n == len(vals)
    assert s.quantile(0.0) == min(vals)
    assert s.quantile(1.0) == max(vals)
    qs = [s.quantile(q) for q in (0.0, 0.25, 0.5, 0.75, 1.0)]
    assert all(b >= a for a, b in zip(qs, qs[1:]))
    # every retained item is a real input value (KLL keeps samples, not means)
    for lv in s.levels:
        for x in lv:
            assert min(vals) <= x <= max(vals)


@settings(max_examples=30, deadline=None)
@given(value_lists)
def test_digest_cdf_bounds_and_monotone(vals):
    d = TDigest.from_values(np.asarray(vals))
    lo, hi = min(vals), max(vals)
    xs = np.linspace(lo, hi, 17) if hi > lo else [lo]
    cds = [d.cdf(float(x)) for x in xs]
    assert all(0.0 <= c <= 1.0 for c in cds)
    assert all(b >= a - 1e-12 for a, b in zip(cds, cds[1:]))
    if hi > lo:
        assert d.cdf(lo - 1.0) == 0.0
        assert d.cdf(hi + 1.0) == 1.0
