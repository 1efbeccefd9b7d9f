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


@settings(max_examples=40, deadline=None)
@given(value_lists)
def test_avl_structural_invariants(vals):
    from t_digest_spark.avl import AVLTreeDigest
    d = AVLTreeDigest.from_values(np.asarray(vals))
    assert d.count == len(vals)
    assert d.min == min(vals)
    assert d.max == max(vals)
    # centroid means stay sorted and weights conserve mass
    assert all(d.means[i] <= d.means[i + 1] for i in range(len(d.means) - 1))
    assert abs(sum(d.counts) - len(vals)) < 1e-9
    q = [d.quantile(x / 10) for x in range(11)]
    assert all(min(vals) <= v <= max(vals) for v in q)
    assert all(q[i] <= q[i + 1] + 1e-12 for i in range(10))   # monotone


@settings(max_examples=40, deadline=None)
@given(value_lists)
def test_avl_serde_identity(vals):
    from t_digest_spark.avl import AVLTreeDigest
    d = AVLTreeDigest.from_values(np.asarray(vals))
    r = AVLTreeDigest.from_bytes(d.to_bytes())
    assert r.count == d.count
    assert r.min == d.min and r.max == d.max


@settings(max_examples=40, deadline=None)
@given(value_lists)
def test_kll_datasketches_serde_identity(vals):
    s = KllSketch.from_values(np.asarray(vals))
    r = KllSketch.from_datasketches_bytes(s.to_datasketches_bytes())
    assert (r.n, r.min, r.max, r.num_retained) == \
        (s.n, s.min, s.max, s.num_retained)
    for q in (0.1, 0.5, 0.9):
        assert r.quantile(q) == s.quantile(q)


@settings(max_examples=40, deadline=None)
@given(value_lists)
def test_req_datasketches_serde_identity(vals):
    from t_digest_spark.sketches.req import ReqSketch
    s = ReqSketch.from_values(np.asarray(vals))
    r = ReqSketch.from_datasketches_bytes(s.to_datasketches_bytes())
    assert (r.n, r.num_retained) == (s.n, s.num_retained)
    if s.n:
        assert (r.min, r.max) == (s.min, s.max)
    for q in (0.1, 0.5, 0.9):
        assert r.quantile(q) == s.quantile(q)


@settings(max_examples=60, deadline=None)
@given(st.floats(min_value=-1.0, max_value=1.0,
                 allow_nan=False, width=64))
def test_fast_asin_error_bound_everywhere(x):
    from t_digest_spark.scales import fast_asin
    assert abs(fast_asin(x) - math.asin(x)) < 1e-6


# values that MAY include +/-inf atoms (adversarial-inf axis): the merge
# sweep must keep infinite atoms in pure clusters, and every query kernel
# must stay NaN-free and monotone no matter where the infinities land.
inf_mixed = st.lists(
    st.one_of(finite,
              st.sampled_from([math.inf, -math.inf])),
    min_size=1, max_size=400)


@settings(max_examples=60, deadline=None)
@given(inf_mixed)
def test_digest_invariants_with_infinite_atoms(vals):
    d = TDigest.from_values(np.asarray(vals))
    assert d.count == len(vals)
    assert d.min == min(vals) and d.max == max(vals)
    n_pos = sum(1 for v in vals if v == math.inf)
    n_neg = sum(1 for v in vals if v == -math.inf)
    # infinite clusters are PURE: their weight equals the atom multiplicity,
    # and no finite cluster absorbed an infinity (means NaN-free)
    assert not np.isnan(d.means).any()
    assert float(d.weights[np.isposinf(d.means)].sum()) == n_pos
    assert float(d.weights[np.isneginf(d.means)].sum()) == n_neg
    # quantile: NaN-free, monotone, endpoints exact
    qs = [d.quantile(q) for q in (0.0, 0.05, 0.25, 0.5, 0.75, 0.95, 1.0)]
    assert not any(math.isnan(v) for v in qs)
    assert all(b >= a for a, b in zip(qs, qs[1:]))
    assert qs[0] == min(vals) and qs[-1] == max(vals)
    # cdf: NaN-free, monotone, in [0,1], and the atom masses are exact at
    # probes outside the finite support
    fin = [v for v in vals if math.isfinite(v)]
    lo = min(fin) - 1.0 if fin else 0.0
    hi = max(fin) + 1.0 if fin else 0.0
    xs = sorted({lo, hi, *(float(v) for v in fin[:20])})
    cs = [d.cdf(x) for x in xs]
    assert not any(math.isnan(c) for c in cs)
    assert all(0.0 <= c <= 1.0 for c in cs)
    assert all(b >= a - 1e-12 for a, b in zip(cs, cs[1:]))
    n = len(vals)
    assert d.cdf(lo) == (n_neg + (0.5 if not fin and n_neg else 0.0)) / n \
        or abs(d.cdf(lo) - n_neg / n) <= 0.5 / n + 1e-12
    assert abs(d.cdf(hi) - (n - n_pos) / n) <= 0.5 / n + 1e-12
    # serde round-trips the infinite extremes exactly
    d2 = TDigest.from_bytes(d.to_bytes())
    np.testing.assert_array_equal(d2.means, d.means)
    assert d2.min == d.min and d2.max == d.max


@settings(max_examples=30, deadline=None)
@given(inf_mixed, inf_mixed)
def test_digest_merge_with_infinite_atoms(a, b):
    da = TDigest.from_values(np.asarray(a))
    db = TDigest.from_values(np.asarray(b))
    m = TDigest.merge_all([da, db])
    vals = a + b
    assert m.count == len(vals)
    assert m.min == min(vals) and m.max == max(vals)
    assert not np.isnan(m.means).any()
    n_pos = sum(1 for v in vals if v == math.inf)
    n_neg = sum(1 for v in vals if v == -math.inf)
    assert float(m.weights[np.isposinf(m.means)].sum()) == n_pos
    assert float(m.weights[np.isneginf(m.means)].sum()) == n_neg
