"""Scale-function tests ported from the reference's assertions
(ScaleFunctionTests.java:37-43, :52-100, :109-169, :172-204)."""

import math

import numpy as np
import pytest

from t_digest_spark.scales import SCALES


QS = np.concatenate([np.array([1e-12, 1e-9, 1e-6, 1e-4]),
                     np.linspace(0.001, 0.999, 201),
                     1 - np.array([1e-12, 1e-9, 1e-6, 1e-4])])


@pytest.mark.parametrize("name", sorted(SCALES))
@pytest.mark.parametrize("delta", [20.0, 100.0, 500.0])
@pytest.mark.parametrize("n", [100.0, 1e6, 1e10])
def test_forward_inverse_roundtrip(name, delta, n):
    s = SCALES[name]
    norm = s.normalizer(delta, n)
    k = s.k(QS, norm)
    back = s.q(k, norm)
    # round-trip to 1e-10 except where the clamp engaged (ScaleFunctionTests.java:52-100);
    # k1_fast is approximate BY DESIGN (fastAsin error <= 1e-6 through exact
    # sin in q()), so its roundtrip is only asin-approximation-tight
    tol = 1e-5 if name == "k1_fast" else 1e-9
    interior = (QS > 1e-14) & (QS < 1 - 1e-14)
    assert np.max(np.abs(back[interior] - QS[interior])) < tol


@pytest.mark.parametrize("name", sorted(SCALES))
def test_k_monotone(name):
    s = SCALES[name]
    norm = s.normalizer(100.0, 1e6)
    k = s.k(np.sort(QS), norm)
    assert np.all(np.diff(k) >= 0)


@pytest.mark.parametrize("name", sorted(SCALES))
def test_max_matches_k_derivative(name):
    """max(q) should approximate the cluster width where k increases by 1 —
    i.e. q(k(q)+1) - q(q's k) ~ max(q) (ScaleFunctionTests.java:109-169 spirit)."""
    s = SCALES[name]
    norm = s.normalizer(200.0, 1e6)
    for q in [0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99]:
        k = float(s.k(q, norm))
        width = float(s.q(k + 0.5, norm)) - float(s.q(k - 0.5, norm))
        mx = float(s.max(q, norm))
        if name == "k_quadratic":
            # reference artifact kept for parity: the 2-arg Java max uses
            # int division "3 / 2" == 1, so max undershoots the true
            # derivative width by exactly 1.5x (scales.py _KQuadratic.max,
            # verified vs the compiled reference)
            mx *= 1.5
        assert width == pytest.approx(mx, rel=0.35), (name, q)


def test_k0_exact_formulas():
    s = SCALES["k0"]
    # k = delta*q/2 in compression form == normalizer*q with normalizer=delta/2
    assert float(s.k(0.25, s.normalizer(100, 0))) == pytest.approx(100 * 0.25 / 2)
    assert float(s.max(0.3, s.normalizer(100, 0))) == pytest.approx(2 / 100)


def test_k2_normalizer_formula():
    s = SCALES["k2"]
    delta, n = 100.0, 1e6
    z = 4 * np.log(n / delta) + 24
    assert s.normalizer(delta, n) == pytest.approx(delta / z)


def test_k3_symmetry():
    s = SCALES["k3"]
    norm = s.normalizer(100.0, 1e6)
    for q in [0.01, 0.2, 0.4]:
        assert float(s.k(q, norm)) == pytest.approx(-float(s.k(1 - q, norm)))


def test_glued_continuity_at_split():
    """Glued variants must be continuous across the split point
    (the tangent-glue construction, ScaleFunction.java:154-229)."""
    for name in ("k1_glued", "k2_glued", "k3_glued"):
        s = SCALES[name]
        norm = s.normalizer(100.0, 1e6)
        eps = 1e-9
        below = float(s.k(0.5 - eps, norm))
        above = float(s.k(0.5 + eps, norm))
        assert abs(above - below) < 1e-6, name
        # uniform below split: k is linear there
        k1 = float(s.k(0.1, norm))
        k2 = float(s.k(0.2, norm))
        k3 = float(s.k(0.3, norm))
        assert (k3 - k2) == pytest.approx(k2 - k1, rel=1e-9), name


def test_unnormalized_guard():
    """Unnormalized scales are rejected unless opted in (TDigest.java:170-180)."""
    from t_digest_spark.core import TDigest
    with pytest.raises(ValueError, match="unnormalized"):
        TDigest(scale="k2_no_norm")
    d = TDigest(delta=50.0, scale="k2_no_norm", unnormalized_ok=True)
    d.add_values(np.linspace(0, 1, 10000))
    assert abs(d.quantile(0.5) - 0.5) < 0.01
    # normalized and unnormalized K_2 agree through the digest within tolerance
    d2 = TDigest(delta=50.0, scale="k2")
    d2.add_values(np.linspace(0, 1, 10000))
    assert abs(d.quantile(0.9) - d2.quantile(0.9)) < 0.01


def test_quadratic_digest_end_to_end():
    from t_digest_spark.core import TDigest
    rng = np.random.default_rng(9)
    vals = rng.exponential(1.0, 50000)
    d = TDigest.from_values(vals, delta=200.0, scale="k_quadratic")
    srt = np.sort(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        exact = srt[int(q * len(srt))]
        assert abs(d.cdf(exact) - q) < 0.02, q


def test_fast_asin_reference_contract():
    """Port of ScaleFunctionTests.asinApproximation + testApproximation
    (ScaleFunctionTests.java:37-43, :210-222): error vs asin < 1e-6 over
    [-1, 1], monotonic, exact at 1, NaN beyond 1."""
    from t_digest_spark.scales import fast_asin
    x = np.arange(-1.0, 1.0, 1e-5)
    got = fast_asin(x)
    err = np.abs(np.arcsin(x) - got)
    assert err.max() < 1e-6
    assert (np.diff(got) >= 0).all()            # monotonic
    assert fast_asin(1.0) == math.asin(1.0)     # exact at the endpoint
    assert math.isnan(fast_asin(1.0001))
    assert fast_asin(-1.0) == -math.asin(1.0)
    # Java's fastAsin(0) takes the positive model path and returns the
    # spline's tiny bias, NOT exact zero (verified vs the compiled
    # reference: -6.2e-8); parity keeps that behavior
    assert abs(fast_asin(0.0)) < 1e-6 and fast_asin(0.0) != 0.0


def test_k1_fast_scale_behaves_like_k1():
    """K_1_FAST: same cluster-size law as K_1 within the fastAsin error."""
    from t_digest_spark.scales import get_scale
    k1 = get_scale("k1")
    kf = get_scale("k1_fast")
    norm = k1.normalizer(100.0, 10_000)
    assert kf.normalizer(100.0, 10_000) == norm
    q = np.linspace(0.001, 0.999, 500)
    assert np.abs(kf.k(q, norm) - k1.k(q, norm)).max() <= norm * 1.1e-6
    k = np.linspace(-norm * 1.5, norm * 1.5, 100)
    assert np.allclose(kf.q(k, norm), k1.q(k, norm))


def test_k1_fast_digest_build():
    from t_digest_spark.core import TDigest
    rng = np.random.default_rng(9)
    vals = rng.normal(0, 1, 50_000)
    d = TDigest.from_values(vals, delta=100.0, scale="k1_fast")
    srt = np.sort(vals)
    for q in (0.01, 0.5, 0.99):
        rank = np.searchsorted(srt, d.quantile(q)) / len(srt)
        assert abs(rank - q) < 0.01, q
    d.check_weights()


def test_scalar_fast_paths_match_array_forms():
    """max_scalar / normalizer_scalar (the AVL per-point fast paths) must
    agree exactly with the vectorized forms they shadow."""
    import numpy as np
    from t_digest_spark.scales import get_scale
    qs = [0.0, 1e-12, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0 - 1e-12, 1.0]
    for name in ("k0", "k1", "k2", "k3", "k1_glued", "k2_glued"):
        sc = get_scale(name)
        maxf = getattr(sc, "max_scalar", None)
        normf = getattr(sc, "normalizer_scalar", None)
        assert maxf is not None, name
        assert normf is not None, name
        for delta, n in ((100.0, 1.0), (100.0, 1e6), (500.0, 1e9)):
            assert normf(delta, n) == float(sc.normalizer(delta, n)), (name, n)
            norm = float(sc.normalizer(delta, n))
            for q in qs:
                assert maxf(q, norm) == float(np.asarray(sc.max(q, norm))), \
                    (name, q)
