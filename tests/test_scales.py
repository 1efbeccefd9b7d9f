"""Scale-function tests ported from the reference's assertions
(ScaleFunctionTests.java:37-43, :52-100, :109-169, :172-204)."""

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
    # round-trip to 1e-10 except where the clamp engaged (ScaleFunctionTests.java:52-100)
    interior = (QS > 1e-14) & (QS < 1 - 1e-14)
    assert np.max(np.abs(back[interior] - QS[interior])) < 1e-9


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
