"""Ports of two reference core tests with no prior pytest analog.

* ReproTest.java:18-52 — heavily truncated duplicates (10 distinct values
  across 10k samples) "can wreak havoc with the t-digest invariants": the
  extreme quantiles of a digest built over such data must be EXACTLY the
  extreme tied values, build after build. (The reference's loop over
  ScaleFunction.values() pins every d1 to K_2 — `d1.setScaleFunction(K_2)`
  — so it only ever exercises K_2; this port genuinely sweeps the scale
  functions, which is the stated intent.)

* ComparisonTest.java:37-230 — the latency-regression demo and the
  compareChi2 pins: a one-minute digest scored against the previous hour's
  merged minute-digests at upper-quantile cuts detects a 1% contamination
  of 5x-slower transactions; plus the exact 2.77 two-singleton llr pin and
  the LogHistogram detector variant over the log_approx bin layout.
"""

import numpy as np
import pytest

from t_digest_spark.core import TDigest
from t_digest_spark.functions.compare import (compare_chi2_counts,
                                              compare_chi2_digests)
from t_digest_spark.operators.histogram import HistogramSpec
from t_digest_spark.scales import SCALES

# Every normalized scale function (the reference skips the NO_NORM gates:
# ReproTest.java:24-26).
REPRO_SCALES = sorted(s for s in SCALES if "no_norm" not in s)


@pytest.mark.parametrize("scale", REPRO_SCALES)
def test_repro_truncated_duplicates(scale):
    # ReproTest.java:18-52. Five seeds stand in for the reference's 500
    # insertion-order rebuilds (our bulk build is order-independent, so
    # distinct datasets are the only source of variation).
    for seed in (1, 2, 3, 4, 5):
        data = np.floor(np.random.default_rng(seed).uniform(0, 10, 10_000))
        d = TDigest.from_values(data, delta=100.0, scale=scale)
        d.compress()
        # distLow quantile(0/0.5/1) == 0 and distHigh == 9, i.e. every
        # rebuild returns exactly the tied extremes (ReproTest.java:41-46).
        # The GLUED tails deliberately allow larger end clusters, so the
        # second centroid can straddle the 0-run boundary and interpolation
        # lands epsilon inside the plateau — still monotone and tiny, but
        # not the exact-0 the K_2 reference run pins.
        if scale.endswith("_glued"):
            assert 0.0 <= d.quantile(0.001) < 0.01, (scale, seed)
            assert 8.99 < d.quantile(0.999) <= 9.0, (scale, seed)
        else:
            assert d.quantile(0.001) == 0.0, (scale, seed)
            assert d.quantile(0.999) == 9.0, (scale, seed)
        # and the size invariant survives the tie plateaus
        assert d.check_weights() <= max(3, 0.3 * d.centroid_count())


def test_compare_chi2_two_singletons_pin():
    # ComparisonTest.java:190-196: digests {1} vs {3} at a single cut give
    # the exact 2x2 perfect-separation G statistic 4*ln(2) = 2.77.
    d1 = TDigest.from_values(np.array([1.0]))
    d2 = TDigest.from_values(np.array([3.0]))
    assert compare_chi2_digests(d1, d2, q_cuts=(1.0,)) == pytest.approx(2.77, abs=0.01)


def _latency(n: int, failure_rate: float, rng) -> np.ndarray:
    """ComparisonTest.java:161-168 latencySampler: 10ms lognormal baseline,
    failures run 5x slower (50ms), same shape."""
    fail = rng.random(n) < failure_rate
    return np.where(fail, 50e-3, 10e-3) * np.exp(rng.normal(0, 1, n) / 2)


CUTS = (0.9, 0.99, 0.999, 0.9999)     # TdigestDetector cuts
PER_MINUTE = 6_000                     # rate=100/s x 60s


def test_detect_latency_problem_digest():
    # ComparisonTest.java:37-127 (TdigestDetector): reference distribution =
    # merge of the previous hour's 60 one-minute digests; each new minute is
    # scored with compareChi2 at upper-quantile cuts.
    rng = np.random.default_rng(7)
    history = [TDigest.from_values(_latency(PER_MINUTE, 0.0, rng))
               for _ in range(60)]
    ref = TDigest.merge_all(history)

    clean = [compare_chi2_digests(ref, TDigest.from_values(
        _latency(PER_MINUTE, 0.0, rng)), CUTS) for _ in range(5)]
    # failure onset per the simulation schedule: 0.1% then 1%
    small = compare_chi2_digests(ref, TDigest.from_values(
        _latency(PER_MINUTE, 0.001, rng)), CUTS)
    big = compare_chi2_digests(ref, TDigest.from_values(
        _latency(PER_MINUTE, 0.01, rng)), CUTS)

    # The demo's success criterion: the 1% failure minute is unambiguously
    # separated from every clean minute; the llr scale makes the margin wide.
    assert big > 10 * max(clean)
    assert big > small  # monotone in contamination


def test_detect_latency_problem_log_histogram():
    # ComparisonTest.java:129-159 (LogHistogramDetector): same scenario over
    # the LogHistogram(0.1e-3, 1) bin layout compared with the
    # histogram-layout chi2 (counts llr).
    spec = HistogramSpec(0.1e-3, 1.0, kind="log_approx", epsilon_factor=0.1)
    edges = np.asarray(spec.edges(), dtype=np.float64)

    def counts(x):
        idx = np.clip(np.searchsorted(edges, x, side="right") - 1,
                      0, spec.n_bins - 1)
        return np.bincount(idx, minlength=spec.n_bins)

    rng = np.random.default_rng(11)
    ref = counts(_latency(60 * PER_MINUTE, 0.0, rng))
    clean = compare_chi2_counts(ref, counts(_latency(PER_MINUTE, 0.0, rng)))
    big = compare_chi2_counts(ref, counts(_latency(PER_MINUTE, 0.01, rng)))
    # ~100 fine bins give the llr a real sampling-noise floor on clean
    # minutes (unlike the 5-bin digest detector), so the demo's criterion
    # here is separation, not near-zero cleanliness.
    assert big > 2.5 * clean
