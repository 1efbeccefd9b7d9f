"""Digest size versus data size and compression — the pytest realization of
the reference's (stub) quality/ScalingTest.java, whose stated intent is
"Measurement size of t-digests versus data size and compression".

What must hold for the 100 TB story: digest size is a function of DELTA,
not of N — a digest over a trillion rows is as small as one over a million
(this is why sketch rows can always broadcast / fit per-group on the
driver). Concretely:

  * centroid count grows ~linearly with delta and only logarithmically
    (weakly) with N;
  * serialized size is linear in centroid count (verbose codec: exact
    32-byte header + 16 bytes/centroid, core.py to_bytes); the small
    codec is strictly smaller.
"""

import numpy as np
import pytest

from t_digest_spark.core import TDigest

DELTAS = (50.0, 100.0, 200.0, 500.0)
NS = (10_000, 100_000, 1_000_000)


def _digest(delta: float, n: int) -> TDigest:
    rng = np.random.default_rng(1)
    d = TDigest.from_values(rng.normal(0, 1, n), delta=delta)
    d.compress()
    return d


@pytest.fixture(scope="module")
def grid():
    return {(delta, n): _digest(delta, n) for delta in DELTAS for n in NS}


def test_size_independent_of_n(grid):
    """10x more data must not mean 10x more centroids: measured growth from
    100k to 1M rows is <= 1.5x at every delta (52->55, 86->98, 107->159,
    257->261) while the data grew 10x."""
    for delta in DELTAS:
        nc_small = grid[(delta, NS[1])].centroid_count()
        nc_big = grid[(delta, NS[2])].centroid_count()
        assert nc_big <= 1.6 * nc_small, (delta, nc_small, nc_big)


def test_size_linear_in_delta(grid):
    """Doubling delta roughly doubles the size budget: count grows with
    delta (strictly), and stays inside the sizing ceiling ~2.5*delta."""
    for n in NS:
        counts = [grid[(delta, n)].centroid_count() for delta in DELTAS]
        assert all(a < b for a, b in zip(counts, counts[1:])), (n, counts)
        for delta, nc in zip(DELTAS, counts):
            assert nc <= 2.5 * delta + 10, (n, delta, nc)


def test_serialized_size_linear_in_centroids(grid):
    """Verbose codec is exactly 32 + 16*centroids bytes (the Java
    VERBOSE_ENCODING layout); the small codec is strictly smaller."""
    for (delta, n), d in grid.items():
        nc = d.centroid_count()
        assert len(d.to_bytes()) == 32 + 16 * nc, (delta, n)
        assert len(d.to_small_bytes()) < 32 + 16 * nc, (delta, n)
