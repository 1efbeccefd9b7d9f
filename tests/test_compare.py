"""Comparison statistics: llr G-test, chi2 over digests, normalized KS."""

import math

import numpy as np
import pandas as pd
import pytest

from t_digest_spark.core import TDigest
from t_digest_spark.functions.compare import (chi2_udf, compare_chi2_counts,
                                              compare_chi2_digests, ks_digests,
                                              ks_udf, llr)


def test_llr_identical_rows_zero():
    assert llr(np.array([[10, 20, 30], [10, 20, 30]])) == pytest.approx(0.0, abs=1e-9)


def test_llr_known_value():
    # 2x2 table [[k11,k12],[k21,k22]] — G = 2*sum(k*ln(k/E))
    k = np.array([[100.0, 10.0], [10.0, 100.0]])
    expected = 0.0
    total = k.sum()
    rows = k.sum(axis=1)
    cols = k.sum(axis=0)
    for i in range(2):
        for j in range(2):
            e = rows[i] * cols[j] / total
            expected += 2 * k[i, j] * math.log(k[i, j] / e)
    assert llr(k) == pytest.approx(expected, rel=1e-12)


def test_llr_rejects_negative():
    with pytest.raises(ValueError):
        llr(np.array([[1.0, -2.0]]))


def test_chi2_same_vs_shifted():
    rng = np.random.default_rng(42)
    a = TDigest.from_values(rng.normal(0, 1, 20_000))
    b = TDigest.from_values(rng.normal(0, 1, 20_000))
    c = TDigest.from_values(rng.normal(1.0, 1, 20_000))
    same = compare_chi2_digests(a, b)
    diff = compare_chi2_digests(a, c)
    assert diff > 50 * max(same, 1.0)


def test_chi2_counts_layout_guard():
    with pytest.raises(ValueError):
        compare_chi2_counts([1, 2, 3], [1, 2])


def test_ks_same_vs_shifted():
    rng = np.random.default_rng(7)
    a = TDigest.from_values(rng.normal(0, 1, 10_000))
    b = TDigest.from_values(rng.normal(0, 1, 10_000))
    c = TDigest.from_values(rng.normal(2.0, 1, 10_000))
    same = ks_digests(a, b)
    diff = ks_digests(a, c)
    # same-dist score ~ O(1); true KS distance for 2-sigma shift is ~0.68
    # so normalized score ~ 0.68*sqrt(5000) ~ 48
    assert same < 5.0
    assert diff > 20.0
    assert diff > 10 * same


def test_ks_empty_nan():
    a = TDigest.from_values(np.array([1.0, 2.0]))
    b = TDigest()
    assert math.isnan(ks_digests(a, b))


def test_ks_and_chi2_with_infinite_atoms():
    """Digests that ingested +/-inf points (adversarial-inf axis): the scan
    grid must skip the infinite means (cdf rejects them, reference parity)
    and probe outside the finite support instead, capturing the infinite
    atoms' mass difference; chi2's cdf-at-quantile-cut path goes through
    the mid-rank extension. On inf-free digests both are unchanged."""
    rng = np.random.default_rng(7)
    base = rng.uniform(0.0, 100.0, 4000)
    a = TDigest.from_values(np.concatenate([base, [np.inf] * 400]))
    b = TDigest.from_values(base)
    ks = ks_digests(a, b)
    assert math.isfinite(ks) and ks > 0
    # the +inf atom holds ~400/4400 of a's mass; at x just above the finite
    # support |Fa - Fb| = that atom mass (Fb = 1 there). Normalized by
    # sqrt(n1*n2/(n1+n2)).
    expect = (400 / 4400) * math.sqrt(4400 * 4000 / 8400)
    assert ks == pytest.approx(expect, rel=0.10)   # digest interpolation slack
    chi2 = compare_chi2_digests(a, b)
    assert math.isfinite(chi2) and chi2 >= 0
    # symmetric probe: -inf atoms, and both-sides-infinite
    c = TDigest.from_values(np.concatenate([base, [-np.inf] * 400]))
    assert math.isfinite(ks_digests(c, b))
    assert math.isfinite(ks_digests(a, c))
    # all mass infinite on one side
    d = TDigest.from_values(np.array([np.inf, np.inf, -np.inf]))
    assert math.isfinite(ks_digests(d, b))


def test_trimmed_mean_with_infinite_atom():
    """An infinite atom OUTSIDE [lo, hi] must not poison the trimmed mean
    (inf * 0-overlap = NaN before the fix); one WITH overlap legitimately
    makes it infinite."""
    rng = np.random.default_rng(3)
    v = rng.uniform(900.0, 100000.0, 1500)
    d = TDigest.from_values(np.concatenate([v, [np.inf]]))
    tm = d.trimmed_mean(0.25, 0.75)
    srt = np.sort(v)
    exact = srt[int(0.25 * srt.size):int(0.75 * srt.size)].mean()
    assert tm == pytest.approx(exact, rel=0.02)
    heavy = TDigest.from_values(
        np.concatenate([np.arange(10.0), [np.inf] * 20]))
    assert heavy.trimmed_mean(0.25, 0.75) == np.inf


@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("compare-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def test_compare_udfs_on_spark(spark):
    """Digest-vs-digest comparison as a column op over paired digest rows."""
    import pyspark.sql.functions as F
    from t_digest_spark.operators import tdigest_aggregate

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "g": np.repeat(["base", "same", "shifted"], 5000),
        "x": np.concatenate([rng.normal(0, 1, 5000), rng.normal(0, 1, 5000),
                             rng.normal(3, 1, 5000)]),
    })
    digs = tdigest_aggregate(spark.createDataFrame(pdf), "x", ["g"])
    base = digs.where(F.col("g") == "base").select(
        F.col("means").alias("m1"), F.col("weights").alias("w1"),
        F.col("dmin").alias("lo1"), F.col("dmax").alias("hi1"))
    others = digs.where(F.col("g") != "base")
    paired = others.crossJoin(F.broadcast(base))
    out = {r.g: r for r in paired.select(
        "g",
        ks_udf()("m1", "w1", "lo1", "hi1", "means", "weights", "dmin", "dmax").alias("ks"),
        chi2_udf()("m1", "w1", "lo1", "hi1", "means", "weights", "dmin", "dmax").alias("chi2"),
    ).collect()}
    assert out["shifted"].ks > 10 * max(out["same"].ks, 0.5)
    assert out["shifted"].chi2 > 10 * max(out["same"].chi2, 1.0)
