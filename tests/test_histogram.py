"""Histogram operator: counts vs numpy oracle, merge algebra, quantile/cdf."""

import math

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F

from t_digest_spark.operators.histogram import (HistogramSpec,
                                                histogram_aggregate,
                                                histogram_cdf,
                                                histogram_merge,
                                                histogram_quantile)


@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("hist-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _np_counts(vals, spec):
    edges = np.array(spec.edges())
    counts, _ = np.histogram(vals[(vals >= spec.lo) & (vals < spec.hi)], bins=edges)
    return counts


def test_linear_counts_match_numpy(spark):
    rng = np.random.default_rng(42)
    vals = rng.uniform(-10, 110, 5000)
    spec = HistogramSpec(0.0, 100.0, n_bins=20, kind="linear")
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    row = histogram_aggregate(df, "x", None, spec).collect()[0]
    np.testing.assert_array_equal(np.array(row.counts), _np_counts(vals, spec))
    assert row.underflow == int((vals < 0).sum())
    assert row.overflow == int((vals >= 100).sum())
    assert row.total == 5000


def test_log_counts_match_numpy(spark):
    rng = np.random.default_rng(7)
    vals = np.exp(rng.normal(3.0, 1.0, 4000))
    spec = HistogramSpec(1.0, 4096.0, bins_per_octave=5, kind="log")
    assert spec.n_bins == 60  # 12 octaves * 5
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    row = histogram_aggregate(df, "x", None, spec).collect()[0]
    got = np.array(row.counts)
    want = _np_counts(vals, spec)
    # float-boundary rows can land one bin apart; totals must agree and
    # per-bin disagreement is bounded by edge collisions (none for this rng)
    np.testing.assert_array_equal(got, want)


def test_grouped_and_merge_equivalence(spark):
    """Merging per-group histograms == histogram of the union (the
    Histogram.add contract: elementwise count sums)."""
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "g": np.repeat(["a", "b", "c"], 1000),
        "x": rng.uniform(0, 100, 3000),
    })
    spec = HistogramSpec(0.0, 100.0, n_bins=10, kind="linear")
    df = spark.createDataFrame(pdf)
    per_group = histogram_aggregate(df, "x", ["g"], spec)
    merged = histogram_merge(per_group, None).collect()[0]
    whole = histogram_aggregate(df, "x", None, spec).collect()[0]
    assert list(merged.counts) == list(whole.counts)
    assert merged.total == whole.total


def test_cdf_and_quantile(spark):
    vals = np.arange(10_000, dtype=np.float64)  # uniform 0..9999
    spec = HistogramSpec(0.0, 10_000.0, n_bins=100, kind="linear")
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    h = histogram_aggregate(df, "x", None, spec)
    row = h.select(
        histogram_cdf(spec, 2500.0).alias("cdf25"),
        histogram_quantile(spec, 0.5).alias("p50"),
        histogram_quantile(spec, 0.99).alias("p99"),
    ).collect()[0]
    assert abs(row.cdf25 - 0.25) < 0.011  # bin-resolution bounded
    assert abs(row.p50 - 5000.0) < 100.0
    assert abs(row.p99 - 9900.0) < 100.0


def test_nulls_and_nans_ignored(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0, float("nan"), None, 50.0]})
    spec = HistogramSpec(0.0, 100.0, n_bins=10, kind="linear")
    df = spark.createDataFrame(pdf)
    row = histogram_aggregate(df, "x", None, spec).collect()[0]
    assert row.total == 3


def test_spec_validation():
    with pytest.raises(ValueError):
        HistogramSpec(10.0, 1.0, n_bins=5, kind="linear")
    with pytest.raises(ValueError):
        HistogramSpec(0.0, 100.0, n_bins=5, kind="log")  # lo must be > 0
    with pytest.raises(ValueError):
        HistogramSpec(1.0, 100.0, kind="linear")  # n_bins required
    with pytest.raises(ValueError):
        HistogramSpec(1.0, 100.0, n_bins=5, kind="banana")


def test_cdf_interpolates_partial_bin(spark):
    """Off-edge x: the containing bin contributes its interpolated fraction
    (ADVICE r1: previously the partial bin's mass was dropped entirely)."""
    vals = np.arange(10_000, dtype=np.float64)  # uniform 0..9999
    spec = HistogramSpec(0.0, 10_000.0, n_bins=100, kind="linear")
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    h = histogram_aggregate(df, "x", None, spec)
    row = h.select(
        histogram_cdf(spec, 2550.0).alias("mid"),     # half-way into bin 25
        histogram_cdf(spec, 2500.0).alias("edge"),    # exactly on the edge
        histogram_cdf(spec, -5.0).alias("below"),
        histogram_cdf(spec, 10_500.0).alias("above"),
    ).collect()[0]
    assert row.mid == pytest.approx(0.255, abs=1e-9)
    assert row.edge == pytest.approx(0.25, abs=1e-9)
    assert row.below == 0.0
    assert row.above == 1.0
