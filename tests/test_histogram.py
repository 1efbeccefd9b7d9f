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


def _java_float_bucket(x, lo, bits):
    import struct as _s
    y = x / lo
    b = _s.unpack("<q", _s.pack("<d", y))[0]
    return (b >> (52 - bits)) - (0x3FF << bits)


def _java_approx_log2(v):
    import struct as _s
    b = _s.unpack("<q", _s.pack("<d", v))[0]
    e = ((b & 0x7FF0000000000000) >> 52) - 1024
    m = _s.unpack("<d", _s.pack("<q", (b & 0x800FFFFFFFFFFFFF) | 0x3FF0000000000000))[0]
    return m * (2 - m / 3.0) + e - 2.0 / 3.0


def test_approx_log2_reference_contract():
    """LogHistogram.approxLog2 port: error < ±0.01, exact at powers of 2,
    exact round trip with its pow2 inverse."""
    from t_digest_spark.operators.histogram import _pow2_approx, approx_log2
    xs = np.exp(np.linspace(np.log(0.001), np.log(1e6), 20_000))
    got = np.array([approx_log2(float(x)) for x in xs])
    assert np.abs(got - np.log2(xs)).max() < 0.01
    for p in (-8, -1, 0, 1, 10, 40):
        # "zero error at powers of two" holds mathematically; in FP the same
        # ~1e-16 arithmetic residue appears in the Java original too
        assert approx_log2(2.0 ** p) == pytest.approx(p, abs=1e-12)
    for x in (0.37, 1.0, 5.5, 123.456):
        assert _pow2_approx(approx_log2(x)) == pytest.approx(x, rel=1e-12)
    # parity with the Java bit-twiddling formulation
    for x in (0.001, 0.37, 1.0, 7.3, 1e5):
        assert approx_log2(x) == _java_approx_log2(x)


def test_float_repr_buckets_match_java_bits(spark):
    """Catalyst float_repr bucket == exact Java doubleToLongBits formula on
    random positive values (FloatHistogram.java:69-73 parity)."""
    rng = np.random.default_rng(55)
    vals = np.exp(rng.uniform(np.log(1.0), np.log(900.0), 4000))
    spec = HistogramSpec(1.0, 1000.0, kind="float_repr", bins_per_decade=50)
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    got = (df.select(spec.bucket(F.col("x")).alias("b"))
           .toPandas()["b"].to_numpy())
    want = np.array([_java_float_bucket(float(x), 1.0, spec.bits)
                     for x in vals])
    assert (got == want).all()
    # lowerBound parity: edge[k] <= x < edge[k+1] for in-range values
    edges = np.array(spec.edges())
    inr = (want >= 0) & (want < spec.n_bins)
    assert (edges[want[inr]] <= vals[inr] + 1e-12).all()
    assert (vals[inr] < edges[want[inr] + 1] + 1e-12).all()


def test_log_approx_buckets_match_java(spark):
    """Catalyst log_approx bucket == (int)(approxLog2(x)*logFactor-logOffset)
    (LogHistogram.java:93-95 parity)."""
    rng = np.random.default_rng(56)
    vals = np.exp(rng.uniform(np.log(1.0), np.log(900.0), 4000))
    spec = HistogramSpec(1.0, 1000.0, kind="log_approx", epsilon_factor=0.1)
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    got = (df.select(spec.bucket(F.col("x")).alias("b"))
           .toPandas()["b"].to_numpy())
    want = np.array([int(_java_approx_log2(float(x)) * spec.log_factor
                         - spec.log_offset) for x in vals])
    assert (got == want).all()


def test_new_kinds_aggregate_and_merge(spark):
    """The reference-layout kinds run through the standard aggregate/merge/
    quantile machinery."""
    from t_digest_spark.operators.histogram import histogram_merge
    rng = np.random.default_rng(57)
    vals = np.exp(rng.uniform(np.log(2.0), np.log(800.0), 20_000))
    pdf = pd.DataFrame({"g": np.where(np.arange(20_000) % 2 == 0, "a", "b"),
                        "x": vals})
    df = spark.createDataFrame(pdf)
    for kind, kw in (("float_repr", {"bins_per_decade": 50}),
                     ("log_approx", {"epsilon_factor": 0.1})):
        spec = HistogramSpec(1.0, 1000.0, kind=kind, **kw)
        h = histogram_aggregate(df, "x", ["g"], spec)
        rows = {r.g: r for r in h.collect()}
        assert rows["a"].total + rows["b"].total == 20_000
        merged = histogram_merge(h, None).collect()[0]
        assert merged.total == 20_000
        p50 = histogram_quantile(spec, 0.5)
        got = h.select(p50.alias("p50")).collect()
        med = np.median(vals)
        for r in got:
            assert abs(r.p50 - med) / med < 0.15


def test_new_kind_validation():
    with pytest.raises(ValueError):
        HistogramSpec(-1.0, 100.0, kind="float_repr")
    with pytest.raises(ValueError):
        HistogramSpec(10.0, 15.0, kind="float_repr")      # max <= 2*min
    with pytest.raises(ValueError):
        HistogramSpec(1.0, 100.0, kind="float_repr", bins_per_decade=2)
    with pytest.raises(ValueError):
        HistogramSpec(1.0, 100.0, kind="log_approx", epsilon_factor=0.9)
