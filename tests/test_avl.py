"""AVLTreeDigest port: behavior gates modeled on the reference's
TDigestTest/AVLTreeDigestTest suites (quantile accuracy on smooth laws,
repeated-point handling, serde round-trips, merge-as-re-add)."""

import math
import struct

import numpy as np
import pytest

from t_digest_spark.avl import AVLTreeDigest
from t_digest_spark.core import Dist


def _rank(sorted_vals, x):
    lo = np.searchsorted(sorted_vals, x, side="left")
    hi = np.searchsorted(sorted_vals, x, side="right")
    return (lo + hi) / 2.0 / len(sorted_vals)


def test_empty_and_singleton():
    d = AVLTreeDigest()
    assert math.isnan(d.quantile(0.5))
    assert math.isnan(d.cdf(1.0))
    d.add(5.0)
    assert d.quantile(0.0) == d.quantile(1.0) == 5.0
    assert d.cdf(4.0) == 0.0 and d.cdf(6.0) == 1.0 and d.cdf(5.0) == 0.5


def test_uniform_quantile_accuracy():
    """compression=N gives quantile rank errors well under 3/N
    (AVLTreeDigest.java:36-40 accuracy claim)."""
    rng = np.random.default_rng(17)
    vals = rng.uniform(0, 1, 50_000)
    d = AVLTreeDigest.from_values(vals, delta=100.0)
    srt = np.sort(vals)
    for q in (0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999):
        r = _rank(srt, d.quantile(q))
        assert abs(r - q) < 0.01, (q, r)
    for x in (0.1, 0.5, 0.9):
        assert abs(d.cdf(x) - _rank(srt, x)) < 0.01, x


def test_normal_tails():
    rng = np.random.default_rng(23)
    vals = rng.normal(0, 1, 100_000)
    d = AVLTreeDigest.from_values(vals, delta=200.0)
    srt = np.sort(vals)
    for q in (0.0001, 0.001, 0.999, 0.9999):
        r = _rank(srt, d.quantile(q))
        assert abs(r - q) < 0.002, (q, r)


def test_repeated_points_no_blowup():
    """Lots of repeats: the uniform-among-candidates selection keeps the
    centroid count bounded and quantiles sane (the 'slightly clever
    selection method' comment, AVLTreeDigest.java:125-127)."""
    vals = np.tile(np.arange(10, dtype=np.float64), 10_000)
    d = AVLTreeDigest.from_values(vals, delta=100.0)
    assert d.centroid_count() < 20 * 100
    assert d.total == 100_000
    assert 4.0 <= d.quantile(0.5) <= 5.0
    assert d.min == 0.0 and d.max == 9.0


def test_min_max_and_count():
    rng = np.random.default_rng(5)
    vals = rng.normal(10, 3, 10_000)
    d = AVLTreeDigest.from_values(vals)
    assert d.min == vals.min() and d.max == vals.max()
    assert d.count == 10_000
    d.check_weights()


def test_weighted_add_matches_repeats():
    a = AVLTreeDigest(seed=7)
    b = AVLTreeDigest(seed=7)
    rng = np.random.default_rng(11)
    xs = rng.uniform(0, 100, 500)
    for x in xs:
        a.add(x, 20.0)
    for x in xs:
        b.add_values(np.full(20, x))
    for q in (0.1, 0.5, 0.9):
        assert abs(a.quantile(q) - b.quantile(q)) < 2.0


def test_merge_digests():
    rng = np.random.default_rng(29)
    parts = [rng.normal(0, 1, 20_000) for _ in range(4)]
    ds = [AVLTreeDigest.from_values(p, delta=100.0) for p in parts]
    merged = AVLTreeDigest(delta=100.0).merge(ds)
    allv = np.sort(np.concatenate(parts))
    assert merged.count == len(allv)
    for q in (0.01, 0.5, 0.99):
        r = _rank(allv, merged.quantile(q))
        assert abs(r - q) < 0.015, (q, r)


def test_serde_verbose_roundtrip():
    rng = np.random.default_rng(31)
    d = AVLTreeDigest.from_values(rng.normal(0, 1, 20_000))
    b = d.to_bytes()
    assert struct.unpack_from(">i", b, 0)[0] == 1    # VERBOSE_ENCODING
    r = AVLTreeDigest.from_bytes(b)
    assert r.min == d.min and r.max == d.max
    assert r.count == d.count
    for q in (0.05, 0.5, 0.95):
        assert abs(r.quantile(q) - d.quantile(q)) < 0.05


def test_serde_small_roundtrip():
    rng = np.random.default_rng(37)
    d = AVLTreeDigest.from_values(rng.uniform(0, 1000, 20_000))
    b = d.to_bytes(small=True)
    assert struct.unpack_from(">i", b, 0)[0] == 2    # SMALL_ENCODING
    assert len(b) < len(d.to_bytes())                # actually smaller
    r = AVLTreeDigest.from_bytes(b)
    assert r.count == d.count
    for q in (0.05, 0.5, 0.95):
        # float32 mean deltas: relative tolerance
        assert abs(r.quantile(q) - d.quantile(q)) < 1.0


def test_serde_rejects_garbage():
    with pytest.raises(ValueError):
        AVLTreeDigest.from_bytes(struct.pack(">idddi", 9, 0, 1, 100, 0))


def test_varint_codec():
    from t_digest_spark.avl import _decode_varint, _encode_varint
    for n in (0, 1, 127, 128, 300, 65_535, 2**21, 2**28 - 1):
        out = bytearray()
        _encode_varint(out, n)
        got, pos = _decode_varint(bytes(out), 0)
        assert got == n and pos == len(out)


def test_varint_codec_random_sweep():
    """TDigestUtilTest.testIntEncoding analog (core/src/test/.../
    TDigestUtilTest.java:31-48): 3000 random 32-bit ints, each
    unsigned-right-shifted by i/100 so the stream sweeps every varint
    byte-length boundary (5-byte negatives down to 1-byte smalls), all
    encoded into ONE buffer and decoded back in order. Java's decode
    returns the signed int bit pattern; the Python codec surfaces the
    same bits as the unsigned value, so parity is via `& 0xFFFFFFFF`."""
    from t_digest_spark.avl import _decode_varint, _encode_varint
    rng = np.random.default_rng(42)
    raw = rng.integers(-2**31, 2**31, size=3000, dtype=np.int64)
    ref, out = [], bytearray()
    for i, r in enumerate(raw):
        shift = i // 100
        n = (int(r) & 0xFFFFFFFF) >> shift
        if shift == 0:
            n = int(r)  # Java n >>> 0 keeps the signed bit pattern
        ref.append(n & 0xFFFFFFFF)
        _encode_varint(out, n)
    data, pos = bytes(out), 0
    for i, expect in enumerate(ref):
        got, pos = _decode_varint(data, pos)
        assert got == expect, f"{i}:"
    assert pos == len(data)


def test_against_merging_digest():
    """Both variants approximate the same distribution: quantiles agree
    within the combined error envelope."""
    from t_digest_spark.core import TDigest
    rng = np.random.default_rng(41)
    vals = rng.gamma(2.0, 3.0, 50_000)
    a = AVLTreeDigest.from_values(vals, delta=100.0)
    m = TDigest.from_values(vals, delta=100.0)
    srt = np.sort(vals)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        ra = _rank(srt, a.quantile(q))
        rm = _rank(srt, m.quantile(q))
        assert abs(ra - q) < 0.01 and abs(rm - q) < 0.01


def test_exact_small_regime_vs_dist():
    """Tiny inputs: digest answers match the exact Dist oracle closely."""
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0])
    d = AVLTreeDigest.from_values(vals, delta=500.0)
    for q in (0.25, 0.5, 0.75):
        assert abs(d.quantile(q) - Dist.quantile(q, vals)) <= 1.0
    for x in (2.5, 5.0, 7.5):
        assert abs(d.cdf(x) - Dist.cdf(x, vals)) <= 0.1


@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("avl-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def test_avltree_aggregate_spark(spark):
    """Distributed AVL build: partial per partition + re-add merge matches
    exact quantiles within the 3/compression envelope."""
    import pandas as pd
    from t_digest_spark.avl import avl_quantile_udf
    from t_digest_spark.operators.aggregation import avltree_aggregate

    rng = np.random.default_rng(47)
    pdf = pd.DataFrame({"g": np.repeat(["a", "b"], 25_000),
                        "x": np.concatenate([rng.normal(0, 1, 25_000),
                                             rng.uniform(0, 100, 25_000)])})
    df = spark.createDataFrame(pdf).repartition(8)
    dig = avltree_aggregate(df, "x", ["g"])
    rows = dig.select("g", avl_quantile_udf(0.5)(
        "means", "weights", "dmin", "dmax").alias("p50")).collect()
    got = {r.g: r.p50 for r in rows}
    for g in ("a", "b"):
        srt = np.sort(pdf[pdf.g == g].x.to_numpy())
        r = _rank(srt, got[g])
        assert abs(r - 0.5) < 0.015, (g, r)
    counts = {r.g: r for r in dig.select("g", "count", "dmin", "dmax").collect()}
    for g in ("a", "b"):
        sub = pdf[pdf.g == g].x
        assert counts[g]["count"] == 25_000.0
        assert counts[g].dmin == sub.min() and counts[g].dmax == sub.max()


def test_avl_single_single_range():
    """Port of TDigestTest.singleSingleRange for the AVL variant: cdf is a
    step function between singletons (half-mass at each singleton)."""
    d = AVLTreeDigest(delta=100.0)
    for x in (1.0, 2.0, 3.0):
        d.add(x)
    assert d.cdf(1.0) == pytest.approx(0.5 / 3.0)
    assert d.cdf(1.0 + 1e-10) == pytest.approx(1 / 3.0)
    assert d.cdf(2.0 - 1e-10) == pytest.approx(1 / 3.0)
    assert d.cdf(2.0) == pytest.approx(1.5 / 3.0)
    assert d.cdf(2.0 + 1e-10) == pytest.approx(2 / 3.0)
    assert d.cdf(3.0 - 1e-10) == pytest.approx(2 / 3.0)
    assert d.cdf(3.0) == pytest.approx(2.5 / 3.0)
    assert d.cdf(3.0 + 1e-10) == 1.0


def test_avl_repeated_values_port():
    """AVLTreeDigestTest.testRepeatedValues behavior: two repeated values,
    quantiles land on (or between) the two points, never outside."""
    rng = np.random.default_rng(3)
    vals = np.where(rng.uniform(size=20_000) < 0.5, 9000.0, 9000.01)
    d = AVLTreeDigest.from_values(vals, delta=100.0)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert 9000.0 <= d.quantile(q) <= 9000.01, q


def test_avl_singleton_in_a_crowd_port():
    """TDigestTest.testSingletonInACrowd: one far-away sample among 10k
    equals; max is preserved and q=1 returns it exactly."""
    d = AVLTreeDigest(delta=100.0)
    d.add_values(np.full(10_000, 10.0))
    d.add(20.0)
    assert d.max == 20.0
    assert d.quantile(1.0) == 20.0
    assert abs(d.quantile(0.5) - 10.0) < 1e-9


def test_buffered_rng_stream_identity():
    """_next_rand's 256-draw refill must reproduce the exact per-call
    Generator.random() stream (PCG64 consumes 64 bits per double either
    way) — the r5 speedup may not perturb reservoir tie-breaks."""
    import numpy as np
    from t_digest_spark.avl import AVLTreeDigest
    d = AVLTreeDigest(seed=7)
    got = [d._next_rand() for _ in range(600)]
    ref = np.random.default_rng(7)
    want = [ref.random() for _ in range(600)]
    assert got == want


def test_avltree_aggregate_row_budget_guard(spark):
    """A task over budget must fail fast with guidance, not burn hours in
    the per-point kernel; within budget is unaffected."""
    import pytest as _pytest
    from t_digest_spark.operators.aggregation import avltree_aggregate
    df = spark.range(2_000).selectExpr(
        "cast(id as double) as x").coalesce(1)
    ok = avltree_aggregate(df, "x", max_rows_per_task=5_000).collect()
    assert len(ok) == 1
    with _pytest.raises(Exception, match="max_rows_per_task"):
        avltree_aggregate(df, "x", max_rows_per_task=1_000).collect()
