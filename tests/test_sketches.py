"""Sketch family (KLL, count-min, Bloom, HLL): kernel bounds, mergeability,
and the Spark partial+final path."""

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F

from t_digest_spark.sketches import BloomFilter, CountMinSketch, KllSketch

# ------------------------------------------------------------------ KLL kernel

# published two-sided 99% normalized rank-error for k=200 (DataSketches)
KLL_BOUND = 0.0165


def test_kll_rank_error_bound():
    rng = np.random.default_rng(42)
    data = rng.normal(0, 1, 500_000)
    srt = np.sort(data)
    s = KllSketch.from_values(data)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = s.quantile(q)
        rank = np.searchsorted(srt, est) / len(srt)
        assert abs(rank - q) < KLL_BOUND, q
    assert s.quantile(0.0) == srt[0]
    assert s.quantile(1.0) == srt[-1]
    # sub-linear memory
    assert s.num_retained < 1000


def test_kll_merge_tolerance():
    rng = np.random.default_rng(7)
    data = rng.exponential(2.0, 200_000)
    srt = np.sort(data)
    parts = [KllSketch.from_values(c) for c in np.array_split(data, 32)]
    m = KllSketch.merge_all(parts)
    assert m.n == len(data)
    for q in (0.01, 0.5, 0.99):
        rank = np.searchsorted(srt, m.quantile(q)) / len(srt)
        assert abs(rank - q) < 2 * KLL_BOUND, q
    # merge shape guard
    with pytest.raises(ValueError):
        KllSketch(k=100).merge(KllSketch(k=200))


def test_kll_exact_small_regime():
    """n <= capacity: nothing compacts, quantiles are exact order stats."""
    vals = np.arange(100, dtype=np.float64)
    s = KllSketch.from_values(vals)
    assert s.num_retained == 100
    assert s.quantile(0.5) == 50.0 or s.quantile(0.5) == 49.0
    assert s.rank(50.0) == pytest.approx((50 + 0.5) / 100)


def test_kll_serde_roundtrip():
    s = KllSketch.from_values(np.random.default_rng(1).uniform(0, 1, 50_000))
    s2 = KllSketch.from_bytes(s.to_bytes())
    assert s2.n == s.n and s2.min == s.min and s2.max == s.max
    for q in (0.1, 0.5, 0.9):
        assert s2.quantile(q) == s.quantile(q)


def test_kll_rejects_nan_and_bad_q():
    s = KllSketch()
    with pytest.raises(ValueError):
        s.update_values([1.0, float("nan")])
    s.update(1.0)
    with pytest.raises(ValueError):
        s.quantile(1.5)


# ------------------------------------------------------------ count-min kernel

def test_countmin_overestimate_only_and_bound():
    rng = np.random.default_rng(3)
    # zipf-ish frequencies over 2000 keys
    keys = rng.zipf(1.3, 100_000) % 2000
    hashes = (keys.astype(np.int64) * 0x9E3779B97F4A7C15) % (1 << 63)
    s = CountMinSketch(d=5, w=4096)
    s.update_hashes(hashes)
    uniq, true_counts = np.unique(hashes, return_counts=True)
    est = s.estimate_hashes(uniq)
    assert (est >= true_counts).all()               # never underestimates
    eps_bound = math_e = 2.718281828 * s.n / s.w    # e*n/w
    assert np.quantile(est - true_counts, 0.99) <= eps_bound


def test_countmin_merge_equals_whole():
    rng = np.random.default_rng(5)
    hs = rng.integers(0, 1 << 62, 50_000, dtype=np.int64)
    whole = CountMinSketch(d=4, w=1024)
    whole.update_hashes(hs)
    a = CountMinSketch(d=4, w=1024)
    b = CountMinSketch(d=4, w=1024)
    a.update_hashes(hs[:25_000])
    b.update_hashes(hs[25_000:])
    a.merge(b)
    assert (a.counts == whole.counts).all()
    assert a.n == whole.n
    with pytest.raises(ValueError):
        a.merge(CountMinSketch(d=3, w=1024))


# ----------------------------------------------------------------- bloom kernel

def test_bloom_no_false_negatives_and_fpp():
    rng = np.random.default_rng(9)
    members = rng.integers(0, 1 << 62, 10_000, dtype=np.int64)
    others = rng.integers(0, 1 << 62, 20_000, dtype=np.int64)
    others = np.setdiff1d(others, members)
    f = BloomFilter.params_for(10_000, 0.01)
    f.add_hashes(members)
    assert f.contains_hashes(members).all()          # no false negatives
    fpp = f.contains_hashes(others).mean()
    assert fpp < 0.03                                # ~1% design point


def test_bloom_merge_equals_whole():
    rng = np.random.default_rng(11)
    hs = rng.integers(0, 1 << 62, 8_000, dtype=np.int64)
    whole = BloomFilter(1 << 16, 5)
    whole.add_hashes(hs)
    a, b = BloomFilter(1 << 16, 5), BloomFilter(1 << 16, 5)
    a.add_hashes(hs[:4_000])
    b.add_hashes(hs[4_000:])
    a.merge(b)
    assert (a.bits == whole.bits).all()


# ------------------------------------------------------------------ Spark path

@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("sketch-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def test_kll_spark_aggregate(spark):
    from t_digest_spark.sketches.spark import kll_aggregate, kll_quantile_udf
    rng = np.random.default_rng(21)
    pdf = pd.DataFrame({"g": np.repeat(["a", "b"], 30_000),
                        "x": np.concatenate([rng.normal(0, 1, 30_000),
                                             rng.uniform(0, 100, 30_000)])})
    df = spark.createDataFrame(pdf).repartition(4)
    out = kll_aggregate(df, "x", ["g"])
    rows = {r.g: r for r in out.select(
        "g", "count",
        kll_quantile_udf(0.5)("items", "offsets", "kmin", "kmax", "count").alias("p50"),
        kll_quantile_udf(0.99)("items", "offsets", "kmin", "kmax", "count").alias("p99"),
    ).collect()}
    for g in ("a", "b"):
        vals = np.sort(pdf[pdf.g == g].x.to_numpy())
        assert rows[g]["count"] == 30_000.0
        for col, q in (("p50", 0.5), ("p99", 0.99)):
            rank = np.searchsorted(vals, rows[g][col]) / len(vals)
            assert abs(rank - q) < 2 * KLL_BOUND, (g, q)


def test_countmin_spark(spark):
    from t_digest_spark.sketches.spark import (countmin_aggregate,
                                               countmin_estimate)
    pdf = pd.DataFrame({"word": ["the"] * 500 + ["cat"] * 120 + ["dog"] * 30
                        + [f"rare{i}" for i in range(350)]})
    df = spark.createDataFrame(pdf).repartition(4)
    cm = countmin_aggregate(df, "word", d=5, w=2048)
    probes = spark.createDataFrame(pd.DataFrame(
        {"word": ["the", "cat", "dog", "absent"]}))
    got = {r.word: r.cm_estimate for r in
           countmin_estimate(cm, probes, "word").collect()}
    assert got["the"] >= 500 and got["cat"] >= 120 and got["dog"] >= 30
    slack = 2.718281828 * 1000 / 2048 * 3
    assert got["the"] <= 500 + slack
    assert got["absent"] <= slack


def test_bloom_spark(spark):
    from t_digest_spark.sketches.spark import bloom_aggregate, bloom_contains
    members = spark.range(0, 5000).select(
        F.concat(F.lit("key"), F.col("id")).alias("key")).repartition(4)
    bf = bloom_aggregate(members, "key", m_bits=1 << 17, k=5)
    probes = spark.range(0, 10_000).select(
        F.concat(F.lit("key"), F.col("id")).alias("key"),
        (F.col("id") < 5000).alias("is_member"))
    out = bloom_contains(bf, probes, "key").collect()
    fn = sum(1 for r in out if r.is_member and not r.bloom_contains)
    fp = sum(1 for r in out if not r.is_member and r.bloom_contains)
    assert fn == 0                       # no false negatives, ever
    assert fp / 5000 < 0.05


def test_hll_spark(spark):
    from t_digest_spark.sketches.spark import (hll_aggregate, hll_estimate_col,
                                               hll_merge)
    df = spark.range(0, 100_000).select(
        (F.col("id") % 20_000).alias("user"),
        (F.col("id") % 4).alias("g"))
    per_g = hll_aggregate(df, "user", ["g"], lgk=12)
    ests = {r.g: r.distinct_estimate for r in
            per_g.select("g", hll_estimate_col()).collect()}
    for g, est in ests.items():
        assert abs(est - 5000) / 5000 < 0.05, (g, est)
    merged = hll_merge(per_g, None).select(hll_estimate_col()).collect()[0]
    assert abs(merged.distinct_estimate - 20_000) / 20_000 < 0.05


# -------------------------------------------------------------------- REQ

def test_req_relative_error_bound():
    from t_digest_spark.sketches.req import ReqSketch
    rng = np.random.default_rng(17)
    data = rng.exponential(1.0, 300_000)
    srt = np.sort(data)
    s = ReqSketch.from_values(data)  # k=12, hra
    for q in (0.9, 0.99, 0.999, 0.9999):
        rank = np.searchsorted(srt, s.quantile(q)) / len(srt)
        # HRA guarantee shape: error relative to the tail mass
        assert abs(rank - q) / (1 - q) < 0.1, (q, rank)
    assert s.quantile(1.0) == srt[-1]
    assert s.num_retained < 4000


def test_req_merge_and_guards():
    from t_digest_spark.sketches.req import ReqSketch
    rng = np.random.default_rng(23)
    data = rng.normal(0, 1, 100_000)
    srt = np.sort(data)
    parts = [ReqSketch.from_values(c) for c in np.array_split(data, 16)]
    m = ReqSketch.merge_all(parts)
    assert m.n == len(data)
    for q in (0.99, 0.999):
        rank = np.searchsorted(srt, m.quantile(q)) / len(srt)
        assert abs(rank - q) / (1 - q) < 0.15, q
    with pytest.raises(ValueError):
        ReqSketch(hra=True).merge(ReqSketch(hra=False))
    with pytest.raises(ValueError):
        ReqSketch().update_values([float("nan")])


def test_req_spark_aggregate(spark):
    from t_digest_spark.sketches.spark import req_aggregate, req_quantile_udf
    rng = np.random.default_rng(31)
    pdf = pd.DataFrame({"g": np.repeat(["a", "b"], 40_000),
                        "x": np.concatenate([rng.exponential(1, 40_000),
                                             rng.lognormal(0, 2, 40_000)])})
    df = spark.createDataFrame(pdf).repartition(4)
    cols = ("items", "offsets", "states", "rmin", "rmax", "count")
    rows = {r.g: r for r in req_aggregate(df, "x", ["g"]).select(
        "g", "count",
        req_quantile_udf(0.999)(*cols).alias("p999"),
        req_quantile_udf(0.9999)(*cols).alias("p9999")).collect()}
    for g in ("a", "b"):
        vals = np.sort(pdf[pdf.g == g].x.to_numpy())
        assert rows[g]["count"] == 40_000.0
        for col, q in (("p999", 0.999), ("p9999", 0.9999)):
            rank = np.searchsorted(vals, rows[g][col]) / len(vals)
            assert abs(rank - q) / (1 - q) < 0.5, (g, q, rank)


def test_countmin_weighted(spark):
    from t_digest_spark.sketches.spark import (countmin_aggregate,
                                               countmin_estimate)
    pdf = pd.DataFrame({"word": ["a", "b", "a"], "wt": [10, 5, 7]})
    cm = countmin_aggregate(spark.createDataFrame(pdf), "word",
                            d=4, w=512, weight_col="wt")
    probes = spark.createDataFrame(pd.DataFrame({"word": ["a", "b"]}))
    got = {r.word: r.cm_estimate for r in
           countmin_estimate(cm, probes, "word").collect()}
    assert got["a"] >= 17 and got["b"] >= 5
    assert got["a"] <= 22 and got["b"] <= 10  # tiny n: collisions near-nil


def test_kll_restore_continues_coin_stream():
    """from_row seeds the compaction coin from n, so a restore does not reset
    the even/odd stream to 0 (ADVICE r1: correlated compactions across
    micro-batch restores weaken the rank-error guarantee)."""
    rng = np.random.default_rng(7)
    s = KllSketch.from_values(rng.uniform(0, 1, 20_000))
    restored = KllSketch.from_row(*s.to_row())
    assert restored._coin != 0
    # still a correct sketch after restore + more data
    restored.update_values(rng.uniform(0, 1, 20_000))
    assert abs(restored.quantile(0.5) - 0.5) < 0.05
    assert restored.n == 40_000


class TestKllDataSketchesSerde:
    """DataSketches KllDoublesSketch binary interchange
    (KllDoublesSketch.java:183-215 layout): round-trips, documented byte
    addresses, and the empty/single-item small layouts."""

    def test_roundtrip_preserves_queries(self):
        s = KllSketch.from_values(np.random.default_rng(3).normal(0, 1, 30_000))
        b = s.to_datasketches_bytes()
        r = KllSketch.from_datasketches_bytes(b)
        assert (r.n, r.min, r.max, r.k, r.m) == (s.n, s.min, s.max, s.k, s.m)
        assert r.num_retained == s.num_retained
        for q in (0.01, 0.5, 0.99):
            assert r.quantile(q) == s.quantile(q)

    def test_preamble_byte_layout(self):
        import struct
        s = KllSketch.from_values(np.arange(10_000, dtype=np.float64))
        b = s.to_datasketches_bytes()
        assert b[0] == 5            # PREAMBLE_INTS_FULL
        assert b[1] == 1            # serialVersionUID1
        assert b[2] == 15           # KLL family id
        assert b[3] == 0b010        # LEVEL_ZERO_SORTED
        assert struct.unpack_from("<H", b, 4)[0] == s.k
        assert b[6] == s.m
        assert struct.unpack_from("<q", b, 8)[0] == s.n
        assert struct.unpack_from("<H", b, 16)[0] == s.k   # minK
        assert b[18] == len(s.levels)
        mn, mx = struct.unpack_from("<dd", b, 20 + 4 * len(s.levels))
        assert (mn, mx) == (0.0, 9999.0)
        # total size: preamble + levels ints + min/max + retained doubles
        assert len(b) == 20 + 4 * len(s.levels) + 16 + 8 * s.num_retained

    def test_empty_and_single(self):
        e = KllSketch()
        be = e.to_datasketches_bytes()
        assert len(be) == 8 and be[0] == 2 and be[3] & 1
        assert KllSketch.from_datasketches_bytes(be).n == 0
        s = KllSketch()
        s.update(42.5)
        bs = s.to_datasketches_bytes()
        assert len(bs) == 16 and bs[1] == 2 and bs[3] & 0b100
        r = KllSketch.from_datasketches_bytes(bs)
        assert r.n == 1 and r.quantile(0.5) == 42.5

    def test_rejects_foreign_bytes(self):
        with pytest.raises(ValueError):
            KllSketch.from_datasketches_bytes(b"\x05\x01\x0e\x00\xc8\x00\x08\x00")

    def test_levels_are_absolute_packed_indices(self):
        import struct
        s = KllSketch.from_values(np.random.default_rng(5).uniform(0, 1, 50_000))
        b = s.to_datasketches_bytes()
        nl = b[18]
        idx = struct.unpack_from(f"<{nl}i", b, 20)
        cap = s._ds_capacity()
        assert idx[0] == cap - s.num_retained   # packed at the top
        sizes = [lv.size for lv in s.levels]
        for h in range(nl - 1):
            assert idx[h + 1] - idx[h] == sizes[h]
        assert cap - idx[-1] == sizes[-1]


class TestReqDataSketchesSerde:
    """DataSketches ReqSketch binary interchange (ReqSerDe.java:36-127):
    all four body formats, documented byte addresses, round-trips."""

    def test_estimation_roundtrip(self):
        from t_digest_spark.sketches.req import ReqSketch
        s = ReqSketch.from_values(
            np.random.default_rng(5).uniform(0, 1, 50_000), k=12, hra=True)
        assert len(s.compactors) > 1
        b = s.to_datasketches_bytes()
        assert b[0] == 4 and b[1] == 1 and b[2] == 17   # preInts, serVer, famID
        assert b[3] & 8                                  # HRA flag
        import struct
        assert struct.unpack_from("<H", b, 4)[0] == 12   # K
        assert b[6] == len(s.compactors)
        r = ReqSketch.from_datasketches_bytes(b)
        assert (r.n, r.min, r.max, r.k, r.hra) == (s.n, s.min, s.max, s.k, s.hra)
        assert r.num_retained == s.num_retained
        for q in (0.5, 0.99, 0.999):
            assert r.quantile(q) == s.quantile(q)
        # restored sketch keeps working
        r.update_values(np.random.default_rng(6).uniform(0, 1, 10_000))
        assert r.n == s.n + 10_000

    def test_exact_and_rawitems_and_empty(self):
        from t_digest_spark.sketches.req import ReqSketch
        e = ReqSketch(k=12)
        be = e.to_datasketches_bytes()
        assert len(be) == 8 and be[3] & 4                # EMPTY flag
        assert ReqSketch.from_datasketches_bytes(be).n == 0
        raw = ReqSketch(k=12)
        raw.update_values([3.0, 1.0, 2.0])
        br = raw.to_datasketches_bytes()
        assert br[3] & 16 and br[7] == 3                 # RAW_ITEMS, count
        rr = ReqSketch.from_datasketches_bytes(br)
        assert rr.n == 3 and rr.quantile(1.0) == 3.0
        ex = ReqSketch(k=12)
        ex.update_values(np.arange(30, dtype=np.float64))
        if len(ex.compactors) == 1:
            bx = ex.to_datasketches_bytes()
            assert bx[0] == 2 and bx[6] == 1             # EXACT: preInts=2
            rx = ReqSketch.from_datasketches_bytes(bx)
            assert rx.n == 30 and rx.min == 0.0 and rx.max == 29.0

    def test_rejects_foreign(self):
        from t_digest_spark.sketches.req import ReqSketch
        with pytest.raises(ValueError):
            ReqSketch.from_datasketches_bytes(
                bytes([2, 1, 15, 0, 12, 0, 1, 0]))       # KLL family id
