"""Golden/behavioral tests for the digest kernel, ported from the reference's
abstract suite (TDigestTest.java) per FIXTURES.md §4 and SURVEY.md §5.2."""

import math

import numpy as np
import pytest

from t_digest_spark.core import Dist, TDigest

RNG = np.random.default_rng(42)
SCALES_UNDER_TEST = ["k0", "k1", "k2", "k3"]


# ---------------------------------------------------------------- golden fixtures

def test_single_value():
    # TDigestTest.java:500-508
    d = TDigest.from_values([42.0])
    for q in [0.0, 0.5, 1.0]:
        assert d.quantile(q) == 42.0
    assert d.count == 1


def test_empty_digest_nan():
    # TDigestTest.java:634-638
    d = TDigest()
    assert math.isnan(d.quantile(0.5))
    assert math.isnan(d.cdf(1.0))


def test_nan_rejected():
    # TDigestTest.java:686-704
    d = TDigest()
    with pytest.raises(ValueError):
        d.add(float("nan"))
    with pytest.raises(ValueError):
        d.cdf(float("nan"))
    with pytest.raises(ValueError):
        d.quantile(1.5)


def test_singleton_quantiles():
    # 20 integer singletons: digest == exact Dist oracle (TDigestTest.java:358-373)
    data = np.arange(20, dtype=np.float64)
    d = TDigest.from_values(data, delta=100)
    for q in np.linspace(0, 1, 1001):
        assert d.quantile(q) == Dist.quantile(q, data), q
    for x in data:
        assert d.cdf(x) == Dist.cdf(x, data)


def test_three_point_cdf_steps():
    # step function at/between singletons (TDigestTest.java:379-394)
    d = TDigest.from_values([1.0, 2.0, 3.0])
    assert d.cdf(1.0) == pytest.approx(1 / 6)
    assert d.cdf(2.0) == pytest.approx(3 / 6)
    assert d.cdf(3.0) == pytest.approx(5 / 6)
    assert d.cdf(1.5) == pytest.approx(2 / 6)
    assert d.cdf(2.5) == pytest.approx(4 / 6)
    assert d.cdf(0.5) == 0.0
    assert d.cdf(3.5) == 1.0


def test_small_count_quantile():
    # values {15,20,32,60}, small-count boundaries (TDigestTest.java:285-296)
    data = np.array([15.0, 20.0, 32.0, 60.0])
    d = TDigest.from_values(data, delta=200)
    for q in np.linspace(0, 1, 101):
        assert d.quantile(q) == Dist.quantile(q, data), q


def test_big_jump():
    # 1..19 then 1_000_000 (TDigestTest.java:253-282)
    data = np.array(list(range(1, 20)) + [1_000_000.0])
    d = TDigest.from_values(data, delta=100)
    assert d.quantile(0.89999999) == pytest.approx(18.0, abs=0)
    assert d.quantile(0.9) == pytest.approx(19.0, abs=0)
    assert d.quantile(0.949999999) == pytest.approx(19.0, abs=0)
    assert d.quantile(0.95) == pytest.approx(1_000_000.0, abs=0)
    assert d.cdf(19.0) == pytest.approx(0.925, abs=1e-11)
    assert d.cdf(19.0000001) == pytest.approx(0.95, abs=1e-11)
    assert d.cdf(19 - 0.0000001) == pytest.approx(0.9, abs=1e-11)


def test_singleton_in_a_crowd():
    # 10000 copies of 10 plus one 20 (TDigestTest.java:918-933)
    d = TDigest(delta=100)
    d.add_values(np.full(10000, 10.0))
    d.add(20.0)
    d.compress()
    assert d.quantile(0.0) == 10.0
    assert d.quantile(0.5) == 10.0
    assert d.quantile(0.999) == 10.0
    assert d.quantile(1.0) == 20.0
    # last centroid must be the singleton
    assert d.weights[-1] == 1.0
    assert d.means[-1] == 20.0


def test_skewed_two_cluster_median():
    # 31 values: 15 near 245, 16 near 5e4 → median exact (TDigestTest.java:305-318)
    lo = 245.0 + np.arange(15) * 0.01
    hi = 5e4 + np.arange(16) * 1.0
    data = np.concatenate([lo, hi])
    d = TDigest.from_values(RNG.permutation(data), delta=100)
    assert d.quantile(0.5) == pytest.approx(Dist.quantile(0.5, data), rel=1e-6)


def test_more_than_2b_weights():
    # weights > int32 (TDigestTest.java:641-663, BigCount.java): synthetic
    # centroid stream totaling 3e9
    d = TDigest(delta=100)
    w = np.full(3000, 1e6)
    v = np.sort(RNG.normal(0, 1, 3000))
    d.add_values(v, w)
    d.add_values([v.min() - 1.0, v.max() + 1.0])  # real singletons at the ends
    d.compress()
    assert d.count == pytest.approx(3e9 + 2)
    qs = d.quantiles(np.linspace(0, 1, 101))
    assert np.all(np.diff(qs) >= 0)


def test_extreme_quantiles_return_min_max():
    # TDigestTest.java:432-495
    data = RNG.uniform(0, 1, 10000)
    d = TDigest.from_values(data)
    assert d.quantile(0.0) == data.min()
    assert d.quantile(1.0) == data.max()
    assert d.quantile(1e-9) == data.min()
    assert d.quantile(1 - 1e-9) == data.max()


# ---------------------------------------------------------------- invariants

@pytest.mark.parametrize("scale", SCALES_UNDER_TEST)
def test_check_weights_invariant(scale):
    # MergingDigest.java:508-548: soft limit 1 k-unit, hard fail at 4 k-units,
    # vs the public delta. The default weight-limit criterion (MergingDigest.
    # java:104-108) is an approximation of the k-limit, so a few soft
    # violations are expected (the reference prints rather than fails them);
    # check_weights() raises internally on any egregious (>4) centroid.
    data = RNG.uniform(0, 1, 100_000)
    d = TDigest.from_values(data, delta=100, scale=scale)
    assert d.check_weights() <= max(3, 0.3 * d.centroid_count())
    assert d.weights[0] == 1.0 and d.weights[-1] == 1.0  # MergingDigest.java:496-497


@pytest.mark.parametrize("scale", SCALES_UNDER_TEST)
def test_quantile_cdf_monotone(scale):
    # TDigestTest.java:1054-1073; BASELINE.json north-star criterion
    data = np.concatenate([RNG.normal(0, 1, 50_000), RNG.normal(5, 0.1, 50_000)])
    d = TDigest.from_values(data, delta=100, scale=scale)
    qs = d.quantiles(np.linspace(0, 1, 1001))
    assert np.all(np.diff(qs) >= 0)
    xs = np.linspace(data.min(), data.max(), 1001)
    cs = np.array([d.cdf(x) for x in xs])
    assert np.all(np.diff(cs) >= -1e-12)
    assert cs[0] >= 0 and cs[-1] <= 1


def test_centroid_count_bounded():
    # cluster-count bounds: m <= ~2*delta after compress (size sizing, SURVEY §2.1)
    data = RNG.uniform(0, 1, 500_000)
    for delta in [50, 100, 200]:
        d = TDigest.from_values(data, delta=delta)
        assert delta / 4 <= d.centroid_count() <= 2.5 * delta


def test_min_max_exact():
    data = 10 ** ((RNG.uniform(0, 1, 100_000) - 0.5) * 6)  # loguniform
    d = TDigest.from_values(data)
    assert d.min == data.min()
    assert d.max == data.max()


# ---------------------------------------------------------------- accuracy vs oracle

def _run_accuracy(data, delta=100, scale="k2", cdf_tol=0.08, q_tol=0.012):
    """Port of the runTest harness (TDigestTest.java:558-631): compress to the
    public delta, then assert cdf within 0.08 absolute and quantile round-trip
    within 0.012 in q-space, <3 soft (>0.005) errors."""
    data = np.asarray(data, dtype=np.float64)
    d = TDigest.from_values(data, delta=delta, scale=scale)
    d.compress()
    assert d.centroid_count() <= delta * 2.1  # size bound, TDigestTest.java:595
    soft = 0
    for q in [0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999]:
        x_est = d.quantile(q)
        q_back = Dist.cdf(x_est, data)
        assert abs(q_back - q) < q_tol, (q, q_back)
        if abs(q_back - q) > 0.005:
            soft += 1
        x_true = Dist.quantile(q, data)
        c_est = d.cdf(x_true)
        assert abs(c_est - q) < cdf_tol, (q, c_est)
    assert soft < 3


def test_accuracy_uniform():
    _run_accuracy(RNG.uniform(0, 1, 100_000))


def test_accuracy_gamma():
    # heavy skew over 11 orders of magnitude; delta=200 (TDigestTest.java:718-731)
    _run_accuracy(RNG.gamma(0.1, 0.1, 100_000), delta=200)


def test_accuracy_narrow_normal_mix():
    # 0.5*U(-1,1) + 0.5*N(0,1e-5); delta=400 (TDigestTest.java:734-757)
    u = RNG.uniform(-1, 1, 50_000)
    nn = RNG.normal(0, 1e-5, 50_000)
    _run_accuracy(np.concatenate([u, nn]), delta=400)


def test_accuracy_sequential():
    # monotone stream base += pi*1e-5 (TDigestTest.java:806-819)
    data = np.cumsum(np.full(100_000, math.pi * 1e-5))
    _run_accuracy(data)


def test_accuracy_repeated_values():
    # rint(u*10)/10: 10 distinct values many times (TDigestTest.java:760-803)
    data = np.rint(RNG.uniform(0, 1, 100_000) * 10) / 10
    d = TDigest.from_values(data)
    for q in [0.01, 0.1, 0.5, 0.9, 0.99]:
        x = d.quantile(q)
        # estimate must land on/near one of the 10 values
        assert abs(x - np.rint(x * 10) / 10) < 0.05, (q, x)


@pytest.mark.parametrize("scale", SCALES_UNDER_TEST)
def test_extreme_quantile_rank_error(scale):
    """North-star accuracy: rank error at p50/p99/p999 well inside the merge
    bound (abs < 0.015; BASELINE.md) even single-pass."""
    data = RNG.uniform(0, 1, 200_000)
    d = TDigest.from_values(data, delta=100, scale=scale)
    for q in [0.5, 0.99, 0.999]:
        rank_err = abs(Dist.cdf(d.quantile(q), data) - q)
        assert rank_err < 0.015, (scale, q, rank_err)


# ---------------------------------------------------------------- merge semantics

@pytest.mark.parametrize("parts", [2, 5, 10, 20, 50, 100])
def test_merge_accuracy(parts):
    """THE distributed-correctness test (quality/AccuracyTest.java:47-150):
    100k uniform split into parts, partials merged; abs err < 0.015,
    rel err < 0.4 at small q."""
    data = RNG.uniform(0, 1, 100_000)
    chunks = np.array_split(data, parts)
    partials = [TDigest.from_values(c, delta=100) for c in chunks]
    merged = TDigest.merge_all(partials)
    assert merged.count == pytest.approx(100_000)
    for q in [0.001, 0.01, 0.1, 0.5]:
        est = merged.quantile(q)
        true = Dist.quantile(q, data)
        q_back = Dist.cdf(est, data)
        assert abs(q_back - q) < 0.015, (q, q_back)
        if q <= 0.5 and true > 0:
            assert abs(est - true) / max(q, 1e-10) < 0.4 * max(true / q, 1) or abs(q_back - q) < 0.005


def test_merge_associative_commutative():
    # BASELINE.json north-star: merge(merge(a,b),c) ~ merge(a,merge(b,c))
    xs = [RNG.uniform(0, 1, 30_000) for _ in range(3)]
    a, b, c = (TDigest.from_values(x) for x in xs)
    left = TDigest.merge_all([TDigest.merge_all([a, b]), c])
    right = TDigest.merge_all([a, TDigest.merge_all([b, c])])
    alldata = np.concatenate(xs)
    for q in [0.01, 0.1, 0.5, 0.9, 0.99]:
        ql, qr = left.quantile(q), right.quantile(q)
        assert abs(Dist.cdf(ql, alldata) - Dist.cdf(qr, alldata)) < 0.01
    assert left.count == right.count == 90_000


def test_merge_repeated_self():
    # stability under repeated self-merge (TDigestTest.java:328-352)
    data = RNG.normal(0, 1, 50_000)
    d1 = TDigest.from_values(data)
    d2 = TDigest.merge_all([d1, d1])
    assert d2.count == pytest.approx(100_000)
    for q in [0.1, 0.5, 0.9]:
        assert d2.quantile(q) == pytest.approx(d1.quantile(q), abs=0.05)


def test_mega_merge():
    # MegaMergeTest shape (MegaMergeTest.java:32-142), scaled down: 200 digests
    # of 1500 points each, merged in one concat+sweep pass
    digests = []
    alldata = []
    for i in range(200):
        x = RNG.normal(i % 10, 1, 1500)
        alldata.append(x)
        digests.append(TDigest.from_values(x, delta=100))
    merged = TDigest.merge_all(digests, delta=100)
    data = np.concatenate(alldata)
    assert merged.count == pytest.approx(data.size)
    for q in [0.01, 0.1, 0.5, 0.9, 0.99]:
        assert abs(Dist.cdf(merged.quantile(q), data) - q) < 0.015


# ---------------------------------------------------------------- serde

@pytest.mark.parametrize("codec", ["verbose", "small"])
def test_serialization_roundtrip(codec):
    # TDigestTest.java:822-877: round-trip quantile agreement 1e-5 / 1e-6
    data = RNG.uniform(0, 1, 100_000)
    for delta in [20, 60, 120]:
        d = TDigest.from_values(data, delta=delta)
        raw = d.to_bytes() if codec == "verbose" else d.to_small_bytes()
        d2 = TDigest.from_bytes(raw)
        tol = 1e-9 if codec == "verbose" else 1e-5
        for q in np.linspace(0, 1, 101):
            assert d2.quantile(q) == pytest.approx(d.quantile(q), abs=tol)
        assert d2.count == pytest.approx(d.count)
        assert d2.min == d.min and d2.max == d.max


def test_verbose_bytes_layout():
    # wire layout parity with MergingDigest.asBytes (MergingDigest.java:875-887)
    import struct
    d = TDigest.from_values([1.0, 2.0, 3.0], delta=100)
    raw = d.to_bytes()
    enc, mn, mx, delta, n = struct.unpack_from(">idddi", raw, 0)
    assert enc == 1 and mn == 1.0 and mx == 3.0 and delta == 100.0 and n == 3
    assert len(raw) == 32 + 16 * n  # byteSize() == 16n+32 (MergingDigest.java:839-846)


def test_empty_serde():
    d = TDigest()
    d2 = TDigest.from_bytes(d.to_bytes())
    assert math.isnan(d2.quantile(0.5))


# ---------------------------------------------------------------- trimmed mean

def test_trimmed_mean_exact_uniform():
    data = RNG.uniform(0, 1, 200_000)
    d = TDigest.from_values(data)
    srt = np.sort(data)
    for lo, hi in [(0.0, 1.0), (0.1, 0.9), (0.25, 0.75), (0.05, 0.5)]:
        exact = srt[int(lo * len(srt)):int(hi * len(srt))].mean()
        assert d.trimmed_mean(lo, hi) == pytest.approx(exact, abs=0.005), (lo, hi)


def test_trimmed_mean_full_range_is_mean():
    data = RNG.normal(10, 3, 100_000)
    d = TDigest.from_values(data)
    assert d.trimmed_mean(0, 1) == pytest.approx(data.mean(), rel=1e-3)


def test_trimmed_mean_validates():
    d = TDigest.from_values([1.0, 2.0])
    with pytest.raises(ValueError):
        d.trimmed_mean(0.9, 0.1)


# ---------------------------------------------------------------- adversarial

def test_careful_attack_stress():
    """Nested-around-zero adversarial stream (CarefulAttack.java:125-180):
    documented-failure stress — digest must stay structurally valid (no crash,
    monotone quantiles), accuracy is allowed to degrade."""
    vals = []
    x = 1.0
    for _ in range(2000):
        vals.extend([x, -x])
        x *= 0.98
    d = TDigest.from_values(np.array(vals), delta=500, scale="k0")
    qs = d.quantiles(np.linspace(0, 1, 201))
    assert np.all(np.diff(qs) >= 0)


def test_mega_merge_thousand_digests():
    """MegaMerge parity (MegaMergeTest.java:109-142): 1000 partial digests of
    1500 points each merged in one pass — count conservation, validity
    invariant, and accuracy within the merge bound."""
    rng = np.random.default_rng(77)
    data = rng.gamma(2.0, 1.0, 1_500_000)
    parts = [TDigest.from_values(c, delta=100.0)
             for c in np.array_split(data, 1000)]
    t0 = __import__("time").perf_counter()
    merged = TDigest.merge_all(parts)
    wall = __import__("time").perf_counter() - t0
    assert merged.count == len(data)
    assert merged.check_weights() == 0
    srt = np.sort(data)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        assert abs(merged.cdf(Dist.quantile(q, srt)) - q) < 0.015, q
    assert merged.min == srt[0] and merged.max == srt[-1]
    # one-pass k-way merge must be fast (concat + single sweep per flush)
    assert wall < 10.0, wall


def test_tree_merge_cluster_shape():
    """Two-level tree merge (treeAggregate(depth=2) shape: fan-in-32 local
    pre-merges, then one final merge) holds the same 0.015 merge bound as the
    flat path, and the flat concat+one-sweep stays at-least-as-accurate — the
    property that justifies the groupBy-merge final aggregate in
    operators/aggregation.py over a treeAggregate. Full 10,000-part record:
    scripts/megamerge_bench.py -> bench_records/megamerge_10k.json."""
    rng = np.random.default_rng(4242)
    n_parts, per_part, fan_in = 1000, 2000, 32
    data = rng.gamma(2.0, 1.0, n_parts * per_part)
    parts = [TDigest.from_values(c, delta=100.0)
             for c in data.reshape(n_parts, per_part)]
    flat = TDigest.merge_all(parts)
    level1 = [TDigest.merge_all(parts[i:i + fan_in])
              for i in range(0, n_parts, fan_in)]
    tree = TDigest.merge_all(level1)
    assert flat.count == data.size and tree.count == data.size
    assert flat.check_weights() == 0 and tree.check_weights() == 0
    srt = np.sort(data)
    flat_errs, tree_errs = [], []
    for q in (0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999):
        flat_errs.append(abs(Dist.cdf(flat.quantile(q), srt) - q))
        tree_errs.append(abs(Dist.cdf(tree.quantile(q), srt) - q))
    assert max(flat_errs) < 0.015, flat_errs
    assert max(tree_errs) < 0.015, tree_errs
    assert max(flat_errs) <= max(tree_errs) + 1e-3, (flat_errs, tree_errs)


def test_k_limit_criterion_parity():
    """The k-limit variant (useWeightLimit=false, MergingDigest.java:104-108,
    :427-465) must satisfy the same validity invariant and accuracy envelope
    as the default weight limit, with cluster counts in the delta/4..delta
    band (ScaleFunctionTests cluster-count bound)."""
    rng = np.random.default_rng(55)
    data = rng.normal(0, 1, 200_000)
    srt = np.sort(data)
    for scale in ("k1", "k2", "k3"):
        d = TDigest(delta=200.0, scale=scale, use_weight_limit=False)
        d.add_values(data)
        d.compress()
        assert d.check_weights() == 0, scale
        assert 200 / 4 <= d.centroid_count() <= 2 * 200 + 20, (scale, d.centroid_count())
        for q in (0.01, 0.5, 0.99):
            assert abs(d.cdf(Dist.quantile(q, srt)) - q) < 0.015, (scale, q)
        # parity with the default criterion at the query level
        dw = TDigest(delta=200.0, scale=scale)
        dw.add_values(data)
        for q in (0.1, 0.5, 0.9):
            assert abs(d.quantile(q) - dw.quantile(q)) < 0.05, (scale, q)


def test_count_before_flush_unit_and_weighted():
    """count must include pending (unflushed) samples for BOTH staging modes:
    unit-weight batches stage weights as None (ADVICE r1: previously crashed
    with AttributeError on None.sum())."""
    d = TDigest()
    d.add_values([1.0, 2.0, 3.0])               # unit weights -> None staged
    assert d.count == 3.0
    d.add_values([4.0, 5.0], [2.0, 3.0])        # explicit weights
    assert d.count == 8.0
    d.compress()
    assert d.count == 8.0


def test_sorted_input_port():
    """TDigestTest.testSorted: a digest built from pre-sorted input keeps
    ordered centroids and sane quantiles (sorted ingestion is the worst
    case for naive clustering schemes)."""
    vals = np.sort(np.random.default_rng(51).uniform(0, 1000, 100_000))
    d = TDigest.from_values(vals)
    means = d.means
    assert (np.diff(means) >= 0).all()
    assert d.min == vals[0] and d.max == vals[-1]
    for q in (0.01, 0.5, 0.99):
        rank = np.searchsorted(vals, d.quantile(q)) / len(vals)
        assert abs(rank - q) < 0.01, q
    d.check_weights()
