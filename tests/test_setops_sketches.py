"""Theta sketch, frequent-items sketch, and bottom-k distinct sampling —
kernel-level properties plus the Spark partial+final aggregation layer.

Contracts tested mirror the published guarantees:
  * Theta (Beyer et al. SIGMOD'07; DataSketches theta framework): exact in
    exact mode; RSE ~ 1/sqrt(k-1) in estimation mode (gated at 5 sigma);
    union/intersect/a_not_b match exact set algebra within bounds; merge is
    associative and order-insensitive.
  * Misra-Gries (Agarwal et al. PODS'12): estimate <= true <= estimate +
    max_error; max_error <= n/(k+1); merge keeps both properties.
  * Bottom-k sample: deterministic, exactly mergeable, equals the global
    ORDER BY md5 LIMIT k answer.
"""

import hashlib

import numpy as np
import pandas as pd
import pytest

from t_digest_spark.sketches.theta import THETA_MAX, ThetaSketch
from t_digest_spark.sketches.frequent import FrequentItemsSketch


def _hash63(rng, n_distinct, repeats=1):
    """Deterministic stand-in for the JVM xxhash64>>1: uniform 63-bit ints."""
    base = rng.integers(0, THETA_MAX, size=n_distinct, dtype=np.int64)
    return np.repeat(base, repeats), base


# ---------------------------------------------------------------------- theta

class TestThetaKernel:
    def test_exact_mode(self):
        rng = np.random.default_rng(1)
        hs, base = _hash63(rng, 1000, repeats=3)
        s = ThetaSketch(k=4096)
        s.update_hashes(hs)
        assert not s.is_estimation
        assert s.estimate() == float(np.unique(base).size)
        assert s.lower_bound() == s.estimate() == s.upper_bound()

    def test_estimation_mode_rse(self):
        rng = np.random.default_rng(2)
        n = 200_000
        hs, base = _hash63(rng, n)
        s = ThetaSketch(k=4096)
        for chunk in np.array_split(hs, 37):
            s.update_hashes(chunk)
        assert s.is_estimation
        true = np.unique(base).size
        rse = 1.0 / np.sqrt(s.retained.size - 1)
        assert abs(s.estimate() - true) <= 5 * rse * true
        assert s.lower_bound(5.0) <= true <= s.upper_bound(5.0)

    def test_merge_equals_bulk(self):
        rng = np.random.default_rng(3)
        hs, _ = _hash63(rng, 50_000)
        bulk = ThetaSketch(k=1024)
        bulk.update_hashes(hs)
        parts = []
        for chunk in np.array_split(hs, 8):
            p = ThetaSketch(k=1024)
            p.update_hashes(chunk)
            parts.append(p)
        m = ThetaSketch.union_all(parts, k=1024)
        # bottom-k union is EXACTLY order-insensitive: same retained set
        m2 = ThetaSketch.union_all(list(reversed(parts)), k=1024)
        assert np.array_equal(m.retained, m2.retained) and m.theta == m2.theta
        assert m.estimate() == pytest.approx(bulk.estimate(), rel=0.05)

    def test_set_algebra_exact_mode(self):
        rng = np.random.default_rng(4)
        a_keys = rng.integers(0, THETA_MAX, 3000, dtype=np.int64)
        b_keys = np.concatenate([a_keys[:1000],
                                 rng.integers(0, THETA_MAX, 2000, dtype=np.int64)])
        a = ThetaSketch(k=8192); a.update_hashes(a_keys)
        b = ThetaSketch(k=8192); b.update_hashes(b_keys)
        sa, sb = set(np.unique(a_keys)), set(np.unique(b_keys))
        assert ThetaSketch.union_all([a, b], k=8192).estimate() == len(sa | sb)
        assert ThetaSketch.intersect(a, b).estimate() == len(sa & sb)
        assert ThetaSketch.a_not_b(a, b).estimate() == len(sa - sb)

    def test_set_algebra_estimation_mode(self):
        rng = np.random.default_rng(5)
        shared = rng.integers(0, THETA_MAX, 40_000, dtype=np.int64)
        a_only = rng.integers(0, THETA_MAX, 60_000, dtype=np.int64)
        b_only = rng.integers(0, THETA_MAX, 30_000, dtype=np.int64)
        a = ThetaSketch(k=4096); a.update_hashes(np.concatenate([shared, a_only]))
        b = ThetaSketch(k=4096); b.update_hashes(np.concatenate([shared, b_only]))
        sa = set(np.unique(np.concatenate([shared, a_only])))
        sb = set(np.unique(np.concatenate([shared, b_only])))
        inter = ThetaSketch.intersect(a, b)
        # intersection error grows vs plain union (documented); 10% here
        assert inter.estimate() == pytest.approx(len(sa & sb), rel=0.10)
        assert ThetaSketch.a_not_b(a, b).estimate() == pytest.approx(
            len(sa - sb), rel=0.10)

    def test_row_roundtrip(self):
        rng = np.random.default_rng(6)
        hs, _ = _hash63(rng, 30_000)
        s = ThetaSketch(k=512)
        s.update_hashes(hs)
        r = ThetaSketch.from_row(*s.to_row())
        assert r.theta == s.theta and np.array_equal(r.retained, s.retained)
        assert r.estimate() == s.estimate()


# ------------------------------------------------------------- frequent items

class TestFrequentItemsKernel:
    @staticmethod
    def _zipf_stream(rng, n):
        keys = rng.zipf(1.3, size=n) % 10_000
        return pd.Series(keys.astype(str))

    def test_mg_guarantees_single_stream(self):
        rng = np.random.default_rng(7)
        vals = self._zipf_stream(rng, 100_000)
        s = FrequentItemsSketch(k=256)
        for chunk in np.array_split(vals.to_numpy(), 13):
            s.update_batch(pd.Series(chunk))
        true = vals.value_counts()
        assert s.max_error <= s.n // (s.k + 1) + 1
        assert len(s.counters) <= s.k
        for key, tc in true.items():
            est = s.estimate(key)
            assert est <= tc <= est + s.max_error

    def test_no_false_negatives_above_threshold(self):
        rng = np.random.default_rng(8)
        vals = self._zipf_stream(rng, 100_000)
        s = FrequentItemsSketch(k=256)
        s.update_batch(vals)
        true = vals.value_counts()
        floor = s.n // (s.k + 1)
        heavy = set(true[true > floor].index)
        assert heavy <= set(s.counters)        # all heavy keys retained
        items = {it for it, _, _ in s.frequent_items()}
        assert heavy <= items

    def test_merge_guarantees(self):
        rng = np.random.default_rng(9)
        vals = self._zipf_stream(rng, 200_000)
        parts = []
        for chunk in np.array_split(vals.to_numpy(), 16):
            p = FrequentItemsSketch(k=256)
            p.update_batch(pd.Series(chunk))
            parts.append(p)
        m = FrequentItemsSketch.merge_all(parts, k=256)
        true = vals.value_counts()
        assert m.n == len(vals)
        assert m.max_error <= m.n // (m.k + 1) + len(parts)
        for key, tc in true.nlargest(50).items():
            est = m.estimate(key)
            assert est <= tc <= est + m.max_error

    def test_weighted_and_roundtrip(self):
        s = FrequentItemsSketch(k=4)
        s.update_counts(["a", "b", "c", "d", "e"], [100, 50, 10, 5, 3])
        assert len(s.counters) <= 4
        assert s.estimate("a") <= 100 <= s.estimate("a") + s.max_error
        r = FrequentItemsSketch.from_row(*s.to_row())
        assert r.counters == s.counters and r.max_error == s.max_error


# --------------------------------------------------------------- Spark layer

@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("setops-sketch-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s
    s.stop()


class TestSparkLayer:
    def test_theta_aggregate_exact_and_setops(self, spark):
        import pyspark.sql.functions as F
        from t_digest_spark.sketches.spark import (theta_aggregate,
                                                   theta_binary_op,
                                                   theta_estimate_udf)
        df = spark.range(0, 20_000).select(
            (F.col("id") % 2).alias("g"), (F.col("id") % 3000).alias("key"))
        sk = theta_aggregate(df, "key", ["g"], k=8192).cache()
        est = {r["g"]: r["e"] for r in sk.select(
            "g", theta_estimate_udf()("retained", "theta", "k").alias("e")
        ).collect()}
        # g=0: even ids -> key = id%3000 over evens covers all 3000 residues
        exact = {r["g"]: r["n"] for r in df.groupBy("g").agg(
            F.countDistinct("key").alias("n")).collect()}
        assert est == {g: float(n) for g, n in exact.items()}

        a = sk.where("g = 0").drop("g")
        b = sk.where("g = 1").drop("g")
        inter = theta_binary_op(a, b, "intersect")
        got = inter.select(theta_estimate_udf()("retained", "theta", "k")
                           .alias("e")).collect()[0]["e"]
        ex = (df.where("g=0").select("key").distinct()
              .intersect(df.where("g=1").select("key").distinct()).count())
        assert got == float(ex)

    def test_frequent_aggregate_spark(self, spark):
        import pyspark.sql.functions as F
        from t_digest_spark.sketches.spark import (frequent_aggregate,
                                                   frequent_items_explode)
        # skewed keys: key 0 is ~33% of rows
        df = spark.range(0, 30_000).select(
            F.when(F.col("id") % 3 == 0, 0).otherwise(F.col("id") % 500)
            .alias("key"))
        fi = frequent_aggregate(df, "key", k=64)
        rows = frequent_items_explode(fi).collect()
        by_item = {r["item"]: r for r in rows}
        true0 = df.where("key = 0").count()
        assert "0" in by_item
        r0 = by_item["0"]
        assert r0["estimate"] <= true0 <= r0["upper_bound"]

    def test_bottomk_sample_matches_sql_and_merges(self, spark):
        import pyspark.sql.functions as F
        from t_digest_spark.sketches.spark import bottomk_distinct_sample
        df = spark.range(0, 10_000).select(
            (F.col("id") % 4).alias("g"), (F.col("id") % 1234).alias("key")) \
            .repartition(16)  # force many partitions -> real merge path
        got = bottomk_distinct_sample(df, "key", ["g"], k=7) \
            .orderBy("g", "sample_rank").collect()
        # oracle: global per-group ORDER BY md5 LIMIT 7 computed in pandas
        pdf = df.distinct().toPandas()
        pdf["h"] = pdf["key"].astype(str).map(
            lambda s: hashlib.md5(s.encode()).hexdigest())
        pdf = pdf.drop_duplicates(["g", "key"])
        expect = []
        for g, sub in pdf.groupby("g"):
            top = sub.drop_duplicates("h").sort_values("h").head(7)
            expect += [(g, i + 1, str(kv))
                       for i, kv in enumerate(top["key"])]
        assert [(r["g"], r["sample_rank"], r["key_value"]) for r in got] \
            == sorted(expect)


class TestEdgeCases:
    def test_theta_empty_and_single(self):
        s = ThetaSketch(k=64)
        assert s.estimate() == 0.0 and not s.is_estimation
        s.update_hashes(np.array([], dtype=np.int64))
        assert s.estimate() == 0.0
        s.update_hashes([42])
        assert s.estimate() == 1.0
        empty = ThetaSketch(k=64)
        assert ThetaSketch.intersect(s, empty).estimate() == 0.0
        assert ThetaSketch.a_not_b(s, empty).estimate() == 1.0
        assert ThetaSketch.a_not_b(empty, s).estimate() == 0.0
        assert ThetaSketch.union_all([], k=64).estimate() == 0.0

    def test_frequent_empty(self):
        s = FrequentItemsSketch(k=8)
        assert s.frequent_items() == []
        assert s.estimate("x") == 0 and s.upper_bound("x") == 0
        m = FrequentItemsSketch.merge_all([], k=8)
        assert m.n == 0 and m.counters == {}

    def test_spark_null_keys_and_empty(self, spark):
        import pyspark.sql.functions as F
        from t_digest_spark.sketches.spark import (bottomk_distinct_sample,
                                                   frequent_aggregate,
                                                   theta_aggregate,
                                                   theta_estimate_udf)
        df = spark.range(0, 100).select(
            F.when(F.col("id") % 2 == 0, F.col("id") % 10).alias("key"))
        # nulls are filtered before the sketch: 5 distinct even residues
        sk = theta_aggregate(df, "key", None, k=64)
        assert sk.select(theta_estimate_udf()("retained", "theta", "k")
                         .alias("e")).collect()[0]["e"] == 5.0
        fi = frequent_aggregate(df, "key", None, k=16).collect()[0]
        assert sum(fi["counts"]) == 50
        # fewer distinct keys than k: sample returns them all
        got = bottomk_distinct_sample(df, "key", None, k=50).collect()
        assert len(got) == 5
        # fully-empty input: zero result rows, not an error
        empty = df.where("key > 1000")
        assert theta_aggregate(empty, "key", None, k=64).count() == 0
        assert bottomk_distinct_sample(empty, "key", None, k=5).count() == 0

    def test_rank_lookup_unknown_group_is_nan(self, spark):
        import pyspark.sql.functions as F
        from t_digest_spark.operators import tdigest_aggregate
        from t_digest_spark.operators.rank import digest_rank_lookup
        df = spark.range(0, 1000).select(
            (F.col("id") % 2).cast("string").alias("g"),
            F.col("id").cast("double").alias("x"))
        digests = tdigest_aggregate(df.where("g = '0'"), "x", ["g"])
        out = digest_rank_lookup(df, digests, "x", ["g"]).toPandas()
        assert out[out.g == "1"]["rank_est"].isna().all()
        assert out[out.g == "0"]["rank_est"].notna().all()


def test_theta_multi_column_tuples(spark):
    """key_col as a list counts distinct TUPLES, matching
    COUNT(DISTINCT a, b) incl. the any-NULL-drops-row convention."""
    import pyspark.sql.functions as F
    from t_digest_spark.sketches.spark import (theta_aggregate,
                                               theta_estimate_udf)
    df = spark.range(0, 9_000).select(
        (F.col("id") % 40).alias("a"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id") % 11).alias("b"))
    sk = theta_aggregate(df, ["a", "b"], None, k=4096)
    got = sk.select(theta_estimate_udf()("retained", "theta", "k")
                    .alias("e")).collect()[0]["e"]
    exact = (df.where("b IS NOT NULL").select("a", "b").distinct().count())
    assert got == float(exact)


def test_theta_merge_mismatched_k():
    """Merging sketches built with different k degrades gracefully to the
    coarser resolution (theta = min) and keeps the union contract."""
    rng = np.random.default_rng(31)
    hs_a = rng.integers(0, THETA_MAX, 50_000, dtype=np.int64)
    hs_b = rng.integers(0, THETA_MAX, 50_000, dtype=np.int64)
    a = ThetaSketch(k=4096); a.update_hashes(hs_a)
    b = ThetaSketch(k=512); b.update_hashes(hs_b)
    m = ThetaSketch.union_all([a, b], k=512)
    m2 = ThetaSketch.union_all([b, a], k=512)
    assert np.array_equal(m.retained, m2.retained) and m.theta == m2.theta
    true = len(set(hs_a) | set(hs_b))
    rse = 1.0 / np.sqrt(m.retained.size - 1)
    assert abs(m.estimate() - true) <= 5 * rse * true


def test_null_groups_form_their_own_group(spark):
    """NULL group values get their own sketch row (Spark groupBy
    semantics), not silent dropping — across KLL, theta, and the digest."""
    import pyspark.sql.functions as F
    from t_digest_spark.operators import tdigest_aggregate
    from t_digest_spark.sketches.spark import (kll_aggregate,
                                               theta_aggregate,
                                               theta_estimate_udf)
    df = spark.range(0, 3000).select(
        F.when(F.col("id") % 3 == 0, None).otherwise(
            (F.col("id") % 2).cast("string")).alias("g"),
        (F.col("id") % 97).alias("key"),
        F.col("id").cast("double").alias("x"))
    th = theta_aggregate(df, "key", ["g"], k=1024)
    rows = {r["g"]: r for r in th.select(
        "g", theta_estimate_udf()("retained", "theta", "k").alias("e"))
        .collect()}
    assert set(rows) == {None, "0", "1"}
    exact_null = (df.where("g IS NULL").select("key").distinct().count())
    assert rows[None]["e"] == float(exact_null)
    kll_groups = {r["g"] for r in kll_aggregate(df, "x", ["g"]).collect()}
    assert None in kll_groups
    dig_groups = {r["g"] for r in tdigest_aggregate(df, "x", ["g"]).collect()}
    assert None in dig_groups


def test_theta_binary_op_one_sided_groups(spark):
    """Groups present in only one operand survive union/a_not_b (full-outer
    semantics); intersect with an absent side is empty, not missing."""
    import pyspark.sql.functions as F
    from t_digest_spark.sketches.spark import (theta_aggregate,
                                               theta_binary_op,
                                               theta_estimate_udf)
    df = spark.range(0, 4000).select(
        (F.col("id") % 4).alias("g"), (F.col("id") % 500).alias("key"))
    a = theta_aggregate(df.where("g < 3"), "key", ["g"], k=2048)   # g=0,1,2
    b = theta_aggregate(df.where("g > 1"), "key", ["g"], k=2048)   # g=2,3
    est = theta_estimate_udf()

    def ests(res):
        return {r["g"]: r["e"] for r in
                res.select("g", est("retained", "theta", "k").alias("e"))
                .collect()}
    uni = ests(theta_binary_op(a, b, "union", ["g"]))
    assert set(uni) == {0, 1, 2, 3}           # one-sided groups kept
    exact0 = df.where("g = 0").select("key").distinct().count()
    assert uni[0] == float(exact0)
    anb = ests(theta_binary_op(a, b, "a_not_b", ["g"]))
    assert anb[0] == float(exact0)            # b absent -> A unchanged
    assert anb[3] == 0.0                      # a absent -> empty
    inter = ests(theta_binary_op(a, b, "intersect", ["g"]))
    assert inter[0] == 0.0 and inter[3] == 0.0
    # global mode with an EMPTY operand: union keeps A
    ga = theta_aggregate(df, "key", None, k=2048)
    gb = theta_aggregate(df.where("g > 99"), "key", None, k=2048)  # empty
    guni = theta_binary_op(ga, gb, "union").select(
        est("retained", "theta", "k").alias("e")).collect()
    assert len(guni) == 1
    assert guni[0]["e"] == float(df.select("key").distinct().count())


def test_countmin_empty_input_estimates_zero(spark):
    """SQL global-aggregate semantics: an EMPTY stream still yields one
    (identity) sketch row, and every key estimates 0 — countmin_estimate
    must not crash on a 0-row collect."""
    from t_digest_spark.sketches.spark import countmin_aggregate, countmin_estimate
    import pyspark.sql.functions as F
    empty = spark.range(0).select(F.col("id").alias("key"))
    cm = countmin_aggregate(empty, "key", d=3, w=64)
    assert cm.count() == 1
    keys = spark.range(5).select(F.col("id").alias("key"))
    out = countmin_estimate(cm, keys, "key").collect()
    assert [r.cm_estimate for r in out] == [0] * 5


def test_bloom_empty_input_contains_nothing(spark):
    """An empty Bloom filter exists (one identity row) and contains no key."""
    from t_digest_spark.sketches.spark import bloom_aggregate, bloom_contains
    import pyspark.sql.functions as F
    empty = spark.range(0).select(F.col("id").alias("key"))
    bf = bloom_aggregate(empty, "key", m_bits=1 << 12, k=4)
    assert bf.count() == 1
    keys = spark.range(5).select(F.col("id").alias("key"))
    out = bloom_contains(bf, keys, "key").collect()
    assert all(not r.bloom_contains for r in out)


def test_countmin_identity_row_is_merge_noop(spark):
    """The identity partial must not change non-empty results."""
    from t_digest_spark.sketches.spark import countmin_aggregate, countmin_estimate
    import pyspark.sql.functions as F
    df = spark.range(100).select((F.col("id") % 10).alias("key"))
    cm = countmin_aggregate(df, "key", d=3, w=1024)
    keys = spark.range(10).select(F.col("id").alias("key"))
    out = countmin_estimate(cm, keys, "key").collect()
    assert [r.cm_estimate for r in out] == [10] * 10
