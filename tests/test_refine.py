"""Digest-guided exact quantile refinement vs Spark's exact `percentile`."""

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F

from t_digest_spark.operators.aggregation import tdigest_aggregate
from t_digest_spark.operators.refine import refined_exact_quantiles


@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("refine-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _df(spark, rng, n=40_000, groups=("A", "B", "C")):
    g = np.array(groups)[rng.integers(0, len(groups), n)]
    x = np.where(g == "B", rng.lognormal(8, 1.2, n), rng.normal(5e4, 1e4, n))
    return spark.createDataFrame(pd.DataFrame({"g": g, "x": x}))


def _exact(spark, df, qs):
    rows = df.groupBy("g").agg(
        *[F.expr(f"percentile(x, {q!r})").alias(f"p{i}")
          for i, q in enumerate(qs)]).collect()
    return {(r["g"], q): r[f"p{i}"]
            for r in rows for i, q in enumerate(qs)}


def test_matches_full_percentile(spark):
    rng = np.random.default_rng(3)
    df = _df(spark, rng)
    qs = (0.25, 0.5, 0.75, 0.99)
    dig = tdigest_aggregate(df, "x", ["g"])
    got = refined_exact_quantiles(spark, df, "x", "g", dig, qs=qs)
    want = _exact(spark, df, qs)
    assert set(got) == set(want)
    for k in want:
        # identical order statistics + interpolation; only float-literal
        # round-trip noise may differ
        assert got[k] == pytest.approx(want[k], rel=1e-9), k


def test_ties_heavy_distribution(spark):
    # 10 distinct repeated values (TDigestTest.java:760 'repeated' shape):
    # slices are plateaus, order statistics must still match exactly
    rng = np.random.default_rng(11)
    n = 20_000
    g = np.array(["A", "B"])[rng.integers(0, 2, n)]
    x = np.rint(rng.uniform(0, 10, n))
    df = spark.createDataFrame(pd.DataFrame({"g": g, "x": x}))
    qs = (0.1, 0.5, 0.9)
    dig = tdigest_aggregate(df, "x", ["g"])
    got = refined_exact_quantiles(spark, df, "x", "g", dig, qs=qs)
    want = _exact(spark, df, qs)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_fallback_path_still_exact(spark):
    # eps=0 collapses the bracket to a point: j0+1 falls outside every
    # bracket, so every (group, q) takes the full-percentile fallback — the
    # correctness guarantee when a sketch bound would ever miss
    rng = np.random.default_rng(5)
    df = _df(spark, rng, n=5_000)
    qs = (0.5,)
    dig = tdigest_aggregate(df, "x", ["g"])
    got = refined_exact_quantiles(spark, df, "x", "g", dig, qs=qs, eps=0.0)
    want = _exact(spark, df, qs)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_extreme_quantiles_clamped_brackets(spark):
    rng = np.random.default_rng(9)
    df = _df(spark, rng, n=10_000)
    qs = (0.001, 0.999)
    dig = tdigest_aggregate(df, "x", ["g"])
    got = refined_exact_quantiles(spark, df, "x", "g", dig, qs=qs)
    want = _exact(spark, df, qs)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k
