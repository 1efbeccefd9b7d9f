"""digest_rank_lookup: vectorized percentile-rank enrichment vs exact
mid-rank — the no-shuffle replacement for percent_rank windows."""

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F


@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("rank-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _mid_rank(vals: np.ndarray) -> np.ndarray:
    order = np.argsort(vals, kind="stable")
    sorted_v = vals[order]
    lt = np.searchsorted(sorted_v, vals, side="left")
    le = np.searchsorted(sorted_v, vals, side="right")
    return (lt + 0.5 * (le - lt)) / vals.size


def test_rank_lookup_grouped(spark):
    from t_digest_spark.operators import tdigest_aggregate
    from t_digest_spark.operators.rank import digest_rank_lookup
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({
        "g": np.repeat(["a", "b"], 20_000),
        "x": np.concatenate([rng.gamma(2.0, 3.0, 20_000),
                             rng.normal(50.0, 5.0, 20_000)]),
    })
    df = spark.createDataFrame(pdf).repartition(8)
    digests = tdigest_aggregate(df, "x", ["g"])
    out = digest_rank_lookup(df, digests, "x", ["g"]).toPandas()
    for g, sub in out.groupby("g"):
        exact = _mid_rank(sub["x"].to_numpy())
        err = np.abs(sub["rank_est"].to_numpy() - exact)
        assert err.max() < 0.015, f"group {g}: max err {err.max()}"
        assert err.mean() < 0.005


def test_rank_lookup_global_and_extremes(spark):
    from t_digest_spark.operators import tdigest_aggregate
    from t_digest_spark.operators.rank import digest_rank_lookup
    rng = np.random.default_rng(12)
    vals = rng.uniform(-100, 100, 30_000)
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    digests = tdigest_aggregate(df, "x", None)
    out = digest_rank_lookup(df, digests, "x", None).toPandas()
    exact = _mid_rank(out["x"].to_numpy())
    assert np.abs(out["rank_est"].to_numpy() - exact).max() < 0.015
    # extremes map to the tails
    imin, imax = out["x"].idxmin(), out["x"].idxmax()
    assert out.loc[imin, "rank_est"] < 0.001
    assert out.loc[imax, "rank_est"] > 0.999


def test_rank_lookup_tie_plateau(spark):
    """Heavy ties: a plateau value's rank lands inside its tied mass and
    values beyond the plateau stay monotone."""
    from t_digest_spark.operators import tdigest_aggregate
    from t_digest_spark.operators.rank import digest_rank_lookup
    rng = np.random.default_rng(13)
    vals = np.concatenate([np.full(5_000, 10.0), rng.uniform(20, 30, 5_000)])
    df = spark.createDataFrame(pd.DataFrame({"x": vals}))
    digests = tdigest_aggregate(df, "x", None)
    out = digest_rank_lookup(df, digests, "x", None).toPandas()
    plateau = out[out.x == 10.0]["rank_est"]
    # mid-rank convention (Dist.cdf): the plateau is the first half of the
    # mass, so its rank must sit near the MIDDLE of the tied mass (~0.25),
    # not the top (~0.5) — review finding r3
    assert (np.abs(plateau - 0.25) <= 0.06).all()
    upper = out[out.x > 20]["rank_est"]
    assert (upper >= 0.45).all()
    s = out.sort_values("x")["rank_est"].to_numpy()
    assert (np.diff(s) >= -1e-9).all()       # monotone in x


def test_rank_lookup_null_group(spark):
    """NULL group rows look up the (None,) digest (Spark groupBy keeps NULL
    groups as their own group) instead of unconditionally getting NaN."""
    from t_digest_spark.operators import tdigest_aggregate
    from t_digest_spark.operators.rank import digest_rank_lookup
    rng = np.random.default_rng(14)
    pdf = pd.DataFrame({
        "g": [None] * 10_000 + ["b"] * 10_000,
        "x": np.concatenate([rng.uniform(0, 1, 10_000),
                             rng.uniform(100, 200, 10_000)]),
    })
    df = spark.createDataFrame(pdf)
    digests = tdigest_aggregate(df, "x", ["g"])
    out = digest_rank_lookup(df, digests, "x", ["g"]).toPandas()
    nulls = out[out.g.isna()]
    assert not nulls["rank_est"].isna().any()
    exact = _mid_rank(nulls["x"].to_numpy())
    assert np.abs(nulls["rank_est"].to_numpy() - exact).max() < 0.015
    # a group absent from digest_df still yields NaN (not a crash)
    only_b = digests.where(F.col("g") == "b")
    out2 = digest_rank_lookup(df, only_b, "x", ["g"]).toPandas()
    assert out2[out2.g.isna()]["rank_est"].isna().all()
    assert not out2[out2.g == "b"]["rank_est"].isna().any()
