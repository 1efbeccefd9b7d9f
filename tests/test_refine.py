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


# ------------------------------------------------- range_partitioned_cumsum

def _naive_cumsum(spark, df, order_col, sum_cols, part_cols):
    from pyspark.sql.window import Window
    w = (Window.partitionBy(*part_cols).orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    out = df
    for c in sum_cols:
        out = out.withColumn(f"{c}_cum", F.sum(c).over(w))
    return out


def _cum_rows(df, part_cols, order_col):
    return sorted(
        (tuple(r[c] for c in part_cols), r[order_col],
         tuple(v for k, v in r.asDict().items() if k.endswith("_cum")))
        for r in df.collect())


def test_range_partitioned_cumsum_matches_window(spark):
    """Distinct order values per group: the chunked two-pass form must be
    row-for-row identical to the single-task window cumsum."""
    from t_digest_spark.operators.refine import range_partitioned_cumsum
    rng = np.random.default_rng(17)
    n = 5_000
    pdf = pd.DataFrame({
        "g": np.array(["A", "B", "C"])[rng.integers(0, 3, n)],
        "x": rng.permutation(n).astype(np.float64),   # distinct per group
        "a": rng.integers(0, 10, n),
        "b": rng.integers(0, 5, n),
    })
    df = spark.createDataFrame(pdf).repartition(8)
    got = range_partitioned_cumsum(df, "x", ["a", "b"], ["g"],
                                   boundaries=np.linspace(0, n, 33)[1:-1])
    want = _naive_cumsum(spark, df, "x", ["a", "b"], ["g"])
    assert _cum_rows(got, ["g"], "x") == _cum_rows(want, ["g"], "x")


def test_range_partitioned_cumsum_approx_boundaries_and_degenerate(spark):
    """approxQuantile-derived boundaries give the same totals; a constant
    order column degenerates to a single chunk without erroring."""
    from t_digest_spark.operators.refine import range_partitioned_cumsum
    rng = np.random.default_rng(23)
    n = 2_000
    pdf = pd.DataFrame({"g": ["G"] * n,
                        "x": rng.permutation(n).astype(np.float64),
                        "a": np.ones(n, dtype=np.int64)})
    df = spark.createDataFrame(pdf)
    got = range_partitioned_cumsum(df, "x", ["a"], ["g"], num_chunks=16)
    want = _naive_cumsum(spark, df, "x", ["a"], ["g"])
    assert _cum_rows(got, ["g"], "x") == _cum_rows(want, ["g"], "x")
    const = spark.createDataFrame(
        pd.DataFrame({"g": ["G"] * 10, "x": [1.0] * 10,
                      "a": np.ones(10, dtype=np.int64)}))
    rows = range_partitioned_cumsum(const, "x", ["a"], ["g"],
                                    boundaries=[]).collect()
    assert sorted(r["a_cum"] for r in rows) == list(range(1, 11))
