"""Integration tests: distributed digest aggregation on a live SparkSession."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from t_digest_spark.core import Dist, TDigest
from t_digest_spark.functions import quantile_udf, trimmed_mean_udf, with_quantiles
from t_digest_spark.operators import (tdigest_aggregate, tdigest_merge,
                                      tdigest_partial_build)
from t_digest_spark.serde import digest_from_cells
from t_digest_spark.sources.synthetic import generate_pdf, source_code_table

import pyspark.sql.functions as F


@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("tdigest-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def code_df(spark):
    return source_code_table(spark, 20_000, partitions=8).cache()


def test_source_table_deterministic():
    # per-row sha256(content) invariant (BASELINE.json): generation is a pure
    # function of row id, independent of partitioning
    a = generate_pdf(np.arange(100))
    b = generate_pdf(np.arange(100))
    ha = [hashlib.sha256(c.encode()).hexdigest() for c in a["content"]]
    hb = [hashlib.sha256(c.encode()).hexdigest() for c in b["content"]]
    assert ha == hb
    # chunked generation == whole generation
    c = pd.concat([generate_pdf(np.arange(0, 50)), generate_pdf(np.arange(50, 100))],
                  ignore_index=True)
    assert list(c["content"]) == list(a["content"])


def test_source_table_skew(code_df):
    top = (code_df.groupBy("repo").count().orderBy(F.desc("count")).limit(2)
           .agg(F.sum("count")).collect()[0][0])
    assert top / 20_000 > 0.25  # ~30% in 2 hot repos


def test_global_aggregate_matches_exact(spark, code_df):
    pdf = code_df.select(F.length("content").alias("x")).toPandas()
    data = pdf["x"].to_numpy(dtype=np.float64)
    dig = tdigest_aggregate(
        code_df.select(F.length("content").cast("double").alias("x")), "x")
    row = dig.collect()[0]
    d = digest_from_cells(row["means"], row["weights"], row["dmin"], row["dmax"], 100.0, "k2")
    assert d.total == pytest.approx(data.size)
    assert row["dmin"] == data.min() and row["dmax"] == data.max()
    for q in [0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999]:
        rank_err = abs(Dist.cdf(d.quantile(q), data) - q)
        assert rank_err < 0.015, (q, rank_err)  # merge bound, BASELINE.md


def test_grouped_aggregate_per_lang(spark, code_df):
    df = code_df.select("lang", F.length("content").cast("double").alias("x"))
    dig = tdigest_aggregate(df, "x", ["lang"])
    out = with_quantiles(dig, {"p50": 0.5, "p99": 0.99}).toPandas().set_index("lang")
    exact = df.toPandas()
    assert set(out.index) == set(exact["lang"].unique())
    for lang, grp in exact.groupby("lang"):
        data = grp["x"].to_numpy()
        est = out.loc[lang, "p50"]
        assert abs(Dist.cdf(est, data) - 0.5) < 0.02, lang
        assert out.loc[lang, "count"] == pytest.approx(len(data))


def test_partition_invariance(spark):
    # same data, different partitioning -> same accuracy (tolerances, not bits)
    vals = np.random.default_rng(3).normal(100, 15, 50_000)
    pdf = pd.DataFrame({"x": vals})
    results = {}
    for parts in (1, 4, 16):
        df = spark.createDataFrame(pdf).repartition(parts)
        row = tdigest_aggregate(df, "x").collect()[0]
        d = digest_from_cells(row["means"], row["weights"], row["dmin"], row["dmax"], 100.0, "k2")
        results[parts] = d
    for parts, d in results.items():
        assert d.total == pytest.approx(50_000)
        for q in [0.01, 0.5, 0.99]:
            assert abs(Dist.cdf(d.quantile(q), vals) - q) < 0.015, (parts, q)


def test_salted_merge_levels(spark):
    vals = np.random.default_rng(4).uniform(0, 1, 20_000)
    df = spark.createDataFrame(pd.DataFrame({"x": vals})).repartition(16)
    partials = tdigest_partial_build(df, "x")
    merged = tdigest_merge(partials, salt_levels=1).collect()[0]
    d = digest_from_cells(merged["means"], merged["weights"], merged["dmin"],
                          merged["dmax"], 100.0, "k2")
    assert d.total == pytest.approx(20_000)
    assert abs(Dist.cdf(d.quantile(0.5), vals) - 0.5) < 0.015


def test_weighted_aggregate(spark):
    pdf = pd.DataFrame({"x": [1.0, 2.0, 3.0], "w": [1.0, 1.0, 98.0]})
    row = tdigest_aggregate(spark.createDataFrame(pdf), "x", weight_col="w").collect()[0]
    d = digest_from_cells(row["means"], row["weights"], row["dmin"], row["dmax"], 100.0, "k2")
    assert d.total == pytest.approx(100.0)
    # the heavy centroid at 3 (w=98) is not a singleton, so the digest
    # interpolates into it (reference contract, MergingDigest.java:752-777)
    assert d.quantile(0.5) == pytest.approx(3.0, abs=0.05)
    assert d.quantile(0.9) == 3.0


def test_nulls_and_nans_ignored(spark):
    pdf = pd.DataFrame({"x": [1.0, None, float("nan"), 2.0, 3.0]})
    row = tdigest_aggregate(spark.createDataFrame(pdf), "x").collect()[0]
    assert row["count"] == pytest.approx(3.0)


def test_infinite_values_survive_aggregation(spark):
    # +/-inf are legal points (production telemetry emits them from upstream
    # overflow). Regression for the adversarial-inf finding: digest_to_cells
    # clamped ANY non-finite min/max to NaN (meant for the empty-digest
    # sentinel), which pandas->Arrow turned into a null in the non-nullable
    # dmin/dmax fields — "IllegalStateException: Value at index is null" in
    # the JVM shuffle read. Non-empty digests must carry their real +/-inf
    # extremes end-to-end.
    pdf = pd.DataFrame({"x": [float(i) for i in range(1000)]
                        + [float("inf"), float("-inf")]})
    dig = tdigest_aggregate(spark.createDataFrame(pdf).repartition(4), "x",
                            None, delta=200.0)
    row = dig.collect()[0]
    assert row["dmin"] == float("-inf") and row["dmax"] == float("inf")
    assert row["count"] == pytest.approx(1002.0)
    d = digest_from_cells(row["means"], row["weights"], row["dmin"],
                          row["dmax"], 200.0, "k2")
    assert d.quantile(0.0) == float("-inf")
    assert d.quantile(1.0) == float("inf")
    # interior quantiles stay finite: the infinite endpoints are forced
    # singletons, never averaged into interior centroids
    assert math.isfinite(d.quantile(0.5))
    # the quantile pandas-UDF path over the digest cells must also survive
    est = dig.select(quantile_udf(0.5, 200.0)(
        "means", "weights", "dmin", "dmax").alias("e50")).collect()[0]["e50"]
    assert abs(est - 499.5) < 25.0


def test_query_udfs(spark):
    vals = np.random.default_rng(5).uniform(0, 100, 30_000)
    df = spark.createDataFrame(pd.DataFrame({"x": vals})).repartition(4)
    dig = tdigest_aggregate(df, "x")
    out = dig.select(
        quantile_udf(0.5)("means", "weights", "dmin", "dmax").alias("p50"),
        trimmed_mean_udf(0.25, 0.75)("means", "weights", "dmin", "dmax").alias("iqm"),
    ).collect()[0]
    assert abs(Dist.cdf(out["p50"], vals) - 0.5) < 0.015
    srt = np.sort(vals)
    exact_iqm = srt[int(0.25 * len(srt)):int(0.75 * len(srt))].mean()
    assert out["iqm"] == pytest.approx(exact_iqm, rel=0.02)


def test_lineitem_digest_vs_exact(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    dig = tdigest_aggregate(li, "l_extendedprice", ["l_returnflag"])
    out = with_quantiles(dig, {"p50": 0.5}).toPandas().set_index("l_returnflag")
    exact = li.select("l_returnflag", "l_extendedprice").toPandas()
    for flag, grp in exact.groupby("l_returnflag"):
        data = grp["l_extendedprice"].to_numpy()
        assert abs(Dist.cdf(out.loc[flag, "p50"], data) - 0.5) < 0.02
        assert out.loc[flag, "dmin"] == data.min()
        assert out.loc[flag, "dmax"] == data.max()


def test_fused_quantile_aggregate(spark):
    """tdigest_quantile_aggregate == tdigest_aggregate + scalar UDFs (same
    digest, queries evaluated inside the merge task)."""
    from t_digest_spark.operators import tdigest_quantile_aggregate
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "g": np.repeat(["a", "b"], 4000),
        "x": np.concatenate([rng.normal(100, 15, 4000), rng.uniform(0, 1, 4000)]),
    })
    df = spark.createDataFrame(pdf).repartition(4)
    fused = {r.g: r for r in tdigest_quantile_aggregate(
        df, "x", ["g"],
        quantiles={"p50": 0.5, "p99": 0.99},
        trimmed={"iq": (0.25, 0.75)},
        cdfs={"cdf100": 100.0}).collect()}
    assert set(fused) == {"a", "b"}
    for g in ("a", "b"):
        vals = np.sort(pdf[pdf.g == g].x.to_numpy())
        assert fused[g]["count"] == 4000.0
        assert abs(fused[g]["p50"] - Dist.quantile(0.5, vals)) < 0.02 * (vals.max() - vals.min()) + 1e-9
        assert 0.0 <= fused[g]["cdf100"] <= 1.0
        lo_i, hi_i = int(0.25 * 4000), int(0.75 * 4000)
        exact_iq = vals[lo_i:hi_i].mean()
        assert abs(fused[g]["iq"] - exact_iq) < 0.05 * (abs(exact_iq) + 1)
    # global (no group) path
    tot = tdigest_quantile_aggregate(df, "x", None, quantiles={"p50": 0.5}).collect()
    assert len(tot) == 1 and tot[0]["count"] == 8000.0


def test_sql_registered_functions(spark):
    """Pure-SQL surface: digest rows queryable with registered UDFs."""
    from t_digest_spark.functions import register_sql_functions
    from t_digest_spark.operators import tdigest_aggregate
    register_sql_functions(spark)
    rng = np.random.default_rng(2)
    df = spark.createDataFrame(pd.DataFrame({"x": rng.uniform(0, 100, 20000)}))
    tdigest_aggregate(df, "x", None).createOrReplaceTempView("dig")
    row = spark.sql("""
        SELECT tdigest_quantile(means, weights, dmin, dmax, 0.5) AS p50,
               tdigest_cdf(means, weights, dmin, dmax, 25.0) AS c25,
               tdigest_trimmed_mean(means, weights, dmin, dmax, 0.25, 0.75) AS iqm
        FROM dig""").collect()[0]
    assert abs(row.p50 - 50.0) < 2.0
    assert abs(row.c25 - 0.25) < 0.02
    assert abs(row.iqm - 50.0) < 2.0


def test_sql_build_aggregate_udtf(spark):
    """Pure-SQL users can BUILD digests too (VERDICT r2 #5): tdigest_build is
    a PARTITION BY table-function aggregate; its digest rows feed the
    registered scalar query UDFs with the same accuracy contract as the
    DataFrame aggregate."""
    from t_digest_spark.functions import (register_sql_aggregate,
                                          register_sql_functions)
    register_sql_functions(spark)
    register_sql_aggregate(spark)
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "g": np.repeat(["a", "b"], 10000),
        "x": np.concatenate([rng.uniform(0, 100, 10000),
                             rng.uniform(100, 300, 10000)])})
    spark.createDataFrame(pdf).createOrReplaceTempView("sql_build_src")
    rows = spark.sql("""
        SELECT key, count AS n,
               tdigest_quantile(means, weights, dmin, dmax, 0.5) AS p50
        FROM tdigest_build(
            TABLE(SELECT g AS key, x FROM sql_build_src) PARTITION BY key)
        ORDER BY key""").collect()
    assert [r.key for r in rows] == ["a", "b"]
    assert all(r.n == 10000.0 for r in rows)
    assert abs(rows[0].p50 - 50.0) < 2.0
    assert abs(rows[1].p50 - 200.0) < 4.0


def test_sql_kll_build_udtf(spark):
    """kll_build gives the registered kll_quantile SQL function a pure-SQL
    producer; exact regime (k=200 > group size) means quantiles are exact
    order statistics in the Java-parity floor convention."""
    from t_digest_spark.functions import (register_sql_aggregate,
                                          register_sql_functions)
    register_sql_functions(spark)
    register_sql_aggregate(spark)
    rng = np.random.default_rng(6)
    vals = rng.uniform(0, 100, 150)
    pdf = pd.DataFrame({"g": ["a"] * 150, "x": vals})
    spark.createDataFrame(pdf).createOrReplaceTempView("sql_kll_src")
    row = spark.sql("""
        SELECT key, count AS n,
               kll_quantile(items, offsets, kmin, kmax, count, 0.5) AS p50
        FROM kll_build(TABLE(SELECT g AS key, x FROM sql_kll_src)
                       PARTITION BY key)""").collect()[0]
    assert row.key == "a" and row.n == 150.0
    assert row.p50 == float(np.sort(vals)[int(0.5 * 150)])


def test_entry_contract_schema(spark):
    """Driver-contract guard: entry() keeps a stable schema and >=1 row."""
    import __spark_entry__ as em
    df = em.entry(spark)
    assert [f.name for f in df.schema.fields] == [
        "lang", "n_docs", "min_len", "max_len", "p50", "p99", "p999",
        "trimmed_mean_5_95"]
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r.min_len <= r.p50 <= r.p999 <= r.max_len for r in rows)


def test_sql_theta_and_frequent_functions(spark):
    """SQL scalar surface for the new sketch family: theta_estimate over
    theta rows, frequent_estimate point lookups over MG rows."""
    from t_digest_spark.functions import register_sql_functions
    from t_digest_spark.sketches.spark import (frequent_aggregate,
                                               theta_aggregate)
    register_sql_functions(spark)
    df = spark.range(0, 5000).selectExpr("id % 700 AS key")
    theta_aggregate(df, "key", None, k=4096).createOrReplaceTempView("th")
    assert spark.sql(
        "SELECT theta_estimate(retained, theta, k) AS e FROM th"
    ).collect()[0].e == 700.0
    frequent_aggregate(df, "key", None, k=1024).createOrReplaceTempView("fi")
    got = spark.sql(
        "SELECT frequent_estimate(keys, counts, max_error, n, k, '3') AS c "
        "FROM fi").collect()[0].c
    assert got == df.where("key = 3").count()


# ------------------------------------------------------------- auto-salting

def test_decide_salt_levels_crossover():
    from t_digest_spark.operators.aggregation import (SALT_CROSSOVER_PARTIALS,
                                                      decide_salt_levels)
    assert decide_salt_levels(1) == 0
    assert decide_salt_levels(SALT_CROSSOVER_PARTIALS) == 0
    assert decide_salt_levels(SALT_CROSSOVER_PARTIALS + 1) == 1
    assert decide_salt_levels(200_000) == 1
    assert decide_salt_levels(100, crossover=50) == 1


def test_auto_salt_small_input_matches_unsalted(spark):
    """At local partition counts auto resolves to 0 levels: the result must
    be IDENTICAL (same plan) to the unsalted merge."""
    import numpy as np
    import pandas as pd
    from t_digest_spark.operators.aggregation import tdigest_aggregate
    rng = np.random.default_rng(11)
    df = spark.createDataFrame(pd.DataFrame({
        "g": np.array(["a", "b"])[rng.integers(0, 2, 20_000)],
        "x": rng.normal(0, 1, 20_000)})).repartition(8)
    auto = {r["g"]: (list(r["means"]), list(r["weights"]))
            for r in tdigest_aggregate(df, "x", ["g"],
                                       salt_levels="auto").collect()}
    plain = {r["g"]: (list(r["means"]), list(r["weights"]))
             for r in tdigest_aggregate(df, "x", ["g"],
                                        salt_levels=0).collect()}
    assert auto == plain
