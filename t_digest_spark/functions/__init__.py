"""Scalar query functions over digest rows, exposed as Arrow-batched pandas UDFs.

Each UDF takes the five digest columns (means, weights, dmin, dmax, count) and
computes the reference query contract (quantile MergingDigest.java:704-790, cdf
:566-702, trimmed mean derived per SURVEY.md §2.3). Digest rows are one-per-group
(small), so the per-row Python inside the UDF iterates over *groups*, not data
rows — the heavy lifting already happened in the vectorized aggregation.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from t_digest_spark.serde import digest_from_cells

_DIGEST_COLS = ("means", "weights", "dmin", "dmax")


def _iter_digests(means, weights, dmin, dmax, delta, scale):
    for m, w, lo, hi in zip(means, weights, dmin, dmax):
        yield digest_from_cells(m, w, lo, hi, delta, scale)


def quantile_udf(q: float, delta: float = 100.0, scale: str = "k2"):
    @pandas_udf("double")
    def _q(means: pd.Series, weights: pd.Series, dmin: pd.Series, dmax: pd.Series) -> pd.Series:
        return pd.Series([d.quantile(q) for d in _iter_digests(means, weights, dmin, dmax, delta, scale)])
    return _q


def quantiles_udf(qs: Sequence[float], delta: float = 100.0, scale: str = "k2"):
    qs = [float(q) for q in qs]

    @pandas_udf("array<double>")
    def _qs(means: pd.Series, weights: pd.Series, dmin: pd.Series, dmax: pd.Series) -> pd.Series:
        return pd.Series([d.quantiles(qs)
                          for d in _iter_digests(means, weights, dmin, dmax, delta, scale)])
    return _qs


def cdf_udf(x: float, delta: float = 100.0, scale: str = "k2"):
    @pandas_udf("double")
    def _c(means: pd.Series, weights: pd.Series, dmin: pd.Series, dmax: pd.Series) -> pd.Series:
        return pd.Series([d.cdf(x) for d in _iter_digests(means, weights, dmin, dmax, delta, scale)])
    return _c


def trimmed_mean_udf(lo: float, hi: float, delta: float = 100.0, scale: str = "k2"):
    @pandas_udf("double")
    def _t(means: pd.Series, weights: pd.Series, dmin: pd.Series, dmax: pd.Series) -> pd.Series:
        return pd.Series([d.trimmed_mean(lo, hi)
                          for d in _iter_digests(means, weights, dmin, dmax, delta, scale)])
    return _t


def with_quantiles(digest_df, quantiles: dict, delta: float = 100.0,
                   scale: str = "k2", drop_digest: bool = True):
    """Attach named quantile columns, e.g. {"p50": 0.5, "p99": 0.99}."""
    cols = [F.col(c) for c in _DIGEST_COLS]
    out = digest_df
    for name, q in quantiles.items():
        out = out.withColumn(name, quantile_udf(q, delta, scale)(*cols))
    if drop_digest:
        out = out.drop("means", "weights")
    return out


def centroid_count_col() -> Column:
    return F.size("means").alias("centroid_count")


def register_sql_functions(spark, delta: float = 100.0, scale: str = "k2"):
    """Expose the digest query surface to pure-SQL users:

        SELECT lang, tdigest_quantile(means, weights, dmin, dmax, 0.5) AS p50
        FROM digests

    Quantile/cdf/trimmed-mean take the digest columns plus literal
    parameters; delta/scale are fixed at registration (job-level parameters,
    like the aggregation that produced the rows).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def tdigest_quantile(means: pd.Series, weights: pd.Series, dmin: pd.Series,
                         dmax: pd.Series, q: pd.Series) -> pd.Series:
        return pd.Series([
            digest_from_cells(m, w, lo, hi, delta, scale).quantile(float(qq))
            for m, w, lo, hi, qq in zip(means, weights, dmin, dmax, q)])

    @pandas_udf("double")
    def tdigest_cdf(means: pd.Series, weights: pd.Series, dmin: pd.Series,
                    dmax: pd.Series, x: pd.Series) -> pd.Series:
        return pd.Series([
            digest_from_cells(m, w, lo, hi, delta, scale).cdf(float(xx))
            for m, w, lo, hi, xx in zip(means, weights, dmin, dmax, x)])

    @pandas_udf("double")
    def tdigest_trimmed_mean(means: pd.Series, weights: pd.Series,
                             dmin: pd.Series, dmax: pd.Series,
                             lo_q: pd.Series, hi_q: pd.Series) -> pd.Series:
        return pd.Series([
            digest_from_cells(m, w, lo, hi, delta, scale).trimmed_mean(
                float(a), float(b))
            for m, w, lo, hi, a, b in zip(means, weights, dmin, dmax, lo_q, hi_q)])

    @pandas_udf("double")
    def avltree_quantile(means: pd.Series, weights: pd.Series,
                         dmin: pd.Series, dmax: pd.Series,
                         q: pd.Series) -> pd.Series:
        from t_digest_spark.avl import AVLTreeDigest
        return pd.Series([
            AVLTreeDigest.from_cells(m, w, lo, hi, delta, scale)
            .quantile(float(qq))
            for m, w, lo, hi, qq in zip(means, weights, dmin, dmax, q)])

    @pandas_udf("double")
    def kll_quantile(items: pd.Series, offsets: pd.Series, kmin: pd.Series,
                     kmax: pd.Series, count: pd.Series,
                     q: pd.Series) -> pd.Series:
        from t_digest_spark.sketches.kll import KllSketch
        return pd.Series([
            KllSketch.from_row(it, off, mn, mx, n).quantile(float(qq))
            for it, off, mn, mx, n, qq
            in zip(items, offsets, kmin, kmax, count, q)])

    from t_digest_spark.sketches.spark import theta_estimate_udf
    theta_estimate = theta_estimate_udf()    # single implementation, reused

    @pandas_udf("bigint")
    def frequent_estimate(keys: pd.Series, counts: pd.Series,
                          max_error: pd.Series, n: pd.Series, k: pd.Series,
                          item: pd.Series) -> pd.Series:
        from t_digest_spark.sketches.frequent import FrequentItemsSketch
        return pd.Series([
            FrequentItemsSketch.from_row(ks, cs, me, nn, kk).estimate(str(it))
            for ks, cs, me, nn, kk, it
            in zip(keys, counts, max_error, n, k, item)])

    spark.udf.register("tdigest_quantile", tdigest_quantile)
    spark.udf.register("tdigest_cdf", tdigest_cdf)
    spark.udf.register("tdigest_trimmed_mean", tdigest_trimmed_mean)
    spark.udf.register("avltree_quantile", avltree_quantile)
    spark.udf.register("kll_quantile", kll_quantile)
    spark.udf.register("theta_estimate", theta_estimate)
    spark.udf.register("frequent_estimate", frequent_estimate)


def register_sql_aggregate(spark, delta: float = 100.0, scale: str = "k2",
                           chunk: int = 65536):
    """Let pure-SQL users BUILD digests (VERDICT r2 #5), not just query them:

        SELECT key, tdigest_quantile(means, weights, dmin, dmax, 0.5) AS p50
        FROM tdigest_build(
            TABLE(SELECT l_returnflag AS key, l_extendedprice AS x FROM li)
            PARTITION BY key)

    Contract: the input table exposes ``key string`` (group, may be a packed
    multi-key) and ``x double``; one digest row per partition comes back.
    Spark runs one UDTF instance per PARTITION BY group, so this IS a
    distributed aggregate — but rows cross the Python boundary one at a
    time, so it is the SQL *convenience* surface; the scale path remains
    ``tdigest_aggregate`` (mapInPandas partials + applyInPandas merge, no
    raw-row shuffle). Values fold into the digest every ``chunk`` rows, so
    per-group memory stays O(chunk + centroids), not O(rows).
    """
    from pyspark.sql.functions import udtf

    def _build_udtf(return_type, make_acc, fold, emit):
        """Shared PARTITION BY accumulator skeleton: chunked folds keep
        per-group memory O(chunk + sketch), the group key is captured from
        any row, and a partition whose values are all NULL still yields its
        group row (SQL GROUP BY semantics) via emit's empty case."""

        @udtf(returnType=return_type)
        class BuildUDTF:
            def __init__(self):
                self._acc = make_acc()
                self._buf = []
                self._key = None

            def eval(self, row):
                if row.key is not None:
                    self._key = row.key
                x = row.x
                if x is not None:
                    self._buf.append(float(x))
                    if len(self._buf) >= chunk:
                        fold(self._acc, np.asarray(self._buf))
                        self._buf.clear()

            def terminate(self):
                if self._buf:
                    fold(self._acc, np.asarray(self._buf))
                    self._buf.clear()
                yield emit(self._key, self._acc)

        return BuildUDTF

    def _make_digest():
        from t_digest_spark.core import TDigest
        return TDigest(delta=delta, scale=scale)

    def _emit_digest(key, d):
        if d.count == 0:
            return (key, [], [], float("nan"), float("nan"), 0.0)
        d.compress()
        return (key, [float(v) for v in d.means],
                [float(v) for v in d.weights],
                float(d.min), float(d.max), float(d.count))

    spark.udtf.register("tdigest_build", _build_udtf(
        "key string, means array<double>, weights array<double>, "
        "dmin double, dmax double, count double",
        _make_digest, lambda d, v: d.add_values(v), _emit_digest))

    def _make_kll():
        from t_digest_spark.sketches.kll import KllSketch
        return KllSketch()

    def _emit_kll(key, sk):
        items, offs, mn, mx, n = sk.to_row()
        return (key, items, offs, mn, mx, n)

    spark.udtf.register("kll_build", _build_udtf(
        "key string, items array<double>, offsets array<int>, "
        "kmin double, kmax double, count double",
        _make_kll, lambda sk, v: sk.update_values(v), _emit_kll))
