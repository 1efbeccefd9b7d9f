"""Spark aggregation layer for the sketch family (KLL, count-min, Bloom, HLL).

Same partial+final shape as the t-digest operators: per-partition partial
sketches via ``mapInPandas`` (no raw-row shuffle), exact mergeable reduce via
``applyInPandas``. HLL needs no custom code at all — Spark ships Apache
DataSketches HLL natively (``hll_sketch_agg``/``hll_union_agg``/
``hll_sketch_estimate``) and those built-ins ARE the idiomatic answer; thin
wrappers here only pin the API shape alongside the other sketches.

Count-min and Bloom hash keys JVM-side with ``xxhash64`` before the sketch
(codegen, consistent between build and probe); NumPy only mixes the 64-bit
hashes into positions.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StructType

from t_digest_spark.sketches.frequency import BloomFilter, CountMinSketch
from t_digest_spark.sketches.kll import DEFAULT_K, DEFAULT_M, KllSketch

_GLOBAL = "__sketch_global__"

KLL_FIELDS = ("items array<double>, offsets array<int>, kmin double, "
              "kmax double, count double")


def _group_prefix(df: DataFrame, group_cols: List[str]) -> str:
    by_name = {f.name: f for f in df.schema.fields}
    parts = [f"{c} {by_name[c].dataType.simpleString()}" for c in group_cols]
    return (", ".join(parts) + ", ") if parts else ""


# ------------------------------------------------------------------------ KLL

def kll_partial_build(df: DataFrame, value_col: str,
                      group_cols: Optional[Sequence[str]] = None,
                      k: int = DEFAULT_K) -> DataFrame:
    group_cols = list(group_cols or [])
    proj = df.select(*group_cols, F.col(value_col).cast("double").alias("__x__")) \
             .where(F.col("__x__").isNotNull() & ~F.isnan("__x__"))
    schema = _group_prefix(proj, group_cols) + KLL_FIELDS

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketches = {}
        keys = {}
        for pdf in batches:
            vals = pdf["__x__"].to_numpy(dtype=np.float64)
            if group_cols:
                gframe = pdf[group_cols]
                codes, uniques = pd.factorize(
                    pd.MultiIndex.from_frame(gframe)
                    if len(group_cols) > 1 else pdf[group_cols[0]])
                for gi in range(len(uniques)):
                    key = uniques[gi]
                    s = sketches.get(key)
                    if s is None:
                        s = sketches[key] = KllSketch(k)
                        keys[key] = key if len(group_cols) > 1 else (key,)
                    s.update_values(vals[codes == gi])
            else:
                s = sketches.get(_GLOBAL)
                if s is None:
                    s = sketches[_GLOBAL] = KllSketch(k)
                    keys[_GLOBAL] = ()
                s.update_values(vals)
        if sketches:
            rows = [tuple(keys[key]) + s.to_row() for key, s in sketches.items()]
            yield pd.DataFrame(rows, columns=(group_cols + [
                "items", "offsets", "kmin", "kmax", "count"]))

    return proj.mapInPandas(build, schema)


def kll_merge(partials: DataFrame,
              group_cols: Optional[Sequence[str]] = None,
              k: int = DEFAULT_K) -> DataFrame:
    group_cols = list(group_cols or [])
    df = partials
    added = False
    if not group_cols:
        df = df.withColumn(_GLOBAL, F.lit(1))
        group_cols = [_GLOBAL]
        added = True
    schema = _group_prefix(df, group_cols) + KLL_FIELDS

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [KllSketch.from_row(r["items"], r["offsets"], r["kmin"],
                                    r["kmax"], r["count"], k=k)
                 for _, r in pdf.iterrows()]
        s = KllSketch.merge_all(parts)
        head = tuple(pdf[c].iloc[0] for c in group_cols)
        return pd.DataFrame([head + s.to_row()],
                            columns=group_cols + ["items", "offsets", "kmin",
                                                  "kmax", "count"])

    out = df.groupBy(*group_cols).applyInPandas(merge_fn, schema)
    return out.drop(_GLOBAL) if added else out


def kll_aggregate(df: DataFrame, value_col: str,
                  group_cols: Optional[Sequence[str]] = None,
                  k: int = DEFAULT_K) -> DataFrame:
    return kll_merge(kll_partial_build(df, value_col, group_cols, k=k),
                     group_cols, k=k)


def kll_quantile_udf(q: float, k: int = DEFAULT_K):
    @pandas_udf("double")
    def _q(items: pd.Series, offsets: pd.Series, kmin: pd.Series,
           kmax: pd.Series, count: pd.Series) -> pd.Series:
        return pd.Series([
            KllSketch.from_row(i, o, lo, hi, n, k=k).quantile(q)
            for i, o, lo, hi, n in zip(items, offsets, kmin, kmax, count)])
    return _q


def kll_rank_udf(x: float, k: int = DEFAULT_K):
    @pandas_udf("double")
    def _r(items: pd.Series, offsets: pd.Series, kmin: pd.Series,
           kmax: pd.Series, count: pd.Series) -> pd.Series:
        return pd.Series([
            KllSketch.from_row(i, o, lo, hi, n, k=k).rank(x)
            for i, o, lo, hi, n in zip(items, offsets, kmin, kmax, count)])
    return _r


# ------------------------------------------------------------------ count-min

def countmin_aggregate(df: DataFrame, key_col: str,
                       group_cols: Optional[Sequence[str]] = None,
                       d: int = 5, w: int = 4096,
                       weight_col: Optional[str] = None) -> DataFrame:
    """One count-min row per group over xxhash64(key)."""
    group_cols = list(group_cols or [])
    cols = [F.xxhash64(key_col).alias("__h__")]
    if weight_col:
        cols.append(F.col(weight_col).cast("long").alias("__w__"))
    proj = df.select(*group_cols, *cols).where(F.col(key_col).isNotNull()
                                               if key_col in df.columns else F.lit(True))
    schema = _group_prefix(proj, group_cols) + "counts array<long>, d int, w int, n long"

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = {}
        keys = {}
        for pdf in batches:
            hs = pdf["__h__"].to_numpy(dtype=np.int64)
            ws = pdf["__w__"].to_numpy(dtype=np.int64) if weight_col else None
            if group_cols:
                codes, uniques = pd.factorize(
                    pd.MultiIndex.from_frame(pdf[group_cols])
                    if len(group_cols) > 1 else pdf[group_cols[0]])
                for gi in range(len(uniques)):
                    key = uniques[gi]
                    s = sk.get(key)
                    if s is None:
                        s = sk[key] = CountMinSketch(d, w)
                        keys[key] = key if len(group_cols) > 1 else (key,)
                    m = codes == gi
                    s.update_hashes(hs[m], ws[m] if ws is not None else None)
            else:
                s = sk.get(_GLOBAL)
                if s is None:
                    s = sk[_GLOBAL] = CountMinSketch(d, w)
                    keys[_GLOBAL] = ()
                s.update_hashes(hs, ws)
        if sk:
            yield pd.DataFrame(
                [tuple(keys[key]) + s.to_row() for key, s in sk.items()],
                columns=group_cols + ["counts", "d", "w", "n"])

    partials = proj.mapInPandas(build, schema)

    gb = list(group_cols)
    added = False
    if not gb:
        partials = partials.withColumn(_GLOBAL, F.lit(1))
        gb = [_GLOBAL]
        added = True
    out_schema = _group_prefix(partials, gb) + "counts array<long>, d int, w int, n long"

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        s = CountMinSketch(d, w)
        for _, r in pdf.iterrows():
            s.merge(CountMinSketch.from_row(r["counts"], r["d"], r["w"], r["n"]))
        head = tuple(pdf[c].iloc[0] for c in gb)
        return pd.DataFrame([head + s.to_row()],
                            columns=gb + ["counts", "d", "w", "n"])

    out = partials.groupBy(*gb).applyInPandas(merge_fn, out_schema)
    return out.drop(_GLOBAL) if added else out


def countmin_estimate(cm_df: DataFrame, keys_df: DataFrame,
                      key_col: str) -> DataFrame:
    """Point-frequency estimates for every key row against ONE global sketch
    row (broadcast to executors). Returns keys_df + ``cm_estimate``."""
    row = cm_df.collect()[0]
    sketch = CountMinSketch.from_row(row["counts"], row["d"], row["w"], row["n"])
    bc = keys_df.sparkSession.sparkContext.broadcast(
        (sketch.counts, sketch.d, sketch.w))

    @pandas_udf("long")
    def _est(h: pd.Series) -> pd.Series:
        counts, d, w = bc.value
        s = CountMinSketch(d, w)
        s.counts = counts
        return pd.Series(s.estimate_hashes(h.to_numpy(dtype=np.int64)))

    return keys_df.withColumn("cm_estimate", _est(F.xxhash64(key_col)))


# ---------------------------------------------------------------------- bloom

def bloom_aggregate(df: DataFrame, key_col: str, m_bits: int = 1 << 20,
                    k: int = 5) -> DataFrame:
    """One global Bloom-filter row over xxhash64(key)."""
    proj = df.select(F.xxhash64(key_col).alias("__h__"))
    schema = "bits array<long>, m long, k int, n long"

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        f = BloomFilter(m_bits, k)
        any_rows = False
        for pdf in batches:
            f.add_hashes(pdf["__h__"].to_numpy(dtype=np.int64))
            any_rows = True
        if any_rows:
            yield pd.DataFrame([f.to_row()], columns=["bits", "m", "k", "n"])

    partials = proj.mapInPandas(build, schema).withColumn(_GLOBAL, F.lit(1))

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        f = BloomFilter(m_bits, k)
        for _, r in pdf.iterrows():
            f.merge(BloomFilter.from_row(r["bits"], r["m"], r["k"], r["n"]))
        return pd.DataFrame([(1,) + f.to_row()],
                            columns=[_GLOBAL, "bits", "m", "k", "n"])

    return (partials.groupBy(_GLOBAL)
            .applyInPandas(merge_fn, f"{_GLOBAL} int, " + schema)
            .drop(_GLOBAL))


def bloom_contains(bloom_df: DataFrame, keys_df: DataFrame,
                   key_col: str) -> DataFrame:
    """Membership test column against one broadcast Bloom row. No false
    negatives; false positives bounded by the (m, k, n) design point."""
    row = bloom_df.collect()[0]
    f = BloomFilter.from_row(row["bits"], row["m"], row["k"], row["n"])
    bc = keys_df.sparkSession.sparkContext.broadcast((f.bits, f.m, f.k))

    @pandas_udf("boolean")
    def _has(h: pd.Series) -> pd.Series:
        bits, m, k_ = bc.value
        g = BloomFilter(m, k_)
        g.bits = bits
        return pd.Series(g.contains_hashes(h.to_numpy(dtype=np.int64)))

    return keys_df.withColumn("bloom_contains", _has(F.xxhash64(key_col)))


# ------------------------------------------------------------------------ HLL

def hll_aggregate(df: DataFrame, col: str,
                  group_cols: Optional[Sequence[str]] = None,
                  lgk: int = 12) -> DataFrame:
    """Distinct-count sketch per group — Spark's native DataSketches HLL
    (the built-in IS the idiomatic engine answer; no custom kernel)."""
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return gb.agg(F.hll_sketch_agg(F.col(col), F.lit(lgk)).alias("hll"))


def hll_merge(hll_df: DataFrame,
              group_cols: Optional[Sequence[str]] = None) -> DataFrame:
    gb = hll_df.groupBy(*group_cols) if group_cols else hll_df.groupBy()
    return gb.agg(F.hll_union_agg("hll").alias("hll"))


def hll_estimate_col() -> Column:
    return F.hll_sketch_estimate("hll").alias("distinct_estimate")


# ------------------------------------------------------------------------ REQ

REQ_FIELDS = ("items array<double>, offsets array<int>, states array<long>, "
              "rmin double, rmax double, count double")


def req_aggregate(df: DataFrame, value_col: str,
                  group_cols: Optional[Sequence[str]] = None,
                  k: int = 12, hra: bool = True) -> DataFrame:
    """Relative-error quantile sketch per group (REQ, sketches/req.py):
    partial build per partition, exact mergeable reduce — tail quantiles
    (p999, p9999) keep ~1% RELATIVE rank error no matter how extreme."""
    from t_digest_spark.sketches.req import ReqSketch
    group_cols = list(group_cols or [])
    proj = df.select(*group_cols, F.col(value_col).cast("double").alias("__x__")) \
             .where(F.col("__x__").isNotNull() & ~F.isnan("__x__"))
    schema = _group_prefix(proj, group_cols) + REQ_FIELDS
    out_cols = ["items", "offsets", "states", "rmin", "rmax", "count"]

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk, keys = {}, {}
        for pdf in batches:
            vals = pdf["__x__"].to_numpy(dtype=np.float64)
            if group_cols:
                codes, uniques = pd.factorize(
                    pd.MultiIndex.from_frame(pdf[group_cols])
                    if len(group_cols) > 1 else pdf[group_cols[0]])
                for gi in range(len(uniques)):
                    key = uniques[gi]
                    s = sk.get(key)
                    if s is None:
                        s = sk[key] = ReqSketch(k, hra)
                        keys[key] = key if len(group_cols) > 1 else (key,)
                    s.update_values(vals[codes == gi])
            else:
                s = sk.get(_GLOBAL)
                if s is None:
                    s = sk[_GLOBAL] = ReqSketch(k, hra)
                    keys[_GLOBAL] = ()
                s.update_values(vals)
        if sk:
            yield pd.DataFrame([tuple(keys[key]) + s.to_row()
                                for key, s in sk.items()],
                               columns=group_cols + out_cols)

    partials = proj.mapInPandas(build, schema)

    gb = list(group_cols)
    added = False
    if not gb:
        partials = partials.withColumn(_GLOBAL, F.lit(1))
        gb = [_GLOBAL]
        added = True
    out_schema = _group_prefix(partials, gb) + REQ_FIELDS

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [ReqSketch.from_row(r["items"], r["offsets"], r["states"],
                                    r["rmin"], r["rmax"], r["count"],
                                    k=k, hra=hra)
                 for _, r in pdf.iterrows()]
        s = ReqSketch.merge_all(parts)
        head = tuple(pdf[c].iloc[0] for c in gb)
        return pd.DataFrame([head + s.to_row()], columns=gb + out_cols)

    out = partials.groupBy(*gb).applyInPandas(merge_fn, out_schema)
    return out.drop(_GLOBAL) if added else out


def req_quantile_udf(q: float, k: int = 12, hra: bool = True):
    from t_digest_spark.sketches.req import ReqSketch

    @pandas_udf("double")
    def _q(items: pd.Series, offsets: pd.Series, states: pd.Series,
           rmin: pd.Series, rmax: pd.Series, count: pd.Series) -> pd.Series:
        return pd.Series([
            ReqSketch.from_row(i, o, st, lo, hi, n, k=k, hra=hra).quantile(q)
            for i, o, st, lo, hi, n in zip(items, offsets, states, rmin, rmax, count)])
    return _q
