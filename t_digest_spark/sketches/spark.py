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



def _norm_group_val(v):
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v


def _factorize_groups(pdf: pd.DataFrame, group_cols):
    """Batch group dispatch with Spark-groupBy NULL semantics: NULL group
    values form their OWN group (use_na_sentinel=False) instead of being
    silently dropped, and are normalized to None so per-sketch dict state
    survives across batches (NaN != NaN would otherwise fork the state)."""
    if len(group_cols) > 1:
        codes, uniques = pd.factorize(
            pd.MultiIndex.from_frame(pdf[group_cols]), use_na_sentinel=False)
        vals = [tuple(_norm_group_val(x) for x in u) for u in uniques]
    else:
        codes, uniques = pd.factorize(pdf[group_cols[0]],
                                      use_na_sentinel=False)
        vals = [_norm_group_val(u) for u in uniques]
    return codes, vals


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
                codes, uniques = _factorize_groups(pdf, group_cols)
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
                codes, uniques = _factorize_groups(pdf, group_cols)
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
        # Global-aggregate semantics on EMPTY input: SQL returns one row,
        # so the global sketch must too — union ONE identity partial
        # (all-zero counters; merging it is a no-op on non-empty input).
        # Without it, an empty stream makes the whole aggregate vanish and
        # countmin_estimate's 1-row collect crashes downstream.
        partials = partials.withColumn(_GLOBAL, F.lit(1))
        ident = partials.sparkSession.createDataFrame(
            [CountMinSketch(d, w).to_row() + (1,)], schema=partials.schema)
        partials = partials.unionByName(ident)
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
    # identity partial: an empty input still yields one (empty-filter) row
    # — SQL global-aggregate semantics; contains() is then false for every
    # key instead of bloom_contains crashing on a 0-row collect
    ident = partials.sparkSession.createDataFrame(
        [BloomFilter(m_bits, k).to_row() + (1,)], schema=partials.schema)
    partials = partials.unionByName(ident)

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
                codes, uniques = _factorize_groups(pdf, group_cols)
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


# ---------------------------------------------------------------------- theta

THETA_FIELDS = "retained array<bigint>, theta bigint, k int"


def theta_aggregate(df: DataFrame, key_col,
                    group_cols: Optional[Sequence[str]] = None,
                    k: int = 4096) -> DataFrame:
    """One theta (bottom-k) distinct sketch per group.

    ``key_col`` may be a single column name or a list of names — a list
    counts distinct TUPLES (xxhash64 hashes all columns jointly; rows with
    any NULL key part are dropped, matching COUNT(DISTINCT a, b)).

    Keys hash JVM-side (``shiftrightunsigned(xxhash64(keys...), 1)`` —
    codegen, uniform over [0, 2^63)); partitions contribute <= k+1 longs
    each to the final merge, so the shuffle is O(partitions * k) no matter
    the row count. Unlike HLL, the result supports intersection / A-not-B
    (theta_binary_op)."""
    from t_digest_spark.sketches.theta import ThetaSketch
    group_cols = list(group_cols or [])
    key_cols = [key_col] if isinstance(key_col, str) else list(key_col)
    keep = F.lit(True)
    for c in key_cols:
        keep = keep & F.col(c).isNotNull()
    proj = (df.where(keep)
              .select(*group_cols,
                      F.shiftrightunsigned(F.xxhash64(*key_cols), 1)
                      .alias("__h__")))
    schema = _group_prefix(proj, group_cols) + THETA_FIELDS
    out_cols = ["retained", "theta", "k"]

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk, keys = {}, {}
        for pdf in batches:
            hs = pdf["__h__"].to_numpy(dtype=np.int64)
            if group_cols:
                codes, uniques = _factorize_groups(pdf, group_cols)
                for gi in range(len(uniques)):
                    key = uniques[gi]
                    s = sk.get(key)
                    if s is None:
                        s = sk[key] = ThetaSketch(k)
                        keys[key] = key if len(group_cols) > 1 else (key,)
                    s.update_hashes(hs[codes == gi])
            else:
                s = sk.get(_GLOBAL)
                if s is None:
                    s = sk[_GLOBAL] = ThetaSketch(k)
                    keys[_GLOBAL] = ()
                s.update_hashes(hs)
        if sk:
            yield pd.DataFrame([tuple(keys[key]) + s.to_row()
                                for key, s in sk.items()],
                               columns=group_cols + out_cols)

    partials = proj.mapInPandas(build, schema)
    return theta_merge(partials, group_cols, k=k)


def theta_merge(partials: DataFrame,
                group_cols: Optional[Sequence[str]] = None,
                k: int = 4096) -> DataFrame:
    """Union theta rows per group (bottom-k union is EXACTLY
    order-insensitive, so any merge tree yields the identical sketch) —
    also the resume path: checkpointed rows union with fresh partials."""
    from t_digest_spark.sketches.theta import ThetaSketch
    group_cols = list(group_cols or [])
    out_cols = ["retained", "theta", "k"]
    gb = list(group_cols)
    added = False
    if not gb:
        partials = partials.withColumn(_GLOBAL, F.lit(1))
        gb = [_GLOBAL]
        added = True
    out_schema = _group_prefix(partials, gb) + THETA_FIELDS

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [ThetaSketch.from_row(r["retained"], r["theta"], r["k"])
                 for _, r in pdf.iterrows()]
        s = ThetaSketch.union_all(parts, k=k)
        head = tuple(pdf[c].iloc[0] for c in gb)
        return pd.DataFrame([head + s.to_row()], columns=gb + out_cols)

    out = partials.groupBy(*gb).applyInPandas(merge_fn, out_schema)
    return out.drop(_GLOBAL) if added else out


def theta_estimate_udf():
    from t_digest_spark.sketches.theta import ThetaSketch

    @pandas_udf("double")
    def _est(retained: pd.Series, theta: pd.Series, k: pd.Series) -> pd.Series:
        return pd.Series([
            ThetaSketch.from_row(r, t, kk).estimate()
            for r, t, kk in zip(retained, theta, k)])
    return _est


def theta_bounds_udf(num_std: float = 3.0):
    """(lower, upper) confidence bounds per sketch row."""
    from t_digest_spark.sketches.theta import ThetaSketch

    @pandas_udf("struct<lb: double, ub: double>")
    def _b(retained: pd.Series, theta: pd.Series, k: pd.Series) -> pd.DataFrame:
        rows = []
        for r, t, kk in zip(retained, theta, k):
            s = ThetaSketch.from_row(r, t, kk)
            rows.append((s.lower_bound(num_std), s.upper_bound(num_std)))
        return pd.DataFrame(rows, columns=["lb", "ub"])
    return _b


def theta_binary_op(a_df: DataFrame, b_df: DataFrame, op: str,
                    join_cols: Optional[Sequence[str]] = None) -> DataFrame:
    """Set algebra between two sketch DataFrames: ``union`` /
    ``intersect`` / ``a_not_b``. Sketch rows are tiny (<= k longs), so the
    join is a broadcast-scale equi-join on the group key (or a single-row
    cross for global sketches); the op itself is a vectorized batch UDF.
    Result columns are again ``retained, theta, k`` — composable.

    The join is FULL OUTER with NULL-SAFE key equality: a group present in
    only one operand meets an empty exact-mode sketch on the other side
    (union/a_not_b then return the present sketch; intersect returns the
    empty sketch) instead of being silently dropped, and a NULL group key
    (theta_aggregate keys NULL groups as their own group) matches its NULL
    counterpart rather than producing two half-blind duplicate rows.
    Global mode outer-joins on a dummy key, so an empty operand DataFrame
    behaves the same way."""
    import functools
    import operator as _operator
    from t_digest_spark.sketches.theta import ThetaSketch
    ops = {"union": lambda a, b: ThetaSketch.union_all([a, b], k=max(a.k, b.k)),
           "intersect": ThetaSketch.intersect, "a_not_b": ThetaSketch.a_not_b}
    if op not in ops:
        raise ValueError(f"op must be one of {sorted(ops)}")
    fn = ops[op]
    join_cols = list(join_cols or [])
    a_ren = a_df.select(
        *[F.col(c).alias(f"__ga{i}__") for i, c in enumerate(join_cols)],
        F.col("retained").alias("__ra__"),
        F.col("theta").alias("__ta__"), F.col("k").alias("__ka__"))
    b_ren = b_df.select(
        *[F.col(c).alias(f"__gb{i}__") for i, c in enumerate(join_cols)],
        F.col("retained").alias("__rb__"),
        F.col("theta").alias("__tb__"), F.col("k").alias("__kb__"))
    if join_cols:
        cond = functools.reduce(_operator.and_, [
            F.col(f"__ga{i}__").eqNullSafe(F.col(f"__gb{i}__"))
            for i in range(len(join_cols))])
        joined = a_ren.join(b_ren, cond, "full_outer")
        # recover the group value from whichever side is present; when the
        # true key is NULL both sides are NULL and coalesce stays NULL
        joined = joined.select(
            *[F.coalesce(F.col(f"__ga{i}__"), F.col(f"__gb{i}__")).alias(c)
              for i, c in enumerate(join_cols)],
            "__ra__", "__ta__", "__ka__", "__rb__", "__tb__", "__kb__")
    else:
        a_ren = a_ren.withColumn("__j__", F.lit(1))
        b_ren = b_ren.withColumn("__j__", F.lit(1))
        joined = a_ren.join(b_ren, ["__j__"], "full_outer")

    def _side(r, t, kk, other_k):
        if r is None:                  # absent group -> empty exact sketch
            return ThetaSketch(int(other_k))
        return ThetaSketch.from_row(r, t, kk)

    @pandas_udf(f"struct<{THETA_FIELDS}>")
    def _op(ra: pd.Series, ta: pd.Series, ka: pd.Series,
            rb: pd.Series, tb: pd.Series, kb: pd.Series) -> pd.DataFrame:
        rows = []
        for r1, t1, k1, r2, t2, k2 in zip(ra, ta, ka, rb, tb, kb):
            ka_eff = k1 if r1 is not None else k2
            kb_eff = k2 if r2 is not None else k1
            rows.append(fn(_side(r1, t1, k1, ka_eff),
                           _side(r2, t2, k2, kb_eff)).to_row())
        return pd.DataFrame(rows, columns=["retained", "theta", "k"])

    res = joined.withColumn(
        "__res__",
        _op("__ra__", "__ta__", "__ka__", "__rb__", "__tb__", "__kb__"))
    return res.select(*join_cols, F.col("__res__.retained").alias("retained"),
                      F.col("__res__.theta").alias("theta"),
                      F.col("__res__.k").alias("k"))


# ------------------------------------------------------------- frequent items

FI_FIELDS = ("keys array<string>, counts array<long>, max_error bigint, "
             "n bigint, k int")


def frequent_aggregate(df: DataFrame, key_col: str,
                       group_cols: Optional[Sequence[str]] = None,
                       k: int = 512,
                       weight_col: Optional[str] = None) -> DataFrame:
    """One Misra-Gries heavy-hitters sketch per group over
    ``cast(key as string)``. Guarantees (frequent.py): estimate <= true <=
    estimate + max_error, max_error <= n/(k+1). Partial rows carry <= k
    counters each — the shuffle never sees raw keys' full cardinality."""
    from t_digest_spark.sketches.frequent import FrequentItemsSketch
    group_cols = list(group_cols or [])
    cols = [F.col(key_col).cast("string").alias("__key__")]
    if weight_col:
        cols.append(F.col(weight_col).cast("long").alias("__w__"))
    proj = df.where(F.col(key_col).isNotNull()).select(*group_cols, *cols)
    schema = _group_prefix(proj, group_cols) + FI_FIELDS
    out_cols = ["keys", "counts", "max_error", "n", "k"]

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk, keys = {}, {}
        for pdf in batches:
            if group_cols:
                codes, uniques = _factorize_groups(pdf, group_cols)
                for gi in range(len(uniques)):
                    key = uniques[gi]
                    s = sk.get(key)
                    if s is None:
                        s = sk[key] = FrequentItemsSketch(k)
                        keys[key] = key if len(group_cols) > 1 else (key,)
                    sub = pdf[codes == gi]
                    _fi_update(s, sub, weight_col)
            else:
                s = sk.get(_GLOBAL)
                if s is None:
                    s = sk[_GLOBAL] = FrequentItemsSketch(k)
                    keys[_GLOBAL] = ()
                _fi_update(s, pdf, weight_col)
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
    out_schema = _group_prefix(partials, gb) + FI_FIELDS

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = [FrequentItemsSketch.from_row(r["keys"], r["counts"],
                                              r["max_error"], r["n"], r["k"])
                 for _, r in pdf.iterrows()]
        s = FrequentItemsSketch.merge_all(parts, k=k)
        head = tuple(pdf[c].iloc[0] for c in gb)
        return pd.DataFrame([head + s.to_row()], columns=gb + out_cols)

    out = partials.groupBy(*gb).applyInPandas(merge_fn, out_schema)
    return out.drop(_GLOBAL) if added else out


def _fi_update(sketch, pdf: pd.DataFrame, weight_col: Optional[str]) -> None:
    if weight_col:
        agg = pdf.groupby("__key__")["__w__"].sum()
        sketch.update_counts(agg.index, agg.to_numpy())
    else:
        sketch.update_batch(pdf["__key__"])


def frequent_items_explode(fi_df: DataFrame,
                           group_cols: Optional[Sequence[str]] = None,
                           threshold: Optional[int] = None) -> DataFrame:
    """Explode sketch rows into (group..., item, estimate, upper_bound)
    rows, NO_FALSE_NEGATIVES convention (frequent.py)."""
    from t_digest_spark.sketches.frequent import FrequentItemsSketch
    group_cols = list(group_cols or [])

    @pandas_udf("array<struct<item: string, estimate: bigint, upper_bound: bigint>>")
    def _items(keys: pd.Series, counts: pd.Series, max_error: pd.Series,
               n: pd.Series, k: pd.Series) -> pd.Series:
        out = []
        for ks, cs, me, nn, kk in zip(keys, counts, max_error, n, k):
            s = FrequentItemsSketch.from_row(ks, cs, me, nn, kk)
            out.append([{"item": it, "estimate": est, "upper_bound": ub}
                        for it, est, ub in s.frequent_items(threshold)])
        return pd.Series(out)

    return (fi_df
            .select(*group_cols,
                    F.explode(_items("keys", "counts", "max_error", "n", "k"))
                    .alias("__it__"))
            .select(*group_cols, F.col("__it__.item").alias("item"),
                    F.col("__it__.estimate").alias("estimate"),
                    F.col("__it__.upper_bound").alias("upper_bound")))


# ------------------------------------------------- deterministic distinct sample

def bottomk_distinct_sample(df: DataFrame, key_col: str,
                            group_cols: Optional[Sequence[str]] = None,
                            k: int = 100) -> DataFrame:
    """Mergeable uniform sample of k DISTINCT keys per group, deterministic:
    members are the k distinct keys with the lexicographically smallest
    ``md5(cast(key as string))``. Because membership is a pure function of
    the key, the sample is (a) identical run-to-run and engine-to-engine
    (value-exact SQL oracle: ORDER BY md5 LIMIT k), (b) exactly mergeable
    (bottom-k of a union = bottom-k of bottom-k's), and (c) uniform over
    distinct keys (md5 is a uniform hash). Per-partition state is <= k
    pairs, so the merge shuffle is O(partitions * k) — the full distinct
    set is never shuffled (contrast groupBy-distinct at 10^12 keys).

    Returns (group..., sample_rank, key_value) rows, rank 1..k by hash
    order."""
    group_cols = list(group_cols or [])
    proj = (df.where(F.col(key_col).isNotNull())
              .select(*group_cols,
                      F.col(key_col).cast("string").alias("__key__"),
                      F.md5(F.col(key_col).cast("string")).alias("__hh__")))
    schema = _group_prefix(proj, group_cols) + "hs array<string>, ks array<string>"

    def topk_local(pdf: pd.DataFrame) -> pd.DataFrame:
        # nsmallest rejects string dtype; a sort of <= (2k + batch) rows is fine
        return (pdf[["__hh__", "__key__"]].drop_duplicates("__hh__")
                .sort_values("__hh__").head(k))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = {}
        for pdf in batches:
            if group_cols:
                codes, uniques = _factorize_groups(pdf, group_cols)
                for gi in range(len(uniques)):
                    key = uniques[gi]
                    head = key if len(group_cols) > 1 else (key,)
                    prev = acc.get(head)
                    sub = pdf[codes == gi]
                    cat = sub if prev is None else pd.concat([prev, sub])
                    acc[head] = topk_local(cat)
            else:
                prev = acc.get(())
                cat = pdf if prev is None else pd.concat([prev, pdf])
                acc[()] = topk_local(cat)
        if acc:
            yield pd.DataFrame(
                [head + (sub["__hh__"].tolist(), sub["__key__"].tolist())
                 for head, sub in acc.items()],
                columns=group_cols + ["hs", "ks"])

    partials = proj.mapInPandas(build, schema)

    gb = list(group_cols)
    added = False
    if not gb:
        partials = partials.withColumn(_GLOBAL, F.lit(1))
        gb = [_GLOBAL]
        added = True

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        frames = [pd.DataFrame({"__hh__": r["hs"], "__key__": r["ks"]})
                  for _, r in pdf.iterrows()]
        sub = topk_local(pd.concat(frames))
        head = tuple(pdf[c].iloc[0] for c in gb)
        return pd.DataFrame([head + (sub["__hh__"].tolist(),
                                     sub["__key__"].tolist())],
                            columns=gb + ["hs", "ks"])

    merged = partials.groupBy(*gb).applyInPandas(
        merge_fn, _group_prefix(partials, gb) + "hs array<string>, ks array<string>")
    if added:
        merged = merged.drop(_GLOBAL)
        gb = []
    return (merged
            .select(*gb, F.posexplode("ks").alias("__i__", "key_value"))
            .select(*gb, (F.col("__i__") + 1).cast("long").alias("sample_rank"),
                    "key_value"))
