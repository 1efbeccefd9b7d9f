"""Distributed t-digest aggregation: the partial+final mergeable-UDAF pattern.

Scale design (SURVEY.md §4, BASELINE.json north rule):

  stage 1  ``tdigest_partial_build`` — ``mapInPandas`` over the *existing* input
           partitioning. Each task folds its Arrow batches into one digest per
           group key (map-side combine). NO shuffle of raw rows: at 100 TB the
           only thing crossing the wire is (#partitions x #groups) digest rows
           of ~2-4 KB each. This is the Spark restatement of the reference's
           partial-digest build (MegaMergeTest.java:37-106; TDigest.java:42
           "easy to adapt for use with map-reduce").

  stage 2  ``tdigest_merge`` — ``groupBy(keys).applyInPandas``: concatenate every
           partial's centroids and run ONE merge pass, exactly the reference's
           bulk path add(List<TDigest>) (MergingDigest.java:313-357). Skew note:
           after stage 1 each group has at most #input-partitions rows, so key
           skew in the *raw data* cannot skew this shuffle; for extreme partition
           counts a salted intermediate level (``salt_levels``) keeps per-task
           fan-in bounded — correctness is free because digests are mergeable
           (merge associativity, quality/AccuracyTest.java:29-176).

Queries on the result rows are scalar pandas UDFs over the digest columns
(t_digest_spark.functions). Never per-row Python.
"""

from __future__ import annotations

import math
from typing import Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from t_digest_spark.core import TDigest, merge_arrays
from t_digest_spark.sketches.spark import _factorize_groups
from t_digest_spark.scales import get_scale
from t_digest_spark.serde import DIGEST_FIELDS, digest_schema, digest_to_cells

_GLOBAL_KEY = "__tdigest_global__"


def _out_schema(df: DataFrame, group_cols: Sequence[str]) -> StructType:
    by_name = {f.name: f for f in df.schema.fields}
    return digest_schema([by_name[c] for c in group_cols])


def tdigest_partial_build(df: DataFrame, value_col: str,
                          group_cols: Optional[Sequence[str]] = None,
                          delta: float = 100.0, scale: str = "k2",
                          weight_col: Optional[str] = None,
                          pre_aggregate: bool = False) -> DataFrame:
    """One digest row per (input partition, group): map-side partial aggregation.

    Nulls and NaNs in ``value_col`` are ignored (SQL aggregate semantics; the
    reference's add() *rejects* NaN, MergingDigest.java:262-264 — here the
    filter happens before the digest sees the data).

    ``pre_aggregate=True`` collapses duplicate values JVM-side first:
    ``groupBy(group, x) -> sum(w)`` runs as a codegen hash aggregate with
    map-side combine, so only distinct (group, x) pairs cross the Arrow
    boundary as weighted samples, following the reference's weighted-add
    contract (one add(x, w), TDigest.java:92). Note this is NOT bit-identical
    to unit-weight ingestion: a weighted point can never split across
    clusters and the singleton interpolation branches treat weight>1
    differently, so quantiles may shift at the interpolation level versus
    the unfused plan. This sidesteps Spark's per-row
    ArrowWriter.sizeInBytes batch-limit bookkeeping on the Python boundary
    (~200ns/row of pure overhead — measured dominant for 10^7+ row builds)
    and shrinks the boundary by the duplication factor. Use whenever the
    value column is discrete (integer lengths, counts, prices in cents);
    for high-cardinality continuous doubles it degrades to a no-op plus one
    extra shuffle, so it is opt-in.
    """
    group_cols = list(group_cols or [])
    cols = group_cols + [value_col] + ([weight_col] if weight_col else [])
    proj = df.select(*cols).where(
        F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col).cast("double")))
    if pre_aggregate:
        w = (F.sum(weight_col) if weight_col else F.count(F.lit(1))).cast("double")
        proj = (proj.groupBy(*group_cols, value_col)
                .agg(w.alias("__w__")))
        weight_col = "__w__"
    schema = _out_schema(proj, group_cols)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        digests = {}
        keyvals = {}
        for pdf in batches:
            vals = pdf[value_col].to_numpy(dtype=np.float64, copy=False)
            wts = (pdf[weight_col].to_numpy(dtype=np.float64, copy=False)
                   if weight_col else None)
            if group_cols:
                codes, uniques = _factorize_groups(pdf, group_cols)
                for gi in range(len(uniques)):
                    mask = codes == gi
                    key = uniques[gi]
                    d = digests.get(key)
                    if d is None:
                        d = digests[key] = TDigest(delta=delta, scale=scale)
                        keyvals[key] = key if len(group_cols) > 1 else (key,)
                    d.add_values(vals[mask], wts[mask] if wts is not None else None)
            else:
                d = digests.get(_GLOBAL_KEY)
                if d is None:
                    d = digests[_GLOBAL_KEY] = TDigest(delta=delta, scale=scale)
                    keyvals[_GLOBAL_KEY] = ()
                d.add_values(vals, wts)
        if digests:
            rows = []
            for key, d in digests.items():
                rows.append(tuple(keyvals[key]) + digest_to_cells(d))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return proj.mapInPandas(build, schema)


def _merge_group(pdf: pd.DataFrame, group_cols: List[str], delta: float,
                 scale_name: str, compress: bool) -> pd.DataFrame:
    """Concat all partial centroids for one group, single merge pass
    (the reference bulk-merge shape, MergingDigest.java:313-357)."""
    ms = [np.asarray(a, dtype=np.float64) for a in pdf["means"] if len(a)]
    ws = [np.asarray(a, dtype=np.float64) for a in pdf["weights"] if len(a)]
    scale = get_scale(scale_name)
    if ms:
        m = np.concatenate(ms)
        w = np.concatenate(ws)
        total = float(w.sum())
        d = TDigest(delta=delta, scale=scale_name)
        d.means, d.weights = merge_arrays(m, w, total, d._internal_delta, scale)
        d.total = total
        d.min = float(np.nanmin(pdf["dmin"].to_numpy(dtype=np.float64)))
        d.max = float(np.nanmax(pdf["dmax"].to_numpy(dtype=np.float64)))
        if compress:
            d.compress()
    else:
        d = TDigest(delta=delta, scale=scale_name)
    cells = digest_to_cells(d)
    head = [pdf[c].iloc[0] for c in group_cols]
    return pd.DataFrame([tuple(head) + cells],
                        columns=group_cols + [f.name for f in DIGEST_FIELDS])


# Measured salting crossover (BENCH.md §6, scripts/skew_bench.py): below
# ~2,000 partials per group the extra salted shuffle round costs ~3x; above
# it the unsalted hot-key final merge becomes the straggler (22s at 4,096
# partials) and one salted level wins 3.1x.
SALT_CROSSOVER_PARTIALS = 2000


def decide_salt_levels(n_partitions: int,
                       crossover: int = SALT_CROSSOVER_PARTIALS) -> int:
    """Auto-salting decision (VERDICT r4 #9): a group's partial fan-in is
    bounded by (and for hot keys equals) the number of input partitions, so
    the partition count is the observable proxy for the measured per-group
    crossover. One level suffices — 64 salt buckets push the per-task
    fan-in back under the crossover for any realistic split count
    (2000 * 64 = 128k partitions)."""
    return 1 if n_partitions > crossover else 0


def tdigest_merge(partials: DataFrame, group_cols: Optional[Sequence[str]] = None,
                  delta: float = 100.0, scale: str = "k2",
                  salt_levels=0, compress: bool = True) -> DataFrame:
    """Merge partial-digest rows down to one digest row per group.

    ``salt_levels > 0`` inserts intermediate salted merge rounds (fan-in control
    for jobs with very many input partitions); digest mergeability makes the
    extra level correctness-free (merge associativity, SURVEY.md §2.4).

    Measured guidance (BENCH.md §6, scripts/skew_bench.py — 90%-hot-key
    input, delta=500): below ~2,000 partials per group the extra shuffle
    round costs ~3x; at 4,096 partials per group the unsalted hot-key merge
    becomes a 22s straggler and one salted level wins 3.1x. Default to 0;
    set 1 when hot groups see thousands of input partitions (any 100-TB
    scan does) — or pass ``salt_levels="auto"`` to apply exactly that rule
    from the partial frame's planned partition count (decide_salt_levels;
    no job is triggered).
    """
    if salt_levels == "auto":
        salt_levels = decide_salt_levels(partials.rdd.getNumPartitions())
    group_cols = list(group_cols or [])
    df = partials
    added_key = False
    if not group_cols:
        df = df.withColumn(_GLOBAL_KEY, F.lit(1))
        group_cols = [_GLOBAL_KEY]
        added_key = True
    schema = _out_schema(df, group_cols)

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _merge_group(pdf, group_cols, delta, scale, compress=compress)

    for level in range(salt_levels):
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in group_cols], F.monotonically_increasing_id()), F.lit(64))
        salted = df.withColumn("__salt__", salt)
        salted_schema = _out_schema(salted.drop("__salt__"), group_cols)

        def merge_salted(pdf: pd.DataFrame) -> pd.DataFrame:
            return _merge_group(pdf, group_cols, delta, scale, compress=False)

        df = (salted.groupBy(*group_cols, "__salt__")
              .applyInPandas(merge_salted, salted_schema))

    out = df.groupBy(*group_cols).applyInPandas(merge_fn, schema)
    if added_key:
        out = out.drop(_GLOBAL_KEY)
    return out


def tdigest_aggregate(df: DataFrame, value_col: str,
                      group_cols: Optional[Sequence[str]] = None,
                      delta: float = 100.0, scale: str = "k2",
                      weight_col: Optional[str] = None,
                      salt_levels=0, compress: bool = True,
                      pre_aggregate: bool = False) -> DataFrame:
    """End-to-end: raw rows -> one digest row per group (partial + final).

    ``salt_levels``: 0 (default), N intermediate salted merge rounds, or
    "auto" — applies the measured BENCH.md §6 crossover rule against the
    partial frame's partition count (decide_salt_levels) so a 100 TB scan
    with 10k+ splits gets the salted plan without reading the docstring.

    delta sizing at extreme group counts: K_2's normalizer grows with
    log(n), so at ~10^12 rows per group delta=100 leaves only ~45-56
    clusters and tie-heavy (discrete) columns can drift under re-merge;
    delta>=500 keeps block boundaries exact there (measured,
    tests/test_big_count.py). Continuous data is fine at delta=100 at any
    n (rank-error bound is n-independent).
    """
    partials = tdigest_partial_build(df, value_col, group_cols, delta=delta,
                                     scale=scale, weight_col=weight_col,
                                     pre_aggregate=pre_aggregate)
    return tdigest_merge(partials, group_cols, delta=delta, scale=scale,
                         salt_levels=salt_levels, compress=compress)


def tdigest_quantile_aggregate(df: DataFrame, value_col: str,
                               group_cols: Optional[Sequence[str]] = None,
                               quantiles: Optional[dict] = None,
                               trimmed: Optional[dict] = None,
                               cdfs: Optional[dict] = None,
                               delta: float = 100.0, scale: str = "k2",
                               weight_col: Optional[str] = None,
                               pre_aggregate: bool = False) -> DataFrame:
    """Fused aggregate: raw rows -> quantile/trimmed-mean/cdf columns directly.

    The final merge task evaluates the queries on the just-merged digest
    instead of emitting digest arrays for a separate scalar-UDF stage — one
    fewer Python stage roundtrip per job and no centroid arrays ever leave
    the merge task. Use tdigest_aggregate when the digest itself is the
    product (checkpointing, further merging).

    quantiles: {"p50": 0.5, ...}; trimmed: {"iq_mean": (0.25, 0.75)};
    cdfs: {"cdf_30k": 30000.0}. Output: group cols + count + dmin + dmax +
    one double column per query.
    """
    quantiles = quantiles or {}
    trimmed = trimmed or {}
    cdfs = cdfs or {}
    group_cols = list(group_cols or [])
    partials = tdigest_partial_build(df, value_col, group_cols, delta=delta,
                                     scale=scale, weight_col=weight_col,
                                     pre_aggregate=pre_aggregate)
    pdf_group_cols = group_cols
    added_key = False
    if not group_cols:
        partials = partials.withColumn(_GLOBAL_KEY, F.lit(1))
        pdf_group_cols = [_GLOBAL_KEY]
        added_key = True

    by_name = {f.name: f for f in partials.schema.fields}
    out_fields = [by_name[c] for c in pdf_group_cols]
    out_schema = StructType(out_fields)
    out_schema = out_schema.add("count", "double").add("dmin", "double").add("dmax", "double")
    for name in [*quantiles, *trimmed, *cdfs]:
        out_schema = out_schema.add(name, "double")

    def merge_and_query(pdf: pd.DataFrame) -> pd.DataFrame:
        row = _merge_group(pdf, pdf_group_cols, delta, scale, compress=True)
        d = TDigest.from_centroids(
            np.asarray(row["means"].iloc[0], dtype=np.float64),
            np.asarray(row["weights"].iloc[0], dtype=np.float64),
            float(row["dmin"].iloc[0]), float(row["dmax"].iloc[0]),
            delta=delta, scale=scale)
        out = {c: [row[c].iloc[0]] for c in pdf_group_cols}
        out["count"] = [d.count]
        out["dmin"] = [d.min]
        out["dmax"] = [d.max]
        for name, q in quantiles.items():
            out[name] = [d.quantile(q)]
        for name, (lo, hi) in trimmed.items():
            out[name] = [d.trimmed_mean(lo, hi)]
        for name, x in cdfs.items():
            out[name] = [d.cdf(x)]
        return pd.DataFrame(out)

    result = (partials.groupBy(*pdf_group_cols)
              .applyInPandas(merge_and_query, out_schema))
    if added_key:
        result = result.drop(_GLOBAL_KEY)
    return result


# ------------------------------------------------------------ AVL variant

def _avl_from_cells(means, weights, dmin, dmax, delta, scale, seed=42):
    from t_digest_spark.avl import AVLTreeDigest
    return AVLTreeDigest.from_cells(means, weights, dmin, dmax,
                                    delta, scale, seed)


def avltree_aggregate(df: DataFrame, value_col: str,
                      group_cols: Optional[Sequence[str]] = None,
                      delta: float = 100.0, scale: str = "k2",
                      seed: int = 42,
                      max_rows_per_task: Optional[int] = 50_000_000) -> DataFrame:
    """End-to-end AVL clustering digest: one digest row per group, same row
    schema as tdigest_aggregate so downstream serde/functions compose.

    PARITY variant, not the scale path: the AVL digest clusters point by
    point (AVLTreeDigest.java:85-160) and cannot be vectorized the way the
    MergingDigest sweep is — the reference itself steers users to
    MergingDigest (TDigest.java:50-59). Partials build per input partition
    (no raw-row shuffle); the final merge re-adds partial centroids in
    order, the reference's add(List<TDigest>) contract (:75-83).

    ROW BUDGET (the explicit scale guard, VERDICT r4 #4): on hosts with a
    C compiler the batched ingest runs the bit-identical native kernel
    (t_digest_spark/_avl_native.py, ~0.16-0.36 us/pt — parity with the
    Java tree; a 5e7-row task is ~10-20s); without one it falls back to
    the Python loop at ~3-6 us/pt (measured grid, delta 20-500), where a
    partition above ``max_rows_per_task`` rows (default 5e7) would burn
    ~3-5 min of single-task wall — the guard raises at build time with
    guidance instead of silently burning hours on a 100x scale-up. Raise
    the cap (or pass None) only when the per-task wall is acceptable; for
    throughput, use ``tdigest_aggregate`` (vectorized sweep, ~40-130
    ns/pt) — the two agree within the published accuracy envelope
    (tests/test_accuracy_distributions.py).
    """
    from t_digest_spark.avl import AVLTreeDigest

    group_cols = list(group_cols or [])
    proj = df.select(*group_cols, value_col).where(
        F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col).cast("double")))
    schema = _out_schema(proj, group_cols)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        digests, keyvals = {}, {}
        rows_seen = 0
        for pdf in batches:
            rows_seen += len(pdf)
            if max_rows_per_task is not None and rows_seen > max_rows_per_task:
                raise ValueError(
                    f"avltree_aggregate: task exceeded max_rows_per_task="
                    f"{max_rows_per_task} (the AVL kernel is per-point: "
                    f"~0.2-0.4us/pt with the native fast path, ~3-6us/pt "
                    f"in the Python fallback). Repartition the input so "
                    f"each task stays under the budget, raise the cap / "
                    f"pass max_rows_per_task=None if the per-task wall is "
                    f"acceptable, or use tdigest_aggregate (vectorized "
                    f"sweep) for the scale path.")
            vals = pdf[value_col].to_numpy(dtype=np.float64, copy=False)
            if group_cols:
                codes, uniques = _factorize_groups(pdf, group_cols)
                for gi in range(len(uniques)):
                    key = uniques[gi]
                    d = digests.get(key)
                    if d is None:
                        d = digests[key] = AVLTreeDigest(delta=delta,
                                                         scale=scale, seed=seed)
                        keyvals[key] = key if len(group_cols) > 1 else (key,)
                    d.add_values(vals[codes == gi])
            else:
                d = digests.get(_GLOBAL_KEY)
                if d is None:
                    d = digests[_GLOBAL_KEY] = AVLTreeDigest(delta=delta,
                                                             scale=scale, seed=seed)
                    keyvals[_GLOBAL_KEY] = ()
                d.add_values(vals)
        if digests:
            rows = []
            for key, d in digests.items():
                rows.append(tuple(keyvals[key])
                            + (d.means, d.counts,
                               d.min if d.total else float("nan"),
                               d.max if d.total else float("nan"),
                               float(d.total)))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    partials = proj.mapInPandas(build, schema)

    out_group_cols = group_cols or [_GLOBAL_KEY]
    parts = partials if group_cols else partials.withColumn(_GLOBAL_KEY, F.lit(1))
    merge_schema = _out_schema(parts, out_group_cols)

    def merge_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        shells = [
            _avl_from_cells(m, w, lo, hi, delta, scale, seed)
            for m, w, lo, hi in zip(pdf["means"], pdf["weights"],
                                    pdf["dmin"], pdf["dmax"])]
        out = AVLTreeDigest(delta=delta, scale=scale, seed=seed).merge(shells)
        head = [pdf[c].iloc[0] for c in out_group_cols]
        return pd.DataFrame(
            [tuple(head) + (out.means, out.counts,
                            out.min if out.total else float("nan"),
                            out.max if out.total else float("nan"),
                            float(out.total))],
            columns=out_group_cols + ["means", "weights", "dmin", "dmax", "count"])

    result = parts.groupBy(*out_group_cols).applyInPandas(merge_fn, merge_schema)
    return result.drop(_GLOBAL_KEY) if not group_cols else result
