"""Digest-guided exact quantiles: sketch-bracketed order-statistic refinement.

Problem: an EXACT grouped quantile (`percentile(x, q)`) is a
TypedImperativeAggregate — every raw value is buffered and shuffled to the
group's single reducer, and mixing it into a codegen aggregate demotes the
whole aggregate to interpreted ObjectHashAggregate. Over a low-cardinality
group key at 100 TB that is THE classic funnel: 100% of the column lands on
G reducers.

Fix: use the t-digest (already built for the query) to bracket the target
quantile with a rank-safety margin eps >> the digest's rank error
(TDigest.java:34 published envelope: <1000 ppm mid-quantile; we default
eps = 2%, a ~20x margin). Then:

  pass A (codegen): per group, count c = #{x < lo} and m = #{lo <= x <= hi}.
  driver: the global j-th order statistics needed by the exact-percentile
      interpolation (j0 = floor((n-1) q), j0+1) map to slice-local indices
      i = j - c; validate c <= j0 and j0+1 < c+m (bracket_ok — guaranteed by
      the digest bound, and FALLBACK to a full exact percentile per group if
      a bracket ever misses, so correctness never rests on the sketch).
  pass B (one scan): percentile(CASE WHEN group = g AND lo<=x<=hi THEN x END,
      i/(m-1)) — integer-grid positions, so percentile returns the exact
      order statistic; the aggregate buffers only the 2*eps slice (~4% of
      rows), not the column.

Result is bit-identical to `percentile(x, q)` (same (n-1)q linear
interpolation over the same global order statistics) with reducer memory
bounded by 2*eps*n instead of n. Cost: two scans of a 2-column projection,
both whole-stage-codegen-able (percentile buffers only slice rows).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _sql_str(v: str) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def range_partitioned_cumsum(
    df: DataFrame,
    order_col: str,
    sum_cols: Sequence[str],
    part_cols: Sequence[str] = (),
    boundaries: Optional[Sequence[float]] = None,
    num_chunks: int = 64,
    approx_rel_err: float = 0.01,
) -> DataFrame:
    """Cumulative sum of ``sum_cols`` ordered by ``order_col`` within each
    ``part_cols`` group, WITHOUT a single-task per-group sort.

    A plain ``Window.partitionBy(part).orderBy(x)`` cumulative sum funnels
    each group's whole domain into one task — fine for discrete domains,
    row-count-sized for continuous columns at scale. This is the two-pass
    range-partitioned form instead:

      1. every row buckets into a chunk by broadcastable range boundaries
         (codegen: count of boundaries <= x over a literal array — a
         monotone map, so chunk order == value order);
      2. chunk TOTALS aggregate per (group, chunk) — a tiny frame, groups x
         chunks rows — and a window over that frame (bounded by num_chunks
         rows per group, constant at any data scale) yields each chunk's
         prefix offset;
      3. offsets broadcast-join back and a within-chunk cumulative window
         runs one task per (group, chunk) over ~1/num_chunks of the domain.

    ``boundaries``: explicit ascending split points. When None they come
    from ``approxQuantile`` over ``order_col`` (one extra distributed pass);
    pass digest-derived quantiles to skip that pass when a sketch of the
    column is already on hand. Output: input columns plus ``<c>_cum`` for
    each ``c`` in ``sum_cols`` (cumulative through the row, inclusive).
    Ties in ``order_col`` within a group get an arbitrary relative order
    (same caveat as the window form); the value at the last row of a tie
    group is exact."""
    from pyspark.sql.window import Window

    part_cols = list(part_cols)
    sum_cols = list(sum_cols)
    if boundaries is None:
        probs = [i / num_chunks for i in range(1, num_chunks)]
        boundaries = df.approxQuantile(order_col, probs, approx_rel_err)
    bs = sorted({float(b) for b in boundaries})
    if bs:
        arr = F.array(*[F.lit(b) for b in bs])
        chunk = F.size(F.filter(arr, lambda b: b <= F.col(order_col)))
    else:
        chunk = F.lit(0)   # constant column: degenerate single chunk
    dfc = df.withColumn("__chunk__", chunk)

    tot = dfc.groupBy(*part_cols, "__chunk__").agg(
        *[F.sum(c).alias(c) for c in sum_cols])
    woff = (Window.partitionBy(*part_cols).orderBy("__chunk__")
            .rowsBetween(Window.unboundedPreceding, -1))
    off = tot.select(
        *part_cols, "__chunk__",
        *[F.coalesce(F.sum(c).over(woff), F.lit(0)).alias(f"__off_{c}__")
          for c in sum_cols])

    win = (Window.partitionBy(*part_cols, "__chunk__").orderBy(order_col)
           .rowsBetween(Window.unboundedPreceding, 0))
    if part_cols:
        # NULL-safe join back: a NULL group key is a real group (GROUP BY
        # keeps it, the window partitions on it) — a plain equality join
        # here would silently drop every NULL-group row from the output
        renames = {c: f"__p{i}__" for i, c in enumerate(part_cols)}
        off_r = off.select(
            *[F.col(c).alias(renames[c]) for c in part_cols],
            F.col("__chunk__").alias("__ck__"),
            *[f"__off_{c}__" for c in sum_cols])
        cond = F.col("__chunk__") == F.col("__ck__")
        for c in part_cols:
            cond = cond & F.col(c).eqNullSafe(F.col(renames[c]))
        out = dfc.join(F.broadcast(off_r), cond).drop(
            "__ck__", *renames.values())
    else:
        out = dfc.join(F.broadcast(off), ["__chunk__"])
    for c in sum_cols:
        out = out.withColumn(
            f"{c}_cum", F.sum(c).over(win) + F.col(f"__off_{c}__"))
    return out.drop("__chunk__", *[f"__off_{c}__" for c in sum_cols])


def refined_exact_quantiles(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    group_col: str,
    digest_df: DataFrame,
    qs: Sequence[float] = (0.25, 0.75),
    eps: float = 0.02,
    delta: float = 100.0,
    scale: str = "k2",
) -> Dict[Tuple[str, float], float]:
    """Exact per-group quantiles of ``df[value_col]`` (Spark `percentile`
    semantics), computed via digest-bracketed slices.

    ``digest_df`` is a t-digest row per group (means/weights/dmin/dmax/count,
    as produced by ``tdigest_aggregate``) — a DataFrame or an
    already-collected list of such rows. Returns {(group, q): value} for
    every group present in ``digest_df``. Group count (and therefore driver
    state and generated-expression count) must be small — this operator is
    for the low-cardinality-group case, which is exactly the case where the
    naive exact percentile funnels.
    """
    from t_digest_spark.serde import digest_from_cells

    qs = list(qs)
    # 1. brackets from the digest, computed DRIVER-SIDE: the digest rows are
    #    group-count scale, and a pandas-UDF pass on 3 local rows costs a
    #    full Python-worker round trip (~0.5s) for no distribution benefit
    rows = (digest_df.select(F.col(group_col).alias("g"), "count", "means",
                             "weights", "dmin", "dmax").collect()
            if isinstance(digest_df, DataFrame) else digest_df)
    brackets = {}
    for r in rows:
        g = r["g"] if "g" in r.__fields__ else r[group_col]
        d = digest_from_cells(r["means"], r["weights"], r["dmin"], r["dmax"],
                              delta, scale)
        b = {"n": int(r["count"])}
        for i, q in enumerate(qs):
            b[f"lo{i}"] = float(d.quantile(max(q - eps, 0.0)))
            b[f"hi{i}"] = float(d.quantile(min(q + eps, 1.0)))
        brackets[g] = b

    if not brackets:
        return {}            # empty table: no groups, nothing to refine
    # 2. pass A: slice rank offsets per (group, q) — codegen conditional sums
    x = F.col(value_col)
    agg_cols = []
    # NULL group keys are real groups (SQL GROUP BY keeps them): sort
    # them first (None is unorderable against str) and match null-safely
    groups = sorted(brackets, key=lambda g: (g is not None, g))
    for gi, g in enumerate(groups):
        b = brackets[g]
        in_g = F.col(group_col).eqNullSafe(F.lit(g))
        for i in range(len(qs)):
            lo, hi = float(b[f"lo{i}"]), float(b[f"hi{i}"])
            agg_cols.append(F.sum((in_g & (x < lo)).cast("long"))
                            .alias(f"c_{gi}_{i}"))
            agg_cols.append(F.sum((in_g & (x >= lo) & (x <= hi)).cast("long"))
                            .alias(f"m_{gi}_{i}"))
    counts = df.agg(*agg_cols).collect()[0]

    # 3. driver: map global order-stat indices into the slice; detect misses
    plan, fallback = {}, []
    for gi, g in enumerate(groups):
        b = brackets[g]
        n = int(b["n"])
        for i, q in enumerate(qs):
            c, m = int(counts[f"c_{gi}_{i}"]), int(counts[f"m_{gi}_{i}"])
            k = (n - 1) * q
            j0 = int(math.floor(k))
            frac = k - j0
            j1 = min(j0 + 1, n - 1) if frac > 0 else j0
            if not (c <= j0 and j1 < c + m and m >= 1):
                fallback.append((g, q))          # digest bound missed: exact path
                continue
            p0 = (j0 - c) / (m - 1) if m > 1 else 0.0
            p1 = (j1 - c) / (m - 1) if m > 1 else 0.0
            plan[(g, q)] = (gi, i, float(b[f"lo{i}"]), float(b[f"hi{i}"]),
                            p0, p1, frac)

    # 4. pass B: exact order statistics from the slices only
    out: Dict[Tuple[str, float], float] = {}
    if plan:
        exprs = []
        for (g, q), (gi, i, lo, hi, p0, p1, frac) in plan.items():
            gcond = (f"{group_col} IS NULL" if g is None
                     else f"{group_col} = {_sql_str(g)}")
            case = (f"CASE WHEN {gcond} AND "
                    f"{value_col} >= {lo!r} AND {value_col} <= {hi!r} "
                    f"THEN {value_col} END")
            # array form: ONE slice buffer per (group, q), both order stats
            exprs.append(F.expr(f"percentile({case}, array({p0!r}, {p1!r}))")
                         .alias(f"v_{gi}_{i}"))
        row = df.agg(*exprs).collect()[0]
        for (g, q), (gi, i, lo, hi, p0, p1, frac) in plan.items():
            v0, v1 = (float(v) for v in row[f"v_{gi}_{i}"])
            out[(g, q)] = v0 + frac * (v1 - v0)

    # 5. fallback (should never fire given the digest bound; kept so
    #    correctness does not depend on the sketch): full exact percentile
    #    for just the missed (group, q) pairs.
    if fallback:
        by_g: Dict[str, list] = {}
        for g, q in fallback:
            by_g.setdefault(g, []).append(q)
        for g, g_qs in by_g.items():
            row = (df.where(F.col(group_col).eqNullSafe(F.lit(g)))
                   .agg(*[F.expr(f"percentile({value_col}, {q!r})")
                          .alias(f"p{i}") for i, q in enumerate(g_qs)])
                   .collect()[0])
            for i, q in enumerate(g_qs):
                out[(g, q)] = float(row[f"p{i}"])
    return out
