"""Distribution-comparison statistics over digests and histograms.

Reference contract (Comparison.java, cited for parity — reimplemented in
NumPy, not ported):
  * llr(count)                 — G-test 2N*MI over a 2xK count table
                                 (Comparison.java:115-162).
  * compareChi2(d1, d2, qCuts) — counts per quantile bin of d1, bins applied
                                 to d2 via cdf, then llr (Comparison.java:49-75).
  * compareChi2(h1, h2)        — counts of two same-layout histograms
                                 (Comparison.java:90-112).
  * ks(d1, d2)                 — max |cdf1-cdf2| over the centroid-mean scan
                                 grid, normalized by sqrt(n1*n2/(n1+n2))
                                 (Comparison.java:173-217). Here the scan grid
                                 is the sorted union of both digests' minima
                                 and centroid means — the same points the
                                 reference's nextValue() iterator visits.

Exposed three ways: plain functions over TDigest (driver-side), a pandas UDF
pairing two digest column sets (digest rows are one-per-group, so the Python
loop is over groups), and histogram chi2 as a zip_with-ready count compare.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

from t_digest_spark.core import TDigest
from t_digest_spark.serde import digest_from_cells


def llr(count: np.ndarray) -> float:
    """G-test statistic 2N*mutual_information for an RxK count table."""
    k = np.asarray(count, dtype=np.float64)
    if k.size == 0:
        raise ValueError("Must have some data in llr")
    if (k < 0).any():
        raise ValueError("Illegal negative count")
    total = k.sum()
    if total <= 0:
        return 0.0

    def ent(v):
        v = v[v > 0]
        return float((v * np.log(v)).sum()) - total * math.log(total)

    h = ent(k.ravel())
    hr = ent(k.sum(axis=1))
    hc = ent(k.sum(axis=0))
    return 2 * (h - hr - hc)


def _cdf_ext(d: TDigest, x: float) -> float:
    """cdf extended to non-finite x: the digest's cdf rejects +/-inf
    exactly like the reference (MergingDigest.cdf "Invalid value"), but a
    digest that INGESTED +/-inf points has infinite centroid means, and the
    comparison scans land on them. At an infinite atom the mid-rank value
    (Dist.cdf convention: (less + equal/2) / n) is computed directly from
    the centroid arrays; finite x passes through unchanged."""
    if math.isfinite(x):
        return d.cdf(x)
    w = np.asarray(d.weights, dtype=np.float64)
    m = np.asarray(d.means, dtype=np.float64)
    if x > 0:
        eq = float(w[np.isposinf(m)].sum())
        less = d.count - eq
    else:
        eq = float(w[np.isneginf(m)].sum())
        less = 0.0
    return (less + 0.5 * eq) / d.count


def compare_chi2_digests(d1: TDigest, d2: TDigest,
                         q_cuts: Sequence[float] = (0.1, 0.25, 0.5, 0.75, 0.9)) -> float:
    """Chi^2-style divergence score: d1's quantile cuts define the bins; d2's
    mass per bin comes from its cdf at those cut points."""
    q_cuts = list(q_cuts)
    counts = np.zeros((2, len(q_cuts) + 1))
    old_q = 0.0
    old_q2 = 0.0
    for i in range(len(q_cuts) + 1):
        if i == len(q_cuts):
            new_q = 1.0
            x = max(d1.max, d2.max) + 1
        else:
            new_q = q_cuts[i]
            x = d1.quantile(new_q)
        counts[0][i] = d1.count * (new_q - old_q)
        q2 = _cdf_ext(d2, x)   # x can be +/-inf when a digest ingested inf
        counts[1][i] = d2.count * (q2 - old_q2)
        old_q = new_q
        old_q2 = q2
    return llr(counts)


def compare_chi2_counts(k1: Sequence[float], k2: Sequence[float]) -> float:
    """Histogram compare: same-layout count vectors -> llr (the caller is
    responsible for layout compatibility, as in Comparison.java:96-105)."""
    k1 = np.asarray(k1, dtype=np.float64)
    k2 = np.asarray(k2, dtype=np.float64)
    if k1.shape != k2.shape:
        raise ValueError("Incompatible histograms in terms of size")
    return llr(np.stack([k1, k2]))


def ks_digests(d1: TDigest, d2: TDigest) -> float:
    """Normalized Kolmogorov-Smirnov over the centroid scan grid."""
    d1._flush()
    d2._flush()
    if d1.count == 0 or d2.count == 0:
        return float("nan")
    grid = np.unique(np.concatenate([
        [d1.min], d1.means, [d2.min], d2.means]))
    finite = grid[np.isfinite(grid)]
    probes = [float(x) for x in finite]
    if finite.size < grid.size:
        # Infinite atoms (+/-inf ingested): cdf rejects non-finite x — the
        # reference's ks scan would throw here too — so the sup is probed
        # at finite points strictly OUTSIDE the finite support instead.
        # Between the -inf atom and the first finite atom, F(x) equals the
        # full -inf atom mass / n, and above the last finite atom it equals
        # 1 - (+inf atom mass)/n — exactly the values where the infinite
        # atoms' mass difference peaks. On inf-free digests the grid is
        # unchanged, bit-identical to the reference scan.
        if finite.size:
            probes.append(float(finite[0]) - 1.0)
            probes.append(float(finite[-1]) + 1.0)
        else:
            probes.append(0.0)    # all mass at +/-inf: one interior probe
    diff = 0.0
    for x in probes:
        diff = max(diff, abs(d1.cdf(x) - d2.cdf(x)))
    n1, n2 = d1.count, d2.count
    return diff * math.sqrt(n1 * n2 / (n1 + n2))


def _pairs(m1, w1, lo1, hi1, m2, w2, lo2, hi2, delta, scale):
    for a in zip(m1, w1, lo1, hi1, m2, w2, lo2, hi2):
        yield (digest_from_cells(a[0], a[1], a[2], a[3], delta, scale),
               digest_from_cells(a[4], a[5], a[6], a[7], delta, scale))


def ks_udf(delta: float = 100.0, scale: str = "k2"):
    """KS over two digest column sets (8 columns: d1 then d2)."""
    @pandas_udf("double")
    def _ks(m1: pd.Series, w1: pd.Series, lo1: pd.Series, hi1: pd.Series,
            m2: pd.Series, w2: pd.Series, lo2: pd.Series, hi2: pd.Series) -> pd.Series:
        return pd.Series([ks_digests(a, b) for a, b in
                          _pairs(m1, w1, lo1, hi1, m2, w2, lo2, hi2, delta, scale)])
    return _ks


def chi2_udf(q_cuts: Sequence[float] = (0.1, 0.25, 0.5, 0.75, 0.9),
             delta: float = 100.0, scale: str = "k2"):
    qc = [float(q) for q in q_cuts]

    @pandas_udf("double")
    def _chi2(m1: pd.Series, w1: pd.Series, lo1: pd.Series, hi1: pd.Series,
              m2: pd.Series, w2: pd.Series, lo2: pd.Series, hi2: pd.Series) -> pd.Series:
        return pd.Series([compare_chi2_digests(a, b, qc) for a, b in
                          _pairs(m1, w1, lo1, hi1, m2, w2, lo2, hi2, delta, scale)])
    return _chi2
