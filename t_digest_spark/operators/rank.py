"""Digest-based percentile-rank enrichment: annotate every row with its
approximate rank within its group's distribution — percent_rank WITHOUT the
per-group global sort a window function would need.

At 100 TB a ``percent_rank() OVER (PARTITION BY g ORDER BY x)`` shuffles and
sorts the entire table. Here the distribution knowledge is compressed into
one digest row per group (built by tdigest_aggregate with zero raw-row
shuffle); each digest is evaluated ONCE into a (grid+1)-point quantile
table on the driver, the tiny {group: table} dict is broadcast, and the
per-row work is a vectorized ``np.interp`` over Arrow batches — no shuffle,
no sort, embarrassingly parallel.

Accuracy = digest rank error (ppm tails / <1e-3 mid, core.py) + grid
resolution (1/grid). The group-cardinality bound is the same one every
digest pipeline already carries: one digest row per group must fit on the
driver (document/gate at ~1e5 groups; the digest rows themselves are the
scarce resource long before the tables are).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from t_digest_spark.serde import digest_from_cells


def digest_rank_lookup(df: DataFrame, digest_df: DataFrame, value_col: str,
                       group_cols: Optional[Sequence[str]] = None,
                       grid: int = 1024, delta: float = 100.0,
                       scale: str = "k2",
                       out_col: str = "rank_est") -> DataFrame:
    """Add ``out_col`` = approximate mid-rank of ``value_col`` within its
    group's digest (0..1). ``digest_df`` is the output of
    tdigest_aggregate over the same grouping."""
    from t_digest_spark.sketches.spark import _factorize_groups

    group_cols = list(group_cols or [])
    rows = digest_df.collect()        # one row per group — bounded, by design
    qs = np.linspace(0.0, 1.0, grid + 1)
    tables = {}
    for r in rows:
        d = digest_from_cells(r["means"], r["weights"], r["dmin"], r["dmax"],
                              delta, scale)
        vals = d.quantiles(qs)
        # np.interp needs strictly increasing xp: collapse flat runs (ties /
        # constant stretches) to ONE point at the MID-rank of the run
        # ((q_first + q_last)/2) — the Dist.cdf mid-rank convention — so a
        # value on a tie plateau maps to the middle of its tied mass, not
        # the top (error would otherwise reach the full plateau mass).
        change = np.r_[True, vals[1:] != vals[:-1]]     # run starts
        starts = np.nonzero(change)[0]
        last_idx = np.r_[starts[1:] - 1, vals.size - 1]  # run ends
        key = tuple(r[c] for c in group_cols)
        tables[key] = (vals[starts], (qs[starts] + qs[last_idx]) / 2.0,
                       float(r["dmin"]), float(r["dmax"]))
    bc = df.sparkSession.sparkContext.broadcast(tables)

    @pandas_udf("double")
    def _rank(*cols: pd.Series) -> pd.Series:
        tabs = bc.value
        x = cols[-1].to_numpy(dtype=np.float64)
        out = np.full(x.size, np.nan)
        if group_cols:
            gframe = pd.DataFrame({c: cols[i].to_numpy(dtype=object)
                                   for i, c in enumerate(group_cols)})
            # Spark-groupBy NULL semantics (shared with the sketch layer):
            # NULL groups form their own group and normalize to None, so
            # NULL-key rows look up the (None, ...) digest instead of
            # unconditionally getting NaN rank.
            codes, uniques = _factorize_groups(gframe, group_cols)
            for gi in range(len(uniques)):
                u = uniques[gi]
                key = u if len(group_cols) > 1 else (u,)
                tab = tabs.get(key)
                if tab is None:
                    continue
                m = codes == gi
                out[m] = _interp_rank(x[m], tab)
        else:
            tab = tabs.get(())
            if tab is not None:          # empty digest_df -> all-NaN, not a crash
                out[:] = _interp_rank(x, tab)
        return pd.Series(out)

    args = [F.col(c) for c in group_cols] + [F.col(value_col).cast("double")]
    return df.withColumn(out_col, _rank(*args))


def _interp_rank(x: np.ndarray, tab) -> np.ndarray:
    vals, qs, dmin, dmax = tab
    r = np.interp(x, vals, qs)
    r[x < dmin] = 0.0
    r[x > dmax] = 1.0
    return np.clip(r, 0.0, 1.0)
