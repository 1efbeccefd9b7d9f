"""Frequent-items (Misra-Gries) sketch — mergeable heavy hitters.

Not in the reference repo; follows the classic Misra-Gries algorithm with
the mergeability result of Agarwal, Cormode, Huang, Phillips, Wei, Yi
("Mergeable Summaries", PODS'12, Thm 1): two MG summaries of size k merge
into one of size k whose error bound is the SUM of inputs' bounds, still
<= n_total/(k+1).  Guarantees (with ``max_error`` = cumulative decrement):

  * estimate(x) <= true_count(x) <= estimate(x) + max_error
  * max_error <= n/(k+1)  (so every key with true count > n/(k+1) is
    retained — no false negatives above the threshold)

The Spark layer keeps the usual partial-build + final-merge shape: batches
are pre-reduced with vectorized ``value_counts`` before they touch the
dict, and the dict never exceeds ~2k entries between prunes.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import pandas as pd


class FrequentItemsSketch:
    """Misra-Gries summary of at most ``k`` weighted counters."""

    __slots__ = ("k", "counters", "max_error", "n")

    def __init__(self, k: int = 512):
        if k < 1:
            raise ValueError("frequent-items sketch needs k >= 1")
        self.k = int(k)
        self.counters: Dict[str, int] = {}
        self.max_error = 0      # cumulative decrement (Delta)
        self.n = 0              # total stream weight

    # ------------------------------------------------------------- update

    def update_counts(self, keys: Sequence[str],
                      counts: Sequence[int]) -> None:
        """Bulk update from pre-aggregated (key, count) pairs. Weights must
        be positive: zero-weight entries are skipped (they would defeat the
        prune's cut>0 early-return and let the dict grow past k), negative
        weights are rejected — MG has no delete semantics."""
        c = self.counters
        for key, w in zip(keys, counts):
            w = int(w)
            if w < 0:
                raise ValueError("frequent-items weights must be >= 0")
            if w == 0:
                continue
            self.n += w
            c[key] = c.get(key, 0) + w
        if len(c) > self.k:
            self._prune()

    def update_batch(self, values: pd.Series) -> None:
        vc = values.value_counts()
        self.update_counts(vc.index.astype(str), vc.to_numpy())

    def _prune(self) -> None:
        """Decrement all counters by the (k+1)-th largest value and drop
        the non-positive ones (classic MG step, done in bulk)."""
        vals = np.fromiter(self.counters.values(), dtype=np.int64,
                           count=len(self.counters))
        if vals.size <= self.k:
            return
        # (k+1)-th largest = cut; every surviving counter loses `cut`.
        cut = int(np.partition(vals, vals.size - self.k - 1)[vals.size - self.k - 1])
        if cut <= 0:
            return
        self.max_error += cut
        self.counters = {key: v - cut for key, v in self.counters.items()
                         if v > cut}

    # -------------------------------------------------------------- query

    def estimate(self, key: str) -> int:
        """Lower-bound estimate (<= true count)."""
        return self.counters.get(key, 0)

    def upper_bound(self, key: str) -> int:
        return self.counters.get(key, 0) + self.max_error

    def frequent_items(self, threshold: int = None):
        """(key, est, ub) for keys whose UPPER bound clears the threshold —
        DataSketches NO_FALSE_NEGATIVES convention.  Default threshold =
        max_error (i.e. everything that could exceed the error floor)."""
        t = self.max_error if threshold is None else int(threshold)
        out = [(key, v, v + self.max_error)
               for key, v in self.counters.items() if v + self.max_error > t]
        out.sort(key=lambda r: (-r[1], r[0]))
        return out

    # -------------------------------------------------------------- merge

    def merge(self, other: "FrequentItemsSketch") -> "FrequentItemsSketch":
        c = self.counters
        for key, v in other.counters.items():
            c[key] = c.get(key, 0) + v
        self.max_error += other.max_error
        self.n += other.n
        if len(c) > self.k:
            self._prune()
        return self

    @classmethod
    def merge_all(cls, parts: Sequence["FrequentItemsSketch"],
                  k: int = 512) -> "FrequentItemsSketch":
        out = cls(k=k)
        for p in parts:
            out.merge(p)
        return out

    # --------------------------------------------------------------- serde

    def to_row(self):
        keys = list(self.counters.keys())
        return (keys, [self.counters[key] for key in keys],
                self.max_error, self.n, self.k)

    @classmethod
    def from_row(cls, keys, counts, max_error, n, k) -> "FrequentItemsSketch":
        s = cls(k=int(k))
        s.counters = {key: int(v) for key, v in zip(keys, counts)}
        s.max_error = int(max_error)
        s.n = int(n)
        return s
