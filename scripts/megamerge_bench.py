#!/usr/bin/env python3
"""Merge algebra at cluster shape: 10,000 partial digests -> one.

The reference's merge studies stop at 100 parts (AccuracyTest) / 1,000
digests (MegaMergeTest.java:109-142). A 100 TB job on a 1000-executor
cluster produces ~10,000 partition partials (1000 executors x ~10
partitions each), and the final aggregate merges them either flat
(groupBy merge: concat all centroids, one sweep — our
operators/aggregation.py path) or as a two-level tree (treeAggregate:
executors pre-merge locally with fan-in F, driver merges the F-way
partials). This study measures BOTH at 10,000 parts:

* wall time of the merge step alone (the digest-merge throughput the
  BASELINE.json metric names, at the cluster fan-in);
* rank error of p50/p99/p999 (and the full AccuracyTest grid) vs the
  exact order statistics of the pooled 50M samples — asserted within
  the same 0.015 merge bound the 2-100 part sweep holds
  (tests/test_core.py:245);
* tree-vs-flat accuracy delta (the tree pays one extra compress level).

Input: 50M gamma(2,1) samples, seeded, split into 10,000 parts of 5,000
samples — the per-partition sample count a 128 MB split of the
source-code table yields for length(content).

Usage: python scripts/megamerge_bench.py   # writes bench_records/megamerge_10k.json
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from t_digest_spark.core import Dist, TDigest

N_PARTS = int(os.environ.get("MEGAMERGE_PARTS", 10_000))
PER_PART = int(os.environ.get("MEGAMERGE_PER_PART", 5_000))
FAN_IN = int(os.environ.get("MEGAMERGE_FAN_IN", 32))
DELTA = 100.0
QS = (0.001, 0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99, 0.999)


def rank_errors(digest: TDigest, srt: np.ndarray) -> dict:
    return {str(q): round(abs(Dist.cdf(digest.quantile(q), srt) - q), 6)
            for q in QS}


def main():
    rng = np.random.default_rng(4242)
    data = rng.gamma(2.0, 1.0, N_PARTS * PER_PART)
    srt = np.sort(data)

    t0 = time.perf_counter()
    parts = [TDigest.from_values(c, delta=DELTA)
             for c in data.reshape(N_PARTS, PER_PART)]
    build_wall = time.perf_counter() - t0

    # Flat: the groupBy-merge shape (one concat + one sweep over every
    # centroid of every partial).
    t0 = time.perf_counter()
    flat = TDigest.merge_all(parts)
    flat_wall = time.perf_counter() - t0

    # Two-level tree: fan-in F local pre-merges, then one final merge of
    # the ceil(N/F) level-1 digests — the treeAggregate(depth=2) shape.
    t0 = time.perf_counter()
    level1 = [TDigest.merge_all(parts[i:i + FAN_IN])
              for i in range(0, N_PARTS, FAN_IN)]
    tree = TDigest.merge_all(level1)
    tree_wall = time.perf_counter() - t0

    flat_err = rank_errors(flat, srt)
    tree_err = rank_errors(tree, srt)
    bound = 0.015
    ok = (max(flat_err.values()) < bound and max(tree_err.values()) < bound
          and flat.count == data.size and tree.count == data.size
          and flat.check_weights() == 0 and tree.check_weights() == 0)

    report = {
        "n_parts": N_PARTS, "per_part": PER_PART, "fan_in": FAN_IN,
        "delta": DELTA, "samples": data.size,
        "build_wall_sec": round(build_wall, 2),
        "flat": {"wall_sec": round(flat_wall, 3),
                 "digests_merged_per_sec": round(N_PARTS / flat_wall, 1),
                 "centroid_count": flat.centroid_count(),
                 "rank_error": flat_err},
        "tree": {"wall_sec": round(tree_wall, 3),
                 "level1_digests": len(level1),
                 "centroid_count": tree.centroid_count(),
                 "rank_error": tree_err},
        "merge_bound": bound,
        "within_bound_and_invariants": ok,
    }
    print(json.dumps(report, indent=2))
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_records", "megamerge_10k.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
