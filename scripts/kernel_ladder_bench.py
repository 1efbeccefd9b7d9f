#!/usr/bin/env python3
"""Analogs of the reference's two JMH-style kernel benchmarks, run on the
same machine class as the rest of BENCH.md and recorded there (§12).

1. MergeBench (benchmark/src/main/java/com/tdunning/MergeBench.java:41-96):
   steady-state ns/add into a MergingDigest whose internal buffer is
   (factor+1)*compression — the regime where every buffer fill triggers a
   merge sweep. Swept over compression {50,100} x factor {2,5,10}, K_2,
   10M pre-generated uniform doubles, digest pre-warmed past the cheap
   startup region exactly as the reference's @Setup does.

2. SpeedComparison ladder (core/src/test/java/com/tdunning/math/stats/
   SpeedComparison.java:83-128, the KDD'21 Table 1 / Fig 6 shape):
   ns/update for MergingDigest vs AVLTreeDigest vs ReqSketch vs KLL at
   delta=500 / K_2_GLUED / reqK=4 / kllK=100. The reference sweeps
   lgN 20..30 per-point; our merging/KLL/REQ kernels are bulk-vectorized
   (that IS the engine's ingest path — Arrow batches), so the ladder
   reports the bulk rate at lgN {20,22,24} and the AVL clustering rate at
   lgN 16 (its per-point Python loop is the honest cost of the behavioral
   parity path, not the scale path — avl.py docstring).

Usage: python scripts/kernel_ladder_bench.py   # prints one JSON line
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from t_digest_spark.avl import AVLTreeDigest
from t_digest_spark.core import TDigest
from t_digest_spark.sketches.kll import KllSketch
from t_digest_spark.sketches.req import ReqSketch


def merge_bench(rng) -> dict:
    data = rng.uniform(0, 1, 10_000_000)
    out = {}
    # factor 100 (buffer ~10k) is our extension of the reference's sweep: it
    # lands on the engine's actual Arrow-batch ingest size and confirms the
    # reference's own "bigger buffer is faster" rationale holds for the
    # vectorized sweep too (MergeBench.java:36-40 comment).
    for compression in (50, 100):
        for factor in (2, 5, 10, 100):
            buf = (factor + 1) * compression
            d = TDigest(delta=float(compression), buffer_size=buf)
            # reference @Setup warm: past the cheap-start region
            d.add_values(rng.uniform(0, 1, 5 * compression * (factor + 1)))
            chunk = d._buffer_cap
            t0 = time.perf_counter()
            for i in range(0, len(data), chunk):
                d.add_values(data[i:i + chunk])
            ns = (time.perf_counter() - t0) / len(data) * 1e9
            out[f"c{compression}_f{factor}"] = round(ns, 2)
    return out


def _best_ns(fn, n, reps: int = 3) -> float:
    """min-of-reps per-element ns, analog of JMH warmup+measure
    (MergeBench.java @Warmup 3x3s / @Measurement 5x3s): the first pass
    pays first-touch page faults for ~10x-input temporaries, which JMH's
    warmup likewise discards."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, (time.perf_counter() - t0) / n * 1e9)
    return best


def ladder(rng) -> dict:
    rows = {}
    for lg_n in (20, 22, 24):
        n = 1 << lg_n
        data = rng.uniform(0, 1, n)
        merging_ns = _best_ns(
            lambda: TDigest.from_values(data, delta=500.0, scale="k2_glued"), n)
        req_ns = _best_ns(lambda: ReqSketch.from_values(data, k=4), n)
        kll_ns = _best_ns(lambda: KllSketch.from_values(data, k=100), n)
        rows[str(lg_n)] = {"merging_ns": round(merging_ns, 2),
                           "req_ns": round(req_ns, 2),
                           "kll_ns": round(kll_ns, 2)}

    n = 1 << 16
    data = rng.uniform(0, 1, n)
    d = AVLTreeDigest(delta=500.0, scale="k2_glued")
    t0 = time.perf_counter()
    for x in data:
        d.add(float(x))
    rows["avl_lg16_ns"] = round((time.perf_counter() - t0) / n * 1e9, 1)
    return rows


def main():
    rng = np.random.default_rng(3)
    report = {"merge_bench_ns_per_add": merge_bench(rng),
              "speed_ladder": ladder(rng)}
    print(json.dumps(report))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bench_records",
                           "kernel_ladder.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
