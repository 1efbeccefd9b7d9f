"""Skew evidence for tdigest_merge(salt_levels=...) — VERDICT r2 #4.

The reference's own scale experiment is the two-level merge
(MegaMergeTest.java:73-105): with very many partial digests per group, the
final single-task concat-merge for a hot key becomes the straggler, and an
intermediate salted merge round (64 buckets) parallelizes it at the cost of
one extra shuffle over partial rows.

This script isolates exactly that stage: it builds a skewed partial-digest
table ONCE (one hot key carrying ~90% of partials' mass, P partials per key
by construction), persists it, then times `tdigest_merge` at salt_levels=0
vs 1 for several fan-ins P, interleaved min-of-N (sandbox steal protocol,
BENCH.md §5).

Usage: python scripts/skew_bench.py [rows] [trials]
Emits one JSON line; results recorded in BENCH.md §6.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def main():
    # NOTE: if you change delta or the hot-key share below, also change the
    # cache-path suffix — persisted partials are keyed on the full config.
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    fanins = [256, 1024, 4096]

    from t_digest_spark.plans import get_spark
    from t_digest_spark.operators.aggregation import (tdigest_merge,
                                                      tdigest_partial_build)

    spark = get_spark("skew_bench", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # warm python workers
    spark.range(1000).select(F.sum("id")).collect()

    # Skewed source: 90% of rows on key 'hot', rest uniform over 63 keys.
    src = (spark.range(rows)
           .select(F.when(F.pmod(F.xxhash64("id"), 10) < 9, F.lit("hot"))
                   .otherwise(F.concat(F.lit("k"),
                                       F.pmod(F.xxhash64("id", F.lit(1)), 63)))
                   .alias("g"),
                   (F.pmod(F.xxhash64("id", F.lit(2)), 1_000_000) / 1e6)
                   .alias("x")))

    results = {}
    for fanin in fanins:
        part_path = f"/tmp/tdigest_skew_partials_{rows}_{fanin}_d500_hot90"
        if not os.path.exists(os.path.join(part_path, "_SUCCESS")):
            partials = tdigest_partial_build(
                src.repartition(fanin), "x", ["g"], delta=500.0)
            partials.write.mode("overwrite").parquet(part_path)
        partials = spark.read.parquet(part_path)
        n_partials = partials.count()

        timings = {0: [], 1: []}
        for _ in range(trials):          # interleaved trials (steal protocol)
            for lv in (0, 1):
                t0 = time.perf_counter()
                tdigest_merge(partials, ["g"], delta=500.0,
                              salt_levels=lv).collect()
                timings[lv].append(time.perf_counter() - t0)
        results[fanin] = {
            "n_partial_rows": n_partials,
            "unsalted_sec": round(min(timings[0]), 3),
            "salted_1_sec": round(min(timings[1]), 3),
            "speedup": round(min(timings[0]) / min(timings[1]), 3),
        }

    print(json.dumps({"metric": "skew_salted_merge", "rows": rows,
                      "hot_share": 0.9, "delta": 500.0,
                      "trials": trials, "fanins": results}))
    spark.stop()


if __name__ == "__main__":
    main()
