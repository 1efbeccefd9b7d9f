"""Estimation-regime smoke for the theta and frequent-items sketches at
cardinalities far beyond the gate SFs — the empirical backing for the
published error bounds at pipeline scale.

* Theta: distinct-count a synthetic table with ~25M rows / ~12.6M distinct
  keys (xxhash64 % m is signed, so the key range is (-m, m)) vs k=4096
  retained — relative error must sit inside 5 sigma of
  RSE = 1/sqrt(k-1) ~ 1.6%; also times the partial-build throughput.
* Theta set algebra at scale: two overlapping key ranges; intersection and
  A-not-B estimates within 10% of exact (set-op error compounds —
  documented in theta.py).
* Frequent items: Zipf(1.2) stream, 20M rows; every key with true count
  > n/(k+1) must be captured and bracketed by [estimate, estimate+Delta].

Generation is distributed (spark.range + codegen expressions); exact
counterparts use Spark exact aggregation.

Usage: python scripts/sketch_scale_smoke.py   (~2-4 min on local[16])
Emits one JSON line; recorded in BENCH.md §9.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def main():
    from t_digest_spark.plans import get_spark
    from t_digest_spark.sketches.spark import (frequent_aggregate,
                                               frequent_items_explode,
                                               theta_aggregate,
                                               theta_binary_op,
                                               theta_estimate_udf)
    from t_digest_spark.sketches.theta import ThetaSketch

    spark = get_spark("sketch-scale-smoke", master="local[16]",
                      shuffle_partitions=32)
    out = {}

    # ---- theta distinct at ~12.6M distinct / 25M rows
    n_rows, key_mod = 25_000_000, 8_000_000
    df = (spark.range(0, n_rows, 1, 32)
          .select((F.xxhash64("id") % key_mod).alias("key")))
    t0 = time.time()
    sk = theta_aggregate(df, "key", None, k=4096).collect()[0]
    theta_wall = time.time() - t0
    s = ThetaSketch.from_row(sk["retained"], sk["theta"], sk["k"])
    exact = df.distinct().count()
    rel_err = abs(s.estimate() - exact) / exact
    rse = 1.0 / math.sqrt(s.retained.size - 1)
    out["theta"] = {
        "rows": n_rows, "exact_distinct": exact,
        "estimate": round(s.estimate()), "rel_err": round(rel_err, 5),
        "rse_bound_5sigma": round(5 * rse, 5),
        "within_5sigma": bool(rel_err <= 5 * rse),
        "build_wall_s": round(theta_wall, 2),
        "rows_per_sec": round(n_rows / theta_wall),
    }

    # ---- theta set algebra in estimation mode (overlapping ranges)
    a = (spark.range(0, 6_000_000, 1, 16).select(F.col("id").alias("key")))
    b = (spark.range(3_000_000, 8_000_000, 1, 16)
         .select(F.col("id").alias("key")))
    ska = theta_aggregate(a, "key", None, k=4096)
    skb = theta_aggregate(b, "key", None, k=4096)
    est_udf = theta_estimate_udf()
    inter_est = theta_binary_op(ska, skb, "intersect").select(
        est_udf("retained", "theta", "k").alias("e")).collect()[0]["e"]
    anotb_est = theta_binary_op(ska, skb, "a_not_b").select(
        est_udf("retained", "theta", "k").alias("e")).collect()[0]["e"]
    out["theta_setops"] = {
        "intersect_exact": 3_000_000, "intersect_est": round(inter_est),
        "intersect_rel_err": round(abs(inter_est - 3e6) / 3e6, 4),
        "anotb_exact": 3_000_000, "anotb_est": round(anotb_est),
        "anotb_rel_err": round(abs(anotb_est - 3e6) / 3e6, 4),
        "both_within_10pct": bool(abs(inter_est - 3e6) / 3e6 < 0.10
                                  and abs(anotb_est - 3e6) / 3e6 < 0.10),
    }

    # ---- frequent items on a Zipf-ish stream, 20M rows
    # key = floor(u^(-1/(alpha-1))) via inverse-CDF over a uniform hash —
    # deterministic, distributed, heavy head
    n_fi = 20_000_000
    alpha = 1.2
    u = (F.shiftrightunsigned(F.xxhash64("id"), 11).cast("double")
         / float(1 << 53))  # uniform (0,1)
    zipf_key = F.floor(F.pow(u + F.lit(1e-12), F.lit(-1.0 / (alpha - 1.0))))
    fdf = spark.range(0, n_fi, 1, 32).select(zipf_key.alias("key"))
    t0 = time.time()
    cap = 1024
    fi = frequent_aggregate(fdf, "key", None, k=cap)
    items = {r["item"]: r for r in frequent_items_explode(fi).collect()}
    fi_wall = time.time() - t0
    floor = n_fi // (cap + 1)
    heavy = (fdf.groupBy("key").count().where(F.col("count") > floor)
             .collect())
    missed = [r for r in heavy if str(r["key"]) not in items]
    bracket_bad = []
    for r in heavy:
        it = items.get(str(r["key"]))
        if it and not (it["estimate"] <= r["count"] <= it["upper_bound"]):
            bracket_bad.append(str(r["key"]))
    out["frequent"] = {
        "rows": n_fi, "capacity": cap, "threshold": floor,
        "n_heavy_keys": len(heavy), "n_missed": len(missed),
        "n_bracket_violations": len(bracket_bad),
        "all_captured": not missed and not bracket_bad,
        "build_wall_s": round(fi_wall, 2),
        "rows_per_sec": round(n_fi / fi_wall),
    }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
