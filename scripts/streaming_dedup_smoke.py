"""Scale smoke for dedup_stream: throughput AND state-store boundedness.

The 100 TB claim for streaming dedup rests on state EVICTION: with a
delay of D and rows spanning many days, the state store must hold ~the
keys inside the trailing D-window, not every key ever seen (which is what
plain dropDuplicates would do). This script replays N time-ordered rows
(DAYS days of data, DUP_FRAC exact duplicates injected next to their
originals) through dedup_stream with a 1-day delay and reports, from the
query's own progress metrics (stateOperators):

  - rows/s through the dedup operator
  - peak numRowsTotal across triggers (peak state) vs total distinct rows
    — a bounded run shows peak state ~ 2 days of keys (current + delay),
    i.e. ~2/days of the distinct total, NOT the whole key set
  - exactness: sum of per-batch emitted counts == batch distinct count
    (every duplicate collapsed, nothing lost)

Usage: python scripts/streaming_dedup_smoke.py [n_rows] [days]
Emits one JSON line; recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

DUP_FRAC = 0.2


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    days = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from t_digest_spark.plans import get_spark
    from t_digest_spark.streaming import dedup_stream
    spark = get_spark("streaming-dedup-smoke", master="local[32]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="dedup_smoke_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)

    # one file per day, time-ordered within and across files; DUP_FRAC of
    # each day's rows are exact duplicates of rows earlier in the SAME day
    # (duplicates arrive near their originals, like real near-time bursts)
    per_day = n_rows // days
    base_ms = 1_700_000_000_000
    day_ms = 86_400_000
    t_gen = time.time()
    for d in range(days):
        rng = np.random.default_rng(d)
        ts = base_ms + d * day_ms + np.sort(rng.integers(0, day_ms, per_day))
        key = rng.integers(0, 1 << 60, per_day)
        val = rng.random(per_day)
        n_dup = int(per_day * DUP_FRAC)
        idx = np.arange(per_day - n_dup, per_day)    # tail rows become
        src = idx - (per_day - n_dup)                # copies of head rows
        key[idx], ts[idx], val[idx] = key[src], ts[src], val[src]
        order = np.argsort(ts, kind="stable")        # keep time order
        pdf = pd.DataFrame({"ts": pd.to_datetime(ts[order], unit="ms"),
                            "k": key[order], "v": val[order]})
        tmp = os.path.join(work, f"_tmp{d}")
        spark.createDataFrame(pdf).coalesce(1).write.mode(
            "overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.rename(os.path.join(tmp, part),
                  os.path.join(in_dir, f"day{d:03d}.parquet"))
        shutil.rmtree(tmp)
    gen_s = round(time.time() - t_gen, 2)

    stream = (spark.readStream.schema("ts timestamp, k long, v double")
              .option("maxFilesPerTrigger", "1").parquet(in_dir))
    deduped = dedup_stream(stream, ["ts", "k", "v"], "ts", "1 day")

    emitted = {"n": 0}

    def fold_count(bdf, _bid):
        # count stays distributed; only the scalar returns to the driver
        emitted["n"] += bdf.count()

    t0 = time.time()
    q = (deduped.writeStream.foreachBatch(fold_count).outputMode("append")
         .option("checkpointLocation", os.path.join(work, "ckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        state_rows = [so.get("numRowsTotal", 0)
                      for p in q.recentProgress
                      for so in (p.get("stateOperators") or [])]
        q.stop()
    wall = round(time.time() - t0, 2)

    total = spark.read.parquet(in_dir).count()
    distinct = (spark.read.parquet(in_dir)
                .dropDuplicates(["ts", "k", "v"]).count())

    out = {
        "n_rows": total, "days": days, "dup_frac": DUP_FRAC,
        "gen_s": gen_s, "dedup_wall_s": wall,
        "rows_per_s": round(total / wall, 1),
        "distinct_rows": distinct,
        "emitted_rows": emitted["n"],
        "exact": emitted["n"] == distinct,
        "peak_state_rows": max(state_rows) if state_rows else None,
        "final_state_rows": state_rows[-1] if state_rows else None,
        "state_bound_ratio": (round(max(state_rows) / distinct, 3)
                              if state_rows else None),
        "expected_bound": round(2.0 / days, 3),
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
