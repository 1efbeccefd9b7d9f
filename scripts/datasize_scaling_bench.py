#!/usr/bin/env python3
"""Data-size scaling evidence: the same flagship job at the same parallelism
over 4x the rows should take ~4x the wall — i.e. rows/sec flat in data size.

Complements scaling_bench.py (which fixes the data and scales the cores —
the north rule's N -> 4N axis): together they bracket the 100 TB claim.
A pipeline that is linear in data at fixed cores AND >=0.8-efficient in
cores at fixed data has no super-linear term to blow up at 1000x the input;
the only remaining scale risks are skew (measured separately, BENCH.md §6)
and shuffle width (the digest pipeline shuffles only per-group sketch rows,
plan-guarded in tests/test_plans.py).

Protocol mirrors scaling_bench.py: each (size) level in its own subprocess
(fresh JVM), levels interleaved across rounds, MIN wall per level (the
estimator least sensitive to hypervisor interference), worker pool
pre-warmed before timing.

Usage: python scripts/datasize_scaling_bench.py   # writes datasize_report.json
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(HERE, "scaling_bench.py")
CPUS = int(os.environ.get("DATASIZE_CPUS", 32))
ROUNDS = int(os.environ.get("DATASIZE_ROUNDS", 2))
# millions of rows per level, e.g. DATASIZE_SIZES="64,256,512"
_SIZES_M = [int(s) for s in
            os.environ.get("DATASIZE_SIZES", "64,256").split(",")]
SIZES = {m * 1_000_000: f"/tmp/tdigest_scaling_input_{m}m" for m in _SIZES_M}


def main():
    walls = {n: [] for n in SIZES}
    for rnd in range(ROUNDS):
        for n_rows, path in SIZES.items():
            env = dict(os.environ, SCALING_CPUS=str(CPUS),
                       SCALING_ROWS=str(n_rows), SCALING_INPUT=path,
                       SCALING_TRIALS="2")
            out = subprocess.run([sys.executable, BENCH, "--one"],
                                 env=env, capture_output=True, text=True)
            if out.returncode != 0 or not out.stdout.strip():
                sys.stderr.write(out.stderr)
                raise RuntimeError(
                    f"scaling_bench --one failed (rc={out.returncode}) "
                    f"for n={n_rows}; stderr above")
            line = out.stdout.strip().splitlines()[-1]
            res = json.loads(line)
            walls[n_rows].extend(res["walls"])
            print(f"round {rnd} n={n_rows}: {res['walls']}", file=sys.stderr)

    sizes = sorted(SIZES)
    stats = {n: {"walls": walls[n], "best_wall": min(walls[n]),
                 "rows_per_sec_best": round(n / min(walls[n]), 1)}
             for n in sizes}
    small, big = sizes[0], sizes[-1]
    ratio = stats[big]["rows_per_sec_best"] / stats[small]["rows_per_sec_best"]
    report = {
        "protocol": "same job, same local[%d], rows in {%s}M; interleaved "
                    "rounds, min wall per size" % (
                        CPUS, ",".join(str(n // 10**6) for n in sizes)),
        "cpus": CPUS,
        "levels": {str(n): stats[n] for n in sizes},
        # consecutive-pair throughput ratios (1.0 = perfectly linear in data)
        "throughput_ratio_steps": {
            f"{a//10**6}M->{b//10**6}M": round(
                stats[b]["rows_per_sec_best"] / stats[a]["rows_per_sec_best"], 3)
            for a, b in zip(sizes, sizes[1:])},
        "throughput_ratio_big_over_small": round(ratio, 3),
    }
    print(json.dumps(report))
    with open(os.path.join(os.path.dirname(HERE), "datasize_report.json"),
              "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
