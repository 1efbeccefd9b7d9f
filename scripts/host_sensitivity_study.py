"""Controlled experiment: how does suite wall-clock respond to host CPU speed?

BENCH.md §0 argues that dividing a suite subtotal by the 1-core canary
ratio OVERCORRECTS, because at sf0.1 the suite is overhead-dominated
(scheduling, state-store triggers, codegen, Arrow batch setup) rather than
CPU-bound. The committed record set shows this observationally (canary
span 5.2x vs subtotal span 1.7x across windows); this script shows it
EXPERIMENTALLY with a known, controlled CPU-capacity cut: run the identical
bench while N busy-loop processes compete for cores. With H hogs alongside
Spark's 32 task threads on a 32-vCPU host, every runnable thread timeshares
~32/(32+H) of a core — the first-order effect of hypervisor steal — so the
canary ratio between conditions is the "host speed" ratio the cross-round
normalization would use, and the measured suite ratio tells us the true
sensitivity exponent s = dlog(suite_wall) / dlog(canary_rate). s == 1 would
validate linear normalization; the measured s << 1 quantifies by how much
it overcorrects.

Usage:  python scripts/host_sensitivity_study.py
Env:    SENSITIVITY_HOGS (default "0,16,32"), SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
Output: bench_records/host_sensitivity.json (+ one summary line on stdout)

Retries are disabled (SPARK_GRAFT_BENCH_RETRIES=0): the whole point is to
measure the degraded reading, not to rescue it.
"""

import json
import math
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _spawn_hogs(n: int):
    """n single-core busy loops (GIL-pinned Python spin — each saturates
    exactly one core, the shape of a noisy neighbor)."""
    return [subprocess.Popen([sys.executable, "-c", "while True: pass"],
                             stdout=subprocess.DEVNULL,
                             stderr=subprocess.DEVNULL)
            for _ in range(n)]


def _run_bench(env_extra: dict) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env["SPARK_GRAFT_BENCH_RETRIES"] = "0"
    env.update(env_extra)
    out = subprocess.run([sys.executable, os.path.join(HERE, "bench.py")],
                         capture_output=True, text=True, env=env,
                         timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"bench failed rc={out.returncode}: "
                           f"{out.stderr[-500:]}")
    # Shared parser (prefers the FULL record over the trailing compact
    # summary line) — one implementation, one place to track the bench
    # output contract.
    from scripts.engine_ab_bench import _parse_bench_stdout
    return _parse_bench_stdout(out.stdout)


def main():
    hog_levels = [int(x) for x in
                  os.environ.get("SENSITIVITY_HOGS", "0,16,32").split(",")]
    conditions = []
    for n_hogs in hog_levels:
        hogs = _spawn_hogs(n_hogs)
        try:
            time.sleep(2)  # let the hogs reach steady spin
            # A failed/timed-out condition (likelier the more hogs) must not
            # discard the completed conditions' measurements.
            try:
                rec = _run_bench({})
            except Exception as e:
                print(f"hogs={n_hogs}: bench FAILED ({e})", file=sys.stderr)
                conditions.append({"hogs": n_hogs,
                                   "error": str(e)[:300]})
                continue
        finally:
            for p in hogs:
                p.kill()
            for p in hogs:
                p.wait()
        comp = rec.get("comparable_to_prev") or {}
        conditions.append({
            "hogs": n_hogs,
            "kernel_pts_per_sec_single_core":
                rec.get("kernel_pts_per_sec_single_core"),
            "kernel_pts_per_sec_8proc": rec.get("kernel_pts_per_sec_8proc"),
            "host_steal_pct_during_run":
                rec.get("host_steal_pct_during_run"),
            "suite_total_sec": rec.get("value"),
            "common_subtotal_sec": comp.get("subtotal_now_sec"),
            "common_vs": comp.get("vs"),
            "n_failed": rec.get("n_failed"),
        })
        print(f"hogs={n_hogs}: canary="
              f"{conditions[-1]['kernel_pts_per_sec_single_core']}, "
              f"subtotal={conditions[-1]['common_subtotal_sec']}s",
              file=sys.stderr)

    # Sensitivity exponent between the extreme COMPLETED conditions: the
    # slope a linear normalization implicitly assumes is 1.0.
    # Extremes selected by MEASURED canary rate, not input order: an
    # unsorted/descending SENSITIVITY_HOGS value would otherwise silently
    # swap lo/hi and report a negative exponent (ADVICE r4).
    ok = sorted((c for c in conditions
                 if "error" not in c
                 and c.get("kernel_pts_per_sec_single_core")),
                key=lambda c: c["kernel_pts_per_sec_single_core"])
    sens = None
    lo, hi = (ok[0], ok[-1]) if len(ok) >= 2 else ({}, {})
    if (lo.get("kernel_pts_per_sec_single_core") and
            hi["kernel_pts_per_sec_single_core"] and
            lo["common_subtotal_sec"] and hi["common_subtotal_sec"]):
        canary_ratio = (hi["kernel_pts_per_sec_single_core"] /
                        lo["kernel_pts_per_sec_single_core"])
        suite_ratio = (lo["common_subtotal_sec"] /
                       hi["common_subtotal_sec"])
        if canary_ratio > 0 and suite_ratio > 0 and canary_ratio != 1:
            sens = round(math.log(suite_ratio) / math.log(canary_ratio), 3)

    report = {
        "protocol": ("identical bench (retries disabled) under N busy-loop "
                     "hogs; canary ratio = controlled host-speed ratio; "
                     "sensitivity = dlog(common_subtotal)/dlog(canary)"),
        "conditions": conditions,
        "sensitivity_exponent": sens,
        "linear_normalization_assumes": 1.0,
    }
    out_path = os.path.join(HERE, "bench_records", "host_sensitivity.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"sensitivity_exponent": sens,
                      "conditions": [(c["hogs"],
                                      c.get("kernel_pts_per_sec_single_core"),
                                      c.get("common_subtotal_sec"))
                                     for c in conditions]}))


if __name__ == "__main__":
    main()
