"""Same-window engine A/B: the r2-era engine vs the current engine, interleaved.

VERDICT r3's open question was whether round-over-round suite-time changes
are engine regressions or host-window artifacts. Cross-round normalization
needs a host-speed model (BENCH.md §0); this experiment needs NONE: it runs
the round-2 driver snapshot's own bench (`git archive 0c10225` — its
bench.py, its __spark_entry__.py, its t_digest_spark, exactly the code that
produced BENCH_r02.json) interleaved A/B/A/B with the current bench on the
same host, same testdata, within minutes of each other. Per-query min
across interleaved rounds cancels window drift; the result is a direct
engine-vs-engine reading.

Harness symmetry — every round-4 HARNESS advantage is switched off for the
current leg so the reading is engine-vs-engine, and the remaining biases
run AGAINST the current engine (a win is conservative):
* per-query canary-bracketed retries DISABLED (SPARK_GRAFT_BENCH_RETRIES=0);
* shared table caching DISABLED (SPARK_GRAFT_CACHE_TABLES=0) — the base
  snapshots re-scan parquet per query, so the current leg must too;
* current-round query contracts are deeper (sketch queries also compute
  exact counterparts in-job for the driver's bound contract — VERDICT r2
  noted ~2x work per query vs earlier definitions) — this one is a bias
  against the current engine and stays.

Usage:  python scripts/engine_ab_bench.py
Env:    AB_ROUNDS (default 2), AB_BASE_COMMIT (default 0c10225 = the r2
        driver snapshot; set 45a61e6 for the r3 snapshot), AB_OUT (report
        filename, default engine_ab_<base>_vs_r4.json),
        SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
Output: bench_records/<AB_OUT> (+ one summary line on stdout)
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# driver snapshot to race: 0c10225 produced BENCH_r02.json, 45a61e6 BENCH_r03.json
R2_COMMIT = os.environ.get("AB_BASE_COMMIT", "0c10225")


def _extract_r2(dest: str):
    ar = subprocess.run(["git", "-C", HERE, "archive", R2_COMMIT],
                        capture_output=True, timeout=120, check=True)
    subprocess.run(["tar", "-x", "-C", dest], input=ar.stdout,
                   check=True, timeout=120)


def _run_bench(cwd: str, extra_env: dict) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    env.update(extra_env)
    out = subprocess.run([sys.executable, "bench.py"], cwd=cwd,
                         capture_output=True, text=True, env=env,
                         timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(f"bench in {cwd} failed rc={out.returncode}: "
                           f"{out.stderr[-500:]}")
    return _parse_bench_stdout(out.stdout)


def _parse_bench_stdout(stdout: str) -> dict:
    """Pick the FULL bench record: round-5 bench.py emits a trailing compact
    summary line for the driver's tail capture, so 'last line' may be the
    abbreviated record. Among parseable JSON lines, prefer the one with the
    most keys (the full record is a strict superset of the compact one)."""
    best = None
    for line in stdout.strip().splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if isinstance(rec, dict) and (best is None or len(rec) > len(best)):
            best = rec
    if best is None:
        raise ValueError("no parseable JSON line in bench stdout")
    return best


def main():
    rounds = int(os.environ.get("AB_ROUNDS", "2"))
    r2dir = tempfile.mkdtemp(prefix="r2_engine_ab_")
    runs = {"r2": [], "r4": []}
    run_errors = []
    try:
        _extract_r2(r2dir)
        # SAME harness-disabling env on BOTH legs: the r2-era snapshot
        # predates these variables (no-op there), while an r4+ base would
        # otherwise race with retries/table-cache ON against a current leg
        # with them OFF — engine+harness, not engine-vs-engine.
        sym_env = {"SPARK_GRAFT_BENCH_RETRIES": "0",
                   "SPARK_GRAFT_CACHE_TABLES": "0"}
        for i in range(rounds):
            for label, cwd, env in (
                    ("r2", r2dir, sym_env),
                    ("r4", HERE, sym_env)):
                # One failed/timed-out run must not discard the completed
                # rounds' measurements — record it and keep interleaving.
                try:
                    rec = _run_bench(cwd, env)
                except Exception as e:
                    run_errors.append(f"round {i + 1} {label}: "
                                      f"{str(e)[:300]}")
                    print(f"round {i + 1} {label}: FAILED ({e})",
                          file=sys.stderr)
                    continue
                runs[label].append(rec)
                print(f"round {i + 1} {label}: total={rec.get('value')}s "
                      f"canary={rec.get('kernel_pts_per_sec_single_core')}",
                      file=sys.stderr)
    finally:
        shutil.rmtree(r2dir, ignore_errors=True)
    if not runs["r2"] or not runs["r4"]:
        raise SystemExit(f"no completed runs for one engine; errors: "
                         f"{run_errors}")

    def _best(recs):
        best = {}
        for rec in recs:
            for k, v in (rec.get("queries") or {}).items():
                if isinstance(v, (int, float)) and (
                        k not in best or v < best[k]):
                    best[k] = v
        return best

    b2, b4 = _best(runs["r2"]), _best(runs["r4"])
    # Require b2[k] > 0: per-query times are rounded to 3 decimals, so a
    # sub-0.5ms query would divide by zero and discard the whole report
    # after both legs already ran (ADVICE r4).
    common = sorted(k for k in set(b2) & set(b4) if b2[k] and b2[k] > 0)
    ratios = {k: round(b4[k] / b2[k], 3) for k in common}
    slower = {k: r for k, r in sorted(ratios.items(), key=lambda kv: -kv[1])
              if r > 1.0}
    report = {
        "protocol": (f"{rounds} interleaved rounds per engine, per-query "
                     "min across rounds; r2 engine = git archive "
                     f"{R2_COMMIT} run via its own bench.py"),
        "sf": runs["r4"][0].get("sf"),
        "window_canaries": {
            "r2_engine_runs": [r.get("kernel_pts_per_sec_single_core")
                               for r in runs["r2"]],
            "r4_engine_runs": [r.get("kernel_pts_per_sec_single_core")
                               for r in runs["r4"]],
        },
        "n_common": len(common),
        "subtotal_r2_engine_sec": round(sum(b2[k] for k in common), 3),
        "subtotal_r4_engine_sec": round(sum(b4[k] for k in common), 3),
        "r4_over_r2_subtotal_ratio": round(
            sum(b4[k] for k in common) / sum(b2[k] for k in common), 3)
            if common else None,
        "n_queries_r4_faster_or_equal": sum(
            1 for k in common if ratios[k] <= 1.0),
        "queries_r4_slower": slower,
        "n_queries_r4_slower_1p5x": sum(1 for r in slower.values()
                                        if r > 1.5),
        "per_query_ratio_r4_over_r2": ratios,
        "rounds_completed": {k: len(v) for k, v in runs.items()},
        "run_errors": run_errors,
        "note": ("same host, same minutes, no normalization model; r4 "
                 "harness advantages OFF (retries=0, table cache=0) for "
                 "engine-vs-engine symmetry; r4 contracts are deeper per "
                 "query — residual bias runs against the r4 engine"),
    }
    out_name = os.environ.get(
        "AB_OUT", "engine_ab_r2_vs_r4.json" if R2_COMMIT == "0c10225"
        else f"engine_ab_{R2_COMMIT}_vs_r4.json")
    out_path = os.path.join(HERE, "bench_records", out_name)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: report[k] for k in (
        "n_common", "subtotal_r2_engine_sec", "subtotal_r4_engine_sec",
        "r4_over_r2_subtotal_ratio", "n_queries_r4_faster_or_equal",
        "n_queries_r4_slower_1p5x")}))


if __name__ == "__main__":
    main()
