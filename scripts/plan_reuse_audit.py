"""Post-AQE scan audit: how many times does each gate query actually scan
each parquet table?

At 100 TB the dominant cost of most queries is the raw scan, and a plan
that references an aggregate twice re-executes every scan under it UNLESS
AQE's runtime exchange reuse dedupes the subtree. The pre-execution plan
cannot answer this (reuse is decided at runtime), so this script EXECUTES
every `queries()` entry at a small SF and counts `Scan parquet` nodes per
table in the FINAL adaptive plan (the section before `== Initial Plan ==`;
reused stages print as one-line `ReusedExchange` references with no scan
subtree, so surviving scan nodes are real executions).

Scan counts above 1 are not automatically wrong — sizing collects
(delta/k from a group count), self-joins, and bracket refinements
legitimately read a table again — but every >1 should have a reason.
Writes bench_records/plan_scan_audit.json.

Usage: python scripts/plan_reuse_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def final_plan(df) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def scan_counts(plan: str) -> dict:
    out = {}
    for line in plan.split("\n"):
        if "Scan parquet" not in line and "Scan ExistingRDD" not in line:
            continue
        for t in TABLES:
            if re.search(rf"\b{t}\b", line) or f"/{t}.parquet" in line:
                out[t] = out.get(t, 0) + 1
                break
        else:
            out["_other"] = out.get("_other", 0) + 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from t_digest_spark.plans import get_spark
    import __spark_entry__ as em

    spark = get_spark("plan-audit", master="local[8]", shuffle_partitions=8)
    report, flagged = {}, {}
    for name, fn in em.queries().items():
        try:
            df = fn(spark, sf_dir)
            df.collect()
            counts = scan_counts(final_plan(df))
        except Exception as e:          # streaming queries manage their own
            report[name] = {"error": str(e)[:120]}   # lifecycle; skip those
            continue
        report[name] = counts
        multi = {t: c for t, c in counts.items() if c > 1 and t != "_other"}
        if multi:
            flagged[name] = multi
        print(f"{name}: {counts}" + ("   <== multi-scan" if multi else ""),
              file=sys.stderr)
    spark.stop()

    out = {
        "sf_dir": sf_dir,
        "method": ("executed ADAPTIVE plan, final section only; reused "
                   "stages print without scan subtrees, so counted scan "
                   "nodes are actual executions"),
        "multi_scan_queries": flagged,
        "per_query": report,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bench_records", "plan_scan_audit.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"multi_scan_queries": flagged}))


if __name__ == "__main__":
    main()
