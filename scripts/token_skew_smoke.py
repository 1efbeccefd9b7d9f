"""Hot-token skew probe for token_df_signals' vocabulary join — evidence
for the PLANS.md §17 claim that AQE skew-join splitting is what carries
the corpus-statistics operator at scale.

Corpus: N docs of ~40 unique-suffixed tokens each, PLUS k occurrences of
the literal token 'the' in EVERY document — so the per-(doc, token) frame
holds N rows keyed 'the' (one shuffle key owning N of ~40N join-probe
rows, the classic Zipf head). The vocabulary side is ~14M distinct tokens
at N=1M, far above the broadcast threshold, so the join back is a real
shuffle join with one hot build/probe key.

Two timed conditions, separate sessions on the same persisted input
(written to parquet so both sessions read identical bytes):
  * AQE ON (the session default, skew-join enabled)
  * AQE OFF (static planning — the hot key serializes one task)

Reported: wall per condition, the ratio, and the in-job exactness checks
(total tokens == 45N; 'the' document frequency == N via hapax arithmetic:
sum_tok_df gains exactly k*N*N from the hot token — verified modulo the
unique-suffix background, which contributes df=1 per token).

Usage: python scripts/token_skew_smoke.py [n_docs] [hot_k]   (default 1000000 5)
Emits one JSON line; recorded in BENCH.md §19.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def make_docs(spark, n: int, hot_k: int):
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids, texts = [], []
            for i in pdf["id"].to_numpy():
                i = int(i)
                rng = np.random.default_rng(i * 7919 + 11)
                words = [f"w{i}_{j}_{rng.integers(0, 1 << 30)}"
                         for j in range(40)] + ["the"] * hot_k
                ids.append(i)
                texts.append(" ".join(words))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return (spark.range(n).repartition(32)
            .mapInPandas(gen, "doc_id long, text string"))


def run_once(master: str, shuffle: int, in_path: str, n: int, hot_k: int,
             aqe: bool) -> dict:
    from pyspark.sql import SparkSession

    b = (SparkSession.builder.master(master)
         .appName(f"token-skew-aqe-{aqe}")
         .config("spark.sql.shuffle.partitions", str(shuffle))
         .config("spark.sql.adaptive.enabled", str(aqe).lower())
         .config("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
         .config("spark.driver.memory", "48g"))
    spark = b.getOrCreate()
    try:
        from t_digest_spark.operators.curation import token_df_signals
        docs = spark.read.parquet(in_path)
        t0 = time.perf_counter()
        agg = (token_df_signals(docs, max_chars=None).agg(
            F.sum("n_tokens").alias("nt"),
            F.sum("sum_tok_df").alias("sdf"),
            F.sum("n_hapax").alias("nh")).collect()[0])
        wall = time.perf_counter() - t0
        total = (40 + hot_k) * n
        # background tokens are unique (df=1, hapax); 'the' occurrences are
        # hot_k per doc with df == n docs
        ok = (int(agg["nt"]) == total
              and int(agg["nh"]) == 40 * n
              and int(agg["sdf"]) == 40 * n + hot_k * n * n)
        return {"aqe": aqe, "wall_s": round(wall, 2),
                "rows_per_s": round(n / wall), "exact_ok": ok}
    finally:
        spark.stop()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    hot_k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = f"local[{cpus}]"
    work = tempfile.mkdtemp(prefix="token_skew_")
    in_path = os.path.join(work, "docs")
    try:
        from t_digest_spark.plans import get_spark
        s = get_spark("token-skew-gen", master=master,
                      shuffle_partitions=int(cpus))
        make_docs(s, n, hot_k).write.parquet(in_path)
        s.stop()
        # Cluster-shaped shuffle partitioning (512, not local-core count):
        # the hot key's probe rows are bounded by the DOC count, so at 32
        # partitions the skew ratio is only ~2x — at the hundreds of
        # reducers a 1000-executor cluster runs, the same key is a >10x
        # straggler, which is the regime this probe models and AQE splits.
        res = [run_once(master, 512, in_path, n, hot_k, aqe)
               for aqe in (False, True)]
        out = {"n_docs": n, "hot_k": hot_k,
               "hot_probe_rows": n,     # per-(doc,tok) rows keyed 'the'
               "results": res,
               "aqe_speedup": round(res[0]["wall_s"] / res[1]["wall_s"], 2),
               "all_exact": all(r["exact_ok"] for r in res)}
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
