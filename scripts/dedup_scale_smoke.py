"""Larger-scale smoke of the MinHash-LSH -> Jaccard dedup pipeline — the
text-side counterpart to ann_scale_smoke.py (VERDICT r2 #7).

Synthetic corpora of N documents with PLANTED near-duplicate pairs (doc i
and doc i+N share ~95% of their text for i < N_DUPS); for each corpus size,
run minhash_lsh_candidates -> ngram_jaccard_pairs and report candidate-pair
counts, planted-pair recall, survivor counts, and wall time. Confirms the
banded-join candidate volume stays far from quadratic while recall holds.

Usage: python scripts/dedup_scale_smoke.py [sizes_csv]   (default 100000,400000,1000000)
Emits one JSON line; recorded in BENCH.md §8.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

N_DUPS = 200
WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
         "oscar", "papa", "quebec", "romeo", "sierra", "tango"]


def make_docs(spark, n: int):
    """Distributed deterministic corpus: ~40-word docs from a per-doc seeded
    vocabulary draw; clones (id >= n) replace the last 2 words only."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids, texts = [], []
            for i in pdf["id"].to_numpy():
                base = int(i) % n
                rng = np.random.default_rng(base * 104729 + 7)
                # wide token space (20 stems x 1e6 suffixes): background
                # shingle overlap between unrelated docs is ~zero, as in a
                # real web corpus — an earlier 1000-suffix variant measured
                # candidates/doc growing ~linearly with corpus size purely
                # from coincidental band collisions on the tiny vocabulary
                words = [WORDS[j] + str(rng.integers(0, 1_000_000))
                         for j in rng.integers(0, len(WORDS), 40)]
                if i >= n:                       # clone with a tiny edit
                    words[-2:] = ["edited", "tail"]
                ids.append(int(i))
                texts.append(" ".join(words))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return (spark.range(n + N_DUPS).repartition(32)
            .mapInPandas(gen, "doc_id long, text string"))


def main():
    sizes = [int(s) for s in
             (sys.argv[1] if len(sys.argv) > 1 else "100000,400000,1000000").split(",")]

    from t_digest_spark.operators.dedup import (minhash_lsh_candidates,
                                                ngram_jaccard_pairs)
    from t_digest_spark.plans import get_spark

    spark = get_spark("dedup_scale_smoke", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.sum("id")).collect()

    results = {}
    for n in sizes:
        docs = make_docs(spark, n).cache()
        total = docs.count()
        t0 = time.perf_counter()
        cands = minhash_lsh_candidates(docs, num_hashes=64, bands=16,
                                       n=5).cache()
        n_cands = cands.count()
        verified = ngram_jaccard_pairs(docs, n=5, threshold=0.8,
                                       candidates=cands)
        planted = (verified.where((F.col("id_b") - F.col("id_a")) == n)
                   .where(F.col("id_a") < N_DUPS).count())
        wall = time.perf_counter() - t0
        results[n] = {
            "docs": total,
            "candidate_pairs": n_cands,
            "candidates_per_doc": round(n_cands / total, 3),
            "planted_recall": round(planted / N_DUPS, 4),
            "wall_sec": round(wall, 2),
        }
        cands.unpersist()
        docs.unpersist()
        print(f"  n={n}: {results[n]}", file=sys.stderr)

    print(json.dumps({"metric": "dedup_scale_smoke", "n_dups": N_DUPS,
                      "sizes": results}))
    spark.stop()


if __name__ == "__main__":
    main()
