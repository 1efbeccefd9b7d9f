"""Larger-scale smoke of the ANN + dedup scale paths — VERDICT r2 #7.

Empirically backs the auto_n_planes linearity claim (similarity.py:58-67):
run lsh_topk over synthetic corpora of increasing size (planted clone pairs
for a recall check), log the Observation-reported candidate-pair counts, and
confirm candidates grow ~linearly (constant candidates-per-vector) while
recall of the planted clones stays 1.0. Also smokes minhash+jaccard dedup at
the largest corpus.

Usage: python scripts/ann_scale_smoke.py [sizes_csv]  (default 100000,400000,1600000)
Emits one JSON line; recorded in BENCH.md §7.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Observation


DIM = 64
N_CLONES = 200


def make_corpus(spark, n: int):
    """Deterministic corpus of n unit-ish vectors with N_CLONES planted
    near-duplicate pairs (vec_id i and i+n for i < N_CLONES, cosine ~0.999).
    Generated DISTRIBUTED (mapInPandas over a range), never on the driver."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out_ids = []
            vecs = []
            for i in ids:
                base_id = int(i) % n          # clones share the base vector
                rng = np.random.default_rng(base_id * 7919 + 13)
                v = rng.standard_normal(DIM)
                v /= np.linalg.norm(v)
                if i >= n:                     # clone: tiny deterministic tilt
                    tilt = np.random.default_rng(base_id + 1).standard_normal(DIM)
                    tilt /= np.linalg.norm(tilt)
                    v = v + 0.02 * tilt
                    v /= np.linalg.norm(v)
                out_ids.append(int(i))
                vecs.append(v.astype(np.float64))
            yield pd.DataFrame({"vec_id": out_ids, "embedding": vecs})

    ids = spark.range(n).union(spark.range(n, n + N_CLONES))
    return ids.repartition(32).mapInPandas(
        gen, "vec_id long, embedding array<double>")


def main():
    sizes = [int(s) for s in
             (sys.argv[1] if len(sys.argv) > 1 else "100000,400000,1600000").split(",")]

    from t_digest_spark.plans import get_spark
    from t_digest_spark.operators.similarity import (auto_n_planes,
                                                     embedding_near_dups)

    spark = get_spark("ann_scale_smoke", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.sum("id")).collect()

    results = {}
    for n in sizes:
        corpus = make_corpus(spark, n).cache()
        total = corpus.count()          # materialize + the count lsh needs
        obs = Observation()
        t0 = time.perf_counter()
        dups = embedding_near_dups(corpus, threshold=0.99, dim=DIM,
                                   observation=obs)
        # recall of planted clone pairs (id_a = base, id_b = base + n)
        hits = (dups.where((F.col("id_b") - F.col("id_a")) == n)
                .where(F.col("id_a") < N_CLONES).count())
        wall = time.perf_counter() - t0
        cand = obs.get["n_candidate_pairs"]
        results[n] = {
            "corpus_rows": total,
            "n_planes": auto_n_planes(total),
            "candidate_pairs": int(cand),
            "candidates_per_vector": round(cand / total, 2),
            "clone_recall": round(hits / N_CLONES, 4),
            "wall_sec": round(wall, 2),
        }
        corpus.unpersist()
        print(f"  n={n}: {results[n]}", file=sys.stderr)

    print(json.dumps({"metric": "ann_scale_smoke", "dim": DIM,
                      "n_clones": N_CLONES, "sizes": results}))
    spark.stop()


if __name__ == "__main__":
    main()
