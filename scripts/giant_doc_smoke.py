"""Pathological-document smoke for the similarity signature paths — the
measured evidence behind dedup.CONTENT_PREFIX_CAP (PLANS.md §16).

A production code corpus is mostly ~100-600-char files with a heavy tail of
multi-MB minified bundles / concatenated logs. This script synthesizes that
shape — N_NORMAL ordinary docs plus N_GIANT multi-MB docs, two of which share
an identical first-CONTENT_PREFIX_CAP prefix (planted cap-collapse pair) —
and runs the full signature battery (MinHash-LSH, SimHash near-dups,
token_count) capped and, at a reduced giant size, uncapped, reporting:

  - wall time + docs/s for each path, capped vs uncapped
  - the planted identical-prefix pair is found by BOTH MinHash and SimHash
  - exact dedup still separates the planted pair (full-content sha)
  - uncapped-vs-capped wall ratio on the SAME corpus (what the cap buys)

Usage: python scripts/giant_doc_smoke.py [giant_mb] [n_giant]
Emits one JSON line; recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from t_digest_spark.operators.dedup import (CONTENT_PREFIX_CAP, dedup_exact,
                                            minhash_lsh_candidates,
                                            simhash_near_dups)
from t_digest_spark.operators.text import token_count

N_NORMAL = 20_000
WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]


def make_docs(spark, n_giant: int, giant_chars: int):
    """id < N_NORMAL: ~40-word docs from a wide token space (as in
    dedup_scale_smoke). id >= N_NORMAL: giant docs of ~giant_chars chars;
    the first two share an identical first-CONTENT_PREFIX_CAP prefix and
    diverge after it (the cap-collapse pair); the rest are independent."""

    def gen(batches):
        for pdf in batches:
            ids, texts = [], []
            for i in pdf["id"].to_numpy():
                i = int(i)
                if i < N_NORMAL:
                    rng = np.random.default_rng(i * 104729 + 7)
                    words = [WORDS[j] + str(rng.integers(0, 1_000_000))
                             for j in rng.integers(0, len(WORDS), 40)]
                    texts.append(" ".join(words))
                else:
                    g = i - N_NORMAL
                    seed = 0 if g < 2 else g          # 0,1 share a prefix
                    rng = np.random.default_rng(seed * 7919 + 13)
                    n_words = giant_chars // 12
                    words = [WORDS[j] + str(rng.integers(0, 1_000_000))
                             for j in rng.integers(0, len(WORDS), n_words)]
                    text = " ".join(words)
                    if g < 2:                          # diverge after the cap
                        tail_rng = np.random.default_rng(1000 + g)
                        tail = " ".join(
                            WORDS[j] + str(tail_rng.integers(0, 1_000_000))
                            for j in tail_rng.integers(0, len(WORDS), n_words // 2))
                        text = text[:CONTENT_PREFIX_CAP] + " " + tail
                    texts.append(text)
                ids.append(i)
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return (spark.range(N_NORMAL + n_giant).repartition(32)
            .mapInPandas(gen, "doc_id long, text string"))


def run_battery(docs, n_docs: int, max_chars):
    """Time each signature path; return (report, pair_found flags)."""
    a, b = N_NORMAL, N_NORMAL + 1          # the planted cap-collapse pair
    rep = {}

    t = time.time()
    # one materialization: collect ALL candidate pairs, count/filter locally
    # (candidate volume is ~10k here; a second Spark action would re-run the
    # whole uncached signature pipeline inside the timing window)
    all_pairs = minhash_lsh_candidates(docs, num_hashes=32, bands=8, n=5,
                                       max_chars=max_chars).collect()
    rep["minhash_wall_s"] = round(time.time() - t, 2)
    pairs = set((r.id_a, r.id_b) for r in all_pairs
                if r.id_a >= N_NORMAL or r.id_b >= N_NORMAL)
    rep["minhash_docs_per_s"] = round(n_docs / rep["minhash_wall_s"], 1)
    rep["minhash_candidates"] = len(all_pairs)
    rep["minhash_found_pair"] = (a, b) in pairs

    t = time.time()
    nd = simhash_near_dups(docs, max_hamming=3, max_chars=max_chars)
    sh_pairs = set((r.id_a, r.id_b) for r in
                   nd.where((F.col("id_a") >= N_NORMAL)
                            | (F.col("id_b") >= N_NORMAL)).collect())
    rep["simhash_wall_s"] = round(time.time() - t, 2)
    rep["simhash_docs_per_s"] = round(n_docs / rep["simhash_wall_s"], 1)
    rep["simhash_found_pair"] = (a, b) in sh_pairs or (b, a) in sh_pairs

    t = time.time()
    tok = token_count(docs).agg(F.sum("ws_tokens")).collect()[0][0]
    rep["token_count_wall_s"] = round(time.time() - t, 2)
    rep["total_ws_tokens"] = int(tok)
    return rep


def main():
    giant_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    n_giant = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from t_digest_spark.plans import get_spark
    spark = get_spark("giant-doc-smoke", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    giant_chars = int(giant_mb * 1_000_000)
    # the planted pair diverges only AFTER the cap — a smaller giant size
    # would silently move the differing tails inside the capped prefix and
    # read as a recall failure instead of a misconfigured corpus
    assert giant_chars > CONTENT_PREFIX_CAP, (giant_chars, CONTENT_PREFIX_CAP)
    n_docs = N_NORMAL + n_giant
    docs = make_docs(spark, n_giant, giant_chars).cache()
    docs.count()

    out = {
        "n_normal": N_NORMAL, "n_giant": n_giant,
        "giant_chars": giant_chars, "cap": CONTENT_PREFIX_CAP,
        "capped": run_battery(docs, n_docs, CONTENT_PREFIX_CAP),
    }

    # exact dedup must still separate the planted pair (tails differ)
    survivors = dedup_exact(docs).count()
    out["exact_dedup_survivors"] = survivors
    out["exact_separates_planted_pair"] = survivors == n_docs

    # uncapped reference on a REDUCED giant size so it completes: what the
    # cap buys, per MB of pathological document
    small_mb = min(giant_mb, 1.0)
    docs_small = make_docs(spark, n_giant, int(small_mb * 1_000_000)).cache()
    docs_small.count()
    out["uncapped_ref_giant_mb"] = small_mb
    out["uncapped"] = run_battery(docs_small, n_docs, None)
    out["capped_at_ref_size"] = run_battery(docs_small, n_docs,
                                            CONTENT_PREFIX_CAP)
    docs_small.unpersist()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
