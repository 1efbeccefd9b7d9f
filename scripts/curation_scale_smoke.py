"""Larger-scale smoke of the curation operators (repetition signals,
temperature mixing, PII scrub, sequence packing) — the curation-family
counterpart to dedup_scale_smoke.py.

Synthetic distributed corpora of N documents (~40 tokens each) with
PLANTED structure the run then verifies in-job:
  * every 50th doc is a high-repetition doc (one token repeated 30x and
    duplicated lines) -> repetition_signals must flag exactly those;
  * every doc carries one planted email and every 4th an IPv4 ->
    pii_scrub totals must equal the planted counts;
  * temperature_sample at tau=0.5 over a skewed 3-group mix -> achieved
    per-group counts must sit within 5 sigma of n*p (deterministic md5
    draws, binomial tolerance);
  * pack_chunks at budget 512 -> the final chunk index must equal
    ceil(total_tokens/512) - 1 (the concat-and-chunk layout identity).

For each corpus size, reports wall time and rows/s per operator.
Throughput flat-or-rising with N (per-row asymptote) is the pass signal
for the scale story; any planted-structure miss is a correctness failure.

Usage: python scripts/curation_scale_smoke.py [sizes_csv]  (default 100000,400000,1000000)
Emits one JSON line; recorded in BENCH.md §19.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

REP_EVERY = 50          # every 50th doc is the high-repetition plant
IP_EVERY = 4            # every 4th doc carries an IPv4
GROUPS = [("en", 0.80), ("de", 0.15), ("sw", 0.05)]   # skewed mix
WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]


def make_docs(spark, n: int):
    """Deterministic distributed corpus with the planted structure above."""
    import numpy as np
    import pandas as pd

    bounds = np.cumsum([w for _, w in GROUPS])

    def gen(batches):
        for pdf in batches:
            rows = {"doc_id": [], "text": [], "lang": []}
            for i in pdf["id"].to_numpy():
                i = int(i)
                rng = np.random.default_rng(i * 99991 + 3)
                u = (i * 2654435761 % 1_000_003) / 1_000_003
                lang = GROUPS[int(np.searchsorted(bounds, u, side="right"))][0]
                words = [WORDS[j] + str(rng.integers(0, 1_000_000))
                         for j in rng.integers(0, len(WORDS), 40)]
                if i % REP_EVERY == 0:
                    words[:30] = ["looploop"] * 30      # top-token plant
                    text = " ".join(words[:10]) + "\n" + "\n".join(
                        [" ".join(words[10:20])] * 3)   # duplicate lines
                else:
                    text = " ".join(words[:20]) + "\n" + " ".join(words[20:])
                text += f" reach user{i}@example.com"
                if i % IP_EVERY == 0:
                    text += f" via 10.{i % 256}.0.1"
                rows["doc_id"].append(i)
                rows["text"].append(text)
                rows["lang"].append(lang)
            yield pd.DataFrame(rows)

    return (spark.range(n).repartition(32)
            .mapInPandas(gen, "doc_id long, text string, lang string"))


def main():
    sizes = [int(s) for s in
             (sys.argv[1] if len(sys.argv) > 1
              else "100000,400000,1000000").split(",")]
    from t_digest_spark.operators.curation import (pack_chunks, pii_scrub,
                                                   repetition_signals,
                                                   temperature_probabilities,
                                                   temperature_sample)
    from t_digest_spark.plans import get_spark
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("curation-scale-smoke", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    out = {"sizes": sizes, "budget": 512, "results": []}
    for n in sizes:
        docs = make_docs(spark, n).persist()
        n_rows = docs.count()        # materialize once; time operators only
        res = {"n": n_rows}

        t0 = time.perf_counter()
        rep = repetition_signals(docs, keep_cols=("lang",))
        flagged = (rep.where((F.col("max_token") * 5 > F.col("n_tokens"))
                             & (F.col("n_tokens") >= 10)
                             | (F.col("n_dup_lines") * 2 >= F.col("n_lines")))
                   .count())
        dt = time.perf_counter() - t0
        want = len(range(0, n, REP_EVERY))
        res["repetition"] = {"wall_s": round(dt, 2),
                             "rows_per_s": round(n / dt),
                             "flagged": flagged, "planted": want,
                             "ok": flagged == want}

        t0 = time.perf_counter()
        probs = {r["lang"]: (r["n_in"], r["p_keep"]) for r in
                 temperature_probabilities(docs, "lang", 0.3).collect()}
        kept = {r["lang"]: r["cnt"] for r in
                temperature_sample(docs, "lang", "doc_id", 0.3)
                .groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
                .collect()}
        dt = time.perf_counter() - t0
        mix_ok = True
        for lang, (n_in, p) in probs.items():
            got = kept.get(lang, 0)
            sigma = math.sqrt(max(n_in * p * (1 - p), 1.0))
            mix_ok &= abs(got - n_in * p) <= 5 * sigma
        res["temperature"] = {"wall_s": round(dt, 2),
                              "rows_per_s": round(n / dt),
                              "kept": sum(kept.values()), "ok": mix_ok}

        t0 = time.perf_counter()
        pii = (pii_scrub(docs).agg(
            F.sum("n_emails").alias("e"), F.sum("n_ipv4").alias("i"),
            F.sum(F.col("n_chars_in") - F.col("n_chars_out")).alias("d"))
            .collect()[0])
        dt = time.perf_counter() - t0
        want_ip = len(range(0, n, IP_EVERY))
        res["pii"] = {"wall_s": round(dt, 2), "rows_per_s": round(n / dt),
                      "emails": pii["e"], "ipv4": pii["i"],
                      "ok": pii["e"] == n and pii["i"] == want_ip}

        t0 = time.perf_counter()
        toks = F.regexp_count(F.col("text"), F.lit(r"[^ \t\n\x0B\f\r]+"))
        packed = pack_chunks(
            docs.select("doc_id", toks.cast("bigint").alias("toks")),
            "toks", "doc_id", budget=512)
        agg = packed.agg(
            F.sum("toks").alias("tot"),
            F.max(F.col("first_chunk") + F.col("chunks_spanned") - 1)
            .alias("last_chunk")).collect()[0]
        dt = time.perf_counter() - t0
        want_chunks = math.ceil(agg["tot"] / 512)
        res["pack"] = {"wall_s": round(dt, 2), "rows_per_s": round(n / dt),
                       "total_tokens": int(agg["tot"]),
                       "n_chunks": int(agg["last_chunk"]) + 1,
                       "ok": int(agg["last_chunk"]) + 1 == want_chunks}

        t0 = time.perf_counter()
        from t_digest_spark.operators.curation import token_df_signals
        tdf = (token_df_signals(docs).agg(
            F.sum("n_tokens").alias("nt"), F.sum("sum_tok_df").alias("sdf"),
            F.sum("n_hapax").alias("nh")).collect()[0])
        dt = time.perf_counter() - t0
        rep_tokens = rep.agg(F.sum("n_tokens").alias("nt")).collect()[0]["nt"]
        res["token_df"] = {
            "wall_s": round(dt, 2), "rows_per_s": round(n / dt),
            "total_tokens": int(tdf["nt"]),
            "avg_df": round(tdf["sdf"] / max(tdf["nt"], 1), 1),
            "hapax_frac": round(tdf["nh"] / max(tdf["nt"], 1), 4),
            # same tokenizer + cap as repetition_signals: totals must agree
            "ok": int(tdf["nt"]) == int(rep_tokens)}

        t0 = time.perf_counter()
        from t_digest_spark.operators.curation import strip_boilerplate
        aug = docs.select(
            "doc_id",
            F.concat(F.col("text"),
                     F.lit("\nSubscribe to our newsletter")).alias("text"))
        bp = (strip_boilerplate(aug, min_df=3).agg(
            F.sum(F.col("n_lines_in") - F.col("n_lines_kept")).alias("rm"),
            F.sum("chars_in").alias("ci"), F.sum("chars_out").alias("co"))
            .collect()[0])
        dt = time.perf_counter() - t0
        # closed-form removals: the planted footer in every doc (df = n),
        # PLUS 3 lines per repetition-plant doc — their 'looploop' lines
        # are IDENTICAL across all n/50 plant docs (df = n/50 >= 3) except
        # each plant's final line, which the per-doc email made unique
        want_rm = n + 3 * len(range(0, n, REP_EVERY))
        res["boilerplate"] = {
            "wall_s": round(dt, 2), "rows_per_s": round(n / dt),
            "lines_removed": int(bp["rm"]), "expected": want_rm,
            "chars_delta": int(bp["ci"] - bp["co"]),
            "ok": int(bp["rm"]) == want_rm}

        docs.unpersist()
        out["results"].append(res)
        print(json.dumps(res), file=sys.stderr)
    out["all_ok"] = all(r[k]["ok"] for r in out["results"]
                        for k in ("repetition", "temperature", "pii", "pack",
                                  "token_df", "boilerplate"))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
