"""Curation operators (repetition / temperature mix / PII / packing):
constructed inputs with Python oracles, plus the determinism and
work-bound properties the entry-gate oracles can't express."""

import math

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F

from t_digest_spark.operators.curation import (keep_by_probability,
                                               pack_chunks, pack_greedy,
                                               pii_scrub,
                                               repetition_signals,
                                               temperature_probabilities,
                                               temperature_sample)


@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("curation-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _docs(spark, texts, langs=None):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts,
        "lang": langs or ["en"] * len(texts)}))


# ------------------------------------------------------------- repetition

def test_repetition_counts_exact(spark):
    df = _docs(spark, [
        "a b a a c",            # 5 tokens, max 'a' x3, 1 line
        "x\ny\nx\nx",           # 4 lines, 2 dup, tokens x:3 y:1
        "",                     # empty: 1 line (['']), 0 tokens
        "   \t ",               # whitespace-only: 0 tokens
        None,                   # NULL text behaves like empty
    ])
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert (out[0]["n_lines"], out[0]["n_dup_lines"],
            out[0]["max_token"], out[0]["n_tokens"]) == (1, 0, 3, 5)
    assert (out[1]["n_lines"], out[1]["n_dup_lines"],
            out[1]["max_token"], out[1]["n_tokens"]) == (4, 2, 3, 4)
    for d in (2, 3, 4):
        assert out[d]["max_token"] == 0 and out[d]["n_tokens"] == 0


def test_repetition_prefix_cap_bounds_work(spark):
    # two docs identical in the first 50 chars diverge beyond the cap:
    # capped signals collapse, full-length signals differ
    a = ("tok " * 25) + "unique_a " * 10
    b = ("tok " * 25) + "other_b " * 10
    df = _docs(spark, [a, b])
    capped = repetition_signals(df, max_chars=50).collect()
    assert capped[0]["n_tokens"] == capped[1]["n_tokens"]
    full = repetition_signals(df, max_chars=None).collect()
    assert full[0]["n_tokens"] == full[1]["n_tokens"] == 35


def test_repetition_exotic_whitespace_ascii_class(spark):
    # \x0B (vertical tab) IS a separator — WS_CLASS spells out Java's \s
    # explicitly so the RE2-based oracle scans the same language (the
    # Java-vs-RE2 seam the ninth adversarial axis caught)
    out = repetition_signals(_docs(spark, ["a\x0bb c"])).collect()[0]
    assert out["n_tokens"] == 3 and out["max_token"] == 1


# -------------------------------------------------------- temperature mix

def test_temperature_probabilities_math(spark):
    df = _docs(spark, ["x"] * 90 + ["y"] * 10,
               langs=["en"] * 90 + ["de"] * 10)
    rows = {r["lang"]: r for r in
            temperature_probabilities(df, "lang", 0.5, tau=0.5).collect()}
    wq = {c: math.floor(math.sqrt(float(c)) * 1e9) for c in (90, 10)}
    swq = wq[90] + wq[10]
    assert rows["en"]["p_keep"] == 0.5 * 100.0 * wq[90] / (swq * 90.0)
    assert rows["de"]["p_keep"] == min(1.0, 0.5 * 100.0 * wq[10] / (swq * 10.0))
    # tau=0.5 upsamples the minority relative to its natural share
    assert rows["de"]["p_keep"] > rows["en"]["p_keep"]


def test_temperature_sample_deterministic_and_consistent(spark):
    df = _docs(spark, [f"doc {i}" for i in range(200)],
               langs=["en"] * 180 + ["de"] * 20)
    s1 = sorted(r["doc_id"] for r in
                temperature_sample(df, "lang", "doc_id", 0.4).collect())
    s2 = sorted(r["doc_id"] for r in
                temperature_sample(df, "lang", "doc_id", 0.4).collect())
    assert s1 == s2 and 0 < len(s1) < 200
    # monotone nesting: raising the target only adds rows
    s3 = sorted(r["doc_id"] for r in
                temperature_sample(df, "lang", "doc_id", 0.8).collect())
    assert set(s1) <= set(s3)


def test_temperature_sample_null_group_and_p1(spark):
    df = _docs(spark, ["a", "b", "c", "d"], langs=["en", "en", "en", None])
    # tau=1 keeps the natural mix, so target 1.0 clamps every p to 1:
    # everything kept, including the NULL-lang group
    got = sorted(r["doc_id"] for r in
                 temperature_sample(df, "lang", "doc_id", 1.0, tau=1.0)
                 .collect())
    assert got == [0, 1, 2, 3]


def test_keep_probability_rate(spark):
    n = 4000
    df = spark.range(n).select(F.col("id").alias("k"))
    kept = df.where(keep_by_probability(F.lit(0.3), "k")).count()
    assert abs(kept / n - 0.3) < 0.03   # md5 uniformity, fixed draw


# ------------------------------------------------------------------- PII

def test_pii_scrub_counts_and_text(spark):
    df = _docs(spark, [
        "mail bob@x.org or alice@y.co.uk now",
        "server 10.0.0.1 and 192.168.1.255 up",
        "both a@b.io at 8.8.8.8",
        "clean text",
        None,
    ])
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[0]["n_emails"] == 2 and out[0]["n_ipv4"] == 0
    assert out[0]["scrubbed_text"] == "mail <EMAIL> or <EMAIL> now"
    assert out[1]["n_ipv4"] == 2 and "<IP>" in out[1]["scrubbed_text"]
    assert out[2]["n_emails"] == 1 and out[2]["n_ipv4"] == 1
    assert out[3]["scrubbed_text"] == "clean text"
    assert out[4]["n_chars_in"] == 0
    # char delta is consistent
    for r in out.values():
        assert r["n_chars_out"] == len(r["scrubbed_text"])


# --------------------------------------------------------------- packing

def test_pack_chunks_matches_python_cumsum(spark):
    rng = np.random.default_rng(7)
    toks = rng.integers(0, 300, size=500)
    toks[17] = 0                       # empty doc spans 0 chunks
    pdf = pd.DataFrame({"doc_id": np.arange(500), "t": toks})
    out = (pack_chunks(spark.createDataFrame(pdf), "t", "doc_id", budget=512)
           .orderBy("doc_id").toPandas())
    before = np.concatenate([[0], np.cumsum(toks)[:-1]])
    first = before // 512
    last = (before + np.maximum(toks, 1) - 1) // 512
    span = np.where(toks > 0, last - first + 1, 0)
    assert (out["first_chunk"].to_numpy() == first).all()
    assert (out["chunks_spanned"].to_numpy() == span).all()
    # every chunk except the last is exactly full by construction
    assert int(out["chunks_spanned"].sum()) >= math.ceil(toks.sum() / 512)


def test_pack_greedy_first_fit_invariants(spark):
    rng = np.random.default_rng(11)
    toks = rng.integers(1, 400, size=300)
    toks[5] = 900                      # oversized doc gets a bin alone
    pdf = pd.DataFrame({"doc_id": np.arange(300), "t": toks})
    out = (pack_greedy(spark.createDataFrame(pdf), "t", "doc_id", budget=512)
           .orderBy("doc_id").toPandas())
    # bins are contiguous runs in doc order; fills never exceed budget
    # except for single oversized docs
    for bin_id, grp in out.groupby("bin_id"):
        ids = grp["doc_id"].to_numpy()
        assert (np.diff(ids) == 1).all()
        if len(grp) > 1:
            assert grp["t"].sum() <= 512
    # greedy: a doc only starts a new bin because it did not fit
    fill = 0
    prev_bin = None
    for r in out.itertuples():
        if prev_bin is not None and r.bin_id != prev_bin:
            assert fill + r.t > 512 or fill >= 512
            fill = 0
        fill += r.t
        prev_bin = r.bin_id


def test_pack_greedy_grouped_unique_bins(spark):
    pdf = pd.DataFrame({"doc_id": np.arange(40), "t": [100] * 40,
                        "g": (["a"] * 20 + ["b"] * 20)})
    out = pack_greedy(spark.createDataFrame(pdf), "t", "doc_id",
                      budget=512, group_col="g").toPandas()
    bins_a = set(out[out["g"] == "a"]["bin_id"])
    bins_b = set(out[out["g"] == "b"]["bin_id"])
    assert not bins_a & bins_b         # salted id spaces never collide
    assert len(bins_a) == 4            # 20 docs x 100 tok / 512 budget


# ------------------------------------------------------- corpus statistics

def test_token_df_signals_hand_oracle(spark):
    from t_digest_spark.operators.curation import token_df_signals
    df = _docs(spark, [
        "a b a",        # doc 0
        "a c",          # doc 1
        "",             # doc 2: zero tokens
    ])
    # df(a)=2 docs, df(b)=1, df(c)=1
    out = {r["doc_id"]: r for r in token_df_signals(df).collect()}
    assert (out[0]["n_tokens"], out[0]["sum_tok_df"], out[0]["n_hapax"]) \
        == (3, 2 * 2 + 1, 1)          # a,a (df 2) + b (df 1, hapax)
    assert (out[1]["n_tokens"], out[1]["sum_tok_df"], out[1]["n_hapax"]) \
        == (2, 2 + 1, 1)
    assert (out[2]["n_tokens"], out[2]["sum_tok_df"], out[2]["n_hapax"]) \
        == (0, 0, 0)


def test_token_df_null_keep_col_survives(spark):
    # a NULL lang doc must keep its token counts (join only on doc_id)
    from t_digest_spark.operators.curation import token_df_signals
    df = _docs(spark, ["x y", "x"], langs=["en", None])
    out = {r["doc_id"]: r for r in
           token_df_signals(df, keep_cols=("lang",)).collect()}
    assert out[1]["lang"] is None and out[1]["n_tokens"] == 1
    assert out[1]["sum_tok_df"] == 2      # x appears in both docs


# --------------------------------------------------- streaming composition

def test_pii_scrub_composes_with_streaming(spark):
    """The stateless curation projections must run unchanged as Structured
    Streaming transformations (pure per-row codegen: no state, no
    aggregation) — a production scrubber sits on the ingest stream."""
    import os
    import tempfile

    work = tempfile.mkdtemp(prefix="curation_stream_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)
    pdf = pd.DataFrame({
        "doc_id": range(4),
        "text": ["mail a@b.io", "ip 10.0.0.1", "clean", None],
    })
    spark.createDataFrame(pdf).coalesce(1).write.parquet(
        os.path.join(in_dir, "b1"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(os.path.join(in_dir, "*")))
    assert stream.isStreaming
    scrubbed = pii_scrub(stream)
    assert scrubbed.isStreaming        # projection stays streaming-valid
    q = (scrubbed.writeStream.format("memory").queryName("pii_stream")
         .outputMode("append").option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
        got = {r["doc_id"]: r for r in
               spark.sql("select * from pii_stream").collect()}
        assert got[0]["n_emails"] == 1 and "<EMAIL>" in got[0]["scrubbed_text"]
        assert got[1]["n_ipv4"] == 1 and got[3]["n_chars_in"] == 0
    finally:
        q.stop()


def test_pack_chunks_per_group_restart(spark):
    # per-shard packing: chunk indices restart per group, NULL group kept
    pdf = pd.DataFrame({
        "doc_id": np.arange(8),
        "g": ["a"] * 3 + ["b"] * 3 + [None] * 2,
        "t": [300] * 8,
    })
    out = (pack_chunks(spark.createDataFrame(pdf), "t", "doc_id",
                       budget=512, part_cols=("g",))
           .orderBy("doc_id").toPandas())
    assert len(out) == 8                      # NULL group rows survive
    for g in ("a", "b"):
        grp = out[out["g"] == g]
        assert grp["first_chunk"].tolist() == [0, 0, 1]   # restarts at 0
    nul = out[out["g"].isna()]
    assert nul["first_chunk"].tolist() == [0, 0]


# --------------------------------------------------------- boilerplate

def test_strip_boilerplate_hand_oracle(spark):
    from t_digest_spark.operators.curation import strip_boilerplate
    df = _docs(spark, [
        "keep me\nFOOTER\nalso keep",
        "other text\nFOOTER",
        "third\nFOOTER\nmore",
        "unique only",
        None,
    ])
    out = {r["doc_id"]: r for r in
           strip_boilerplate(df, min_df=3).collect()}
    # FOOTER appears in 3 docs -> removed; everything else kept in order
    assert out[0]["clean_text"] == "keep me\nalso keep"
    assert out[1]["clean_text"] == "other text"
    assert out[2]["clean_text"] == "third\nmore"
    assert out[3]["clean_text"] == "unique only"
    assert out[0]["n_lines_in"] == 3 and out[0]["n_lines_kept"] == 2
    # NULL text -> one empty line, df(' ') of '' is < 3 here -> kept
    assert out[4]["clean_text"] == "" and out[4]["n_lines_in"] == 1
    for r in out.values():
        assert r["chars_out"] == len(r["clean_text"])


def test_strip_boilerplate_all_lines_removed(spark):
    from t_digest_spark.operators.curation import strip_boilerplate
    df = _docs(spark, ["SPAM", "SPAM", "SPAM"])
    out = strip_boilerplate(df, min_df=2).collect()
    assert all(r["clean_text"] == "" and r["n_lines_kept"] == 0
               for r in out)
    assert len(out) == 3                     # rows survive as empty docs


def test_strip_boilerplate_df_counts_docs_not_occurrences(spark):
    from t_digest_spark.operators.curation import strip_boilerplate
    # one doc repeating a line 5 times: document frequency is 1, kept
    df = _docs(spark, ["x\nx\nx\nx\nx", "y"])
    out = {r["doc_id"]: r for r in
           strip_boilerplate(df, min_df=2).collect()}
    assert out[0]["n_lines_kept"] == 5
