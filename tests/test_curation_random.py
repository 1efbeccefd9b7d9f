"""Randomized triangulation battery for the curation family: a THIRD
engine (Python re/Counter/cumsum) recomputes every per-document signal on
hostile random corpora and must agree exactly with the Spark operators.

The driver gate already proves Spark == DuckDB; this battery adds
Spark == Python on randomized inputs (fixed seeds, no flaking), which
catches dialect assumptions all three engines would have to share to go
unnoticed. Patterns compile with re.ASCII so Python's \\d/\\w match the
Java/RE2 ASCII semantics the operators are specified against.

Corpus shapes mixed in: empty/whitespace-only/None text, CJK + combining
marks + astral plane, vertical tabs inside and between tokens, newline
runs, massive token repeats, emails/IPs at string edges, digit-heavy
near-IP strings, and multi-line duplicate blocks.
"""

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F

from t_digest_spark.operators.curation import (EMAIL_RE, IPV4_RE,
                                               pack_chunks, pii_scrub,
                                               repetition_signals,
                                               token_df_signals)
from t_digest_spark.operators.text import WS_CLASS

WS_RUN = re.compile(WS_CLASS + "+")
EMAIL = re.compile(EMAIL_RE, re.ASCII)
IPV4 = re.compile(IPV4_RE, re.ASCII)

FRAGMENTS = [
    "", " ", "\t", "\x0b", "\n", "\n\n", "a", "the the the", "K" * 500,
    "café", "中文 文档", "é", "\U0001F600", "a@b.co", "x@y.c",
    "1.2.3.4", "999.999.999.999", "1.2.3.4.5", "mail me@sub.dom.org now",
    "dup line\ndup line", "tok " * 30, "9.9.9.9@host.com", " lead",
    "trail ", "mixed\x0btab", "10.0.0.1\n10.0.0.1",
]


def _corpus(seed: int, n: int = 40):
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 8))
        parts = [FRAGMENTS[int(j)] for j in
                 rng.integers(0, len(FRAGMENTS), k)]
        texts.append(None if k == 0 and rng.random() < 0.3
                     else " ".join(parts))
    return texts


def _tokens_py(text):
    if text is None:
        return []
    return [t for t in WS_RUN.split(text.strip()) if t != ""]


@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("curation-random", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6, 7, 8])
def test_repetition_matches_python(spark, seed):
    texts = _corpus(seed)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = {r["doc_id"]: r for r in
           repetition_signals(df, max_chars=None).collect()}
    for i, tx in enumerate(texts):
        lines = (tx or "").split("\n")
        toks = _tokens_py(tx)
        c = Counter(toks)
        assert got[i]["n_lines"] == len(lines), (seed, i, tx)
        assert got[i]["n_dup_lines"] == len(lines) - len(set(lines))
        assert got[i]["n_tokens"] == len(toks), (seed, i, tx)
        assert got[i]["max_token"] == (max(c.values()) if c else 0), \
            (seed, i, tx)


@pytest.mark.parametrize("seed", [11, 12, 13, 14, 15, 16])
def test_pii_matches_python(spark, seed):
    texts = _corpus(seed)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    for i, tx in enumerate(texts):
        t = tx or ""
        scrub = IPV4.sub("<IP>", EMAIL.sub("<EMAIL>", t))
        assert got[i]["n_emails"] == len(EMAIL.findall(t)), (seed, i, tx)
        assert got[i]["n_ipv4"] == len(IPV4.findall(t)), (seed, i, tx)
        assert got[i]["scrubbed_text"] == scrub, (seed, i, tx)


@pytest.mark.parametrize("seed", [21, 22, 23, 24])
def test_token_df_matches_python(spark, seed):
    texts = _corpus(seed)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = {r["doc_id"]: r for r in
           token_df_signals(df, max_chars=None).collect()}
    per_doc = [Counter(_tokens_py(tx)) for tx in texts]
    df_docs = Counter()
    for c in per_doc:
        df_docs.update(set(c))
    for i, c in enumerate(per_doc):
        assert got[i]["n_tokens"] == sum(c.values())
        assert got[i]["sum_tok_df"] == sum(
            cnt * df_docs[t] for t, cnt in c.items())
        assert got[i]["n_hapax"] == sum(
            cnt for t, cnt in c.items() if df_docs[t] == 1)


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_pack_matches_python(spark, seed):
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, 900, size=200)
    toks[rng.integers(0, 200, 10)] = 0
    pdf = pd.DataFrame({"doc_id": np.arange(200), "t": toks})
    out = (pack_chunks(spark.createDataFrame(pdf), "t", "doc_id",
                       budget=257, num_chunks=16)
           .orderBy("doc_id").toPandas())
    before = 0
    for i, t in enumerate(toks):
        t = int(t)
        first = before // 257
        span = 0 if t == 0 else (before + t - 1) // 257 - first + 1
        assert out["first_chunk"].iloc[i] == first
        assert out["chunks_spanned"].iloc[i] == span
        before += t


@pytest.mark.parametrize("seed", [41, 42])
def test_temperature_sample_matches_python_md5(spark, seed):
    """The full keep rule — quantized weights, probability arithmetic, md5
    hex threshold — recomputed in pure Python must select the identical
    row set (the determinism the DuckDB oracle also replays)."""
    import hashlib

    from t_digest_spark.operators.curation import temperature_sample

    rng = np.random.default_rng(seed)
    n = 300
    langs = [None if rng.random() < 0.05
             else ("en", "de", "sw")[int(rng.integers(0, 3))]
             for _ in range(n)]
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(n), "text": ["x"] * n, "lang": langs}))
    frac = 0.37
    got = sorted(r["doc_id"] for r in
                 temperature_sample(df, "lang", "doc_id", frac).collect())

    counts = Counter(langs)
    wq = {g: math.floor(math.sqrt(float(c)) * 1e9)
          for g, c in counts.items()}
    swq = sum(wq.values())
    p = {g: min(1.0, frac * float(n) * float(wq[g]) / (float(swq) * float(c)))
         for g, c in counts.items()}
    want = []
    for i, g in enumerate(langs):
        thr = format(math.floor(p[g] * float(1 << 60)), "x").rjust(15, "0")
        h = hashlib.md5(f"k:{i}".encode()).hexdigest()[:15]
        if p[g] >= 1.0 or h < thr:
            want.append(i)
    assert got == want


@pytest.mark.parametrize("seed", [51, 52, 53])
def test_strip_boilerplate_matches_python(spark, seed):
    from t_digest_spark.operators.curation import strip_boilerplate
    texts = _corpus(seed)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))
    got = {r["doc_id"]: r for r in
           strip_boilerplate(df, min_df=2).collect()}
    ldf = Counter()
    for tx in texts:
        ldf.update(set((tx or "").split("\n")))
    for i, tx in enumerate(texts):
        lines = (tx or "").split("\n")
        kept = [l for l in lines if ldf[l] < 2]
        assert got[i]["clean_text"] == "\n".join(kept), (seed, i, tx)
        assert got[i]["n_lines_in"] == len(lines)
        assert got[i]["n_lines_kept"] == len(kept)
