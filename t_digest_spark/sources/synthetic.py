"""Deterministic synthetic source-code table (the north-rule input shape).

Schema per BASELINE.json input_hint / FIXTURES.md §1:
    (repo string, path string, commit string, lang string, content string)

Every column is a pure function of the row id, so the table is identical no
matter how Spark partitions the generation — that's what makes the per-row
sha256(content) invariant (BASELINE.json) testable, and what lets the same
generator scale from 10k rows (pytest) to millions (bench) without a driver-
side materialization.

Distribution features for the sketch workload:
  * repo is Zipf-skewed (~30% of rows land in 2 hot repos) to exercise the
    skew story of the aggregation layer;
  * length(content) follows a lognormal-ish law per lang (known ballpark
    quantiles, heavy right tail like real file sizes).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SCHEMA = "id long, repo string, path string, commit string, lang string, content string"

_LANGS = np.array(["py", "java", "c", "go", "js", "md"])
_LANG_WEIGHTS = np.array([0.40, 0.20, 0.12, 0.10, 0.10, 0.08])
_EXT = {"py": "py", "java": "java", "c": "c", "go": "go", "js": "js", "md": "md"}
_TOKENS = ("def foo(x):\n    return x + 1\n", "// TODO fix\n", "int main() {\n",
           "for i in range(10):\n", "console.log(x);\n", "# heading\n",
           "var x = 42;\n", "if err != nil {\n    return err\n}\n")
_CORPUS = "".join(_TOKENS) * 64  # 64*173 chars of fill material


def _row_rng_u01(ids: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic uniform(0,1) per row id, independent per stream.

    splitmix64-style integer hash — stable across numpy versions and
    partitionings (unlike stateful RNG streams)."""
    step = np.uint64((stream * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        z = ids.astype(np.uint64) + step
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def generate_pdf(ids: np.ndarray) -> pd.DataFrame:
    """Vectorized generation of the table slice for the given row ids."""
    ids = np.asarray(ids, dtype=np.int64)
    n = ids.size
    # Zipf-skewed repos: 30% of rows in org0/repo0 or org1/repo1
    u_repo = _row_rng_u01(ids, 1)
    hot = u_repo < 0.30
    hot_idx = (u_repo < 0.15).astype(np.int64)
    cold_idx = (ids % 7).astype(np.int64), (ids % 97).astype(np.int64)
    repo = np.where(
        hot,
        np.char.add("org", np.char.add(hot_idx.astype(str),
                    np.char.add("/repo", hot_idx.astype(str)))),
        np.char.add(np.char.add("org", cold_idx[0].astype(str)),
                    np.char.add("/repo", cold_idx[1].astype(str))))
    # lang: categorical with skewed weights
    u_lang = _row_rng_u01(ids, 2)
    lang = _LANGS[np.searchsorted(np.cumsum(_LANG_WEIGHTS), u_lang)]
    # content length: lognormal-ish per row, lang-shifted, heavy tail
    u_len = _row_rng_u01(ids, 3)
    u_len2 = _row_rng_u01(ids, 4)
    normal = np.sqrt(-2 * np.log(np.clip(u_len, 1e-12, 1))) * np.cos(2 * np.pi * u_len2)
    lang_shift = np.array([6.0, 6.4, 6.2, 6.1, 5.8, 5.2])[
        np.searchsorted(np.cumsum(_LANG_WEIGHTS), u_lang)]
    length = np.clip(np.exp(lang_shift + 0.9 * normal), 8, 200_000).astype(np.int64)

    path = np.char.add(np.char.add("src/f", (ids % 100_000).astype(str)),
                       np.char.add(".", np.vectorize(_EXT.get)(lang)))
    # content: unique per-row header + deterministic fill cut to length
    headers = [f"// id={i} r={r} l={lg}\n" for i, r, lg in zip(ids, repo, lang)]
    corpus_len = len(_CORPUS)
    contents = []
    for h, L in zip(headers, length):
        body_len = max(int(L) - len(h), 0)
        reps = body_len // corpus_len + 1
        contents.append(h + (_CORPUS * reps)[:body_len])
    commit = [hashlib.sha256(f"{r}/{p}".encode()).hexdigest()[:40]
              for r, p in zip(repo, path)]
    return pd.DataFrame({
        "id": ids, "repo": repo, "path": path, "commit": commit,
        "lang": lang, "content": contents,
    })


def source_code_table(spark: SparkSession, n_rows: int,
                      partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation: spark.range -> mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield generate_pdf(pdf["id"].to_numpy())

    rng = spark.range(0, n_rows, numPartitions=partitions)
    return rng.mapInPandas(gen, SCHEMA)
