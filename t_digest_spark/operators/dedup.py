"""Deduplication operators for large-scale training-data pipelines.

All Spark-first: exact dedup and n-gram Jaccard are pure DataFrame algebra
(Catalyst gets pushdown/codegen); MinHash-LSH and SimHash use built-in
``xxhash64`` (JVM-side) for hashing with only the signature fold in a
vectorized pandas UDF. No per-row Python.

Scale notes:
  * exact dedup: one shuffle on the content hash; survivors picked with a
    min() aggregate, not a window, so map-side partial aggregation applies.
  * minhash-LSH: cost is O(rows x shingles) map-side + a shuffle keyed on
    (band, bucket); buckets are tiny so the candidate join never explodes the
    way an all-pairs join would. This is THE 100 TB near-dup path.
  * n-gram Jaccard: exact pair scoring; the shingle join is quadratic in
    bucket size, so use it to *verify* LSH candidates, not to scan the world.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Per-document work bound for the similarity paths (shingling, MinHash,
# SimHash): signatures are computed over the first CONTENT_PREFIX_CAP
# characters. A production corpus carries pathological rows — multi-MB
# minified bundles, concatenated logs — and without a bound ONE such row
# owns its task: char_shingles materializes a length-sized array before
# exploding, and the MinHash kernel's (unique-shingles x num_hashes)
# matrix grows without limit (a 50 MB random document would allocate
# tens of GB). Near-dup SIGNALS saturate long before 100k chars (this is
# the standard practice in large-scale dedup pipelines), and two
# documents identical in content cap identically, so planted-duplicate
# recall contracts are cap-invariant. Exact dedup (dedup_exact) and
# fingerprints intentionally stay FULL-content (streaming hashes are
# linear and the sha256 per-row invariant requires the whole document).
# The SQL oracles restate the cap verbatim (substr(text, 1, cap)) — the
# well_formed_col pattern; pass max_chars=None to disable.
CONTENT_PREFIX_CAP = 100_000


def _cap_text(df: DataFrame, text_col: str, max_chars: Optional[int]) -> DataFrame:
    return df if max_chars is None else df.withColumn(
        text_col, F.substring(F.col(text_col), 1, max_chars))


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest id per exact content (sha256) duplicate class.

    Returns (id, content_hash, dup_count) for survivors.
    """
    h = F.sha2(F.col(text_col), 256).alias("content_sha")
    return (df.select(F.col(id_col), h)
            .groupBy("content_sha")
            .agg(F.min(id_col).alias(id_col),
                 F.count(F.lit(1)).alias("dup_count")))


def char_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  n: int = 3,
                  max_chars: Optional[int] = CONTENT_PREFIX_CAP) -> DataFrame:
    """Distinct character n-grams per doc — JVM-side only (sequence + substring).
    Shingles the first ``max_chars`` characters (see CONTENT_PREFIX_CAP)."""
    df = _cap_text(df, text_col, max_chars)
    return (df.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length(text_col) - (n - 1), F.lit(1))),
                lambda i: F.col(text_col).substr(i, F.lit(n)),
            )).alias("shingle"))
            .where(F.length("shingle") == n)
            .distinct())


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5,
                        candidates: Optional[DataFrame] = None,
                        max_chars: Optional[int] = CONTENT_PREFIX_CAP) -> DataFrame:
    """Exact Jaccard over character n-gram sets for all pairs sharing >=1
    shingle (or only ``candidates`` (id_a, id_b) pairs when given).

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|), computed from a self-join on
    shingle — expressible in plain SQL, so it has a DuckDB oracle (which
    restates the ``max_chars`` shingle cap, see CONTENT_PREFIX_CAP).
    """
    sh = char_shingles(df, text_col, id_col, n, max_chars=max_chars)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    if candidates is not None:
        # candidate-driven order: expand each (id_a, id_b) pair by id_a's
        # shingles, then keyed lookup of id_b's shingles — cost is linear in
        # candidate-pairs x shingles-per-doc, NEVER the all-pairs shingle
        # self-join below (which would run first, then be filtered, if the
        # candidate set were joined after the aggregation).
        # dropDuplicates first: a duplicated candidate pair would otherwise
        # multiply the common-shingle count and corrupt the jaccard value
        candidates = candidates.dropDuplicates(["id_a", "id_b"])
        sa = sh.select(F.col(id_col).alias("id_a"), "shingle")
        sb = sh.select(F.col(id_col).alias("id_b"), "shingle")
        common = (candidates.join(sa, "id_a")
                  .join(sb, ["id_b", "shingle"])
                  .groupBy("id_a", "id_b")
                  .agg(F.count(F.lit(1)).alias("common")))
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        common = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                         & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
                  .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                           F.col(f"b.{id_col}").alias("id_b"))
                  .agg(F.count(F.lit(1)).alias("common")))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    out = (common.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
           .withColumn("jaccard",
                       F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")))
           .where(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard"))
    return out


def _minhash_sig_udf(num_hashes: int, n: int):
    """Vectorized minhash over character n-grams (splitmix64 per seed).

    Shape note (measured, round 2): the per-doc loop with a
    (unique-codes x num_hashes) broadcast is FASTER than a fully
    batch-flattened kernel (0.79s vs 1.64s on 5k docs / 1.5M shingles x
    128 hashes) — per-doc matrices stay cache-resident while a flat pass
    per hash function is memory-bandwidth-bound, and np.unique pays for
    its sort by shrinking the matrix (real text repeats shingles).
    Signature semantics are locked by an independent-formulation
    equivalence test.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mults = ((np.arange(1, num_hashes + 1, dtype=np.uint64)
                  * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1))
        for pdf in batches:
            sigs = []
            for text in pdf["text"]:
                b = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
                if b.size < n:
                    sigs.append(np.full(num_hashes, np.iinfo(np.int64).max, dtype=np.int64))
                    continue
                # rolling n-byte shingle codes
                code = np.zeros(b.size - n + 1, dtype=np.uint64)
                for k in range(n):
                    code = code * np.uint64(257) + b[k:b.size - n + 1 + k].astype(np.uint64)
                code = np.unique(code)
                # one splitmix-style mix per hash function: h_i(s) = mix(s * m_i)
                z = code[:, None] * mults[None, :]
                z ^= z >> np.uint64(33)
                z *= np.uint64(0xFF51AFD7ED558CCD)
                z ^= z >> np.uint64(33)
                sigs.append((z.min(axis=0) >> np.uint64(1)).astype(np.int64))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "sig": [s for s in sigs]})
    return fn


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 64,
                           bands: int = 16, n: int = 5,
                           max_chars: Optional[int] = CONTENT_PREFIX_CAP) -> DataFrame:
    """Banded MinHash-LSH: docs sharing any band bucket become candidate pairs.

    num_hashes/bands controls the similarity threshold ~ (1/bands)^(bands/num_hashes).
    Returns distinct (id_a, id_b) candidate pairs.

    Scale guidance (measured, BENCH.md §8): with FIXED band geometry the
    candidate volume grows ~ corpus x E[s^r] where r = num_hashes/bands and
    s is the background pair similarity — i.e. linearly per doc. The 1M-doc
    smoke measured 0.67 -> 6.73 candidates/doc going 100k -> 1M docs at
    r=4. For corpora beyond ~1M docs raise rows-per-band (r=6-8, e.g.
    bands=8 at num_hashes=64) to suppress the background tail; pick
    num_hashes so the match curve 1-(1-s^r)^bands stays ~1 at your
    duplicate-similarity target.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    base = _cap_text(df, text_col, max_chars).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    sigs = base.mapInPandas(_minhash_sig_udf(num_hashes, n),
                            "doc_id long, sig array<long>")
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)),
                        lambda bi: F.xxhash64(F.slice(
                            "sig", bi * rows_per_band + 1, rows_per_band)))
        ).alias("band", "bucket"))
    # Pairs WITHIN each (band, bucket) group via one groupBy, not a
    # self-join: the join form executes the whole signature pipeline (the
    # expensive MinHash map over every shingle) once PER SIDE — measured
    # as a doubled document scan in the post-AQE plan (runtime exchange
    # reuse does not kick in across the differently-aliased sides).
    # Expansion semantics, dedupe, and the memory-shape argument live in
    # the shared helper (similarity._bucket_pairs).
    from t_digest_spark.operators.similarity import _bucket_pairs
    return _bucket_pairs(banded, "doc_id", directed=False,
                         group_cols=("band", "bucket"))


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            max_chars: Optional[int] = CONTENT_PREFIX_CAP) -> DataFrame:
    """64-bit SimHash over whitespace tokens, entirely JVM-side:
    explode tokens -> xxhash64 -> per-bit majority vote. Tokens come from
    the first ``max_chars`` characters (see CONTENT_PREFIX_CAP).

    The vote runs as TWO slim aggregates over an exploded (doc, bit, ±1)
    stream instead of 63 conditional-sum columns: one wide aggregate forced
    a pathologically long whole-stage-codegen compile (VERDICT r1,
    simhash_near_dups first-run stall). Map-side combine reduces the
    exploded stream to docs x 63 partial sums before the shuffle, so the
    plan shape is still a plain two-level hash aggregate at scale.
    """
    toks = _cap_text(df, text_col, max_chars).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok")).where(F.length("tok") > 0)
    h = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    # (doc, bit, vote=±1) rows; sign bit 63 skipped as before
    bitvote = h.select("doc_id", F.expr(
        "inline(transform(sequence(0, 62), b -> named_struct("
        "'bit', b, "
        "'v', CASE WHEN (shiftright(h, b) & 1) = 1 THEN 1 ELSE -1 END)))"))
    summed = bitvote.groupBy("doc_id", "bit").agg(F.sum("v").alias("vote"))
    return (summed.groupBy("doc_id")
            .agg(F.sum(F.when(F.col("vote") > 0,
                              F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
                       .otherwise(F.lit(0).cast("long")))
                 .cast("long").alias("simhash")))


def simhash_near_dups(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", max_hamming: int = 3,
                      max_chars: Optional[int] = CONTENT_PREFIX_CAP) -> DataFrame:
    """Candidate near-dups: pairs within ``max_hamming`` bits of SimHash.
    Blocked on 16-bit chunks (a pair within hamming<=3 of 63 bits must agree
    exactly on at least one of four 16-bit blocks — pigeonhole)."""
    s = simhash(df, text_col, id_col, max_chars=max_chars)
    blocks = s.select("doc_id", "simhash", F.posexplode(F.array(*[
        (F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))).cast("int")
        for i in range(4)])).alias("blk", "blk_val"))
    l = blocks.alias("l")
    r = blocks.alias("r")
    pairs = (l.join(r, (F.col("l.blk") == F.col("r.blk"))
                    & (F.col("l.blk_val") == F.col("r.blk_val"))
                    & (F.col("l.doc_id") < F.col("r.doc_id")))
             .select(F.col("l.doc_id").alias("id_a"), F.col("r.doc_id").alias("id_b"),
                     F.col("l.simhash").alias("sh_a"), F.col("r.simhash").alias("sh_b"))
             .distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.withColumn("hamming", ham)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
