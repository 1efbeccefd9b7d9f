"""Embedding similarity search over array<float> columns.

Baseline: brute-force cosine top-k with JVM-side higher-order functions
(``zip_with`` + ``aggregate`` — whole-stage codegen, no Python). Scale path:
random-hyperplane LSH bucketing so the pair join only touches same-bucket
candidates, with exact re-ranking inside buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn("_vec", v).withColumn(
        "_norm", F.sqrt(_dot(F.col("_vec"), F.col("_vec"))))


def brute_force_topk(df: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of ``df`` rows for every query row.

    The query side is broadcast (it is the small side by construction); the
    corpus streams through a single map stage — no corpus shuffle. Ties broken
    by ascending corpus id for determinism.
    """
    corpus = with_norm(df, vec_col).select(
        F.col(id_col).alias("corpus_id"), "_vec", F.col("_norm").alias("_cnorm"))
    qs = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_vec").alias("_qvec"),
        F.col("_norm").alias("_qnorm"))
    scored = (corpus.join(F.broadcast(qs), F.col("corpus_id") != F.col("query_id"))
              .withColumn("cosine",
                          _dot(F.col("_vec"), F.col("_qvec"))
                          / (F.col("_cnorm") * F.col("_qnorm"))))
    from pyspark.sql.window import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "corpus_id", "rank", "cosine"))


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic random hyperplanes (fixed seed — reproducible bucketing)."""
    rng = np.random.default_rng(0xD16E57)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(df: DataFrame, dim: int, n_planes: int = 16,
               vec_col: str = "embedding") -> DataFrame:
    """Sign-LSH bucket id per row: bit b set iff dot(vec, plane_b) > 0.
    Pure column algebra — the planes are literals folded into the plan."""
    planes = _hyperplanes(dim, n_planes)
    bucket = F.lit(0).cast("long")
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for b in range(n_planes):
        proj = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(float(c)) for c in planes[b]]),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, val: acc + val)
        bucket = bucket + F.when(proj > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn("lsh_bucket", bucket)


def lsh_topk(df: DataFrame, k: int = 5, id_col: str = "vec_id",
             vec_col: str = "embedding", dim: int = 64,
             n_planes: int = 8) -> DataFrame:
    """Approximate all-pairs top-k: exact cosine re-rank *within* LSH buckets.
    Recall measured against brute_force_topk in tests."""
    b = lsh_bucket(with_norm(df, vec_col), dim, n_planes, vec_col).select(
        F.col(id_col), "_vec", "_norm", "lsh_bucket")
    l = b.alias("l")
    r = b.alias("r")
    scored = (l.join(r, (F.col("l.lsh_bucket") == F.col("r.lsh_bucket"))
                     & (F.col(f"l.{id_col}") != F.col(f"r.{id_col}")))
              .select(F.col(f"l.{id_col}").alias("query_id"),
                      F.col(f"r.{id_col}").alias("corpus_id"),
                      (_dot(F.col("l._vec"), F.col("r._vec"))
                       / (F.col("l._norm") * F.col("r._norm"))).alias("cosine")))
    from pyspark.sql.window import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "corpus_id", "rank", "cosine"))


def embedding_near_dups(df: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        dim: int = 64, n_planes: int = 8) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, LSH-blocked."""
    b = lsh_bucket(with_norm(df, vec_col), dim, n_planes, vec_col).select(
        F.col(id_col), "_vec", "_norm", "lsh_bucket")
    l = b.alias("l")
    r = b.alias("r")
    return (l.join(r, (F.col("l.lsh_bucket") == F.col("r.lsh_bucket"))
                   & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .withColumn("cosine", _dot(F.col("l._vec"), F.col("r._vec"))
                        / (F.col("l._norm") * F.col("r._norm")))
            .where(F.col("cosine") >= threshold)
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"), "cosine"))
