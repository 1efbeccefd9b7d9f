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
    # rank cast to long: row_number() is int32 in Spark but the oracle engine
    # emits int64 — the driver's canonical hash is dtype-sensitive.
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("query_id", "corpus_id", "rank", "cosine"))


def _hyperplanes(dim: int, n_planes: int, table: int = 0) -> np.ndarray:
    """Deterministic random hyperplanes (fixed seed per table —
    reproducible bucketing, independent tables)."""
    rng = np.random.default_rng(0xD16E57 + 0x9E37 * table)
    return rng.standard_normal((n_planes, dim))


def _bucket_expr(v, planes: np.ndarray):
    bucket = F.lit(0).cast("long")
    for b in range(planes.shape[0]):
        proj = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(float(c)) for c in planes[b]]),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, val: acc + val)
        bucket = bucket + F.when(proj > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def lsh_bucket(df: DataFrame, dim: int, n_planes: int = 16,
               vec_col: str = "embedding", n_tables: int = 1) -> DataFrame:
    """Sign-LSH bucketing: bit b set iff dot(vec, plane_b) > 0.

    Single-table sign-LSH has recall (1 - theta/pi)^n_planes per true
    neighbor — poor for moderate angles — so the scale path uses
    ``n_tables`` independent plane sets and unions their buckets (recall
    1-(1-p)^T): one row per (vector, table), pure column algebra, planes
    folded into the plan as literals.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if n_tables == 1:
        return df.withColumn("lsh_table", F.lit(0)).withColumn(
            "lsh_bucket", _bucket_expr(v, _hyperplanes(dim, n_planes, 0)))
    pairs = F.array(*[
        F.struct(F.lit(t).alias("lsh_table"),
                 _bucket_expr(v, _hyperplanes(dim, n_planes, t)).alias("lsh_bucket"))
        for t in range(n_tables)])
    return (df.withColumn("__tb__", F.explode(pairs))
            .withColumn("lsh_table", F.col("__tb__.lsh_table"))
            .withColumn("lsh_bucket", F.col("__tb__.lsh_bucket"))
            .drop("__tb__"))


def lsh_topk(df: DataFrame, k: int = 5, id_col: str = "vec_id",
             vec_col: str = "embedding", dim: int = 64,
             n_planes: int = 8, n_tables: int = 4) -> DataFrame:
    """Approximate all-pairs top-k: exact cosine re-rank *within* the union
    of multi-table LSH buckets. Recall measured against brute_force_topk in
    tests (planted-cluster corpus)."""
    base = with_norm(df, vec_col).select(F.col(id_col), "_vec", "_norm")
    b = lsh_bucket(base, dim, n_planes, "_vec", n_tables=n_tables).select(
        F.col(id_col), "lsh_table", "lsh_bucket")
    l = b.alias("l")
    r = b.alias("r")
    # candidate id-pairs stay NARROW through the join + dedupe shuffles;
    # vectors rejoin afterwards (corpus-row scale, not pair scale)
    cand = (l.join(r, (F.col("l.lsh_table") == F.col("r.lsh_table"))
                   & (F.col("l.lsh_bucket") == F.col("r.lsh_bucket"))
                   & (F.col(f"l.{id_col}") != F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("query_id"),
                    F.col(f"r.{id_col}").alias("corpus_id"))
            .dropDuplicates(["query_id", "corpus_id"]))
    qa = base.select(F.col(id_col).alias("query_id"),
                     F.col("_vec").alias("_qv"), F.col("_norm").alias("_qn"))
    ca = base.select(F.col(id_col).alias("corpus_id"),
                     F.col("_vec").alias("_cv"), F.col("_norm").alias("_cn"))
    scored = (cand.join(qa, "query_id").join(ca, "corpus_id")
              .select("query_id", "corpus_id",
                      (_dot(F.col("_qv"), F.col("_cv"))
                       / (F.col("_qn") * F.col("_cn"))).alias("cosine")))
    from pyspark.sql.window import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("query_id", "corpus_id", "rank", "cosine"))


def embedding_near_dups(df: DataFrame, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        dim: int = 64, n_planes: int = 8,
                        n_tables: int = 4) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold, multi-table LSH-blocked."""
    base = with_norm(df, vec_col).select(F.col(id_col), "_vec", "_norm")
    b = lsh_bucket(base, dim, n_planes, "_vec", n_tables=n_tables).select(
        F.col(id_col), "lsh_table", "lsh_bucket")
    l = b.alias("l")
    r = b.alias("r")
    # narrow id-pair dedupe first (a pair colliding in several tables would
    # otherwise be scored n_tables times), vectors rejoin at pair scale
    cand = (l.join(r, (F.col("l.lsh_table") == F.col("r.lsh_table"))
                   & (F.col("l.lsh_bucket") == F.col("r.lsh_bucket"))
                   & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")))
            .select(F.col(f"l.{id_col}").alias("id_a"),
                    F.col(f"r.{id_col}").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"]))
    aa = base.select(F.col(id_col).alias("id_a"),
                     F.col("_vec").alias("_va"), F.col("_norm").alias("_na"))
    bb = base.select(F.col(id_col).alias("id_b"),
                     F.col("_vec").alias("_vb"), F.col("_norm").alias("_nb"))
    return (cand.join(aa, "id_a").join(bb, "id_b")
            .select("id_a", "id_b",
                    (_dot(F.col("_va"), F.col("_vb"))
                     / (F.col("_na") * F.col("_nb"))).alias("cosine"))
            .where(F.col("cosine") >= threshold))
