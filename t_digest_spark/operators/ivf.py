"""IVF (inverted-file) approximate nearest-neighbor search.

The second scale path for embedding similarity next to sign-LSH
(similarity.py): a coarse quantizer partitions the corpus into k cells;
queries probe only the ``nprobe`` nearest cells, so the exact re-rank
touches ~nprobe/k of the corpus instead of all of it.

Spark-first layout:
  * **Train**: deterministic seed centroids (hash-ranked sample) refined by
    Lloyd iterations executed as DataFrame ops — assignment is one
    vectorized Arrow pass (argmax of X @ C.T against the broadcast centroid
    matrix), the update is a plain groupBy-mean over component arrays
    (posexplode + avg, pure JVM). No MLlib dependency, no driver-side data
    loops; only the k x dim centroid matrix ever sits on the driver.
  * **Index**: one ``cell`` column per corpus row — at warehouse scale this
    is a write-once partition/bucket column, so probe queries prune cells
    at the scan (partition pruning does the "inverted file" part).
  * **Query**: each query probes its ``nprobe`` nearest centroids; the
    candidate join is keyed on ``cell`` (bucketed, never all-pairs) and the
    exact cosine re-rank stays JVM-side (similarity.cosine_pair_col —
    zip_with fold with corpus-row-precomputed norms; beats the Arrow
    einsum 3x at pair scale, measurement in its docstring).

Determinism: seeds are hash-ranked, Lloyd iterations are fixed-count, and
argmax ties break on the lowest centroid id — same data, same index.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from t_digest_spark.operators.similarity import (cosine_pair_col, norm_col,
                                                 well_formed_col)


def _assign_udf(centroids: np.ndarray):
    """Vectorized cell assignment: argmax cosine against the (broadcast)
    centroid matrix; ties -> lowest cell id (np.argmax contract)."""
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64, copy=False)
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (X / norms) @ cn.T
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))
    return _assign


def _topn_cells_udf(centroids: np.ndarray, nprobe: int):
    """The nprobe nearest centroid ids per query vector (ascending-id
    tiebreak via stable argsort on (-sim, id))."""
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf("array<int>")
    def _cells(vecs: pd.Series) -> pd.Series:
        X = np.stack(vecs.to_numpy()).astype(np.float64, copy=False)
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (X / norms) @ cn.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(np.int32) for row in order])
    return _cells


def ivf_train(df: DataFrame, k: int, dim: int, vec_col: str = "embedding",
              id_col: str = "vec_id", iters: int = 2,
              sample_mod: Optional[int] = None,
              train_target: int = 65536) -> np.ndarray:
    """Train the coarse quantizer; returns the (k, dim) centroid matrix.

    Seeds = the k corpus vectors with the smallest xxhash64(id) (a
    deterministic uniform sample — an orderBy+limit over ids only, the
    vectors rejoin at k-row scale). Each Lloyd iteration is one assignment
    pass + one groupBy-mean; empty cells keep their previous centroid.

    ``sample_mod=None`` (default) auto-sizes a deterministic hash sample so
    Lloyd touches ~``train_target`` vectors regardless of corpus size —
    full-corpus k-means at 100x scale would dominate the whole pipeline for
    no recall gain. Pass ``sample_mod=1`` to force full-corpus training.
    """
    base = df.select(F.col(id_col).alias("__id"),
                     F.transform(F.col(vec_col), lambda x: x.cast("double"))
                     .alias("__v"))
    # corrupt vectors (wrong dim, NULL/NaN/inf components) out of the
    # training sample: one NaN seed poisons its centroid forever, and a
    # ragged row crashes the np.stack in the assignment kernel
    base = base.where(well_formed_col(F.col("__v"), dim))
    if sample_mod is None:
        n = df.count()          # one cheap metadata-ish job, same as lsh_topk
        sample_mod = max(1, n // max(train_target, 16 * k))
    if sample_mod > 1:
        base = base.where(F.pmod(F.xxhash64("__id"), sample_mod) == 0)
    seed_ids = (base.select("__id", F.xxhash64("__id").alias("__h"))
                .orderBy("__h").limit(k).select("__id"))
    seeds = (base.join(F.broadcast(seed_ids), "__id")
             .select("__v").toPandas()["__v"])
    if len(seeds) == 0:
        # empty corpus: a 0-centroid model (ivf_index/ivf_topk short-
        # circuit to empty results) — np.stack would crash on no arrays
        return np.zeros((0, dim), dtype=np.float64)
    centroids = np.stack(seeds.to_numpy()).astype(np.float64)[:k]
    for _ in range(iters):
        assigned = base.select(
            _assign_udf(centroids)("__v").alias("cell"), "__v")
        comp = assigned.select(
            "cell", F.posexplode("__v").alias("i", "val"))
        means = (comp.groupBy("cell", "i").agg(F.avg("val").alias("m"))
                 .groupBy("cell")
                 .agg(F.array_sort(F.collect_list(F.struct("i", "m")))
                      .alias("pairs"))
                 .select("cell", F.transform("pairs", lambda p: p["m"])
                         .alias("centroid")))
        new = centroids.copy()
        for row in means.collect():            # k rows, driver-side is fine
            new[row.cell] = np.asarray(row.centroid, dtype=np.float64)
        centroids = new
    return centroids


def ivf_index(df: DataFrame, centroids: np.ndarray,
              vec_col: str = "embedding") -> DataFrame:
    """Attach the ``cell`` column (at scale: write partitioned/bucketed by
    it so probes prune at the scan). Corrupt vectors (wrong dim,
    NULL/NaN/inf components) are excluded — they can neither be assigned
    a cell (a ragged row crashes the vectorized kernel, a NaN one argmaxes
    arbitrarily) nor be ranked by any probe."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dim = centroids.shape[1] if len(centroids) else 0
    return (df.where(well_formed_col(v, dim))
            .withColumn("cell", _assign_udf(centroids)(v)))


def ivf_topk(df: DataFrame, centroids: np.ndarray, k: int = 5,
             nprobe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding",
             queries: Optional[DataFrame] = None,
             observation=None) -> DataFrame:
    """Approximate top-k neighbors for every query (default: all-pairs over
    ``df``): candidates are corpus rows in the query's nprobe nearest
    cells, re-ranked by exact vectorized cosine. Candidate volume is
    observable (``n_candidate_pairs``) — no silent caps."""
    if len(centroids) == 0:
        # 0-centroid model (trained on an empty corpus): no neighbors
        return df.sparkSession.createDataFrame(
            [], "query_id long, corpus_id long, rank long, cosine double")
    # Candidate id-pairs stay NARROW through the cell join (same pattern as
    # lsh_topk, similarity.py) — shipping both vectors through the
    # pair-scale shuffle would move 2*dim doubles per candidate. Vectors
    # rejoin at corpus-row scale after the join. No dedupe needed: each
    # corpus row lives in exactly one cell, so a (query, corpus) pair can
    # appear at most once across the nprobe probes.
    corpus = ivf_index(df, centroids, vec_col).select(
        F.col(id_col).alias("corpus_id"), "cell")
    qsrc = queries if queries is not None else df
    qv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # query side shares the index's corrupt-vector exclusion (the probe
    # kernel np.stacks query vectors; a ragged/NaN query has no cells)
    qsrc = qsrc.where(well_formed_col(qv, centroids.shape[1]))
    probes = qsrc.select(
        F.col(id_col).alias("query_id"),
        F.explode(_topn_cells_udf(centroids, nprobe)(qv)).alias("cell"))
    cand = (probes.join(corpus, "cell")
            .where(F.col("query_id") != F.col("corpus_id"))
            .select("query_id", "corpus_id")
            # Spread the pair explosion BEFORE the (broadcast-joined) einsum
            # re-rank: the cell join multiplies rows inside whatever task
            # produced the probe, so with a few input partitions the whole
            # re-rank would run in them (measured 42s single-task vs ~4s
            # spread, sf0.1 all-pairs). Hash on query_id — 16 bytes/row at
            # pair scale — ALSO pre-satisfies the top-k window's
            # partitioning, so the window's own exchange disappears. The partition
            # COUNT must be explicit: pair rows are so narrow that AQE
            # would coalesce a column-only repartition back to one
            # partition (16MB < the 64MB advisory size) and re-serialize
            # the re-rank.
            .repartition(int(df.sparkSession.conf.get(
                "spark.sql.shuffle.partitions", "200")), F.col("query_id")))
    if observation is not None:
        cand = cand.observe(observation,
                            F.count(F.lit(1)).alias("n_candidate_pairs"))
    # JVM-side cosine with norms precomputed at CORPUS-row scale: the
    # pair-scale expression is one zip_with fold + divide, no Arrow
    # boundary (measurement: similarity.cosine_pair_col docstring).
    qa = qsrc.select(F.col(id_col).alias("query_id"), qv.alias("_qv"),
                     norm_col(qv).alias("_qn"))
    cv = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ca = df.select(F.col(id_col).alias("corpus_id"), cv.alias("_cv"),
                   norm_col(cv).alias("_cn"))
    scored = (cand.join(qa, "query_id").join(ca, "corpus_id")
              .select("query_id", "corpus_id",
                      cosine_pair_col(F.col("_qv"), F.col("_cv"),
                                      F.col("_qn"), F.col("_cn"))
                      .alias("cosine")))
    from pyspark.sql.window import Window
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"),
                                               F.asc("corpus_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .where(F.col("rank") <= k)
            .select("query_id", "corpus_id", "rank", "cosine"))
