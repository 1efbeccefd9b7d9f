"""Connected components over a pair graph — the transitive-closure step a
near-dup pipeline needs between pair verification and survivor selection.

Why it exists: LSH + Jaccard verification emits *pairs* (a~b, b~c). Picking a
survivor per pair is not transitively correct — a chain a~b~c is ONE duplicate
cluster even when (a,c) never appears as a pair. The standard scale answer is
connected components over the pair graph, then one survivor per component.

Algorithm: alternating large-star / small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the MapReduce/Spark
native formulation. Each round is pure DataFrame algebra:

  large-star(u): m = min(neighbors(u) + {u}); re-point every neighbor v > u
                 at m.
  small-star(u): direct every edge from its larger endpoint u to its smaller
                 v; m = min(incoming v + {u}); re-point those v (and u) at m.

Both stars are a groupBy-min plus a co-partitioned self-join — NO
``collect_list``, so a web-scale giant component (the usual dedup pathology:
boilerplate shared by millions of files) never materializes one row per
component in an executor. Convergence is O(log n) rounds; each round ends in
``localCheckpoint`` to truncate the iterative lineage (on a cluster, set a
checkpoint dir and swap in ``checkpoint`` — same call shape).

The driver loop runs one tiny agg per round (count + xxhash64 sum) to detect
the fixed point — O(rounds) jobs, never a data-scale collect.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected, deduplicated, self-loop-free (small, big) edge list."""
    return (edges.select(F.least(src, dst).alias("src"),
                         F.greatest(src, dst).alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .distinct())


def _large_star(e: DataFrame) -> DataFrame:
    """Re-point every strictly-larger neighbor of u at min(Γ(u) ∪ {u}).

    One explicit hash partitioning on u; the groupBy-min and the join back
    both run co-partitioned on it (the identical repartition subplan is
    exchange-reused), so the whole star costs a single shuffle. Output may
    carry duplicate edges — the downstream small-star groupBy-min is
    insensitive to multiplicity and its output distinct() canonicalizes, so
    a distinct here would only add an exchange per round."""
    sym = (e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
           .unionByName(e.select(F.col("dst").alias("u"),
                                 F.col("src").alias("v")))
           .repartition("u"))
    m = (sym.groupBy("u").agg(F.min("v").alias("mv"))
         .select("u", F.least("u", "mv").alias("m")))
    return (sym.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst")))


def _small_star(e: DataFrame) -> DataFrame:
    """Direct each edge large→small; re-point the small side (and u) at the
    neighborhood min. Same one-partitioning structure as the large star;
    the closing distinct() (one exchange) canonicalizes the round's output."""
    d = (e.select(F.greatest("src", "dst").alias("u"),
                  F.least("src", "dst").alias("v"))
         .repartition("u"))
    m = d.groupBy("u").agg(F.min("v").alias("m"))
    nb = d.join(m, "u")
    out = (nb.select(F.col("v").alias("src"), F.col("m").alias("dst"))
           .unionByName(m.select(F.col("u").alias("src"),
                                 F.col("m").alias("dst"))))
    return (out.where(F.col("src") != F.col("dst")).distinct())


def _signature(e: DataFrame):
    """(row count, order-insensitive hash) — fixed-point detector.

    One tiny two-column aggregate per round; xxhash64 sum collisions across
    <100 rounds are negligible and a false 'converged' is caught by the
    star-shape property below anyway."""
    # decimal(38,0) sum: immune to ANSI-mode long overflow (Spark 4 default)
    row = e.agg(F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum(F.xxhash64("src", "dst")
                                 .cast("decimal(38,0)")),
                           F.lit(0).cast("decimal(38,0)")).alias("h")
                ).collect()[0]
    return row["n"], row["h"]


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst",
                         vertices: Optional[DataFrame] = None,
                         id_col: str = "id",
                         max_iter: int = 30) -> DataFrame:
    """Label every vertex with the minimum vertex id of its component.

    Parameters
    ----------
    edges : DataFrame with two vertex-id columns (any orderable type on which
        least/greatest is the desired total order — long ids recommended).
    vertices : optional DataFrame of all vertex ids (``id_col``); isolated
        vertices (no edges) only appear in the output if provided here.
    max_iter : safety bound; the algorithm converges in O(log n) rounds
        (a 2^30-vertex path graph needs ~30).

    Returns (id, component) — one row per vertex, component = min id.
    """
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    sig = _signature(e)
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig2 = _signature(e2)
        e = e2
        if sig2 == sig:
            break
        sig = sig2
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds")
    # At the fixed point every edge points member -> component root. A root
    # never appears as src (it is the min of its component), so the label
    # table is edges ∪ self-labels for roots.
    members = e.select(F.col("src").alias(id_col),
                       F.col("dst").alias("component"))
    roots = e.select(F.col("dst").alias(id_col)).distinct() \
             .withColumn("component", F.col(id_col))
    labels = members.unionByName(roots)
    if vertices is not None:
        vs = vertices.select(F.col(id_col)).distinct()
        labels = (vs.join(labels, id_col, "left")
                  .select(id_col,
                          F.coalesce("component", F.col(id_col))
                          .alias("component")))
    return labels


def dedup_survivors(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                    vertices: Optional[DataFrame] = None,
                    id_col: str = "doc_id",
                    max_iter: int = 30) -> DataFrame:
    """Transitive survivor selection over verified duplicate pairs.

    Returns (doc_id, component, is_survivor): every doc in a duplicate
    cluster maps to the cluster's min id; exactly one survivor per cluster.
    Docs absent from ``pairs`` survive trivially (pass ``vertices`` to emit
    them). This is the step between ``ngram_jaccard_pairs`` and the write of
    the deduplicated corpus."""
    cc = connected_components(pairs, src=id_a, dst=id_b,
                              vertices=vertices, id_col=id_col,
                              max_iter=max_iter)
    return cc.withColumn("is_survivor",
                         F.col(id_col) == F.col("component"))
