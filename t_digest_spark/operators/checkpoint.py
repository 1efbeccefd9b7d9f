"""Resumable digest state: Parquet checkpoints of digest rows with lineage.

North-rule requirement (BASELINE.json): "resumable from checkpoint with
per-partition lineage + metrics". Digests are mergeable (quality/
AccuracyTest.java:29-176), so resume is correctness-free: read the
checkpointed digests, build partials over only the new data, merge.

Checkpoint row layout: group cols + digest cols (means/weights/dmin/dmax/
count) + digest_bytes (reference verbose wire codec, MergingDigest.java:
875-887 — cross-ecosystem interchange) + lineage (n_partials merged,
n_updates = total weight folded in, run_id).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from t_digest_spark.operators.aggregation import (tdigest_merge,
                                                  tdigest_partial_build)
from t_digest_spark.serde import digest_from_cells


def _bytes_udf(delta: float, scale: str):
    @pandas_udf("binary")
    def to_bytes(means: pd.Series, weights: pd.Series, dmin: pd.Series,
                 dmax: pd.Series) -> pd.Series:
        out = []
        for m, w, lo, hi in zip(means, weights, dmin, dmax):
            out.append(digest_from_cells(m, w, lo, hi, delta, scale).to_bytes())
        return pd.Series(out)
    return to_bytes


def write_checkpoint(digest_df: DataFrame, path: str,
                     run_id: str = "r0", delta: float = 100.0,
                     scale: str = "k2", n_partials_col: Optional[str] = None,
                     mode: str = "overwrite") -> None:
    out = (digest_df
           .withColumn("digest_bytes",
                       _bytes_udf(delta, scale)("means", "weights", "dmin", "dmax"))
           .withColumn("n_partials",
                       F.col(n_partials_col).cast("long") if n_partials_col else F.lit(1).cast("long"))
           .withColumn("n_updates", F.col("count"))
           .withColumn("run_id", F.lit(run_id)))
    out.write.mode(mode).parquet(path)


def read_checkpoint(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def resume_aggregate(new_df: DataFrame, checkpoint_path: str, value_col: str,
                     group_cols: Optional[Sequence[str]] = None,
                     delta: float = 100.0, scale: str = "k2",
                     new_run_id: str = "r1",
                     out_checkpoint_path: Optional[str] = None) -> DataFrame:
    """Fold new data into checkpointed digest state.

    The checkpointed digests act as pre-built partials; mergeability makes the
    result identical (within merge tolerance) to a from-scratch aggregate over
    old+new data.
    """
    spark = new_df.sparkSession
    group_cols = list(group_cols or [])
    prior = read_checkpoint(spark, checkpoint_path).select(
        *group_cols, "means", "weights", "dmin", "dmax", "count")
    fresh = tdigest_partial_build(new_df, value_col, group_cols,
                                  delta=delta, scale=scale)
    merged = tdigest_merge(prior.unionByName(fresh), group_cols,
                           delta=delta, scale=scale)
    if out_checkpoint_path:
        write_checkpoint(merged, out_checkpoint_path, run_id=new_run_id,
                         delta=delta, scale=scale)
        return read_checkpoint(spark, out_checkpoint_path)
    return merged


# ------------------------------------------------------------- theta sketches

def write_theta_checkpoint(theta_df: DataFrame, path: str,
                           run_id: str = "r0",
                           mode: str = "overwrite") -> None:
    """Checkpoint theta distinct-sketch rows with the same lineage shape as
    digest checkpoints (north rule: resumable + per-partition lineage +
    metrics). ``n_retained`` is the state-size metric; ``is_estimation``
    records the regime at checkpoint time."""
    out = (theta_df
           .withColumn("n_retained", F.size("retained").cast("long"))
           .withColumn("is_estimation", F.col("theta") != F.lit(-1))
           .withColumn("run_id", F.lit(run_id)))
    out.write.mode(mode).parquet(path)


def resume_theta_aggregate(new_df: DataFrame, checkpoint_path: str,
                           key_col: str,
                           group_cols: Optional[Sequence[str]] = None,
                           k: int = 4096, new_run_id: str = "r1",
                           out_checkpoint_path: Optional[str] = None) -> DataFrame:
    """Fold new data into checkpointed theta state. Bottom-k union is
    EXACTLY order-insensitive, so the resumed sketch is byte-identical to
    a from-scratch aggregate over old+new (pinned in tests) — stronger
    than the digest's within-tolerance resume."""
    from t_digest_spark.sketches.spark import theta_aggregate, theta_merge
    spark = new_df.sparkSession
    group_cols = list(group_cols or [])
    prior = read_checkpoint(spark, checkpoint_path).select(
        *group_cols, "retained", "theta", "k")
    fresh = theta_aggregate(new_df, key_col, group_cols, k=k)
    merged = theta_merge(prior.unionByName(fresh), group_cols, k=k)
    if out_checkpoint_path:
        write_theta_checkpoint(merged, out_checkpoint_path,
                               run_id=new_run_id)
        return read_checkpoint(spark, out_checkpoint_path).select(
            *group_cols, "retained", "theta", "k")
    return merged
