"""Temporal operators: as-of join.

An as-of join attaches to each left row the LATEST right row with
``right.ts <= left.ts`` per key — the point-in-time lookup every event
pipeline needs (latest model version at training time, last purchase
before a click, most recent quote at a trade).

Spark lacks a native as-of join; the classic portable implementation is
the **union + ordered forward-fill**: tag both sides, union them, and per
key carry the last right-side payload forward with
``last(..., ignorenulls=True)`` over an ordered running window. One
shuffle on the join key (same as any join), ordering local to each key
partition — the key (user, symbol, entity id) is HIGH-cardinality in real
data, so there is no low-cardinality window funnel here; the sort is the
same work a sort-merge join would do. Ties (equal timestamps) order the
right row first, so a right row at exactly left.ts matches (the ASOF
``>=`` convention DuckDB and kdb use).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, key_cols: Sequence[str],
              ts_col: str, payload_cols: Sequence[str],
              payload_prefix: str = "asof_") -> DataFrame:
    """For each left row, attach the latest right payload at or before its
    timestamp (NULLs when no right row precedes it).

    Output: every left column + ``payload_prefix``-prefixed right payload
    columns + ``asof_ts`` (the matched right row's timestamp).
    """
    key_cols = list(key_cols)
    payload_cols = list(payload_cols)
    out_payload = [payload_prefix + c for c in payload_cols]

    lt = left.withColumn("__is_r", F.lit(0))
    for src, dst in zip(payload_cols, out_payload):
        lt = lt.withColumn(dst, F.lit(None).cast(right.schema[src].dataType))
    lt = lt.withColumn("__asof_ts",
                       F.lit(None).cast(right.schema[ts_col].dataType))
    rt = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("__is_r"),
        *[F.col(src).alias(dst) for src, dst in zip(payload_cols, out_payload)],
        F.col(ts_col).alias("__asof_ts"))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    u = lt.unionByName(rt.select(*lt.columns))

    # right rows sort BEFORE left rows at equal ts (>= asof convention)
    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col(ts_col).asc(), F.col("__is_r").desc())
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u
    for dst in out_payload + ["__asof_ts"]:
        filled = filled.withColumn(
            dst, F.last(F.when(F.col("__is_r") == 1, F.col(dst)),
                        ignorenulls=True).over(w))
    return (filled.where(F.col("__is_r") == 0)
            .drop("__is_r")
            .withColumnRenamed("__asof_ts", "asof_ts"))
