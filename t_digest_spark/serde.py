"""Digest <-> Spark row adapters.

A digest travels through DataFrames as five flat columns (columnar, mirroring the
reference's primitive-array layout, MergingDigest.java:52-57 / SURVEY.md §1.4):

    means   array<double>   sorted centroid means
    weights array<double>   centroid weights (double: >2^31 totals supported,
                            TDigestTest.java:641-663)
    dmin    double          exact minimum seen
    dmax    double          exact maximum seen
    count   double          total weight

Compression delta and the scale-function name are job-level parameters, not
per-row state. ``digest_bytes`` (BinaryType, the reference-wire verbose codec,
MergingDigest.java:875-887) is used for checkpoints.
"""

from __future__ import annotations

import math
from typing import List

import numpy as np
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, LongType,
                               StructField, StructType)

from t_digest_spark.core import TDigest

DIGEST_FIELDS: List[StructField] = [
    StructField("means", ArrayType(DoubleType(), containsNull=False), nullable=False),
    StructField("weights", ArrayType(DoubleType(), containsNull=False), nullable=False),
    StructField("dmin", DoubleType(), nullable=False),
    StructField("dmax", DoubleType(), nullable=False),
    StructField("count", DoubleType(), nullable=False),
]

CHECKPOINT_EXTRA_FIELDS: List[StructField] = [
    StructField("digest_bytes", BinaryType(), nullable=False),
    StructField("n_partials", LongType(), nullable=False),
    StructField("n_updates", DoubleType(), nullable=False),
]


def digest_schema(group_fields: List[StructField]) -> StructType:
    return StructType(list(group_fields) + DIGEST_FIELDS)


def digest_to_cells(d: TDigest) -> tuple:
    """(means, weights, dmin, dmax, count) cells for one digest row.

    The empty digest carries the +inf/-inf min/max SENTINELS — those map
    to NaN so the cells read as SQL NULL (min over zero rows). The test
    must be emptiness, NOT finiteness: a digest that really ingested
    +/-inf points (production telemetry does emit them) has a genuinely
    infinite extreme, and clamping it to NaN turns into an Arrow null
    that the JVM kills on reading the non-nullable dmin/dmax fields
    ("Value at index is null", found by the adversarial inf sweep).
    """
    d._flush()
    if d.total > 0:
        return (d.means, d.weights, d.min, d.max, d.total)
    return (d.means, d.weights, math.nan, math.nan, d.total)


def digest_from_cells(means, weights, dmin, dmax, delta: float, scale: str) -> TDigest:
    return TDigest.from_centroids(
        np.asarray(means, dtype=np.float64),
        np.asarray(weights, dtype=np.float64),
        float(dmin), float(dmax), delta=delta, scale=scale)
