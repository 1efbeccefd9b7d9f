"""Deterministic, entity-consistent Bernoulli sampling.

``consistent_sample`` keeps a row iff ``md5('k:' || cast(key as string)) <
threshold(fraction)`` — a pure function of the key, so:

  * the same key samples identically in EVERY table (sample users in
    `events` and in `orders` separately and the joins still line up — the
    property rand()-based sampling cannot give);
  * results are reproducible run-to-run and engine-to-engine (the SQL
    oracle is the literal same predicate);
  * at scale it is a codegen filter pushed at the scan — no shuffle, no
    state, trivially composable with everything downstream.

The threshold is the fraction scaled into the 128-bit md5 hex space;
md5's uniformity makes the sample Bernoulli(fraction) over distinct keys.
Salt with ``seed`` to draw a different (still consistent) sample.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_threshold(fraction: float) -> str:
    """32-hex-digit threshold: keys whose md5 sorts below it are kept."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if fraction >= 1.0:
        return "g" * 32          # sorts after every hex digest: keep all
    return format(int(fraction * (1 << 128)), "032x")


def _key_expr(key_col: str, seed: Optional[str]) -> Column:
    # NULL keys form ONE shared entity (md5(NULL) is NULL, which would
    # silently drop the rows — even at fraction=1.0): all null-key rows are
    # kept or dropped together, deterministically per (fraction, seed).
    # The encoding is INJECTIVE: real keys hash as 'k:<value>' and NULLs as
    # the distinct marker 'null:' — ':' never ends a 'k:'-prefixed value's
    # prefix, so no genuine string key can collide with the NULL entity
    # (a literal sentinel string previously shared the NULL fate).
    key = F.when(F.col(key_col).isNull(), F.lit("null:")).otherwise(
        F.concat(F.lit("k:"), F.col(key_col).cast("string")))
    if seed:
        key = F.concat(key, F.lit(seed))
    return key


def sample_predicate(key_col: str, fraction: float,
                     seed: Optional[str] = None) -> Column:
    """The keep-predicate as a Column — reusable across tables so entity
    samples stay consistent."""
    return F.md5(_key_expr(key_col, seed)) < F.lit(sample_threshold(fraction))


def consistent_sample(df: DataFrame, key_col: str, fraction: float,
                      seed: Optional[str] = None) -> DataFrame:
    return df.where(sample_predicate(key_col, fraction, seed))


def stratified_sample(df: DataFrame, key_col: str, strata_col: str,
                      fractions: dict, default: float = 0.0,
                      seed: Optional[str] = None) -> DataFrame:
    """Per-stratum consistent sampling (e.g. downsample English to 5% but
    keep 100% of low-resource languages): the keep-threshold is selected by
    a codegen CASE over ``strata_col``, the key hash is shared across
    strata, so a key sampled in one stratum at fraction f is also sampled
    anywhere its stratum's fraction >= f (nesting carries over). Still a
    pure pushdown-friendly filter — no shuffle, no state."""
    h = F.md5(_key_expr(key_col, seed))
    expr = F.lit(sample_threshold(default))
    for stratum, frac in sorted(fractions.items()):
        expr = F.when(F.col(strata_col) == stratum,
                      F.lit(sample_threshold(frac))).otherwise(expr)
    return df.where(h < expr)
