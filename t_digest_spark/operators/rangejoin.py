"""Range (interval) join: left.value in [right.lo, right.hi).

The naive plan for a non-equi interval predicate is a broadcast
nested-loop join — O(rows x intervals) comparisons, fine for a handful
of bands but a scale-killer when the interval table is large. The
bin-bucketing restatement keeps it an EQUI-join: pick a bin width,
explode every interval into the bins it covers, bucket each left row
into its bin, equi-join on the bin, and re-check exact containment.
Candidate pairs per row are bounded by intervals-overlapping-its-bin
(intervals spanning many bins replicate into each — the usual
space-for-bandwidth trade; pick ``bin_width`` near the typical interval
length). Overlapping intervals produce one output row per containing
interval, exactly like the SQL BETWEEN join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(left: DataFrame, value_col: str, intervals: DataFrame,
               lo_col: str, hi_col: str, bin_width: float) -> DataFrame:
    """Inner join of left rows to every interval with
    lo <= value < hi, as an equi-join on bucketed bins."""
    binned_iv = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / bin_width).cast("long"),
            # hi is exclusive: a bin starting exactly at hi never matches
            F.floor((F.col(hi_col) - F.lit(1e-9)) / bin_width).cast("long"))))
    binned_l = left.withColumn(
        "__bin", F.floor(F.col(value_col) / bin_width).cast("long"))
    return (binned_l.join(binned_iv, "__bin")
            .where((F.col(value_col) >= F.col(lo_col))
                   & (F.col(value_col) < F.col(hi_col)))
            .drop("__bin"))
