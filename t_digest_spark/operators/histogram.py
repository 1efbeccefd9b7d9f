"""Fixed-bin mergeable histograms — the reference's second sketch family.

Reference semantics (cited for parity, not ported):
  * Histogram.java:30-35 — abstract fixed-bin counts `long[]`, merge =
    elementwise sum over identical bin layouts (Histogram.java add()).
  * FloatHistogram.java:69-73 — log-spaced bins between lo and hi with
    ~binsPerDecade resolution (bin edges follow the float representation).
  * LogHistogram.java:93-95 — bins spaced by approxLog2.

Spark-first restatement: the bucket index is a Catalyst expression (stays in
whole-stage codegen), counting is ONE hash aggregate with map-side combine
(an array of conditional sums — no per-bucket shuffle, no UDF), and merging
histograms is `zip_with(a, b, +)` — pure JVM. The reference's approxLog2
(a bit-twiddling log approximation used to avoid libm cost in Java) is
deliberately replaced with exact `log2`: Catalyst evaluates it natively and
vectorized, so the approximation would add error for zero speedup.

Two bin layouts:
  * log-spaced  (reference parity: FloatHistogram/LogHistogram semantics)
  * linear      (uniform width; exact SQL-oracle-able bucket arithmetic)

Row layout per group: (group..., counts array<long>, underflow long,
overflow long, total long). Merge of rows with the same layout is
histogram_merge(); layouts are job-level parameters like digest delta.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_log2(v: float) -> float:
    """Reference LogHistogram.approxLog2 (LogHistogram.java:70-76): integer
    part from the floating-point exponent, mantissa adjusted with a
    second-order polynomial; error < ±0.01, exact at powers of two."""
    import struct as _struct
    bits = _struct.unpack("<q", _struct.pack("<d", v))[0]
    exponent = ((bits & 0x7FF0_0000_0000_0000) >> 52) - 1024
    m = _struct.unpack("<d", _struct.pack(
        "<q", (bits & 0x800FFFFFFFFFFFFF) | 0x3FF0000000000000))[0]
    return m * (2 - (1.0 / 3) * m) + exponent - (2.0 / 3.0)


def _pow2_approx(x: float) -> float:
    """Exact inverse of approx_log2 (LogHistogram.java:84-91) so bin edges
    are computed exactly."""
    exponent = math.floor(x) - 1
    x = x - exponent
    m = 3 - math.sqrt(7 - 3 * x)
    return (2.0 ** (exponent + 1)) * m


def _corrected_exponent(y: Column) -> Column:
    """floor(log2(y)) with an off-by-one guard: libm log2 can land a hair
    on the wrong side of a power of two; the exact comparisons against
    pow(2, e) (exact for integral e) repair it."""
    e0 = F.floor(F.log2(y)).cast("int")
    return (F.when(F.pow(F.lit(2.0), e0.cast("double")) > y, e0 - 1)
            .when(F.pow(F.lit(2.0), (e0 + 1).cast("double")) <= y, e0 + 1)
            .otherwise(e0))


class HistogramSpec:
    """Bin layout: shared by aggregate, merge, and query helpers."""

    def __init__(self, lo: float, hi: float, n_bins: Optional[int] = None,
                 bins_per_octave: Optional[float] = None, kind: str = "log",
                 bins_per_decade: float = 50.0, epsilon_factor: float = 0.1):
        if lo >= hi:
            raise ValueError("lo must be < hi")
        self.kind = kind
        self.lo = float(lo)
        self.hi = float(hi)
        if kind == "log":
            if lo <= 0:
                raise ValueError("log histogram requires lo > 0 "
                                 "(FloatHistogram.java:69 contract)")
            octaves = math.log2(hi / lo)
            if n_bins is None:
                bins_per_octave = bins_per_octave or 10.0
                n_bins = max(int(math.ceil(octaves * bins_per_octave)), 1)
            self.bins_per_octave = n_bins / octaves
        elif kind == "linear":
            if n_bins is None:
                raise ValueError("linear histogram requires n_bins")
            self.width = (self.hi - self.lo) / n_bins
        elif kind == "float_repr":
            # reference FloatHistogram (FloatHistogram.java:43-73): constant
            # width in base-2 float-representation space
            self._validate_positive_log_range()
            if not (5 <= bins_per_decade <= 10000):
                raise ValueError(
                    f"Unreasonable number of bins per decade {bins_per_decade}")
            self.bits = int(math.ceil(
                math.log(bins_per_decade * math.log10(2)) / math.log(2)))
            n_bins = self._float_repr_index(self.hi) + 1
            if n_bins > 10000:
                raise ValueError(f"Excessive number of bins {n_bins}")
        elif kind == "log_approx":
            # reference LogHistogram (LogHistogram.java:39-57): approxLog2
            # with quadratic mantissa correction
            self._validate_positive_log_range()
            if not (1e-6 <= epsilon_factor <= 0.5):
                raise ValueError(
                    f"Unreasonable epsilon factor {epsilon_factor}")
            self.log_factor = math.log(2) / math.log(1 + epsilon_factor)
            self.log_offset = approx_log2(self.lo) * self.log_factor
            n_bins = int(approx_log2(self.hi) * self.log_factor
                         - self.log_offset) + 1
            if n_bins > 10000:
                raise ValueError(f"Excessive number of bins {n_bins}")
        else:
            raise ValueError(f"unknown histogram kind {kind!r}")
        self.n_bins = int(n_bins)

    def _validate_positive_log_range(self):
        """Histogram.java base-class contract for the log-ish layouts."""
        if self.lo <= 0 or self.hi <= 0:
            raise ValueError("Min and max must be positive")
        if self.hi <= 2 * self.lo:
            raise ValueError(
                f"Illegal/nonsensical min, max ({self.lo}, {self.hi})")

    def _float_repr_index(self, x: float) -> int:
        """Driver-side exact FloatHistogram.bucketIndex (bit twiddling,
        FloatHistogram.java:69-73)."""
        import struct as _struct
        y = x / self.lo
        bits = _struct.unpack("<q", _struct.pack("<d", y))[0]
        return (bits >> (52 - self.bits)) - (0x3FF << self.bits)

    def bucket(self, x: Column) -> Column:
        """Bucket index expression (NULL-safe; out-of-range clamped later).

        The float_repr/log_approx layouts decompose x into exponent e and
        mantissa m = x/2^e in [1,2) with exact Catalyst arithmetic (division
        by a power of two is exact), reproducing the reference's
        bit-representation binning without bit operations."""
        if self.kind == "log":
            return F.floor(F.log2(x / F.lit(self.lo)) * F.lit(self.bins_per_octave))
        if self.kind == "linear":
            return F.floor((x - F.lit(self.lo)) / F.lit(self.width))
        if self.kind == "float_repr":
            y = x / F.lit(self.lo)
            e = _corrected_exponent(y)
            m = y / F.pow(F.lit(2.0), e.cast("double"))
            idx = (e.cast("long") * (1 << self.bits)
                   + F.floor((m - 1.0) * (1 << self.bits)).cast("long"))
            return F.when(x <= 0.0, F.lit(-1).cast("long")).otherwise(idx)
        # log_approx
        e = _corrected_exponent(x)
        m = x / F.pow(F.lit(2.0), e.cast("double"))
        alog2 = (m * (2.0 - m / 3.0) + e.cast("double") - 1.0 - (2.0 / 3.0))
        idx = F.floor(alog2 * F.lit(self.log_factor) - F.lit(self.log_offset))
        return F.when(x <= 0.0, F.lit(-1).cast("long")).otherwise(idx)

    def edges(self) -> list:
        """Bin lower edges (for presentation / quantile interpolation).
        float_repr/log_approx reproduce the reference's lowerBound exactly
        (FloatHistogram.java:77-80; LogHistogram pow2 inverse)."""
        if self.kind == "log":
            return [self.lo * 2 ** (i / self.bins_per_octave)
                    for i in range(self.n_bins + 1)]
        if self.kind == "linear":
            return [self.lo + i * self.width for i in range(self.n_bins + 1)]
        if self.kind == "float_repr":
            out = []
            for k in range(self.n_bins + 1):
                e, frac = divmod(k, 1 << self.bits)
                out.append(self.lo * (2.0 ** e) * (1 + frac / (1 << self.bits)))
            return out
        return [_pow2_approx((k + self.log_offset) / self.log_factor)
                for k in range(self.n_bins + 1)]


def histogram_aggregate(df: DataFrame, value_col: str,
                        group_cols: Optional[Sequence[str]] = None,
                        spec: HistogramSpec = None) -> DataFrame:
    """One histogram row per group in a single hash aggregate.

    The counts array is built as n_bins conditional sums — Catalyst runs this
    as one partial+final aggregate with map-side combine, so raw rows never
    shuffle; only (groups x n_bins) longs do. At 100 TB this is the same
    plan shape as a plain groupBy().count().
    """
    group_cols = list(group_cols or [])
    x = F.col(value_col).cast("double")
    b = spec.bucket(x)
    valid = x.isNotNull() & ~F.isnan(x)
    in_range = valid & (b >= 0) & (b < spec.n_bins)
    proj = df.select(*group_cols,
                     F.when(in_range, b).alias("__b__"),
                     F.when(valid & (b < 0), 1).otherwise(0).alias("__under__"),
                     F.when(valid & (b >= spec.n_bins), 1).otherwise(0).alias("__over__"))
    counts = F.array(*[
        F.sum(F.when(F.col("__b__") == i, F.lit(1)).otherwise(F.lit(0)))
        for i in range(spec.n_bins)]).alias("counts")
    agg = proj.groupBy(*group_cols).agg(
        counts,
        F.sum("__under__").alias("underflow"),
        F.sum("__over__").alias("overflow"))
    return agg.withColumn(
        "total",
        F.aggregate("counts", F.lit(0).cast("long"), lambda a, c: a + c)
        + F.col("underflow") + F.col("overflow"))


def histogram_merge(hist_df: DataFrame,
                    group_cols: Optional[Sequence[str]] = None) -> DataFrame:
    """Merge histogram rows sharing a bin layout: elementwise array addition
    (the reference's Histogram.add contract) — zip_with, fully JVM-side."""
    group_cols = list(group_cols or [])
    zero = F.array_repeat(F.lit(0).cast("long"), F.size(F.first("counts")))
    merged = F.aggregate(
        F.collect_list("counts"), zero,
        lambda acc, c: F.zip_with(acc, c, lambda a, b: a + b)).alias("counts")
    gb = hist_df.groupBy(*group_cols) if group_cols else hist_df.groupBy()
    return gb.agg(merged,
                  F.sum("underflow").alias("underflow"),
                  F.sum("overflow").alias("overflow"),
                  F.sum("total").alias("total"))


def histogram_cdf(spec: HistogramSpec, x: float) -> Column:
    """P(X <= x) from the counts array (in-range mass only) — JVM expression.

    Bins fully below x count whole; the bin CONTAINING x contributes a
    linearly interpolated fraction of its mass ((x - lo_edge) / bin_width),
    so off-edge x is no longer biased low by up to a bin's mass. For x on a
    bin edge the fraction is exactly 0 (previous behavior preserved). x is a
    literal, so the containing bin resolves driver-side; only the two array
    folds run in the executor."""
    import bisect
    xv = float(x)
    inrange = F.aggregate("counts", F.lit(0).cast("long"), lambda a, c: a + c)
    if xv <= spec.lo:
        return F.lit(0.0) * inrange.cast("double")  # 0, NULL-propagating
    if xv >= spec.hi:
        return inrange.cast("double") / inrange.cast("double")  # 1 (NaN if empty)
    edges = spec.edges()
    b = min(max(bisect.bisect_right(edges, xv) - 1, 0), spec.n_bins - 1)
    frac = (xv - edges[b]) / (edges[b + 1] - edges[b])
    full = F.aggregate(F.slice("counts", 1, b), F.lit(0).cast("long"),
                       lambda a, c: a + c) if b > 0 else F.lit(0).cast("long")
    part = F.element_at("counts", b + 1).cast("double") * F.lit(frac)
    return (full.cast("double") + part) / inrange.cast("double")


def histogram_quantile(spec: HistogramSpec, q: float) -> Column:
    """Quantile by linear interpolation within the containing bin.

    Pure Catalyst: cumulative mass via aggregate over a zipped index array.
    Bins are few (a histogram row is tiny), so the expression cost is nil
    next to the aggregate that produced the row.
    """
    edges = spec.edges()
    lows = F.array(*[F.lit(e) for e in edges[:-1]])
    highs = F.array(*[F.lit(e) for e in edges[1:]])
    n = F.aggregate("counts", F.lit(0).cast("long"), lambda a, c: a + c)
    target = F.lit(float(q)) * n.cast("double")
    # running cumulative sums of counts
    cum = F.aggregate(
        "counts",
        F.struct(F.lit(0).cast("long").alias("s"),
                 F.array().cast("array<long>").alias("acc")),
        lambda st, c: F.struct(
            (st["s"] + c).alias("s"),
            F.concat(st["acc"], F.array(st["s"] + c)).alias("acc")),
        lambda st: st["acc"])
    # first bin where cum >= target
    idx = F.array_position(F.transform(cum, lambda c: c >= target), True)
    prev_cum = F.when(idx > 1, F.element_at(cum, (idx - 1).cast("int"))
                      ).otherwise(F.lit(0).cast("long"))
    cnt = F.element_at("counts", idx.cast("int"))
    lo_e = F.element_at(lows, idx.cast("int"))
    hi_e = F.element_at(highs, idx.cast("int"))
    frac = (target - prev_cum.cast("double")) / cnt.cast("double")
    return F.when(idx == 0, F.lit(None).cast("double")).otherwise(
        lo_e + (hi_e - lo_e) * F.least(F.greatest(frac, F.lit(0.0)), F.lit(1.0)))


# ---------------------------------------------------------------- wire serde

def float_histogram_to_bytes(spec: "HistogramSpec", counts) -> bytes:
    """FloatHistogram serialization PAYLOAD, wire-compatible with what
    FloatHistogram.writeObject emits inside the Java object stream
    (FloatHistogram.java:94-109): min/max doubles, precision + shift bytes,
    a short byte-length, then the Simple64-compressed counts as big-endian
    64-bit words. The Java-Serializable container framing (stream magic +
    block-data records) is a JVM transport detail — strip it with
    `java_object_stream_payload` when reading reference-produced streams."""
    import struct

    from t_digest_spark import simple64

    if spec.kind != "float_repr":
        raise ValueError("wire serde is defined for float_repr histograms")
    words = simple64.compress([int(c) for c in counts])
    nbytes = 8 * len(words)
    if nbytes > 32767:
        # the Java format's length field is a signed short (writeShort,
        # FloatHistogram.java:106) — Java silently truncates past this,
        # we refuse
        raise ValueError(
            f"compressed counts ({nbytes} bytes) exceed the wire format's "
            "signed-short length field (32767)")
    return (struct.pack(">ddbbh", spec.lo, spec.hi, spec.bits,
                        52 - spec.bits, nbytes)
            + struct.pack(f">{len(words)}Q", *words))


def float_histogram_from_bytes(raw: bytes):
    """Parse the payload back to (HistogramSpec, counts list). The bin count
    derives from (min, max, precision) exactly as readObject does
    (FloatHistogram.java:113-132). NOTE: the reference's own readObject
    CORRUPTS counts whenever a compressed word uses the 15x4-bit packing —
    Simple64.java decompressSingle STATUS_15NUM_4BITS writes outOffset+6
    twice and never writes outOffset+7 (copy-paste bug, found by the
    java_parity harness); this reader decodes the format as written."""
    import math as _math
    import struct

    from t_digest_spark import simple64

    lo, hi, bits, _shift, nbytes = struct.unpack_from(">ddbbh", raw, 0)
    if nbytes < 0:
        raise ValueError(
            "negative payload length: the stream was written by a Java "
            "histogram whose compressed counts overflowed the signed-short "
            "length field (writeShort truncation)")
    if len(raw) < 20 + nbytes:
        raise ValueError(
            f"truncated Simple64 stream: payload declares {nbytes} bytes, "
            f"buffer has {len(raw) - 20}")
    # a bins_per_decade that reproduces exactly these precision bits; the
    # derived 2^bits/log10(2) can exceed Java's own <=10000 input cap by up
    # to 2x (ceil), so clamp — binsPerDecade=10000 still yields bits=12,
    # the maximum any valid reference stream carries
    bpd = min((1 << bits) / _math.log10(2), 10000.0)
    spec = HistogramSpec(lo, hi, kind="float_repr", bins_per_decade=bpd)
    if spec.bits != bits:
        raise ValueError(f"cannot reconstruct precision {bits}")
    n_words = nbytes // 8
    words = struct.unpack_from(f">{n_words}Q", raw, 20)
    counts = simple64.decompress(words, spec.n_bins)
    return spec, counts


def java_object_stream_payload(raw: bytes) -> bytes:
    """Extract raw primitive payload from a Java ObjectOutputStream that
    only wrote primitives (stream magic 0xACED 0x0005 + TC_BLOCKDATA /
    TC_BLOCKDATALONG records)."""
    if raw[:4] != b"\xac\xed\x00\x05":
        raise ValueError("not a Java object stream")
    out = bytearray()
    i = 4
    while i < len(raw):
        tag = raw[i]
        if tag == 0x77:              # TC_BLOCKDATA, 1-byte length
            n = raw[i + 1]
            out += raw[i + 2:i + 2 + n]
            i += 2 + n
        elif tag == 0x7A:            # TC_BLOCKDATALONG, 4-byte length
            n = int.from_bytes(raw[i + 1:i + 5], "big")
            out += raw[i + 5:i + 5 + n]
            i += 5 + n
        else:
            raise ValueError(f"unexpected object-stream tag 0x{tag:02x}")
    return bytes(out)
