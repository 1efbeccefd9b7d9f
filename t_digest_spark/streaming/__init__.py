"""Structured Streaming digest accumulation.

The reference digest is itself a one-pass streaming accumulator with lazy
flush (MergingDigest.java:571, :709 — queries flush pending points). The
Spark restatement: per-key digest state inside ``applyInPandasWithState`` —
each micro-batch's Arrow batches play the role of the reference's staging
buffer (MergingDigest.java:85-97), folded into the state digest with the
same sort+sweep merge the batch path uses.

State layout mirrors the serde row: (means, weights, dmin, dmax, count).
Output mode "update": every trigger emits the refreshed digest row per key
touched in that trigger, so a downstream sink always holds the latest
mergeable state — the streaming analog of the checkpoint table
(operators/checkpoint.py).

For event-time windowed digests: ``with_event_window`` puts the window
struct in the grouping key and ``window_col="win"`` turns on explicit state
lifecycle (event-time timeouts + late-row discard) — Spark does not filter
late rows for arbitrary stateful operators by itself.
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StringType,
                               StructField, StructType)

from t_digest_spark.core import TDigest
from t_digest_spark.serde import DIGEST_FIELDS, digest_to_cells

STATE_SCHEMA = StructType([
    StructField("means", ArrayType(DoubleType())),
    StructField("weights", ArrayType(DoubleType())),
    StructField("dmin", DoubleType()),
    StructField("dmax", DoubleType()),
    StructField("count", DoubleType()),
])


def _window_end_ms(key_item) -> int:
    """Extract window end epoch-millis from a window-struct key item
    (arrives as a Row/tuple of (start, end) datetimes)."""
    end = key_item["end"] if hasattr(key_item, "__getitem__") and not isinstance(
        key_item, (tuple, list)) else key_item[1]
    if hasattr(key_item, "end"):
        end = key_item.end
    return int(end.timestamp() * 1000)


def tdigest_stream_aggregate(df: DataFrame, value_col: str,
                             group_cols: Sequence[str],
                             delta: float = 100.0, scale: str = "k2",
                             window_col: Optional[str] = None,
                             allowed_lateness_ms: int = 0) -> DataFrame:
    """Stateful per-key digest over a streaming DataFrame.

    Returns a streaming DataFrame of digest rows (group cols + means/weights/
    dmin/dmax/count) in update mode; each emitted row is a valid mergeable
    digest, so downstream batch jobs can tdigest_merge() them freely.

    Spark does NOT filter late rows for arbitrary stateful operators (the
    watermark only gates built-in aggregations), so windowed state lifecycle
    is handled here when ``window_col`` names the window-struct key column
    (see with_event_window): state registers an event-time timeout at
    window_end + allowed_lateness; on timeout the state is dropped, and rows
    arriving for a window already behind the watermark are discarded instead
    of resurrecting expired state.
    """
    group_cols = list(group_cols)
    by_name = {f.name: f for f in df.schema.fields}
    out_schema = StructType([by_name[c] for c in group_cols] + DIGEST_FIELDS)
    timeout = (GroupStateTimeout.EventTimeTimeout if window_col
               else GroupStateTimeout.NoTimeout)
    win_idx = group_cols.index(window_col) if window_col else -1

    def update(key: Tuple, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if window_col and state.hasTimedOut:
            state.remove()
            return
        if window_col:
            end_ms = _window_end_ms(key[win_idx])
            wm = state.getCurrentWatermarkMs()
            if wm > 0 and end_ms + allowed_lateness_ms <= wm and not state.exists:
                for _ in pdfs:      # drain: late rows for an expired window
                    pass
                return
        d = TDigest(delta=delta, scale=scale)
        if state.exists:
            means, weights, dmin, dmax, count = state.get
            if means:
                d = TDigest.from_centroids(
                    np.asarray(means, dtype=np.float64),
                    np.asarray(weights, dtype=np.float64),
                    float(dmin), float(dmax), delta=delta, scale=scale)
        for pdf in pdfs:
            vals = pdf[value_col].to_numpy(dtype=np.float64, copy=False)
            vals = vals[~np.isnan(vals)]
            if len(vals):
                d.add_values(vals)
        cells = digest_to_cells(d)
        # state round-trips through Pyrolite: native Python types only
        state.update((np.asarray(cells[0]).tolist(), np.asarray(cells[1]).tolist(),
                      float(cells[2]), float(cells[3]), float(cells[4])))
        if window_col:
            wm = state.getCurrentWatermarkMs()
            end_ms = _window_end_ms(key[win_idx])
            state.setTimeoutTimestamp(max(end_ms + allowed_lateness_ms, wm + 1))
        yield pd.DataFrame([tuple(key) + cells],
                           columns=[f.name for f in out_schema.fields])

    return (df.groupBy(*group_cols)
            .applyInPandasWithState(update, out_schema, STATE_SCHEMA,
                                    "update", timeout))


def with_event_window(df: DataFrame, ts_col: str, window_duration: str,
                      watermark: Optional[str] = None) -> DataFrame:
    """Attach an event-time window struct column ``win`` (plus watermark when
    given) so the window participates in the digest grouping key.

    The source timestamp column is dropped afterwards: the window struct
    inherits the event-time marker, and a stream may carry at most one
    event-time column.
    """
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    return df.withColumn("win", F.window(ts_col, window_duration)).drop(ts_col)


HIST_STATE_SCHEMA = StructType([
    StructField("counts", ArrayType(DoubleType())),
    StructField("underflow", DoubleType()),
    StructField("overflow", DoubleType()),
])


def histogram_stream_aggregate(df: DataFrame, value_col: str,
                               group_cols: Sequence[str], spec,
                               window_col: Optional[str] = None,
                               allowed_lateness_ms: int = 0) -> DataFrame:
    """Stateful per-key fixed-bin histogram over a streaming DataFrame —
    completes the stateful accumulator family (digest, KLL, histogram).
    Output rows carry the batch layout (counts array<long> + underflow/
    overflow/total) so histogram_merge() and the quantile/cdf expressions
    apply unchanged. Same windowed state lifecycle as the other two
    accumulators; histogram state is O(n_bins) per key, so even the
    unwindowed form is bounded (unlike KLL/digest growth, the array never
    grows) — still prefer a window for key-space hygiene.
    Bin indices are computed with NumPy HERE (not via spec.bucket Catalyst
    expressions) because the fold runs inside the stateful Python worker.
    """
    import numpy as np

    group_cols = list(group_cols)
    by_name = {f.name: f for f in df.schema.fields}
    out_schema = StructType([by_name[c] for c in group_cols])
    for name, typ in (("counts", ArrayType(LongType())),
                      ("underflow", LongType()), ("overflow", LongType()),
                      ("total", LongType())):
        out_schema = out_schema.add(name, typ)
    timeout = (GroupStateTimeout.EventTimeTimeout if window_col
               else GroupStateTimeout.NoTimeout)
    win_idx = group_cols.index(window_col) if window_col else -1
    edges = np.asarray(spec.edges(), dtype=np.float64)

    def update(key, pdfs, state: GroupState):
        if window_col and state.hasTimedOut:
            state.remove()
            return
        if window_col:
            end_ms = _window_end_ms(key[win_idx])
            wm = state.getCurrentWatermarkMs()
            if wm > 0 and end_ms + allowed_lateness_ms <= wm and not state.exists:
                for _ in pdfs:
                    pass
                return
        if state.exists:
            counts_l, under, over = state.get
            counts = np.asarray(counts_l, dtype=np.float64)
        else:
            counts = np.zeros(spec.n_bins)
            under = over = 0.0
        for pdf in pdfs:
            vals = pdf[value_col].to_numpy(dtype=np.float64, copy=False)
            vals = vals[~np.isnan(vals)]
            if not len(vals):
                continue
            # searchsorted against the exact edge array reproduces
            # spec.bucket for every layout incl. float_repr/log_approx
            b = np.searchsorted(edges, vals, side="right") - 1
            under += float((vals < edges[0]).sum())
            over += float((vals >= edges[-1]).sum())
            inr = (b >= 0) & (b < spec.n_bins) & (vals < edges[-1])
            counts += np.bincount(b[inr], minlength=spec.n_bins)
        state.update((counts.tolist(), float(under), float(over)))
        if window_col:
            wm = state.getCurrentWatermarkMs()
            end_ms = _window_end_ms(key[win_idx])
            state.setTimeoutTimestamp(max(end_ms + allowed_lateness_ms, wm + 1))
        total = int(counts.sum() + under + over)
        yield pd.DataFrame(
            [tuple(key) + (counts.astype("int64").tolist(),
                           int(under), int(over), total)],
            columns=[f.name for f in out_schema.fields])

    return (df.groupBy(*group_cols)
            .applyInPandasWithState(update, out_schema, HIST_STATE_SCHEMA,
                                    "update", timeout))


KLL_STATE_SCHEMA = StructType([
    StructField("items", ArrayType(DoubleType())),
    StructField("offsets", ArrayType(DoubleType())),
    StructField("kmin", DoubleType()),
    StructField("kmax", DoubleType()),
    StructField("count", DoubleType()),
])


def kll_stream_aggregate(df: DataFrame, value_col: str,
                         group_cols: Sequence[str], k: int = 200,
                         window_col: Optional[str] = None,
                         allowed_lateness_ms: int = 0) -> DataFrame:
    """Stateful per-key KLL sketch over a streaming DataFrame — same update
    shape as the digest accumulator; each emitted row is mergeable with the
    batch KLL operators (sketches/spark.py).

    State lifecycle mirrors tdigest_stream_aggregate: with ``window_col``
    naming a window-struct key column (see with_event_window), state
    registers an event-time timeout at window_end + allowed_lateness, is
    dropped on timeout, and late rows for expired windows are discarded.
    Without a window the state is keyed only by group_cols and is UNBOUNDED:
    high-cardinality keys in a long-running stream grow state without limit
    — give such streams a window (or pre-bucket the key space).
    """
    from t_digest_spark.sketches.kll import KllSketch

    group_cols = list(group_cols)
    by_name = {f.name: f for f in df.schema.fields}
    out_schema = StructType([by_name[c] for c in group_cols])
    for name, typ in (("items", ArrayType(DoubleType())),
                      ("offsets", ArrayType(DoubleType())),
                      ("kmin", DoubleType()), ("kmax", DoubleType()),
                      ("count", DoubleType())):
        out_schema = out_schema.add(name, typ)
    timeout = (GroupStateTimeout.EventTimeTimeout if window_col
               else GroupStateTimeout.NoTimeout)
    win_idx = group_cols.index(window_col) if window_col else -1

    def update(key, pdfs, state: GroupState):
        if window_col and state.hasTimedOut:
            state.remove()
            return
        if window_col:
            end_ms = _window_end_ms(key[win_idx])
            wm = state.getCurrentWatermarkMs()
            if wm > 0 and end_ms + allowed_lateness_ms <= wm and not state.exists:
                for _ in pdfs:      # drain: late rows for an expired window
                    pass
                return
        s = KllSketch(k)
        if state.exists:
            items, offsets, kmin, kmax, count = state.get
            s = KllSketch.from_row(items, offsets, kmin, kmax, count, k=k)
        for pdf in pdfs:
            vals = pdf[value_col].to_numpy(dtype=np.float64, copy=False)
            vals = vals[~np.isnan(vals)]
            if len(vals):
                s.update_values(vals)
        items, offsets, mn, mx, n = s.to_row()
        row = ([float(x) for x in items], [float(o) for o in offsets],
               float(mn), float(mx), float(n))
        state.update(row)
        if window_col:
            wm = state.getCurrentWatermarkMs()
            end_ms = _window_end_ms(key[win_idx])
            state.setTimeoutTimestamp(max(end_ms + allowed_lateness_ms, wm + 1))
        yield pd.DataFrame([tuple(key) + row],
                           columns=[f.name for f in out_schema.fields])

    return (df.groupBy(*group_cols)
            .applyInPandasWithState(update, out_schema, KLL_STATE_SCHEMA,
                                    "update", timeout))


THETA_STATE_SCHEMA = StructType([
    StructField("retained", ArrayType(LongType())),
    StructField("theta", LongType()),
])


def theta_stream_aggregate(df: DataFrame, key_col: str,
                           group_cols: Sequence[str], k: int = 4096,
                           window_col: Optional[str] = None,
                           allowed_lateness_ms: int = 0) -> DataFrame:
    """Stateful per-key theta (bottom-k) distinct sketch over a streaming
    DataFrame — 'distinct users per window' with O(k) state per key, the
    streaming counterpart of sketches/spark.py theta_aggregate. Keys hash
    JVM-side before the stateful operator (shiftrightunsigned(xxhash64, 1),
    codegen); emitted rows are mergeable with batch theta rows and feed the
    same estimate/bounds UDFs and set-algebra ops.

    State lifecycle mirrors the other stateful accumulators: with
    ``window_col`` the state registers an event-time timeout at
    window_end + allowed_lateness, drops on timeout, and discards late rows
    for expired windows. Without a window, per-key state stays bounded at
    <= k longs (unlike raw dropDuplicates state, which grows with the
    distinct count).
    """
    from t_digest_spark.sketches.theta import ThetaSketch

    group_cols = list(group_cols)
    # NULL keys carry no distinct identity and must not count: xxhash64 of
    # NULL evaluates to the seed (a perfectly valid hash), so without this
    # filter a NULL id would inflate every window's distinct count — the
    # batch counterpart (sketches/spark.py theta_aggregate) drops NULL
    # keys the same way, as does COUNT(DISTINCT).
    df = (df.where(F.col(key_col).isNotNull())
          .withColumn("__h__",
                      F.shiftrightunsigned(F.xxhash64(key_col), 1)))
    by_name = {f.name: f for f in df.schema.fields}
    out_schema = StructType([by_name[c] for c in group_cols])
    for name, typ in (("retained", ArrayType(LongType())),
                      ("theta", LongType()), ("k", LongType())):
        out_schema = out_schema.add(name, typ)
    timeout = (GroupStateTimeout.EventTimeTimeout if window_col
               else GroupStateTimeout.NoTimeout)
    win_idx = group_cols.index(window_col) if window_col else -1

    def update(key, pdfs, state: GroupState):
        if window_col and state.hasTimedOut:
            state.remove()
            return
        if window_col:
            end_ms = _window_end_ms(key[win_idx])
            wm = state.getCurrentWatermarkMs()
            if wm > 0 and end_ms + allowed_lateness_ms <= wm and not state.exists:
                for _ in pdfs:      # drain: late rows for an expired window
                    pass
                return
        s = ThetaSketch(k)
        if state.exists:
            retained, theta = state.get
            s = ThetaSketch.from_row(retained, theta, k)
        for pdf in pdfs:
            hs = pdf["__h__"].to_numpy(dtype=np.int64, copy=False)
            if len(hs):
                s.update_hashes(hs)
        retained, theta, _ = s.to_row()
        state.update((retained, int(theta)))
        if window_col:
            wm = state.getCurrentWatermarkMs()
            end_ms = _window_end_ms(key[win_idx])
            state.setTimeoutTimestamp(max(end_ms + allowed_lateness_ms, wm + 1))
        yield pd.DataFrame([tuple(key) + (retained, int(theta), int(k))],
                           columns=[f.name for f in out_schema.fields])

    return (df.groupBy(*group_cols)
            .applyInPandasWithState(update, out_schema, THETA_STATE_SCHEMA,
                                    "update", timeout))


FI_STATE_SCHEMA = StructType([
    StructField("keys", ArrayType(StringType())),
    StructField("counts", ArrayType(LongType())),
    StructField("max_error", LongType()),
    StructField("n", LongType()),
])


def frequent_stream_aggregate(df: DataFrame, key_col: str,
                              group_cols: Sequence[str], k: int = 512,
                              window_col: Optional[str] = None,
                              allowed_lateness_ms: int = 0) -> DataFrame:
    """Stateful per-key Misra-Gries heavy hitters over a streaming
    DataFrame — 'trending items per window' with state bounded at k
    counters per key (sketches/frequent.py guarantees carry over:
    estimate <= true <= estimate + max_error, max_error <= n/(k+1)).
    Emitted rows are mergeable with batch frequent_aggregate rows and feed
    frequent_items_explode / the frequent_estimate SQL scalar.

    Same windowed state lifecycle as the other stateful accumulators
    (digest, KLL, histogram, theta)."""
    from t_digest_spark.sketches.frequent import FrequentItemsSketch

    group_cols = list(group_cols)
    df = df.withColumn("__key__", F.col(key_col).cast("string"))
    by_name = {f.name: f for f in df.schema.fields}
    out_schema = StructType([by_name[c] for c in group_cols])
    for name, typ in (("keys", ArrayType(StringType())),
                      ("counts", ArrayType(LongType())),
                      ("max_error", LongType()), ("n", LongType()),
                      ("k", LongType())):
        out_schema = out_schema.add(name, typ)
    timeout = (GroupStateTimeout.EventTimeTimeout if window_col
               else GroupStateTimeout.NoTimeout)
    win_idx = group_cols.index(window_col) if window_col else -1

    def update(key, pdfs, state: GroupState):
        if window_col and state.hasTimedOut:
            state.remove()
            return
        if window_col:
            end_ms = _window_end_ms(key[win_idx])
            wm = state.getCurrentWatermarkMs()
            if wm > 0 and end_ms + allowed_lateness_ms <= wm and not state.exists:
                for _ in pdfs:      # drain: late rows for an expired window
                    pass
                return
        s = FrequentItemsSketch(k)
        if state.exists:
            keys_l, counts_l, max_error, n = state.get
            s = FrequentItemsSketch.from_row(keys_l, counts_l, max_error, n, k)
        for pdf in pdfs:
            if len(pdf):
                s.update_batch(pdf["__key__"])
        keys_l, counts_l, max_error, n, _ = s.to_row()
        state.update((list(keys_l), [int(c) for c in counts_l],
                      int(max_error), int(n)))
        if window_col:
            wm = state.getCurrentWatermarkMs()
            end_ms = _window_end_ms(key[win_idx])
            state.setTimeoutTimestamp(max(end_ms + allowed_lateness_ms, wm + 1))
        yield pd.DataFrame([tuple(key) + (list(keys_l),
                                          [int(c) for c in counts_l],
                                          int(max_error), int(n), int(k))],
                           columns=[f.name for f in out_schema.fields])

    return (df.groupBy(*group_cols)
            .applyInPandasWithState(update, out_schema, FI_STATE_SCHEMA,
                                    "update", timeout))


REQ_STATE_SCHEMA = StructType([
    StructField("items", ArrayType(DoubleType())),
    StructField("offsets", ArrayType(LongType())),
    StructField("states", ArrayType(LongType())),
    StructField("rmin", DoubleType()),
    StructField("rmax", DoubleType()),
    StructField("count", DoubleType()),
])


def req_stream_aggregate(df: DataFrame, value_col: str,
                         group_cols: Sequence[str], k: int = 12,
                         hra: bool = True,
                         window_col: Optional[str] = None,
                         allowed_lateness_ms: int = 0) -> DataFrame:
    """Stateful per-key REQ sketch over a streaming DataFrame — RELATIVE
    rank error concentrated in the tail, i.e. streaming p999/p9999 latency
    per window, completing the stateful accumulator family (digest, KLL,
    histogram, theta, frequent-items, REQ). Emitted rows are mergeable
    with batch req_aggregate rows and feed req_quantile_udf unchanged.

    Same windowed state lifecycle as the other stateful accumulators."""
    from t_digest_spark.sketches.req import ReqSketch

    group_cols = list(group_cols)
    by_name = {f.name: f for f in df.schema.fields}
    out_schema = StructType([by_name[c] for c in group_cols])
    for name, typ in (("items", ArrayType(DoubleType())),
                      ("offsets", ArrayType(LongType())),
                      ("states", ArrayType(LongType())),
                      ("rmin", DoubleType()), ("rmax", DoubleType()),
                      ("count", DoubleType())):
        out_schema = out_schema.add(name, typ)
    timeout = (GroupStateTimeout.EventTimeTimeout if window_col
               else GroupStateTimeout.NoTimeout)
    win_idx = group_cols.index(window_col) if window_col else -1

    def update(key, pdfs, state: GroupState):
        if window_col and state.hasTimedOut:
            state.remove()
            return
        if window_col:
            end_ms = _window_end_ms(key[win_idx])
            wm = state.getCurrentWatermarkMs()
            if wm > 0 and end_ms + allowed_lateness_ms <= wm and not state.exists:
                for _ in pdfs:      # drain: late rows for an expired window
                    pass
                return
        s = ReqSketch(k, hra)
        if state.exists:
            items, offsets, states_l, rmin, rmax, count = state.get
            s = ReqSketch.from_row(items, offsets, states_l, rmin, rmax,
                                   count, k=k, hra=hra)
        for pdf in pdfs:
            vals = pdf[value_col].to_numpy(dtype=np.float64, copy=False)
            vals = vals[~np.isnan(vals)]
            if len(vals):
                s.update_values(vals)
        items, offsets, states_l, mn, mx, n = s.to_row()
        row = ([float(x) for x in items], [int(o) for o in offsets],
               [int(st) for st in states_l], float(mn), float(mx), float(n))
        state.update(row)
        if window_col:
            wm = state.getCurrentWatermarkMs()
            end_ms = _window_end_ms(key[win_idx])
            state.setTimeoutTimestamp(max(end_ms + allowed_lateness_ms, wm + 1))
        yield pd.DataFrame([tuple(key) + row],
                           columns=[f.name for f in out_schema.fields])

    return (df.groupBy(*group_cols)
            .applyInPandasWithState(update, out_schema, REQ_STATE_SCHEMA,
                                    "update", timeout))


def dedup_stream(stream: DataFrame, key_cols: Sequence[str],
                 ts_col: str = "ts", delay: str = "2 days") -> DataFrame:
    """Watermark-bounded streaming deduplication over ``key_cols`` —
    Spark's ``dropDuplicatesWithinWatermark`` with event-time state
    eviction, the 100 TB-safe form: plain ``dropDuplicates`` on a stream
    keeps an UNBOUNDED key log for the life of the query, while
    within-watermark state is bounded by delay x arrival rate and evicted
    as event time advances.

    Exactness under time-ordered replay (any number of unioned source
    legs): a duplicate is missed only if its first copy's state was
    evicted before the second copy arrived. Eviction needs the GLOBAL
    watermark — the MIN across sources under Spark's default
    multipleWatermarkPolicy — to pass the key's event time + delay, and a
    time-ordered source sits at ~the event time it is delivering, so the
    global watermark trails every in-flight event time by >= delay. The
    same argument shows no well-ordered row is ever dropped as late. Rows
    with event time AT or before 1970-01-01T00:00:00 DO drop against
    Spark's zero-initialized first-batch watermark — the late filter is
    ``event_time <= watermark``, so the floor is exclusive at exactly
    epoch (the same floor as the windowed aggregates, restate it in any
    batch oracle) — and NULL event times never advance the watermark.

    NULL key components compare EQUAL (groupBy semantics), matching SQL
    ``SELECT DISTINCT``; NaN compares equal to NaN on both engines.
    """
    return (stream.withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark(list(key_cols)))
