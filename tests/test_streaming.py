"""Structured Streaming digest: incremental micro-batches == batch digest."""

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F

from t_digest_spark.core import Dist, TDigest
from t_digest_spark.serde import digest_from_cells
from t_digest_spark.streaming import tdigest_stream_aggregate


@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("stream-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _write_batch(spark, in_dir, pdf, name):
    tmp = os.path.join(in_dir, "_tmp_" + name)
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
    os.rename(os.path.join(tmp, part), os.path.join(in_dir, name + ".parquet"))
    shutil.rmtree(tmp)


def test_stream_digest_matches_batch(spark):
    rng = np.random.default_rng(42)
    batch1 = pd.DataFrame({
        "g": np.repeat(["a", "b"], 2000),
        "x": np.concatenate([rng.normal(10, 2, 2000), rng.uniform(0, 1, 2000)]),
    })
    batch2 = pd.DataFrame({
        "g": np.repeat(["a", "b"], 1500),
        "x": np.concatenate([rng.normal(12, 2, 1500), rng.uniform(0.5, 1.5, 1500)]),
    })

    work = tempfile.mkdtemp(prefix="tdigest_stream_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)
    try:
        _write_batch(spark, in_dir, batch1, "b1")

        stream = (spark.readStream
                  .schema("g string, x double")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(in_dir))
        digests = tdigest_stream_aggregate(stream, "x", ["g"])
        q = (digests.writeStream.format("memory").queryName("dig_stream")
             .outputMode("update").option("checkpointLocation", ckpt)
             .start())
        try:
            q.processAllAvailable()
            first = {r.g: r for r in
                     spark.sql("select * from dig_stream").collect()}
            assert set(first) == {"a", "b"}
            assert first["a"]["count"] == 2000.0  # .count is Row's method

            _write_batch(spark, in_dir, batch2, "b2")
            q.processAllAvailable()
        finally:
            q.stop()

        # memory sink in update mode appends refreshed rows; last row per key
        # is the live state
        rows = spark.sql("select * from dig_stream").collect()
        latest = {}
        for r in rows:
            latest[r.g] = r
        assert latest["a"]["count"] == 3500.0
        assert latest["b"]["count"] == 3500.0

        all_a = np.concatenate([batch1[batch1.g == "a"].x.to_numpy(),
                                batch2[batch2.g == "a"].x.to_numpy()])
        d = digest_from_cells(latest["a"].means, latest["a"].weights,
                              latest["a"].dmin, latest["a"].dmax, 100.0, "k2")
        for qq in (0.1, 0.5, 0.9, 0.99):
            exact = Dist.quantile(qq, np.sort(all_a))
            # reference quantile-accuracy ballpark at delta=100 (AccuracyTest
            # abs tolerance scaled to the value range)
            assert abs(d.cdf(exact) - qq) < 0.02
        assert d.min == all_a.min()
        assert d.max == all_a.max()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_stream_restart_resumes_from_checkpoint(spark):
    """Stop a stateful digest stream mid-input, restart the SAME query
    definition against the SAME checkpoint, feed the rest: the restarted
    query must recover its digest state from the state store (count 3500,
    not 1500) WITHOUT replaying already-committed source files (not 5500)
    — the Structured-Streaming form of the north rule's checkpoint-resume
    requirement (the batch form is operators/checkpoint.py, gate query
    checkpoint_resume)."""
    rng = np.random.default_rng(7)
    batch1 = pd.DataFrame({
        "g": np.repeat(["a", "b"], 2000),
        "x": np.concatenate([rng.normal(10, 2, 2000), rng.uniform(0, 1, 2000)]),
    })
    batch2 = pd.DataFrame({
        "g": np.repeat(["a", "b"], 1500),
        "x": np.concatenate([rng.normal(12, 2, 1500), rng.uniform(0.5, 1.5, 1500)]),
    })

    work = tempfile.mkdtemp(prefix="tdigest_stream_restart_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")   # shared across both query runs
    os.makedirs(in_dir)

    def _start(sink_rows):
        # foreachBatch, not the memory sink: memory cannot recover from an
        # existing checkpoint ("This query does not support recovering...")
        stream = (spark.readStream
                  .schema("g string, x double")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(in_dir))
        digests = tdigest_stream_aggregate(stream, "x", ["g"])
        return (digests.writeStream
                .foreachBatch(lambda bdf, _bid: sink_rows.extend(bdf.collect()))
                .outputMode("update").option("checkpointLocation", ckpt)
                .start())

    try:
        _write_batch(spark, in_dir, batch1, "b1")
        run1_rows = []
        q = _start(run1_rows)
        try:
            q.processAllAvailable()
            first = {r.g: r for r in run1_rows}
            assert first["a"]["count"] == 2000.0
        finally:
            q.stop()

        # New data lands while the query is DOWN; restart from checkpoint.
        _write_batch(spark, in_dir, batch2, "b2")
        run2_rows = []
        q2 = _start(run2_rows)
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()

        # The fresh sink only sees rows emitted AFTER restart, so a
        # correct resume shows recovered-state + new-batch totals.
        latest = {}
        for r in run2_rows:
            latest[r.g] = r
        assert set(latest) == {"a", "b"}
        assert latest["a"]["count"] == 3500.0   # 1500 = state lost; 5500 = replay
        assert latest["b"]["count"] == 3500.0

        all_a = np.concatenate([batch1[batch1.g == "a"].x.to_numpy(),
                                batch2[batch2.g == "a"].x.to_numpy()])
        d = digest_from_cells(latest["a"].means, latest["a"].weights,
                              latest["a"].dmin, latest["a"].dmax, 100.0, "k2")
        for qq in (0.1, 0.5, 0.9, 0.99):
            exact = Dist.quantile(qq, np.sort(all_a))
            assert abs(d.cdf(exact) - qq) < 0.02
        assert d.min == all_a.min()
        assert d.max == all_a.max()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_windowed_stream_digest(spark):
    """Event-time windowed digests: the window struct joins the grouping key
    (with_event_window), so each (window, key) holds its own digest state."""
    import datetime as dt
    from t_digest_spark.streaming import with_event_window

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    rng = np.random.default_rng(5)
    for minute in (0, 1, 2, 3):          # two 2-minute windows
        for _ in range(500):
            rows.append({"ts": base + dt.timedelta(minutes=minute),
                         "g": "a", "x": float(rng.normal(10 * (minute // 2), 1))})
    pdf = pd.DataFrame(rows)

    work = tempfile.mkdtemp(prefix="tdigest_win_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    try:
        _write_batch(spark, in_dir, pdf, "b1")
        stream = (spark.readStream
                  .schema("ts timestamp, g string, x double")
                  .parquet(in_dir))
        windowed = with_event_window(stream, "ts", "2 minutes",
                                     watermark="10 minutes")
        digests = tdigest_stream_aggregate(windowed, "x", ["win", "g"],
                                           window_col="win")
        q = (digests.writeStream.format("memory").queryName("win_stream")
             .outputMode("update")
             .option("checkpointLocation", os.path.join(work, "ck")).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.sql("select * from win_stream").collect()
        assert len(got) == 2  # two event-time windows
        by_start = {r.win.start.minute: r for r in got}
        assert set(by_start) == {0, 2}
        for start_min, center in ((0, 0.0), (2, 10.0)):
            r = by_start[start_min]
            assert r["count"] == 1000.0
            d = digest_from_cells(r.means, r.weights, r.dmin, r.dmax, 100.0, "k2")
            assert abs(d.quantile(0.5) - center) < 0.2
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_windowed_stream_watermark_expiry(spark):
    """Late data beyond the watermark must not resurrect an expired window's
    state; data within the watermark still folds in."""
    import datetime as dt
    from t_digest_spark.streaming import with_event_window

    base = dt.datetime(2026, 3, 1, 0, 0, 0)
    early = pd.DataFrame({
        "ts": [base + dt.timedelta(minutes=m) for m in (0, 0, 1, 1)] * 250,
        "g": ["a"] * 1000,
        "x": np.random.default_rng(2).normal(0, 1, 1000),
    })
    # push event time far ahead so the first window passes the watermark
    ahead = pd.DataFrame({
        "ts": [base + dt.timedelta(minutes=60)] * 500,
        "g": ["a"] * 500,
        "x": np.random.default_rng(3).normal(50, 1, 500),
    })
    # late straggler for the long-expired first window
    late = pd.DataFrame({
        "ts": [base + dt.timedelta(minutes=0, seconds=30)] * 100,
        "g": ["a"] * 100,
        "x": np.random.default_rng(4).normal(-50, 1, 100),
    })

    work = tempfile.mkdtemp(prefix="tdigest_wm_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    try:
        stream = (spark.readStream
                  .schema("ts timestamp, g string, x double")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(in_dir))
        windowed = with_event_window(stream, "ts", "2 minutes",
                                     watermark="5 minutes")
        digests = tdigest_stream_aggregate(windowed, "x", ["win", "g"],
                                           window_col="win")
        q = (digests.writeStream.format("memory").queryName("wm_stream")
             .outputMode("update")
             .option("checkpointLocation", os.path.join(work, "ck")).start())
        try:
            _write_batch(spark, in_dir, early, "b1")
            q.processAllAvailable()
            _write_batch(spark, in_dir, ahead, "b2")
            q.processAllAvailable()
            _write_batch(spark, in_dir, late, "b3")
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql("select * from wm_stream").collect()
        latest = {}
        for r in rows:
            latest[r.win.start] = r
        first_win = latest[base]
        # the late batch (mean -50) must NOT appear in the expired window:
        # count stays 1000 and min stays near the N(0,1) sample range
        assert first_win["count"] == 1000.0
        assert first_win.dmin > -20.0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_kll_stream_matches_batch(spark):
    """Streaming KLL state == batch KLL within the published bound, and the
    emitted rows stay mergeable with the batch operators."""
    from t_digest_spark.sketches.kll import KllSketch
    from t_digest_spark.streaming import kll_stream_aggregate

    rng = np.random.default_rng(44)
    b1 = pd.DataFrame({"g": ["s"] * 4000, "x": rng.normal(0, 1, 4000)})
    b2 = pd.DataFrame({"g": ["s"] * 3000, "x": rng.normal(1, 1, 3000)})
    work = tempfile.mkdtemp(prefix="kll_stream_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    try:
        _write_batch(spark, in_dir, b1, "b1")
        stream = (spark.readStream.schema("g string, x double")
                  .option("maxFilesPerTrigger", "1").parquet(in_dir))
        q = (kll_stream_aggregate(stream, "x", ["g"])
             .writeStream.format("memory").queryName("kll_stream")
             .outputMode("update")
             .option("checkpointLocation", os.path.join(work, "ck")).start())
        try:
            q.processAllAvailable()
            _write_batch(spark, in_dir, b2, "b2")
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql("select * from kll_stream").collect()
        last = rows[-1]
        assert last["count"] == 7000.0
        s = KllSketch.from_row(last["items"], last["offsets"], last.kmin,
                               last.kmax, last["count"])
        allv = np.sort(np.concatenate([b1.x.to_numpy(), b2.x.to_numpy()]))
        for q_ in (0.1, 0.5, 0.9):
            rank = np.searchsorted(allv, s.quantile(q_)) / len(allv)
            assert abs(rank - q_) < 0.02, q_
        assert s.min == allv[0] and s.max == allv[-1]
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_windowed_kll_stream_expiry(spark):
    """KLL accumulator state lifecycle mirrors the digest one: windowed state
    expires past the watermark and late rows cannot resurrect it."""
    import datetime as dt
    from t_digest_spark.sketches.kll import KllSketch
    from t_digest_spark.streaming import kll_stream_aggregate, with_event_window

    base = dt.datetime(2026, 4, 1, 0, 0, 0)
    early = pd.DataFrame({
        "ts": [base + dt.timedelta(minutes=m) for m in (0, 0, 1, 1)] * 250,
        "g": ["a"] * 1000,
        "x": np.random.default_rng(12).normal(0, 1, 1000),
    })
    ahead = pd.DataFrame({
        "ts": [base + dt.timedelta(minutes=60)] * 500,
        "g": ["a"] * 500,
        "x": np.random.default_rng(13).normal(50, 1, 500),
    })
    late = pd.DataFrame({
        "ts": [base + dt.timedelta(seconds=30)] * 100,
        "g": ["a"] * 100,
        "x": np.random.default_rng(14).normal(-50, 1, 100),
    })
    work = tempfile.mkdtemp(prefix="kll_wm_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    try:
        stream = (spark.readStream
                  .schema("ts timestamp, g string, x double")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(in_dir))
        windowed = with_event_window(stream, "ts", "2 minutes",
                                     watermark="5 minutes")
        sk = kll_stream_aggregate(windowed, "x", ["win", "g"],
                                  window_col="win")
        q = (sk.writeStream.format("memory").queryName("kll_wm_stream")
             .outputMode("update")
             .option("checkpointLocation", os.path.join(work, "ck")).start())
        try:
            _write_batch(spark, in_dir, early, "b1")
            q.processAllAvailable()
            _write_batch(spark, in_dir, ahead, "b2")
            q.processAllAvailable()
            _write_batch(spark, in_dir, late, "b3")
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql("select * from kll_wm_stream").collect()
        latest = {}
        for r in rows:
            latest[r.win.start] = r
        first_win = latest[base]
        assert first_win["count"] == 1000.0      # late batch not folded in
        s = KllSketch.from_row(first_win["items"], first_win["offsets"],
                               first_win.kmin, first_win.kmax,
                               first_win["count"])
        assert s.min > -20.0                     # no N(-50,1) samples
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_histogram_stream_matches_batch(spark):
    """Streaming histogram state == the batch histogram aggregate after all
    triggers, and emitted rows merge with the batch operators."""
    from t_digest_spark.operators.histogram import (HistogramSpec,
                                                    histogram_aggregate)
    from t_digest_spark.streaming import histogram_stream_aggregate

    rng = np.random.default_rng(61)
    b1 = pd.DataFrame({"g": ["s"] * 3000, "x": rng.uniform(0, 100, 3000)})
    b2 = pd.DataFrame({"g": ["s"] * 2000, "x": rng.uniform(0, 100, 2000)})
    spec = HistogramSpec(0.0, 100.0, n_bins=20, kind="linear")
    work = tempfile.mkdtemp(prefix="hist_stream_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    try:
        _write_batch(spark, in_dir, b1, "b1")
        stream = (spark.readStream.schema("g string, x double")
                  .option("maxFilesPerTrigger", "1").parquet(in_dir))
        q = (histogram_stream_aggregate(stream, "x", ["g"], spec)
             .writeStream.format("memory").queryName("hist_stream")
             .outputMode("update")
             .option("checkpointLocation", os.path.join(work, "ck")).start())
        try:
            q.processAllAvailable()
            _write_batch(spark, in_dir, b2, "b2")
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql("select * from hist_stream").collect()
        last = rows[-1]
        assert last.total == 5000
        both = pd.concat([b1, b2])
        batch = histogram_aggregate(
            spark.createDataFrame(both), "x", ["g"], spec).collect()[0]
        assert list(last.counts) == list(batch.counts)
        assert last.underflow == batch.underflow
        assert last.overflow == batch.overflow
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_windowed_histogram_stream_expiry(spark):
    """Histogram accumulator honors the same windowed lifecycle as the
    digest/KLL accumulators: expired windows drop state and late rows
    cannot resurrect them."""
    import datetime as dt
    from t_digest_spark.operators.histogram import HistogramSpec
    from t_digest_spark.streaming import (histogram_stream_aggregate,
                                          with_event_window)

    base = dt.datetime(2026, 5, 1, 0, 0, 0)
    early = pd.DataFrame({
        "ts": [base + dt.timedelta(minutes=m) for m in (0, 0, 1, 1)] * 250,
        "g": ["a"] * 1000,
        "x": np.random.default_rng(71).uniform(0, 50, 1000),
    })
    ahead = pd.DataFrame({
        "ts": [base + dt.timedelta(minutes=60)] * 200,
        "g": ["a"] * 200,
        "x": np.random.default_rng(72).uniform(0, 50, 200),
    })
    late = pd.DataFrame({
        "ts": [base + dt.timedelta(seconds=30)] * 100,
        "g": ["a"] * 100,
        "x": np.random.default_rng(73).uniform(60, 90, 100),  # overflow range
    })
    spec = HistogramSpec(0.0, 50.0, n_bins=10, kind="linear")
    work = tempfile.mkdtemp(prefix="hist_wm_")
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir)
    try:
        stream = (spark.readStream
                  .schema("ts timestamp, g string, x double")
                  .option("maxFilesPerTrigger", "1").parquet(in_dir))
        windowed = with_event_window(stream, "ts", "2 minutes",
                                     watermark="5 minutes")
        h = histogram_stream_aggregate(windowed, "x", ["win", "g"], spec,
                                       window_col="win")
        q = (h.writeStream.format("memory").queryName("hist_wm")
             .outputMode("update")
             .option("checkpointLocation", os.path.join(work, "ck")).start())
        try:
            _write_batch(spark, in_dir, early, "b1")
            q.processAllAvailable()
            _write_batch(spark, in_dir, ahead, "b2")
            q.processAllAvailable()
            _write_batch(spark, in_dir, late, "b3")
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql("select * from hist_wm").collect()
        latest = {}
        for r in rows:
            latest[r.win.start] = r
        first = latest[base]
        assert first.total == 1000          # late overflow batch NOT folded
        assert first.overflow == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_theta_stream_matches_batch(spark):
    """Streaming theta distinct sketch over two micro-batches equals the
    exact distinct count (exact mode at this cardinality) and is mergeable
    with batch theta rows."""
    from t_digest_spark.sketches.theta import ThetaSketch
    from t_digest_spark.streaming import theta_stream_aggregate

    batch1 = pd.DataFrame({"g": ["a"] * 3000 + ["b"] * 3000 + ["a"] * 5,
                           "u": pd.array(list(range(1000)) * 3
                                         + list(range(500, 2000, 1)) * 2
                                         + [None] * 5, dtype="Int64")})
    batch2 = pd.DataFrame({"g": ["a"] * 2000,
                           "u": pd.array(list(range(500, 2500, 1)),
                                         dtype="Int64")})
    # the 5 NULL ids must not count: xxhash64(NULL) is the seed value, a
    # valid hash — the accumulator filters NULL keys like batch theta

    work = tempfile.mkdtemp(prefix="theta_stream_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)
    try:
        _write_batch(spark, in_dir, batch1, "b1")
        stream = (spark.readStream
                  .schema("g string, u long")
                  .option("maxFilesPerTrigger", "1")
                  .parquet(in_dir))
        sk = theta_stream_aggregate(stream, "u", ["g"], k=8192)
        q = (sk.writeStream.format("memory").queryName("theta_stream")
             .outputMode("update").option("checkpointLocation", ckpt)
             .start())
        try:
            q.processAllAvailable()
            _write_batch(spark, in_dir, batch2, "b2")
            q.processAllAvailable()
        finally:
            q.stop()
        latest = {}
        for r in spark.sql("select * from theta_stream").collect():
            latest[r.g] = r
        est_a = ThetaSketch.from_row(latest["a"].retained, latest["a"].theta,
                                     latest["a"].k).estimate()
        est_b = ThetaSketch.from_row(latest["b"].retained, latest["b"].theta,
                                     latest["b"].k).estimate()
        exact_a = len(set(batch1[batch1.g == "a"].u.dropna())
                      | set(batch2.u.dropna()))
        exact_b = len(set(batch1[batch1.g == "b"].u.dropna()))
        assert est_a == float(exact_a)
        assert est_b == float(exact_b)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_frequent_stream_matches_batch(spark):
    """Streaming Misra-Gries over two micro-batches keeps the containment
    guarantee for the heavy key and exact totals."""
    from t_digest_spark.sketches.frequent import FrequentItemsSketch
    from t_digest_spark.streaming import frequent_stream_aggregate

    rng = np.random.default_rng(17)
    def batch(n, heavy_frac):
        keys = np.where(rng.uniform(size=n) < heavy_frac, 7,
                        rng.integers(100, 4000, size=n))
        return pd.DataFrame({"g": "a", "item": keys.astype("int64")})

    b1, b2 = batch(20_000, 0.3), batch(15_000, 0.25)
    work = tempfile.mkdtemp(prefix="fi_stream_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)
    try:
        _write_batch(spark, in_dir, b1, "b1")
        stream = (spark.readStream.schema("g string, item long")
                  .option("maxFilesPerTrigger", "1").parquet(in_dir))
        sk = frequent_stream_aggregate(stream, "item", ["g"], k=256)
        q = (sk.writeStream.format("memory").queryName("fi_stream")
             .outputMode("update").option("checkpointLocation", ckpt)
             .start())
        try:
            q.processAllAvailable()
            _write_batch(spark, in_dir, b2, "b2")
            q.processAllAvailable()
        finally:
            q.stop()
        latest = None
        for r in spark.sql("select * from fi_stream").collect():
            latest = r
        s = FrequentItemsSketch.from_row(latest.keys, latest.counts,
                                         latest.max_error, latest.n, latest.k)
        true7 = int((b1.item == 7).sum() + (b2.item == 7).sum())
        assert s.n == 35_000
        assert s.max_error <= s.n // (s.k + 1) + 2
        assert s.estimate("7") <= true7 <= s.estimate("7") + s.max_error
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_req_stream_matches_batch(spark):
    """Streaming REQ over two micro-batches: exact count, tail quantile
    within the relative-rank envelope, and mergeable with the batch row
    format."""
    from t_digest_spark.sketches.req import ReqSketch
    from t_digest_spark.streaming import req_stream_aggregate

    rng = np.random.default_rng(23)
    b1 = pd.DataFrame({"g": "a", "x": rng.gamma(2.0, 3.0, 30_000)})
    b2 = pd.DataFrame({"g": "a", "x": rng.gamma(2.0, 3.0, 20_000)})
    work = tempfile.mkdtemp(prefix="req_stream_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)
    try:
        _write_batch(spark, in_dir, b1, "b1")
        stream = (spark.readStream.schema("g string, x double")
                  .option("maxFilesPerTrigger", "1").parquet(in_dir))
        sk = req_stream_aggregate(stream, "x", ["g"], k=12, hra=True)
        q = (sk.writeStream.format("memory").queryName("req_stream")
             .outputMode("update").option("checkpointLocation", ckpt)
             .start())
        try:
            q.processAllAvailable()
            _write_batch(spark, in_dir, b2, "b2")
            q.processAllAvailable()
        finally:
            q.stop()
        latest = None
        for r in spark.sql("select * from req_stream").collect():
            latest = r
        s = ReqSketch.from_row(latest["items"], latest["offsets"],
                               latest["states"], latest["rmin"],
                               latest["rmax"], latest["count"], k=12, hra=True)
        assert s.n == 50_000
        allx = np.sort(np.concatenate([b1.x.to_numpy(), b2.x.to_numpy()]))
        for qq in (0.99, 0.999):
            est = s.quantile(qq)
            # rank of the estimate must be within ~4% RELATIVE rank error
            rank = np.searchsorted(allx, est) / allx.size
            assert abs(rank - qq) <= 0.04 * (1 - qq) + 2 / allx.size + 0.004
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_dedup_stream_doubled_legs_exact(spark):
    """Two unioned file-stream legs over the SAME time-ordered files (every
    row duplicated, copies possibly in different micro-batches) dedup back
    to the exact distinct set — the min-policy global-watermark argument in
    dedup_stream's docstring, exercised for real. Also pins: duplicates
    WITHIN a batch collapse, NULL key components compare equal, and the
    deduped output is exactly unique."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    for day in range(8):                      # 8 time-ordered files
        ts = base + dt.timedelta(days=day)
        rows.append(pd.DataFrame({
            "ts": [ts, ts, ts + dt.timedelta(hours=1)],
            "k": [f"k{day}", f"k{day}", None],     # in-batch dup + NULL key
            "v": [float(day), float(day), 7.0],
        }))

    work = tempfile.mkdtemp(prefix="dedup_stream_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)
    try:
        for i, pdf in enumerate(rows):
            _write_batch(spark, in_dir, pdf, f"b{i}")

        from t_digest_spark.streaming import dedup_stream
        schema = "ts timestamp, k string, v double"
        leg = lambda: (spark.readStream.schema(schema)
                       .option("maxFilesPerTrigger", "1").parquet(in_dir))
        doubled = leg().unionByName(leg())
        deduped = dedup_stream(doubled, ["ts", "k", "v"], "ts", "2 days")

        q = (deduped.writeStream.format("memory").queryName("dedup_sink")
             .outputMode("append")
             .option("checkpointLocation", ckpt).start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        got = spark.table("dedup_sink").toPandas()
        want = pd.concat(rows).drop_duplicates()
        assert len(got) == len(want), (len(got), len(want))
        # exact distinct set, NULL-safe
        gs = set(map(tuple, got.astype(str).to_numpy().tolist()))
        ws = set(map(tuple, want.astype(str).to_numpy().tolist()))
        assert gs == ws
        assert not got.duplicated().any()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_dedup_stream_restart_resumes_from_checkpoint(spark):
    """Streaming-dedup form of the checkpoint-resume requirement: stop the
    doubled-leg dedup mid-input, land a batch that REPEATS earlier rows
    plus new ones while the query is down, restart from the SAME
    checkpoint — the restarted query must recover its dedup state (the
    repeated rows stay suppressed: their keys live in the recovered state
    store) and emit exactly the genuinely-new rows once each."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    b1 = pd.DataFrame({
        "ts": [base + dt.timedelta(hours=h) for h in range(4)],
        "k": [f"k{h}" for h in range(4)],
        "v": [float(h) for h in range(4)],
    })
    # b2: two exact repeats of b1 rows + three new rows, slightly later
    b2 = pd.concat([b1.iloc[:2], pd.DataFrame({
        "ts": [base + dt.timedelta(hours=4 + h) for h in range(3)],
        "k": [f"n{h}" for h in range(3)],
        "v": [100.0 + h for h in range(3)],
    })])

    work = tempfile.mkdtemp(prefix="dedup_stream_restart_")
    in_dir = os.path.join(work, "in")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(in_dir)

    from t_digest_spark.streaming import dedup_stream

    def _start(sink_rows):
        stream = (spark.readStream.schema("ts timestamp, k string, v double")
                  .option("maxFilesPerTrigger", "1").parquet(in_dir))
        deduped = dedup_stream(stream, ["ts", "k", "v"], "ts", "2 days")
        return (deduped.writeStream
                .foreachBatch(lambda bdf, _bid: sink_rows.extend(bdf.collect()))
                .outputMode("append").option("checkpointLocation", ckpt)
                .start())

    try:
        _write_batch(spark, in_dir, b1, "b1")
        run1 = []
        q = _start(run1)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        assert len(run1) == 4                       # b1 emitted once each

        _write_batch(spark, in_dir, b2, "b2")       # lands while DOWN
        run2 = []
        q2 = _start(run2)
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        # resume-correct: only the 3 new rows emit. 5 = dedup state lost
        # (repeats re-emitted); 9 = committed source files replayed.
        got = sorted(r.k for r in run2)
        assert got == ["n0", "n1", "n2"], got
    finally:
        shutil.rmtree(work, ignore_errors=True)
