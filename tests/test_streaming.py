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
