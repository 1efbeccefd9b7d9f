"""Resumable checkpoints: digest state round-trips through Parquet and
resume == from-scratch within merge tolerance (north-rule requirement)."""

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F

from t_digest_spark.core import Dist, TDigest
from t_digest_spark.operators import tdigest_aggregate
from t_digest_spark.operators.checkpoint import (read_checkpoint,
                                                 resume_aggregate,
                                                 write_checkpoint)
from t_digest_spark.serde import digest_from_cells


@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("ckpt-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def test_checkpoint_resume_roundtrip(spark):
    rng = np.random.default_rng(21)
    half1 = pd.DataFrame({"g": np.repeat(["a", "b"], 5000),
                          "x": rng.normal(0, 1, 10000)})
    half2 = pd.DataFrame({"g": np.repeat(["a", "b"], 5000),
                          "x": rng.normal(0.5, 1, 10000)})
    work = tempfile.mkdtemp(prefix="tdigest_ckpt_")
    try:
        ck1 = os.path.join(work, "ck1")
        ck2 = os.path.join(work, "ck2")

        dig1 = tdigest_aggregate(spark.createDataFrame(half1), "x", ["g"])
        write_checkpoint(dig1, ck1, run_id="r0")

        # lineage columns present and digest_bytes decodes to the same digest
        row = read_checkpoint(spark, ck1).where(F.col("g") == "a").collect()[0]
        assert row.run_id == "r0"
        assert row.n_updates == 10000.0 / 2
        d_bytes = TDigest.from_bytes(bytes(row.digest_bytes))
        d_cells = digest_from_cells(row.means, row.weights, row.dmin, row.dmax,
                                    100.0, "k2")
        assert d_bytes.count == d_cells.count == 5000.0
        assert d_bytes.quantile(0.5) == pytest.approx(d_cells.quantile(0.5), abs=1e-12)

        # resume with the second half, writing a new checkpoint
        resumed = resume_aggregate(spark.createDataFrame(half2), ck1, "x", ["g"],
                                   new_run_id="r1", out_checkpoint_path=ck2)
        got = {r.g: r for r in resumed.collect()}
        assert got["a"].run_id == "r1"
        assert got["a"]["count"] == 10000.0

        # accuracy: resumed digest == from-scratch digest over all data
        # within the reference merge tolerance (AccuracyTest.java:137-138)
        all_a = np.sort(np.concatenate([half1[half1.g == "a"].x.to_numpy(),
                                        half2[half2.g == "a"].x.to_numpy()]))
        d = digest_from_cells(got["a"].means, got["a"].weights,
                              got["a"].dmin, got["a"].dmax, 100.0, "k2")
        for q in (0.01, 0.25, 0.5, 0.9, 0.99):
            exact = Dist.quantile(q, all_a)
            assert abs(d.cdf(exact) - q) < 0.015, q
        assert d.min == all_a[0] and d.max == all_a[-1]
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_wire_codec_cross_checkpoint(spark):
    """digest_bytes uses the reference verbose wire layout
    (MergingDigest.java:875-887): decodable standalone, quantiles intact."""
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({"x": rng.uniform(0, 100, 20000)})
    work = tempfile.mkdtemp(prefix="tdigest_wire_")
    try:
        ck = os.path.join(work, "ck")
        dig = tdigest_aggregate(spark.createDataFrame(pdf), "x", None)
        write_checkpoint(dig, ck, run_id="w0")
        raw = spark.read.parquet(ck).collect()[0]
        d = TDigest.from_bytes(bytes(raw.digest_bytes))
        ref = digest_from_cells(raw.means, raw.weights, raw.dmin, raw.dmax,
                                100.0, "k2")
        for q in (0.1, 0.5, 0.999):
            assert d.quantile(q) == pytest.approx(ref.quantile(q), abs=1e-9)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_theta_checkpoint_resume_byte_identical(spark, tmp_path):
    """Resume from a theta checkpoint == from-scratch over old+new, down to
    the retained hash set (bottom-k union is exactly order-insensitive)."""
    import pyspark.sql.functions as F
    from t_digest_spark.operators.checkpoint import (resume_theta_aggregate,
                                                     write_theta_checkpoint)
    from t_digest_spark.sketches.spark import theta_aggregate
    old = spark.range(0, 60_000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 9000).alias("key"))
    new = spark.range(60_000, 100_000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 13_000).alias("key"))
    ck = str(tmp_path / "theta_ck")
    write_theta_checkpoint(theta_aggregate(old, "key", ["g"], k=2048), ck,
                           run_id="r0")
    resumed = {r["g"]: r for r in
               resume_theta_aggregate(new, ck, "key", ["g"], k=2048,
                                      out_checkpoint_path=str(tmp_path / "ck2"))
               .collect()}
    bulk = {r["g"]: r for r in
            theta_aggregate(old.unionByName(new), "key", ["g"], k=2048)
            .collect()}
    assert set(resumed) == set(bulk) == {0, 1}
    for g in (0, 1):
        assert resumed[g]["theta"] == bulk[g]["theta"]
        assert list(resumed[g]["retained"]) == list(bulk[g]["retained"])
    # lineage metadata present in the checkpoint
    meta = spark.read.parquet(str(tmp_path / "ck2")).select(
        "run_id", "n_retained", "is_estimation").collect()
    assert all(r["run_id"] == "r1" for r in meta)
    assert all(r["n_retained"] > 0 for r in meta)
