"""North-star run mode: `spark-submit --py-files <zip>` (BASELINE.json
north_star: "runs via spark-submit --py-files on multi-executor clusters").

Packages the working tree the way scripts/make_dist.sh does, then submits a
self-contained job whose ONLY route to the library is the --py-files zip:
the job runs from an empty temp cwd, so a repo-root sys.path leak cannot
mask a packaging defect (missing module, repo-relative file dependency).
The job builds a grouped digest through the full mapInPandas-partial ->
merge aggregation path and prints quantiles the test asserts.
"""

import json
import os
import pathlib
import subprocess
import sys
import tempfile
import zipfile

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"

JOB = """
import json
from pyspark.sql import SparkSession
import pyspark.sql.functions as F

spark = (SparkSession.builder.master("local[4]")
         .appName("tdigest-submit-smoke")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())

from t_digest_spark.operators.aggregation import tdigest_quantile_aggregate

df = spark.range(0, 100_000).select(
    (F.col("id") % 2).alias("grp"),
    (F.col("id") % 1000).cast("double").alias("x"))
rows = tdigest_quantile_aggregate(
    df, "x", ["grp"], quantiles={"p50": 0.5, "p99": 0.99}).collect()
out = {str(r["grp"]): {"p50": r["p50"], "p99": r["p99"], "n": r["count"]}
       for r in rows}
print("RESULT:" + json.dumps(out, sort_keys=True))
spark.stop()
"""


def _make_zip(path: pathlib.Path) -> None:
    """scripts/make_dist.sh packaging, hermetic copy (no dist/ mutation)."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(ROOT / "t_digest_spark"):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    p = pathlib.Path(root) / f
                    z.write(p, p.relative_to(ROOT))


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not installed")
def test_spark_submit_py_files():
    with tempfile.TemporaryDirectory(prefix="tdigest_submit_") as work:
        work = pathlib.Path(work)
        zip_path = work / "t_digest_spark.zip"
        _make_zip(zip_path)
        job = work / "job.py"
        job.write_text(JOB)

        env = dict(os.environ)
        env.pop("PYTHONPATH", None)        # the zip must be the only route
        env.setdefault("PYSPARK_PYTHON", sys.executable)
        res = subprocess.run(
            [SPARK_SUBMIT, "--master", "local[4]",
             "--py-files", str(zip_path), str(job)],
            cwd=work, env=env, capture_output=True, text=True, timeout=300)
        assert res.returncode == 0, res.stderr[-3000:]

        line = next(l for l in res.stdout.splitlines()
                    if l.startswith("RESULT:"))
        out = json.loads(line[len("RESULT:"):])
        assert set(out) == {"0", "1"}
        for grp in ("0", "1"):
            assert out[grp]["n"] == 50_000
            # x = id % 1000: each group sees 500 distinct values uniformly,
            # p50 within a couple of rank-error units of the exact median
            assert abs(out[grp]["p50"] - 499.5) < 15, out
            assert out[grp]["p99"] > 975, out
