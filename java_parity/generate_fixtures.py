#!/usr/bin/env python3
"""Generate committed golden fixtures by driving the REAL reference
implementation (compiled in place from /root/reference via build.sh) and
cross-checking every wire codec in both directions.

Run from the repo root:  python java_parity/generate_fixtures.py

Outputs to tests/fixtures/java_parity/:
  md_<name>.bin / md_<name>_small.bin / md_<name>.json   Java-built MergingDigest
  md_<name>_py.bin / md_<name>_py.json                   Python-built bytes + Java's read of them
  avl_* equivalents for AVLTreeDigest
  kll_<name>.bin/.json, kll_<name>_py.bin/.json          DataSketches KLL images
  req_<fmt>.bin/.json, req_<fmt>_py.bin/.json            DataSketches REQ images

Inputs are regenerated deterministically inside tests (seeds below), so the
committed Python-built bytes also pin build determinism.
"""
import json
import pathlib
import subprocess
import sys

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
FIXDIR = ROOT / "tests" / "fixtures" / "java_parity"
BUILD = pathlib.Path("/tmp/java_parity_build")
CLASSES = BUILD / "classes"
TMP = pathlib.Path("/tmp/java_parity_work")

sys.path.insert(0, str(ROOT))
from t_digest_spark.core import TDigest            # noqa: E402
from t_digest_spark.avl import AVLTreeDigest       # noqa: E402
from t_digest_spark.sketches.kll import KllSketch  # noqa: E402
from t_digest_spark.sketches.req import ReqSketch  # noqa: E402

# Deterministic inputs — regenerated identically in tests/test_java_parity.py.
DATASETS = {
    "gamma": lambda: np.random.default_rng(42).gamma(2.0, 3.0, 50_000),
    "uniform": lambda: np.random.default_rng(7).uniform(-1e6, 1e6, 10_000),
    "dups": lambda: np.floor(np.random.default_rng(3).uniform(0, 50, 20_000)),
}


def jrun(*args):
    subprocess.run(["java", "-cp", str(CLASSES), "Harness", *args], check=True)


def cdf_grid(vals):
    return np.linspace(float(vals.min()), float(vals.max()), 9)


def main():
    subprocess.run([str(ROOT / "java_parity" / "build.sh"), str(BUILD)], check=True)
    FIXDIR.mkdir(parents=True, exist_ok=True)
    TMP.mkdir(parents=True, exist_ok=True)

    for name, gen in DATASETS.items():
        vals = gen().astype(np.float64)
        infile = TMP / f"{name}.doubles"
        vals.astype("<f8").tofile(infile)
        cdfs = cdf_grid(vals)
        cdffile = TMP / f"{name}.cdf.doubles"
        cdfs.astype("<f8").tofile(cdffile)

        # ---- MergingDigest: Java-built images + Java reading Python bytes
        jrun("merging-build", "100", str(infile),
             str(FIXDIR / f"md_{name}.bin"), str(FIXDIR / f"md_{name}_small.bin"),
             str(FIXDIR / f"md_{name}.json"), str(cdffile))
        d = TDigest.from_values(vals, delta=100.0)
        (FIXDIR / f"md_{name}_py.bin").write_bytes(d.to_bytes())
        jrun("merging-read", str(FIXDIR / f"md_{name}_py.bin"),
             str(FIXDIR / f"md_{name}_py.json"), str(cdffile))

        # ---- AVLTreeDigest
        jrun("avl-build", "100", str(infile),
             str(FIXDIR / f"avl_{name}.bin"), str(FIXDIR / f"avl_{name}_small.bin"),
             str(FIXDIR / f"avl_{name}.json"), str(cdffile))
        a = AVLTreeDigest.from_values(vals, delta=100.0)
        (FIXDIR / f"avl_{name}_py.bin").write_bytes(a.to_bytes())
        jrun("avl-read", str(FIXDIR / f"avl_{name}_py.bin"),
             str(FIXDIR / f"avl_{name}_py.json"), str(cdffile))

        # ---- KLL (DataSketches binary)
        jrun("kll-build", "200", str(infile),
             str(FIXDIR / f"kll_{name}.bin"), str(FIXDIR / f"kll_{name}.json"))
        k = KllSketch.from_values(vals, k=200)
        pybin = FIXDIR / f"kll_{name}_py.bin"
        pybin.write_bytes(k.to_datasketches_bytes())
        # Java must round-trip the Python image byte-identically.
        jrun("kll-roundtrip", str(pybin), str(TMP / "kll_rt.bin"))
        assert (TMP / "kll_rt.bin").read_bytes() == pybin.read_bytes(), \
            f"KLL {name}: Java round-trip of Python image not byte-identical"
        jrun("kll-read", str(pybin), str(FIXDIR / f"kll_{name}_py.json"))

    # ---- REQ: one fixture per wire format (gamma data).
    vals = DATASETS["gamma"]().astype(np.float64)
    req_cases = {
        "estimation": vals,          # multi-compactor
        "exact": vals[:40],          # single compactor
        "rawitems": vals[:3],        # n <= MIN_K
    }
    for fmt, sub in req_cases.items():
        infile = TMP / f"req_{fmt}.doubles"
        sub.astype("<f8").tofile(infile)
        if fmt != "estimation":
            # The reference CAN serialize these formats.
            jrun("req-build", "12", "1", str(infile),
                 str(FIXDIR / f"req_{fmt}.bin"), str(FIXDIR / f"req_{fmt}.json"))
        else:
            # Reference bug: ReqSerDe.getSerBytes (ReqSerDe.java:314-336)
            # undersizes ESTIMATION images by 8 bytes (min/max were widened
            # float->double in the vendored port but the size constant kept
            # the float-based "+24"), so Java CANNOT write this format — it
            # can only read it. Fixture is therefore Python-written only.
            pass
        r = ReqSketch.from_values(sub, k=12, hra=True)
        pybin = FIXDIR / f"req_{fmt}_py.bin"
        pybin.write_bytes(r.to_datasketches_bytes())
        jrun("req-read", str(pybin), str(FIXDIR / f"req_{fmt}_py.json"))
        if fmt == "exact":
            jrun("req-roundtrip", str(pybin), str(TMP / "req_rt.bin"))
            assert (TMP / "req_rt.bin").read_bytes() == pybin.read_bytes(), \
                "REQ exact: Java round-trip of Python image not byte-identical"

    # ---- Scale-function behavioral vectors (all 11 enum values, full grid)
    jrun("scales", str(FIXDIR / "scales.json"))

    # ---- Simple64 codec: Java-compressed words for varied shapes + the
    # Java object stream of a FloatHistogram (payload cross-validated).
    rng = np.random.default_rng(5)
    s64_cases = {
        "zeros": np.zeros(100, dtype=np.int64),
        "small": rng.integers(0, 4, 500),
        "mixed": rng.integers(0, 1000, 300),
        "spiky": np.maximum(0, rng.poisson(3, 400)
                            + rng.integers(0, 2, 400) * rng.integers(0, 100000, 400)),
        "big": rng.integers(0, 2 ** 59, 50),
        "ramp": np.arange(200, dtype=np.int64),
    }
    s64_fix = {}
    for cname, vals in s64_cases.items():
        vals = vals.astype(np.int64)
        infile = TMP / "s64_in.bin"
        vals.view(np.uint64).astype("<u8").tofile(infile)
        jrun("s64-compress", str(infile), str(TMP / "s64_j.bin"))
        jwords = np.fromfile(TMP / "s64_j.bin", dtype="<u8")
        s64_fix[cname] = {"values": [int(v) for v in vals],
                          "java_words": [int(w) for w in jwords]}
    (FIXDIR / "simple64.json").write_text(json.dumps(s64_fix))

    fh_vals = np.random.default_rng(11).gamma(2.0, 3.0, 30_000) + 0.5
    fh_in = TMP / "fh_in.doubles"
    fh_vals.astype("<f8").tofile(fh_in)
    jrun("fhisto-build", "0.4", "100.0", "50", str(fh_in),
         str(FIXDIR / "float_histogram.oos"),
         str(FIXDIR / "float_histogram.json"))

    # ---- Merge algebra: the reference's bulk merge (MergingDigest.add(List))
    # over two digests, with both part states and the merged state dumped.
    merge_inputs = []
    for i in range(10):                      # 10 parts = MegaMerge shape
        f = TMP / f"mm{i}.doubles"
        np.random.default_rng(100 + i).gamma(
            2.0 + 0.05 * i, 3.0, 20_000 + 1000 * i).astype("<f8").tofile(f)
        merge_inputs.append(str(f))
    jrun("merging-merge", "100", str(FIXDIR / "merge"), *merge_inputs)
    jrun("avl-merge", "100", str(FIXDIR / "avl_merge"), *merge_inputs[:5])

    # ---- Comparison (chi2/ks/llr) + Dist oracle vectors; the harness also
    # dumps both digest states so Python compares on identical centroids.
    in1 = TMP / "cmp1.doubles"
    in2 = TMP / "cmp2.doubles"
    np.random.default_rng(42).gamma(2.0, 3.0, 50_000).astype("<f8").tofile(in1)
    np.random.default_rng(9).gamma(2.2, 2.8, 40_000).astype("<f8").tofile(in2)
    jrun("compare", str(in1), str(in2), str(FIXDIR / "compare.json"))

    print(f"fixtures written to {FIXDIR}")


if __name__ == "__main__":
    main()
