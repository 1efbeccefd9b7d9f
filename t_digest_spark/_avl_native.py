"""Optional C fast path for the AVLTreeDigest per-point add loop.

The AVL variant clusters point-by-point (AVLTreeDigest.java:85-160) and
cannot be vectorized the way the MergingDigest sweep can, so its Python
loop costs ~2.6us/pt — ~20x the vectorized merge kernel. This module
compiles (with the system C compiler, at first use, cached by source
hash) a C translation of EXACTLY the same per-point algorithm and drives
it through ctypes. Bit-for-bit parity with the Python loop is by
construction and pinned by tests/test_avl_native.py:

  * identical floating-point operation order, compiled with
    -ffp-contract=off (no FMA contraction) and no -ffast-math, so every
    double result is the same IEEE value the Python expression produces;
  * libm log() is the same glibc symbol CPython's math.log binds;
  * the reservoir tie-break consumes the digest's OWN buffered RNG
    stream (avl.py:_next_rand): C reads the live 256-double buffer in
    place and refills it through a Python callback that draws
    `rng.random(256)` exactly when the buffer exhausts — the same draw
    pattern, so mixing native and pure-Python adds on one digest stays
    on one stream.

Scope: scales k2 (the package default and the gate configuration) and
k2_glued (the SpeedComparison parity cell); any other scale, invalid
inputs (NaN / non-positive weights, which must raise at the exact
offending point), a missing compiler, or a failed self-test silently
falls back to the pure-Python loop. The rare compress
(> 20*delta live centroids) returns control to Python — it is amortized
over thousands of adds and consumes no RNG.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SOURCE = r"""
#include <math.h>
#include <string.h>

/* draw from the live Python-side buffer; refill via callback when spent
   (mirrors avl.py:_next_rand: check-before-read, index reset to 0) */
typedef void (*refill_fn)(void);

static double next_rand(double *buf, long *i, refill_fn refill) {
    if (*i >= 256) { refill(); *i = 0; }
    return buf[(*i)++];
}

/* k-limit term: k2 is q(1-q)/norm; k2_glued is flat (0.25/norm) below
   the 0.5 split and k2 above it (ScaleFunction.java:368-456 via
   scales.py max_scalar — identical FP expressions) */
static double kmax(double q, double norm, int glued) {
    if (glued && q <= 0.5) return 0.5 * (1.0 - 0.5) / norm;
    return q * (1.0 - q) / norm;
}

/* One batch of AVLTreeDigest adds, scale k2 or k2_glued (glued flag).
   Returns the number of points consumed; a return < nv means the
   compress trigger fired (n > 20*delta) and the caller must compress
   and re-enter. */
long avl_add_batch(double *means, double *counts, long *n_io,
                   const double *vals, const double *wts, long nv,
                   double *total_io, double *min_io, double *max_io,
                   double delta, int glued,
                   double *rand_buf, long *rand_i_io, refill_fn refill) {
    long n = *n_io;
    double total = *total_io, mn = *min_io, mx = *max_io;
    long p;
    for (p = 0; p < nv; p++) {
        double x = vals[p];
        double w = wts ? wts[p] : 1.0;
        long lo, hi, j;
        if (x < mn) mn = x;
        if (x > mx) mx = x;
        if (n == 0) {                      /* first point: total SET, no
                                              compress check (avl.py add) */
            means[0] = x; counts[0] = w; n = 1; total = w;
            continue;
        }
        /* floor: bisect_left(means, x) - 1, clamped to 0 */
        lo = 0; hi = n;
        while (lo < hi) {
            long mid = (lo + hi) >> 1;
            if (means[mid] < x) lo = mid + 1; else hi = mid;
        }
        {
        long start = lo - 1;
        double min_dist, tt, norm, n_cand, head;
        long last, closest;
        if (start < 0) start = 0;
        /* forward scan to the first distance increase */
        min_dist = INFINITY;
        last = n;
        for (j = start; j < n; j++) {
            double z = means[j] - x;
            if (z < 0.0) z = -z;
            if (z < min_dist) { start = j; min_dist = z; }
            else if (z > min_dist) { last = j; break; }
        }
        /* k2 normalizer: delta / (4 ln(max(total,1)/delta) + 24) */
        tt = total > 1.0 ? total : 1.0;
        norm = delta / (4.0 * log(tt / delta) + 24.0);
        closest = -1;
        n_cand = 0.0;
        head = 0.0;
        for (j = 0; j < start; j++) head += counts[j];
        for (j = start; j < last; j++) {
            double cj = counts[j];
            double q0 = head / total;
            double q1 = q0 + cj / total;
            double k0 = total * kmax(q0, norm, glued);
            double k1 = total * kmax(q1, norm, glued);
            double lim = k0 < k1 ? k0 : k1;
            if (cj + w <= lim) {
                n_cand += 1.0;
                if (next_rand(rand_buf, rand_i_io, refill) < 1.0 / n_cand)
                    closest = j;
            }
            head += cj;
        }
        if (closest < 0) {
            /* insert at bisect_right(means, x): ties go after */
            lo = 0; hi = n;
            while (lo < hi) {
                long mid = (lo + hi) >> 1;
                if (x < means[mid]) hi = mid; else lo = mid + 1;
            }
            memmove(means + lo + 1, means + lo, (n - lo) * sizeof(double));
            memmove(counts + lo + 1, counts + lo, (n - lo) * sizeof(double));
            means[lo] = x; counts[lo] = w; n++;
        } else {
            /* clamped weighted average, inlined like avl.py */
            double m0 = means[closest], c0 = counts[closest];
            double lv, lw, hv, hw, new_mean, new_count;
            if (m0 <= x) { lv = m0; lw = c0; hv = x; hw = w; }
            else         { lv = x;  lw = w;  hv = m0; hw = c0; }
            new_mean = (lv * lw + hv * hw) / (lw + hw);
            if (new_mean < lv) new_mean = lv;
            else if (new_mean > hv) new_mean = hv;
            new_count = c0 + w;
            if (new_mean == means[closest]) {
                counts[closest] = new_count;
            } else if ((closest == 0 || means[closest - 1] <= new_mean)
                       && (closest == n - 1 || new_mean < means[closest + 1])) {
                means[closest] = new_mean;
                counts[closest] = new_count;
            } else {
                memmove(means + closest, means + closest + 1,
                        (n - closest - 1) * sizeof(double));
                memmove(counts + closest, counts + closest + 1,
                        (n - closest - 1) * sizeof(double));
                n--;
                lo = 0; hi = n;
                while (lo < hi) {
                    long mid = (lo + hi) >> 1;
                    if (new_mean < means[mid]) hi = mid; else lo = mid + 1;
                }
                memmove(means + lo + 1, means + lo,
                        (n - lo) * sizeof(double));
                memmove(counts + lo + 1, counts + lo,
                        (n - lo) * sizeof(double));
                means[lo] = new_mean; counts[lo] = new_count; n++;
            }
        }
        total += w;
        if ((double)n > 20.0 * delta) { p++; break; }
        }
    }
    *n_io = n; *total_io = total; *min_io = mn; *max_io = mx;
    return p;
}
"""

_REFILL_CB = ctypes.CFUNCTYPE(None)
_lib = None          # resolved CDLL, False = permanently unavailable


def _cache_dir() -> str:
    """Per-user 0700 cache directory: loading a .so from a predictable
    world-writable path (/tmp/tdigest_avl_<hash>.so) would let any local
    user pre-plant a library that dlopen runs constructors from. The dir
    is created 0700 and verified owned-by-us and non-world-writable on
    every use (a pre-existing attacker-owned dir is rejected)."""
    d = os.path.join(tempfile.gettempdir(), f"tdigest-native-{os.getuid()}")
    os.makedirs(d, mode=0o700, exist_ok=True)
    st = os.stat(d)
    if st.st_uid != os.getuid() or (st.st_mode & 0o022):
        raise PermissionError(f"unsafe native cache dir {d}")
    return d


def _build() -> "ctypes.CDLL | None":
    """Compile (once per source hash, cached per-user) and load."""
    tag = hashlib.md5(_C_SOURCE.encode()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"tdigest_avl_{tag}.so")
    if not os.path.exists(so_path):
        cc = os.environ.get("CC", "cc")
        fd, c_path = tempfile.mkstemp(suffix=".c")
        with os.fdopen(fd, "w") as f:
            f.write(_C_SOURCE)
        tmp_so = so_path + f".{os.getpid()}.tmp"
        try:
            subprocess.run(
                [cc, "-O2", "-fPIC", "-shared", "-ffp-contract=off",
                 "-o", tmp_so, c_path, "-lm"],
                check=True, capture_output=True, timeout=120)
            os.rename(tmp_so, so_path)      # atomic under concurrent workers
        finally:
            os.unlink(c_path)
            if os.path.exists(tmp_so):
                os.unlink(tmp_so)
    lib = ctypes.CDLL(so_path)
    lib.avl_add_batch.restype = ctypes.c_long
    lib.avl_add_batch.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_long),
        _REFILL_CB,
    ]
    return lib


def _self_test(lib) -> bool:
    """Native vs pure-Python parity on a small adversarial stream (ties,
    weights, a compress trigger via tiny delta). Exact equality required."""
    from t_digest_spark.avl import AVLTreeDigest
    rng = np.random.default_rng(12345)
    vals = np.concatenate([rng.normal(0, 1, 4000),
                           np.repeat(3.25, 500),
                           rng.uniform(-2, 2, 1500)])
    wts = rng.integers(1, 4, len(vals)).astype(np.float64)
    ref = AVLTreeDigest(delta=20, seed=7)
    for v, w in zip(vals.tolist(), wts.tolist()):
        ref.add(v, w)
    nat = AVLTreeDigest(delta=20, seed=7)
    if not _batch_add_with(lib, nat, vals, wts):
        return False
    if not (nat.means == ref.means and nat.counts == ref.counts
            and nat.total == ref.total and nat.min == ref.min
            and nat.max == ref.max and nat._rand_i == ref._rand_i
            and ((nat._rand_buf is None and ref._rand_buf is None)
                 or np.array_equal(nat._rand_buf, ref._rand_buf))):
        return False
    gref = AVLTreeDigest(delta=50, scale="k2_glued", seed=3)
    for v in vals[:2000].tolist():
        gref.add(v)
    gnat = AVLTreeDigest(delta=50, scale="k2_glued", seed=3)
    if not _batch_add_with(lib, gnat, vals[:2000], None):
        return False
    return gnat.means == gref.means and gnat.counts == gref.counts


def _get_lib():
    global _lib
    if _lib is None:
        try:
            lib = _build()
            _lib = lib if _self_test(lib) else False
        except Exception:
            _lib = False
    return _lib or None


def _batch_add_with(lib, digest, vals: np.ndarray,
                    wts: "np.ndarray | None") -> bool:
    """Drive the native loop for one pre-validated batch."""
    dbl_p = ctypes.POINTER(ctypes.c_double)

    # live RNG buffer shared with the Python path; a None buffer stays
    # untouched until the first draw actually happens (stream position
    # must not move for draw-free batches)
    was_none = digest._rand_buf is None
    if was_none:
        digest._rand_buf = np.zeros(256, dtype=np.float64)
        digest._rand_i = 256                 # force refill on first draw
    elif not isinstance(digest._rand_buf, np.ndarray):
        digest._rand_buf = np.asarray(digest._rand_buf, dtype=np.float64)
    rand_buf = digest._rand_buf
    refilled = [False]

    @_REFILL_CB
    def _refill():
        refilled[0] = True
        rand_buf[:] = digest._rng.random(256)

    n0 = len(digest.means)
    consumed = 0
    nv = len(vals)
    while consumed < nv:
        remaining = nv - consumed
        cap = n0 + remaining + 8
        means = np.empty(cap, dtype=np.float64)
        counts = np.empty(cap, dtype=np.float64)
        means[:n0] = digest.means
        counts[:n0] = digest.counts
        n_io = ctypes.c_long(n0)
        total_io = ctypes.c_double(digest.total)
        min_io = ctypes.c_double(digest.min)
        max_io = ctypes.c_double(digest.max)
        rand_i_io = ctypes.c_long(digest._rand_i)
        done = lib.avl_add_batch(
            means.ctypes.data_as(dbl_p), counts.ctypes.data_as(dbl_p),
            ctypes.byref(n_io),
            vals[consumed:].ctypes.data_as(dbl_p),
            wts[consumed:].ctypes.data_as(dbl_p) if wts is not None else None,
            remaining,
            ctypes.byref(total_io), ctypes.byref(min_io),
            ctypes.byref(max_io),
            digest.delta,
            1 if getattr(digest._scale, "name", None) == "k2_glued" else 0,
            rand_buf.ctypes.data_as(dbl_p), ctypes.byref(rand_i_io),
            _refill)
        n0 = n_io.value
        digest.means = means[:n0].tolist()
        digest.counts = counts[:n0].tolist()
        digest.total = total_io.value
        digest.min = min_io.value
        digest.max = max_io.value
        digest._rand_i = rand_i_io.value
        consumed += done
        # the trigger can fire on the LAST point of a batch, in which case
        # done == remaining — detect it from the state, not the count, or
        # the compress the Python loop runs inside add() would be skipped
        if n0 > 20.0 * digest.delta:
            digest.compress()
            n0 = len(digest.means)
    if was_none and not refilled[0]:
        # no draw ever happened: restore the canonical pristine state the
        # Python path would hold (buffer allocated lazily at first draw)
        digest._rand_buf = None
        digest._rand_i = 0
    return True


def batch_add(digest, vals: np.ndarray, wts: "np.ndarray | None") -> bool:
    """Native add_values. Returns False (caller must run the Python loop)
    when the scale is not k2/k2_glued, inputs need Python's per-point
    error semantics, or the native library is unavailable."""
    if getattr(digest._scale, "name", None) not in ("k2", "k2_glued"):
        return False
    if len(vals) == 0:
        return True
    if np.isnan(vals).any():
        return False                         # Python loop raises in-order
    if wts is not None and (len(wts) != len(vals) or not (wts > 0).all()):
        return False
    lib = _get_lib()
    if lib is None:
        return False
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    if wts is not None:
        wts = np.ascontiguousarray(wts, dtype=np.float64)
    return _batch_add_with(lib, digest, vals, wts)
