"""The t-digest kernel: centroid arrays + sort/sweep merge + quantile/cdf queries.

Behavior-faithful to the reference MergingDigest (reference: core/src/main/java/com/
tdunning/math/stats/MergingDigest.java) but vectorized: instead of the reference's
per-point Java loop (MergingDigest.java:413-503) the merge sweep here walks *clusters*
(a few hundred iterations) and decides each cluster's extent with one vectorized
window computation over the cumulative-weight array. Rows are never visited one at a
time in Python.

Deliberate, documented deviations from the reference (all accuracy-neutral or better):
  * Bulk ingestion buffers Arrow-batch-sized chunks (default 65536 points) instead of
    the reference's ~5*size temp buffer (MergingDigest.java:168-192). Larger buffers
    only improve accuracy (the reference's SinglePassTest.java:36-60 uses buffer >= N
    to isolate *theoretical* accuracy); the internal working compression delta' stays
    at the reference's two-level value sqrt(scale)*delta (MergingDigest.java:200-211)
    so centroid counts match.
  * Cluster means are computed as a pivoted weighted average of the member slice
    instead of the incremental update (MergingDigest.java:461); algebraically equal,
    overflow-safe near DBL_MAX, and clamped into the member mean range.
"""

from __future__ import annotations

import math
import struct
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from t_digest_spark.scales import get_scale

__all__ = ["TDigest", "Dist", "merge_arrays", "sizing"]

_DEFAULT_INGEST_CHUNK = 65536


def sizing(compression: float, buffer_size: int = -1, size: int = -1,
           use_weight_limit: bool = True, use_two_level: bool = True
           ) -> Tuple[float, float, int, int]:
    """Replicates the reference's constructor sizing rules.

    Returns (public_compression, internal_compression, size, buffer_size).
    Reference: MergingDigest.java:118-234 (delta>=10 floor :154-156, weight-limit
    size fudge :159-163, default size 2*delta :166, default buffer 5*size :168-192,
    int-division scale factor :199-202, two-level delta' = sqrt(scale)*delta
    :205-211, +20 fudge :219, buffer >= 2*size :214-224).
    """
    compression = float(compression)
    if compression < 10:
        compression = 10.0
    size_fudge = 0.0
    if use_weight_limit:
        size_fudge = 10.0
        if compression < 30:
            size_fudge += 20.0
    size = int(max(2 * compression + size_fudge, size))
    if buffer_size == -1:
        buffer_size = 5 * size
    if buffer_size <= 2 * size:
        buffer_size = 2 * size
    scale_factor = max(1, buffer_size // size - 1)
    if not use_two_level:
        scale_factor = 1
    public_compression = compression
    internal = math.sqrt(scale_factor) * public_compression
    if size < internal + size_fudge:
        size = int(math.ceil(internal + size_fudge))
    size += 20
    if buffer_size <= 2 * size:
        buffer_size = 2 * size
    return public_compression, internal, size, buffer_size


def merge_arrays(means: np.ndarray, weights: np.ndarray, total: float,
                 compression: float, scale, run_backwards: bool = False,
                 assume_sorted: bool = False,
                 use_weight_limit: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """One merge/compress pass over unsorted (mean, weight) pairs.

    Semantics of the reference sweep (MergingDigest.java:413-503): stable sort by
    mean; greedily grow the current cluster while the size criterion holds;
    sorted positions 1 and n-1 are forced to start new clusters so the
    first/last cluster of a unit-weight stream stays a singleton (:440-443);
    odd passes run backwards to cancel left-to-right bias (:369-371,
    :408-410, :489-495). Two criteria, matching the reference pair:

      * weight limit (default, :104-108, :428-436):
        ``proposed <= total*min(max(q0), max(q2))``
      * k limit (:427, :437-439, :463-465): the cluster may extend while
        ``cum <= total * q(k(q0) + 1)`` — one searchsorted per cluster.

    Vectorization: both conditions depend only on the cluster start state and
    the cumulative weight array, so each cluster's extent is found with one
    boolean window + argmax (weight limit) or one searchsorted (k limit)
    instead of a per-point loop.
    """
    n = means.shape[0]
    if n == 0:
        return np.empty(0), np.empty(0)
    if assume_sorted:
        m = means
        w = weights
    else:
        order = np.argsort(means, kind="stable")
        m = means[order]
        w = weights[order]
    if run_backwards:
        m = m[::-1]
        w = w[::-1]
    if n == 1:
        return m.copy(), w.copy()

    cum = np.cumsum(w)
    normalizer = scale.normalizer(compression, total)

    # Singleton-run fast path. A cluster starting at sorted position s has
    # emitted weight exactly cum[s-1] behind it (path-independent), so whether
    # it can absorb even its immediate neighbor is a pure function of s —
    # computable for ALL positions in one vectorized shot. Positions that
    # cannot absorb are emitted as singleton RUNS wholesale, making the
    # all-singleton regime (delta >= 2n, exact order-statistic digests) cost
    # O(1) Python iterations instead of O(n).
    c_prev_all = np.concatenate((np.zeros(1), cum[:-1]))  # cum[s-1]
    can2 = np.zeros(n, dtype=bool)
    q0_all = c_prev_all[:-1] / total
    sm_cum = None
    if use_weight_limit:
        # scale.max evaluated ONCE over every cumulative-q position; the
        # per-cluster window walk below reuses these values instead of
        # re-applying the (asin-heavy) scale function per window, which was
        # O(n * windows). The q inputs here are cum[j]/total directly; the
        # pre-hoist walk evaluated fl(c_prev + fl(cum[j] - c_prev))/total,
        # which may differ by 1 ulp — so cluster boundaries match the old
        # kernel up to ULP-level q ties (the determinism pins in
        # tests/fixtures guard the CURRENT kernel's output, and digests on
        # either side of such a tie stay within the merge invariant).
        sm_cum = scale.max(cum / total, normalizer)
        sm_zero = float(scale.max(0.0, normalizer))
        prop2 = cum[1:] - c_prev_all[:-1]                 # weight of {s, s+1}
        sm_q0 = np.concatenate(([sm_zero], sm_cum[:n - 2]))
        lim2 = total * np.minimum(sm_q0, sm_cum[1:])
        can2[:-1] = prop2 <= lim2
    else:
        # k-limit: absorb while cum <= total*q(k(q0)+1) (MergingDigest.java:427)
        wlim_all = total * scale.q(scale.k(q0_all, normalizer) + 1.0, normalizer)
        can2[:-1] = cum[1:] <= wlim_all
    # forced cluster breaks: sorted positions 1 and n-1 always start clusters
    can2[0] = False
    can2[n - 2] = False
    true_idx = np.flatnonzero(can2)

    # Finite/infinite boundary breaks (adversarial-inf axis): a cluster must
    # never span the -inf prefix -> finite transition or the finite -> +inf
    # suffix (m is sorted, NaN already rejected). Mixing an infinite point
    # into a finite cluster makes the weighted mean infinite — IEEE-correct
    # but it teleports the cluster's finite mass to the extreme, inflating
    # rank error by the cluster weight. The reference never faces this (its
    # cdf/quantile reject inf at query time); keeping the infinite atoms in
    # their own clusters preserves the k-scale rank bound for the finite
    # mass and represents the atoms exactly. Inf-free inputs: p_neg == 0,
    # p_pos == n, and neither branch below fires — byte-identical sweep.
    p_neg = int(np.searchsorted(m, -np.inf, side="right"))
    p_pos = int(np.searchsorted(m, np.inf, side="left"))
    has_inf = p_neg > 0 or p_pos < n

    seg_m: List[np.ndarray] = []
    seg_w: List[np.ndarray] = []
    s = 0
    while s < n:
        if not can2[s]:
            ti = np.searchsorted(true_idx, s)
            r = int(true_idx[ti]) if ti < true_idx.size else n
            seg_m.append(m[s:r])
            seg_w.append(w[s:r])
            s = r
            continue
        c_prev = float(c_prev_all[s])
        if not use_weight_limit:
            # k-limit extent: one searchsorted, no window walk
            wlim = float(total * scale.q(
                scale.k(c_prev / total, normalizer) + 1.0, normalizer))
            e = int(np.searchsorted(cum, wlim, side="right")) - 1
            e = max(e, s)
            if s == 0:
                e = 0                      # position 1 starts a cluster
            elif s < n - 1:
                e = min(e, n - 2)          # position n-1 starts a cluster
            if has_inf:
                if s < p_neg:
                    e = min(e, p_neg - 1)  # -inf cluster stops at the prefix
                elif s < p_pos:
                    e = min(e, p_pos - 1)  # finite cluster stops before +inf
            cw = float(cum[e] - c_prev)
            if e == s:
                cm = float(m[s])
            else:
                lo, hi = (float(m[s]), float(m[e])) if m[s] <= m[e] else (float(m[e]), float(m[s]))
                if lo == hi or not (math.isfinite(lo) and math.isfinite(hi)):
                    # all-equal cluster (pivoted dot reduces to the pivot —
                    # bit-identical short-circuit) or an all-infinite one
                    # (pivoted dot would be inf-inf = NaN)
                    cm = lo if not math.isfinite(lo) else (
                        hi if not math.isfinite(hi) else lo)
                else:
                    pivot = float(m[s])
                    cm = pivot + float(np.dot(w[s:e + 1], m[s:e + 1] - pivot)) / cw
                    cm = min(max(cm, lo), hi)
            seg_m.append(np.array([cm]))
            seg_w.append(np.array([cw]))
            s = e + 1
            continue
        max_q0 = sm_zero if s == 0 else float(sm_cum[s - 1])
        e = s  # last index included in this cluster
        j0 = s + 1
        win = 512
        while j0 < n:
            j1 = min(n, j0 + win)
            prop = cum[j0:j1] - c_prev  # cluster weight if extended through j
            ok = prop <= total * np.minimum(max_q0, sm_cum[j0:j1])
            # forced cluster breaks at sorted positions 1 and n-1
            if j0 <= 1 < j1:
                ok[1 - j0] = False
            if j0 <= n - 1 < j1:
                ok[n - 1 - j0] = False
            if has_inf:
                # no cluster spans the -inf/finite or finite/+inf boundary
                for fb in (p_neg, p_pos):
                    if 0 < fb < n and j0 <= fb < j1:
                        ok[fb - j0] = False
            bad = np.argmax(~ok) if not ok.all() else -1
            if bad >= 0:
                e = j0 + bad - 1
                break
            e = j1 - 1
            j0 = j1
            win *= 4
        cw = float(cum[e] - c_prev)
        if e == s:
            cm = float(m[s])
        else:
            lo, hi = (float(m[s]), float(m[e])) if m[s] <= m[e] else (float(m[e]), float(m[s]))
            if lo == hi or not (math.isfinite(lo) and math.isfinite(hi)):
                # All-equal cluster: the pivoted dot reduces to the pivot
                # exactly, so short-circuiting is bit-identical. Infinite
                # endpoint: the pivoted form would compute inf-inf = NaN
                # and NaN-poison the centroid (adversarial-inf axis); the
                # true weighted mean of a cluster containing an infinite
                # member IS that infinity. For the pathological cluster
                # holding BOTH -inf and +inf, take the low side — a
                # deterministic pick that keeps the means ordered (IEEE
                # says NaN, which no downstream consumer survives).
                cm = lo if not math.isfinite(lo) else (
                    hi if not math.isfinite(hi) else lo)
            else:
                pivot = float(m[s])
                cm = pivot + float(np.dot(w[s:e + 1], m[s:e + 1] - pivot)) / cw
                cm = min(max(cm, lo), hi)
        seg_m.append(np.array([cm]))
        seg_w.append(np.array([cw]))
        s = e + 1

    om = np.concatenate(seg_m).astype(np.float64, copy=False)
    ow = np.concatenate(seg_w).astype(np.float64, copy=False)
    if run_backwards:
        om = om[::-1].copy()
        ow = ow[::-1].copy()
    return om, ow


def _weighted_average(x1: float, w1: float, x2: float, w2: float) -> float:
    """Order-safe clamped weighted average (AbstractTDigest.java:32-52)."""
    if x1 > x2:
        x1, w1, x2, w2 = x2, w2, x1, w1
    x = (x1 * w1 + x2 * w2) / (w1 + w2)
    return max(x1, min(x, x2))


class TDigest:
    """A mergeable t-digest with MergingDigest semantics.

    State: sorted centroid arrays (means, weights), exact min/max, total weight,
    public compression delta, internal working compression delta' (two-level,
    MergingDigest.java:100-102), and a scale function name.
    """

    __slots__ = ("means", "weights", "min", "max", "delta", "scale_name", "total",
                 "_internal_delta", "_buffer_cap", "_merge_count",
                 "_pending_m", "_pending_w", "_pending_n", "use_alternating",
                 "use_weight_limit")

    def __init__(self, delta: float = 100.0, scale: str = "k2",
                 buffer_size: int = -1, use_alternating: bool = True,
                 unnormalized_ok: bool = False, use_weight_limit: bool = True):
        public, internal, _size, buf = sizing(delta, buffer_size=buffer_size)
        self.delta = public
        self._internal_delta = internal
        self._buffer_cap = buf if buffer_size != -1 else max(buf, _DEFAULT_INGEST_CHUNK)
        self.scale_name = scale.lower()
        sc = get_scale(self.scale_name)  # validate early
        if getattr(sc, "unnormalized", False) and not unnormalized_ok:
            # reference gate: only setUnnormalizedScaleFunction accepts these
            # (TDigest.java:170-180) — centroid count grows ~log(n)
            raise ValueError(
                f"scale {self.scale_name!r} is unnormalized (size grows with "
                "log n); pass unnormalized_ok=True to opt in")
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.min = math.inf
        self.max = -math.inf
        self.total = 0.0
        self._merge_count = 0
        # Alternating merge direction cancels left-to-right bias for
        # mirror-symmetric scales, but applies the size limit to mirrored
        # quantiles — wrong for asymmetric laws (the reference's experiments
        # disable it for GLUED scales, IIDgenerator.java:178-181).
        if getattr(sc, "asymmetric", False):
            use_alternating = False
        self.use_alternating = use_alternating
        # k-limit variant (useWeightLimit=false, MergingDigest.java:104-108)
        self.use_weight_limit = use_weight_limit
        self._pending_m: List[np.ndarray] = []
        self._pending_w: List[np.ndarray] = []
        self._pending_n = 0

    # ------------------------------------------------------------------ build

    @property
    def _scale(self):
        return get_scale(self.scale_name)

    def add(self, x: float, w: float = 1.0) -> None:
        """Stage one sample (NaN rejected, MergingDigest.java:262-264)."""
        self.add_values(np.asarray([x], dtype=np.float64),
                        np.asarray([w], dtype=np.float64))

    def add_values(self, values: Sequence[float], weights: Optional[Sequence[float]] = None) -> None:
        """Stage a batch of samples; flush in buffer-sized chunks.

        The staged batch plays the role of the reference's temp buffer
        (MergingDigest.java:85-97): each flush sorts pending points together with
        the live centroids and runs one merge pass at the internal delta'.
        """
        v = np.asarray(values, dtype=np.float64)
        if v.ndim != 1:
            v = v.ravel()
        if np.isnan(v).any():
            raise ValueError("Cannot add NaN to t-digest")
        if weights is None:
            w = None  # unit weights, materialized lazily at flush
        else:
            w = np.asarray(weights, dtype=np.float64)
            if w.shape != v.shape:
                raise ValueError("values/weights length mismatch")
            keep = w > 0
            if not keep.all():
                v, w = v[keep], w[keep]
        if v.size == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self._pending_m.append(v)
        self._pending_w.append(w)
        self._pending_n += v.size
        if self._pending_n >= self._buffer_cap - self.means.size - 1:
            self._flush()

    def _flush(self, force: bool = False, compression: Optional[float] = None) -> None:
        if self._pending_n == 0 and not force:
            return
        if self._pending_n == 0 and self.total == 0:
            return
        if self._pending_m:
            v = np.concatenate(self._pending_m) if len(self._pending_m) > 1 else self._pending_m[0]
            all_unit = all(pw is None for pw in self._pending_w)
            if all_unit:
                # fast path: quicksort values only; unit weights materialized after
                vs = np.sort(v)
                ws = np.ones_like(vs)
            else:
                pw = np.concatenate([np.ones(len(pm)) if q is None else q
                                     for pm, q in zip(self._pending_m, self._pending_w)])
                order = np.argsort(v, kind="stable")
                vs = v[order]
                ws = pw[order]
            if self.means.size:
                # merge the sorted chunk with the (sorted) live centroids; on ties
                # new points sort first, like the reference's buffer layout
                # (MergingDigest.java:388-391 copies live centroids *after* the
                # incoming points before the stable sort)
                pos = np.searchsorted(vs, self.means, side="right")
                m = np.insert(vs, pos, self.means)
                w = np.insert(ws, pos, self.weights)
            else:
                m, w = vs, ws
        else:
            m, w = self.means, self.weights
        self._pending_m, self._pending_w, self._pending_n = [], [], 0
        self.total = float(w.sum())
        backwards = self.use_alternating and (self._merge_count % 2 == 1)
        self._merge_count += 1
        self.means, self.weights = merge_arrays(
            m, w, self.total,
            compression if compression is not None else self._internal_delta,
            self._scale, run_backwards=backwards, assume_sorted=True,
            use_weight_limit=self.use_weight_limit)
        if self.total > 0 and self.means.size:
            self.min = min(self.min, float(self.means[0]))
            self.max = max(self.max, float(self.means[-1]))

    def compress(self) -> None:
        """Force-flush then re-merge down to the *public* delta
        (MergingDigest.java:556-559; two-level presentation)."""
        self._flush(force=True, compression=self.delta)

    @classmethod
    def from_values(cls, values, weights=None, delta: float = 100.0, scale: str = "k2",
                    compress: bool = True) -> "TDigest":
        d = cls(delta=delta, scale=scale)
        d.add_values(values, weights)
        if compress:
            d.compress()
        else:
            d._flush()
        return d

    @classmethod
    def from_centroids(cls, means, weights, mn: float, mx: float,
                       delta: float = 100.0, scale: str = "k2") -> "TDigest":
        """Rehydrate a digest from already-merged centroid arrays (deserialization)."""
        d = cls(delta=delta, scale=scale)
        d.means = np.asarray(means, dtype=np.float64)
        d.weights = np.asarray(weights, dtype=np.float64)
        d.total = float(d.weights.sum())
        if d.total > 0:
            d.min = float(mn)
            d.max = float(mx)
        return d

    @classmethod
    def merge_all(cls, digests: Iterable["TDigest"], delta: Optional[float] = None,
                  scale: Optional[str] = None, compress: bool = True) -> "TDigest":
        """Merge many digests: concatenate every centroid, ONE merge pass.

        This is the reference's bulk path add(List<TDigest>) (MergingDigest.java:
        313-357): compress each input, concatenate all centroids, single sweep.
        It is the body of our distributed final-aggregate.
        """
        ds = [d for d in digests if d is not None]
        if not ds:
            return cls(delta=delta or 100.0, scale=scale or "k2")
        out = cls(delta=delta if delta is not None else ds[0].delta,
                  scale=scale if scale is not None else ds[0].scale_name)
        ms, ws = [], []
        for d in ds:
            d._flush()
            ms.append(d.means)
            ws.append(d.weights)
            if d.total > 0:
                out.min = min(out.min, d.min)
                out.max = max(out.max, d.max)
        m = np.concatenate(ms)
        w = np.concatenate(ws)
        out.total = float(w.sum())
        if out.total > 0:
            out.means, out.weights = merge_arrays(
                m, w, out.total, out._internal_delta, out._scale,
                use_weight_limit=out.use_weight_limit)
        if compress:
            out.compress()
        return out

    # ------------------------------------------------------------------ query

    @property
    def count(self) -> float:
        # Unit-weight batches stage None in _pending_w (weights materialize
        # lazily at flush) — count each such batch by its value count.
        pending = sum(len(m) if w is None else float(w.sum())
                      for m, w in zip(self._pending_m, self._pending_w))
        return self.total + pending

    def centroid_count(self) -> int:
        self._flush()
        return int(self.means.size)

    def quantile(self, q: float) -> float:
        """Faithful port of the quantile interpolation contract
        (MergingDigest.java:704-790): min/max endpoint handling, half-sample
        interpolation in the first/last centroid, singleton exclusion rules."""
        if q < 0 or q > 1:
            raise ValueError(f"q should be in [0,1], got {q}")
        self._flush()
        mean, weight, total = self.means, self.weights, self.total
        n = mean.size
        if n == 0:
            return math.nan
        if n == 1:
            return float(mean[0])
        index = q * total
        if index < 1:
            return self.min
        if weight[0] > 1 and index < weight[0] / 2:
            # one sample sits exactly at min (MergingDigest.java:727-731).
            # Infinite first centroid (digest ingested -inf; adversarial-inf
            # axis): mean[0]-min is -inf - -inf = NaN — every sample in the
            # cluster IS -inf, so the quantile is -inf, no interpolation.
            if not math.isfinite(float(mean[0]) - self.min):
                return float(mean[0]) if math.isfinite(self.min) else self.min
            return self.min + (index - 1) / (weight[0] / 2 - 1) * (mean[0] - self.min)
        if index > total - 1:
            return self.max
        if weight[n - 1] > 1 and total - index <= weight[n - 1] / 2:
            # symmetric +inf guard: max - mean[n-1] is inf - inf = NaN
            if not math.isfinite(self.max - float(mean[n - 1])):
                return float(mean[n - 1]) if math.isfinite(self.max) else self.max
            return self.max - (total - index - 1) / (weight[n - 1] / 2 - 1) * (self.max - mean[n - 1])

        # interior: cumulative midpoints bracket the index
        w_so_far = weight[0] / 2
        for i in range(n - 1):
            dw = (weight[i] + weight[i + 1]) / 2
            if w_so_far + dw > index:
                left_unit = 0.0
                if weight[i] == 1:
                    if index - w_so_far < 0.5:
                        return float(mean[i])
                    left_unit = 0.5
                right_unit = 0.0
                if weight[i + 1] == 1:
                    if w_so_far + dw - index <= 0.5:
                        return float(mean[i + 1])
                    right_unit = 0.5
                z1 = index - w_so_far - left_unit
                z2 = w_so_far + dw - index - right_unit
                mi, mj = float(mean[i]), float(mean[i + 1])
                if not (math.isfinite(mi) and math.isfinite(mj)):
                    # Infinite bracket endpoint (ingested +/-inf): the gap
                    # has no interpolable geometry, and a weighted average
                    # with an infinity would teleport the WHOLE gap to the
                    # extreme (or NaN at a zero weight). Step at the
                    # half-weight boundary instead: q inside the left
                    # centroid's half of the gap belongs to its samples.
                    return mi if index - w_so_far < weight[i] / 2 else mj
                return _weighted_average(mi, z2, mj, z1)
            w_so_far += dw
        z1 = index - total - weight[n - 1] / 2.0
        z2 = weight[n - 1] / 2 - z1
        if not math.isfinite(self.max - float(mean[n - 1])):
            # +inf last centroid: every sample there IS self.max (= inf)
            return float(mean[n - 1]) if math.isfinite(self.max) else self.max
        return _weighted_average(float(mean[n - 1]), z1, self.max, z2)

    def quantiles(self, qs: Sequence[float]) -> np.ndarray:
        return np.asarray([self.quantile(float(q)) for q in qs])

    def cdf(self, x: float) -> float:
        """Faithful port of the cdf contract (MergingDigest.java:566-702):
        exact-at-min/max tail handling, tied-centroid accumulation, singleton
        exclusion, adjacent-singleton step function."""
        if math.isnan(x) or math.isinf(x):
            raise ValueError(f"Invalid value: {x}")
        self._flush()
        mean, weight, total = self.means, self.weights, self.total
        n = mean.size
        if n == 0:
            return math.nan
        if n == 1:
            if x < self.min:
                return 0.0
            if x > self.max:
                return 1.0
            return 0.5
        if x < self.min:
            return 0.0
        if x > self.max:
            return 1.0
        # left tail: a sample sits exactly at min (MergingDigest.java:599-614)
        if x < mean[0]:
            if mean[0] - self.min > 0:
                if x == self.min:
                    return 0.5 / total
                if not math.isfinite(self.min):
                    # -inf min with a finite first centroid (serde-restored
                    # shape): (x-min)/(mean[0]-min) is inf/inf = NaN. Take
                    # the min->-inf limit of the reference formula, w0/2.
                    return (weight[0] / 2) / total
                return (1 + (x - self.min) / (mean[0] - self.min) * (weight[0] / 2 - 1)) / total
            return 0.0
        # right tail
        if x > mean[n - 1]:
            if self.max - mean[n - 1] > 0:
                if x == self.max:
                    return 1 - 0.5 / total
                if not math.isfinite(self.max):
                    # +inf max, finite last centroid: max->inf limit
                    return 1 - (weight[n - 1] / 2) / total
                dq = (1 + (self.max - x) / (self.max - mean[n - 1]) * (weight[n - 1] / 2 - 1)) / total
                return 1 - dq
            return 1.0
        weight_so_far = 0.0
        it = 0
        while it < n - 1:
            if mean[it] == x:
                dw = 0.0
                while it < n and mean[it] == x:
                    dw += weight[it]
                    it += 1
                return (weight_so_far + dw / 2) / total
            if mean[it] <= x < mean[it + 1]:
                if mean[it + 1] - mean[it] > 0:
                    if not (math.isfinite(float(mean[it]))
                            and math.isfinite(float(mean[it + 1]))):
                        # Infinite bracket endpoint (digest ingested +/-inf):
                        # (x-left)/(right-left) is NaN for a -inf left, and
                        # the gap has no interpolable geometry anyway — step
                        # semantics. A -inf atom's mass is wholly below any
                        # finite x; a +inf atom's wholly above; a finite
                        # singleton (exact sample, and mean[it] < x here —
                        # equality was consumed above) is below; a finite
                        # centroid keeps the half-weight convention.
                        below = weight_so_far
                        if mean[it] == -math.inf:
                            below += weight[it]
                        elif weight[it] == 1:
                            below += 1.0
                        else:
                            below += weight[it] / 2
                        return below / total
                    left_excl = 0.0
                    right_excl = 0.0
                    if weight[it] == 1:
                        if weight[it + 1] == 1:
                            return (weight_so_far + 1) / total
                        left_excl = 0.5
                    elif weight[it + 1] == 1:
                        right_excl = 0.5
                    dw = (weight[it] + weight[it + 1]) / 2
                    left = mean[it]
                    right = mean[it + 1]
                    dw_no_single = dw - left_excl - right_excl
                    base = weight_so_far + weight[it] / 2 + left_excl
                    return (base + dw_no_single * (x - left) / (right - left)) / total
                dw = (weight[it] + weight[it + 1]) / 2
                return (weight_so_far + dw) / total
            weight_so_far += weight[it]
            it += 1
        if x == mean[n - 1]:
            return 1 - 0.5 / total
        raise AssertionError("cdf walk fell through")  # unreachable per contract

    def trimmed_mean(self, lo: float = 0.0, hi: float = 1.0) -> float:
        """Mean of values between quantiles lo and hi.

        Not present in the reference (SURVEY.md §2.3) — derived here: each centroid
        i occupies the cumulative-weight interval (C_{i-1}, C_i]; its contribution
        is its mean times the overlap of that interval with [lo, hi]*total.
        """
        if not (0 <= lo < hi <= 1):
            raise ValueError(f"need 0 <= lo < hi <= 1, got ({lo}, {hi})")
        self._flush()
        if self.means.size == 0:
            return math.nan
        cum = np.cumsum(self.weights)
        left = np.concatenate(([0.0], cum[:-1]))
        lo_w, hi_w = lo * self.total, hi * self.total
        overlap = np.minimum(cum, hi_w) - np.maximum(left, lo_w)
        overlap = np.clip(overlap, 0.0, None)
        tw = float(overlap.sum())
        if tw <= 0:
            return self.quantile((lo + hi) / 2)
        # mask zero-overlap centroids before the dot product: an infinite
        # atom OUTSIDE [lo, hi] must not contribute, but inf * 0.0 = NaN
        # would poison the sum (adversarial-inf finding). An infinite atom
        # WITH overlap legitimately makes the trimmed mean +/-inf.
        inc = overlap > 0
        return float(np.dot(self.means[inc], overlap[inc]) / tw)

    def check_weights(self) -> int:
        """Reference invariant: no centroid spans more than one k-unit (hard fail
        at 4) vs the public delta (MergingDigest.java:508-548). Returns the count
        of soft violations; raises on egregious ones."""
        self._flush()
        scale = self._scale
        normalizer = scale.normalizer(self.delta, self.total)
        k1 = float(scale.k(0.0, normalizer))
        q = 0.0
        bad = 0
        for i in range(self.means.size):
            w = float(self.weights[i])
            dq = w / self.total
            k2 = float(scale.k(q + dq, normalizer))
            q += dq / 2
            if k2 - k1 > 1 and w != 1:
                bad += 1
            if k2 - k1 > 4 and w != 1:
                raise AssertionError(
                    f"Egregiously oversized centroid at {i}: dk={k2 - k1:.2f} w={w} q={q:.4f}")
            q += dq / 2
            k1 = k2
        return bad

    # ------------------------------------------------------------------ serde

    VERBOSE_ENCODING = 1
    SMALL_ENCODING = 2

    def to_bytes(self) -> bytes:
        """Verbose codec, wire-compatible with the reference's asBytes
        (MergingDigest.java:875-887; big-endian, Java ByteBuffer default):
        [int 1][min][max][delta][int n][weight_i, mean_i ...] doubles."""
        self.compress()
        out = bytearray(struct.pack(">idddi", self.VERBOSE_ENCODING,
                                    self.min, self.max,
                                    self.delta, self.means.size))
        pairs = np.empty(2 * self.means.size, dtype=">f8")
        pairs[0::2] = self.weights
        pairs[1::2] = self.means
        out += pairs.tobytes()
        return bytes(out)

    def to_small_bytes(self) -> bytes:
        """Compact codec (MergingDigest.java:889-903): float32 weights/means."""
        self.compress()
        _, _, size, buf = sizing(self.delta)
        out = bytearray(struct.pack(">iddfhhh", self.SMALL_ENCODING,
                                    self.min, self.max,
                                    self.delta, size, buf, self.means.size))
        pairs = np.empty(2 * self.means.size, dtype=">f4")
        pairs[0::2] = self.weights
        pairs[1::2] = self.means
        out += pairs.tobytes()
        return bytes(out)

    @classmethod
    def from_bytes(cls, data: bytes, scale: str = "k2") -> "TDigest":
        """Parse either codec (MergingDigest.java:905-943)."""
        (encoding,) = struct.unpack_from(">i", data, 0)
        if encoding == cls.VERBOSE_ENCODING:
            mn, mx, delta, n = struct.unpack_from(">dddi", data, 4)
            pairs = np.frombuffer(data, dtype=">f8", count=2 * n, offset=32).astype(np.float64)
        elif encoding == cls.SMALL_ENCODING:
            mn, mx, delta, _size, _buf, n = struct.unpack_from(">ddfhhh", data, 4)
            pairs = np.frombuffer(data, dtype=">f4", count=2 * n, offset=30).astype(np.float64)
        else:
            raise ValueError(f"Invalid format for serialized digest: {encoding}")
        w = pairs[0::2]
        m = pairs[1::2]
        return cls.from_centroids(m, w, mn, mx, delta=delta, scale=scale)

    def __repr__(self) -> str:
        return (f"TDigest(delta={self.delta}, scale={self.scale_name!r}, "
                f"count={self.count:.0f}, centroids={self.means.size})")


class Dist:
    """Exact oracle for cdf/quantile given all data (reference: Dist.java:27-75).

    Note this is the floor-index order-statistic convention, NOT SQL
    percentile_cont — oracle SQL must select the order statistic explicitly.
    """

    @staticmethod
    def cdf(x: float, data: np.ndarray) -> float:
        data = np.asarray(data, dtype=np.float64)
        return float(((data < x).sum() + (data == x).sum() / 2.0) / data.size)

    @staticmethod
    def quantile(q: float, data: np.ndarray) -> float:
        data = np.sort(np.asarray(data, dtype=np.float64))
        n = data.size
        if n == 0:
            return math.nan
        index = min(max(q * n, 0), n - 1)
        return float(data[int(math.floor(index))])
