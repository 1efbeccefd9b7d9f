"""AVLTreeDigest — the reference's clustering t-digest variant.

Faithful behavioral port of AVLTreeDigest.java (add :85-160, compress
:166-208, cdf :226-346, interpolateTail :348-362, quantile :368-468, serde
:501-590) with the ordered-multiset state held in plain sorted Python lists
instead of an AVL tree: the tree in Java exists to give O(log n)
floor/next/headSum on a mutable ordered multiset; at t-digest sizes
(<= ~5*delta live centroids, hard compress trigger at 20*delta) a bisect +
list-insert achieves the same semantics, and NumPy prefix sums cover
headSum. Ordering ties match IntAVLTree (new equal-mean nodes insert AFTER
existing ones; floor = last node with mean STRICTLY below x,
AVLGroupTree.java:192-208).

Divergences (documented, deliberate):
  * The reference's reservoir-sampling RNG is an unseeded java.util.Random
    (AVLTreeDigest.java:80); here a seeded numpy Generator makes builds
    reproducible. Any i.i.d. uniform stream satisfies the algorithm.
  * add() takes float weights like the rest of this package; the reference
    narrows to int. Serialization rounds to int to match the wire format.

Scale note for users: this variant clusters point-by-point and cannot be
vectorized the way the MergingDigest sweep can; the reference itself
recommends MergingDigest (TDigest.java:50-59). It is provided for API/
behavior parity; the Spark scale path stays on t_digest_spark.core.TDigest.
On hosts with a C compiler, ``add_values`` routes the k2-scale per-point
loop through a bit-identical ctypes kernel (_avl_native, 163-357 ns/pt —
parity with the Java tree); elsewhere it runs this module's Python loop
(~2.7-5.2 us/pt), where ``avltree_aggregate``'s per-task row budget
matters.
"""

from __future__ import annotations

import math
import struct
from bisect import bisect_left, bisect_right
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from t_digest_spark.scales import get_scale


def _weighted_average(x1: float, w1: float, x2: float, w2: float) -> float:
    """Clamped weighted average (AbstractTDigest.weightedAverage contract:
    result stays within [min(x1,x2), max(x1,x2)], arguments ordered)."""
    if x1 <= x2:
        lo, lw, hi, hw = x1, w1, x2, w2
    else:
        lo, lw, hi, hw = x2, w2, x1, w1
    x = (lo * lw + hi * hw) / (lw + hw)
    return max(lo, min(x, hi))


def _encode_varint(out: bytearray, n: int) -> None:
    """7-bit varint (AbstractTDigest.encode :58-70)."""
    k = 0
    while n < 0 or n > 0x7F:
        out.append(0x80 | (0x7F & n))
        n = (n % (1 << 32)) >> 7  # java >>> on int
        k += 1
        if k >= 6:
            raise ValueError("Size is implausibly large")
    out.append(n)


def _decode_varint(data: bytes, pos: int) -> Tuple[int, int]:
    """(value, new_pos) — AbstractTDigest.decode :72-85."""
    v = data[pos]
    pos += 1
    z = 0x7F & v
    shift = 7
    while v & 0x80:
        if shift > 28:
            raise ValueError("Shift too large in decode")
        v = data[pos]
        pos += 1
        z += (v & 0x7F) << shift
        shift += 7
    return z, pos


_VERBOSE_ENCODING = 1
_SMALL_ENCODING = 2


class AVLTreeDigest:
    """Clustering t-digest: each point joins the nearest centroid with room
    (uniform choice among ties), K_2 sizing by default."""

    def __init__(self, delta: float = 100.0, scale: str = "k2",
                 seed: int = 42):
        self.delta = float(delta)
        self.scale_name = scale
        self._scale = get_scale(scale)
        self.means: List[float] = []      # sorted; ties in insertion order
        self.counts: List[float] = []
        self.total = 0.0
        self.min = math.inf
        self.max = -math.inf
        self._rng = np.random.default_rng(seed)
        self._rand_buf = None          # buffered draws (see _next_rand)
        self._rand_i = 0

    # ----------------------------------------------------------------- build

    def _k_limit(self, q: float) -> float:
        norm = self._scale.normalizer(self.delta, max(self.total, 1.0))
        return self.total * float(self._scale.max(q, norm))

    def _next_rand(self) -> float:
        """Buffered uniform draw. Refilling 256 at a time produces the
        IDENTICAL stream to repeated Generator.random() calls (PCG64
        consumes 64 bits per double either way; pinned by
        test_avl.test_buffered_rng_stream_identity), at ~1/10th the
        per-draw overhead."""
        i = self._rand_i
        buf = self._rand_buf
        if buf is None or i >= 256:
            buf = self._rand_buf = self._rng.random(256)
            i = 0
        self._rand_i = i + 1
        return buf[i]

    def add(self, x: float, w: float = 1.0) -> None:
        """AVLTreeDigest.java:85-160.

        Per-point Python cost matters here (this variant cannot vectorize
        the way the MergingDigest sweep can), so the loop avoids numpy
        scalar round-trips: the scale's ``max_scalar`` pure-float fast
        path, the normalizer hoisted per point (total is fixed during one
        add), buffered RNG draws, and an in-place mean update when the
        centroid keeps its slot (the overwhelmingly common case — a
        delete+reinsert pair otherwise)."""
        if math.isnan(x):
            raise ValueError("Cannot add NaN to t-digest")
        if w <= 0:
            raise ValueError("weight must be > 0")
        if x < self.min:
            self.min = x
        if x > self.max:
            self.max = x
        means = self.means
        counts = self.counts
        if not means:
            self._insert(x, w)
            self.total = w
            return
        # floor = last centroid with mean strictly below x (ties go left)
        start = bisect_left(means, x) - 1
        if start < 0:
            start = 0
        # forward scan: distance decreases to the nearest neighbor(s), then
        # increases — stop at the first increase (AVLTreeDigest.java:104-115)
        min_dist = math.inf
        n = len(means)
        last = n
        j = start
        while j < n:
            z = means[j] - x
            if z < 0.0:
                z = -z
            if z < min_dist:
                start = j
                min_dist = z
            elif z > min_dist:
                last = j
                break
            j += 1
        # uniform reservoir over nearest centroids that still have room
        total = self.total
        scale = self._scale
        normf = getattr(scale, "normalizer_scalar", scale.normalizer)
        norm = normf(self.delta, total if total > 1.0 else 1.0)
        maxf = getattr(scale, "max_scalar", None)
        closest = -1
        n_cand = 0.0
        # explicit naive left-to-right accumulation, NOT builtins.sum():
        # CPython >= 3.12 compensates float sum() (Neumaier, gh-100425),
        # which can round differently from the native kernel's plain
        # `head += c` on fractional weights and desynchronize the two
        # paths' reservoir decisions. This loop is the pinned definition.
        head = 0.0
        for c in counts[:start]:
            head += c
        for j in range(start, last):
            cj = counts[j]
            q0 = head / total
            q1 = q0 + cj / total
            if maxf is not None:
                k0 = total * maxf(q0, norm)
                k1 = total * maxf(q1, norm)
            else:
                k0 = total * float(scale.max(q0, norm))
                k1 = total * float(scale.max(q1, norm))
            if cj + w <= (k0 if k0 < k1 else k1):
                n_cand += 1
                if self._next_rand() < 1.0 / n_cand:
                    closest = j
            head += cj
        if closest < 0:
            self._insert(x, w)
        else:
            # inlined _weighted_average (same clamped contract; the call
            # costs ~1us/pt at this call rate)
            m0 = means[closest]
            c0 = counts[closest]
            if m0 <= x:
                lo, lw, hi, hw = m0, c0, x, w
            else:
                lo, lw, hi, hw = x, w, m0, c0
            new_mean = (lo * lw + hi * hw) / (lw + hw)
            if new_mean < lo:
                new_mean = lo
            elif new_mean > hi:
                new_mean = hi
            new_count = c0 + w
            # in-place when the mean is unchanged, else reposition
            # (AVLGroupTree.update semantics, :171-186)
            if new_mean == means[closest]:
                counts[closest] = new_count
            elif ((closest == 0 or means[closest - 1] <= new_mean)
                    and (closest == n - 1 or new_mean < means[closest + 1])):
                # slot unchanged under the bisect_right tie rule (<= left
                # neighbor keeps it AFTER the equal value; strict < right
                # neighbor keeps it BEFORE) — overwrite without list shifts
                means[closest] = new_mean
                counts[closest] = new_count
            else:
                del means[closest]
                del counts[closest]
                self._insert(new_mean, new_count)
        self.total = total + w
        if len(means) > 20 * self.delta:
            self.compress()

    def _insert(self, x: float, w: float) -> None:
        i = bisect_right(self.means, x)     # ties insert after (tree add)
        self.means.insert(i, x)
        self.counts.insert(i, w)

    def add_values(self, values: Sequence[float],
                   weights: Optional[Sequence[float]] = None) -> None:
        arr = np.asarray(values, dtype=np.float64).ravel()
        warr = (None if weights is None
                else np.asarray(weights, dtype=np.float64).ravel())
        # C fast path (same algorithm, same RNG stream, bit-identical —
        # see _avl_native); falls through to the Python loop for non-k2
        # scales, invalid inputs (which must raise at the exact offending
        # point), or when no compiler is available
        from t_digest_spark import _avl_native
        if _avl_native.batch_add(self, arr, warr):
            return
        # .tolist() up front: the loop then works on Python floats — math
        # on numpy scalars costs ~3x more per op than on native floats
        vals = arr.tolist()
        if warr is None:
            add = self.add
            for v in vals:
                add(v)
        else:
            wts = warr.tolist()
            if len(wts) != len(vals):
                # zip() would silently truncate to the shorter sequence;
                # the pre-batch loop raised here and so must we.
                raise ValueError(
                    f"weights length {len(wts)} != values length {len(vals)}")
            for v, w in zip(vals, wts):
                self.add(v, w)

    def compress(self) -> None:
        """Single in-order adjacent-merge sweep (AVLTreeDigest.java:166-208)."""
        if len(self.means) <= 1:
            return
        means, counts = self.means, self.counts
        node = 0
        n0 = 0.0
        k0 = self._k_limit(n0 / self.total) if self.total else 0.0
        w0 = counts[0]
        n1 = n0 + counts[0]
        w1 = 0.0
        while node < len(means):
            after = node + 1
            while after < len(means):
                w1 = counts[after]
                k1 = self._k_limit((n1 + w1) / self.total)
                if w0 + w1 > min(k0, k1):
                    break
                mean = _weighted_average(means[node], w0, means[after], w1)
                means[node] = mean
                counts[node] = w0 + w1
                del means[after]
                del counts[after]
                n1 += w1
                w0 += w1
            node = after
            if node < len(means):
                n0 = n1
                k0 = self._k_limit(n0 / self.total)
                w0 = w1
                n1 = n0 + w0

    @classmethod
    def from_values(cls, values, weights=None, delta: float = 100.0,
                    scale: str = "k2", seed: int = 42) -> "AVLTreeDigest":
        d = cls(delta=delta, scale=scale, seed=seed)
        d.add_values(values, weights)
        return d

    @classmethod
    def from_cells(cls, means, weights, dmin, dmax, delta: float = 100.0,
                   scale: str = "k2", seed: int = 42) -> "AVLTreeDigest":
        """Rehydrate a digest shell from the shared digest row layout
        (means, weights, dmin, dmax) — the ONE place the cell contract
        lives; every UDF/aggregation surface goes through here."""
        d = cls(delta=delta, scale=scale, seed=seed)
        d.means = [float(x) for x in means]
        d.counts = [float(x) for x in weights]
        d.total = float(sum(d.counts))
        if d.total > 0:
            d.min = float(dmin)
            d.max = float(dmax)
        return d

    def merge(self, others: Iterable["AVLTreeDigest"]) -> "AVLTreeDigest":
        """add(List<TDigest>) (AVLTreeDigest.java:75-83): fold every centroid
        of every input into this digest, centroid order preserved."""
        for other in others:
            if other.total > 0:
                self.min = min(self.min, other.min)
                self.max = max(self.max, other.max)
            if other.means:
                # same in-order fold as the per-point loop, through the
                # batched path (native-accelerated when available)
                self.add_values(other.means, other.counts)
        return self

    # ----------------------------------------------------------------- query

    @property
    def count(self) -> float:
        return self.total

    def centroid_count(self) -> int:
        return len(self.means)

    def centroids(self) -> List[Tuple[float, float]]:
        return list(zip(self.means, self.counts))

    def cdf(self, x: float) -> float:
        """AVLTreeDigest.java:226-346 — singleton-aware interpolation with
        special handling of min/max and two-sample tail centroids."""
        means, counts, n = self.means, self.counts, self.total
        if not means:
            return float("nan")
        if len(means) == 1:
            if x < means[0]:
                return 0.0
            if x > means[0]:
                return 1.0
            return 0.5
        if x < self.min:
            return 0.0
        if x == self.min:
            return 0.5 / n
        if x > self.max:
            return 1.0
        if x == self.max:
            return (n - 0.5) / n
        first_mean = means[0]
        if x < first_mean:
            return self._interpolate_tail(x, 0, first_mean, self.min)
        last_mean = means[-1]
        if x > last_mean:
            return 1.0 - self._interpolate_tail(x, len(means) - 1,
                                                last_mean, self.max)
        i = 0
        a_mean, a_weight = means[0], counts[0]
        if x == a_mean:
            return a_weight / 2.0 / n
        i = 1
        b_mean, b_weight = means[1], counts[1]
        weight_so_far = 0.0
        while b_weight > 0:
            if x == b_mean:
                weight_so_far += a_weight
                j = i + 1
                while j < len(means):
                    if x == means[j]:
                        b_weight += counts[j]
                        j += 1
                    else:
                        break
                return (weight_so_far + b_weight / 2.0) / n
            if x < b_mean:
                if a_weight == 1:
                    if b_weight == 1:
                        return (weight_so_far + 1.0) / n
                    partial = (x - a_mean) / (b_mean - a_mean) * b_weight / 2.0
                    return (weight_so_far + 1.0 + partial) / n
                elif b_weight == 1:
                    partial = (x - a_mean) / (b_mean - a_mean) * a_weight / 2.0
                    return (weight_so_far + a_weight / 2.0 + partial) / n
                else:
                    partial = ((x - a_mean) / (b_mean - a_mean)
                               * (a_weight + b_weight) / 2.0)
                    return (weight_so_far + a_weight / 2.0 + partial) / n
            weight_so_far += a_weight
            if i + 1 < len(means):
                a_mean, a_weight = b_mean, b_weight
                i += 1
                b_mean, b_weight = means[i], counts[i]
            else:
                b_weight = 0
        raise RuntimeError("Ran out of centroids")

    def _interpolate_tail(self, x: float, node: int, mean: float,
                          extreme: float) -> float:
        count = self.counts[node]
        if count == 2:
            return 1.0 / self.total
        weight = count / 2.0 - 1.0
        partial = (extreme - x) / (extreme - mean) * weight
        return (partial + 1.0) / self.total

    def quantile(self, q: float) -> float:
        """AVLTreeDigest.java:368-468."""
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"q should be in [0,1], got {q}")
        means, counts, n = self.means, self.counts, self.total
        if not means:
            return float("nan")
        if len(means) == 1:
            return means[0]
        index = q * n
        if index < 1:
            return self.min
        if index >= n - 1:
            return self.max
        cur_weight = counts[0]
        if cur_weight == 2 and index <= 2:
            return 2 * means[0] - self.min
        if counts[-1] == 2 and index > n - 2:
            return 2 * means[-1] - self.max
        weight_so_far = cur_weight / 2.0
        if index < weight_so_far:
            return _weighted_average(self.min, weight_so_far - index,
                                     means[0], index - 1)
        cur = 0
        for _ in range(len(means) - 1):
            nxt = cur + 1
            next_weight = counts[nxt]
            dw = (counts[cur] + next_weight) / 2.0
            if index < weight_so_far + dw:
                left_excl = right_excl = 0.0
                if counts[cur] == 1:
                    if index < weight_so_far + 0.5:
                        return means[cur]
                    left_excl = 0.5
                if next_weight == 1:
                    if index >= weight_so_far + dw - 0.5:
                        return means[nxt]
                    right_excl = 0.5
                w1 = index - weight_so_far - left_excl
                w2 = weight_so_far + dw - index - right_excl
                return _weighted_average(means[cur], w2, means[nxt], w1)
            weight_so_far += dw
            cur = nxt
        w1 = index - weight_so_far
        w2 = n - 1 - index
        return _weighted_average(means[cur], w2, self.max, w1)

    # ----------------------------------------------------------------- serde

    def to_bytes(self, small: bool = False) -> bytes:
        """Wire formats of AVLTreeDigest.asBytes/asSmallBytes (:501-541):
        big-endian; verbose = doubles + int counts, small = float mean
        deltas + varint counts.

        The reference wire format stores INT counts; this package accepts
        float weights, so serialization refuses digests whose centroid
        weights are not (within 1e-9) positive integers — silently rounding
        would change the total count, and a weight rounding to 0 would make
        the image unreadable (fromBytes re-ADDS centroids and add rejects
        w <= 0)."""
        self.compress()
        for c in self.counts:
            r = round(c)
            if r < 1 or abs(c - r) > 1e-9:
                raise ValueError(
                    f"cannot serialize centroid weight {c!r}: the reference "
                    "wire format stores positive integer counts")
        n = len(self.means)
        if small:
            out = bytearray(struct.pack(">idddi", _SMALL_ENCODING, self.min,
                                        self.max, self.delta, n))
            x = 0.0
            for m in self.means:
                out += struct.pack(">f", m - x)
                x = m
            for c in self.counts:
                _encode_varint(out, int(round(c)))
            return bytes(out)
        out = bytearray(struct.pack(">idddi", _VERBOSE_ENCODING, self.min,
                                    self.max, self.delta, n))
        for m in self.means:
            out += struct.pack(">d", m)
        for c in self.counts:
            out += struct.pack(">i", int(round(c)))
        return bytes(out)

    @classmethod
    def from_bytes(cls, data: bytes, scale: str = "k2",
                   seed: int = 42) -> "AVLTreeDigest":
        """fromBytes (:549-590): rebuilds by RE-ADDING each centroid, like
        the reference (restore is a merge, not a raw state copy)."""
        encoding, mn, mx, compression, n = struct.unpack_from(">idddi", data, 0)
        pos = struct.calcsize(">idddi")
        r = cls(delta=compression, scale=scale, seed=seed)
        if encoding == _VERBOSE_ENCODING:
            means = list(struct.unpack_from(f">{n}d", data, pos))
            pos += 8 * n
            cnts = struct.unpack_from(f">{n}i", data, pos)
        elif encoding == _SMALL_ENCODING:
            means = []
            x = 0.0
            for _ in range(n):
                (d,) = struct.unpack_from(">f", data, pos)
                pos += 4
                x += d
                means.append(x)
            cnts = []
            for _ in range(n):
                z, pos = _decode_varint(data, pos)
                cnts.append(z)
        else:
            raise ValueError("Invalid format for serialized histogram")
        for m, c in zip(means, cnts):
            r.add(m, c)
        if r.total > 0:
            r.min = min(mn, r.min)
            r.max = max(mx, r.max)
        return r

    def check_weights(self) -> None:
        """Invariant: no centroid except singletons exceeds the k-limit at
        its own position (the AVL variant's analog of checkWeights)."""
        head = 0.0
        for m, c in zip(self.means, self.counts):
            q0 = head / self.total
            q1 = (head + c) / self.total
            lim = max(self._k_limit(q0), self._k_limit(q1))
            assert c <= 1 or c <= lim * 1.01 + 1e-9, \
                f"centroid at {m} weight {c} exceeds limit {lim}"
            head += c
        assert abs(head - self.total) < 1e-6

    def __repr__(self) -> str:
        return (f"AVLTreeDigest(delta={self.delta}, n={self.total}, "
                f"centroids={len(self.means)})")


def avl_quantile_udf(q: float, delta: float = 100.0, scale: str = "k2"):
    """Quantile over AVL digest rows — same 4-column (means, weights, dmin,
    dmax) convention as t_digest_spark.functions.quantile_udf, but the AVL
    variant's own interpolation contract (AVLTreeDigest.java:368-468)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _q(means: pd.Series, weights: pd.Series, dmin: pd.Series,
           dmax: pd.Series) -> pd.Series:
        return pd.Series([
            AVLTreeDigest.from_cells(m, w, lo, hi, delta, scale).quantile(q)
            for m, w, lo, hi in zip(means, weights, dmin, dmax)])
    return _q
