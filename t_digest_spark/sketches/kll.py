"""KLL doubles quantile sketch (Karnin-Lang-Liberty 2016), NumPy-native.

The reference vendors Apache DataSketches' KLL switched to doubles
(reference: core/src/main/java/com/tdunning/math/stats/datasketches/kll/
KllDoublesSketch.java — DEFAULT_K=200 :178, DEFAULT_M=8 :179) as the
t-digest's accuracy/speed rival. This is an independent implementation of
the published algorithm with the same parameters, built for the same
mergeable-UDAF pattern as the t-digest kernel:

  * levels of compactors; an item at level h carries weight 2^h;
  * level capacity cap(h) = max(ceil(k * (2/3)^(depth-1-h)), m) — highest
    level gets ~k, lower levels geometrically less;
  * compaction: sort the level, keep every other item (random even/odd
    offset), promote survivors to the next level;
  * merge: concatenate levels pairwise, compact while over capacity —
    associative/commutative in distribution, tested within tolerance;
  * rank/quantile queries over the weighted item multiset.

Randomness: the even/odd coin is drawn from a counter-seeded generator so a
build is deterministic for a given insertion order (tests), while remaining
i.i.d.-ish across compactions as the guarantee requires.

Normalized rank error (two-sided, 99%) for DEFAULT_K=200 is ~1.65%
(published DataSketches figure); tests gate at that bound.
"""

from __future__ import annotations

import math
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_K = 200   # KllDoublesSketch.java:178
DEFAULT_M = 8     # KllDoublesSketch.java:179
_GROWTH = 2.0 / 3.0


_POW3 = [3 ** i for i in range(31)]


def _cap_aux(k: int, depth: int) -> int:
    """Round-to-nearest k*(2/3)^depth in exact integer arithmetic
    (KllHelper.java:110-137, incl. the >30-depth folding)."""
    if depth <= 30:
        return ((2 * k << depth) // _POW3[depth] + 1) >> 1
    half = depth // 2
    rest = depth - half
    tmp = ((2 * k << half) // _POW3[half] + 1) >> 1
    return ((2 * tmp << rest) // _POW3[rest] + 1) >> 1


def _level_capacity(k: int, m: int, depth: int, height: int) -> int:
    """Capacity of the level `height` levels below the top when there are
    `depth` levels: round-to-nearest k * (2/3)^(depth-1-height), floored at m
    (exact Java-parity formula, KllHelper.java:93-98; verified against the
    compiled reference via java_parity harness)."""
    below_top = depth - 1 - height
    return max(_cap_aux(k, below_top), m)


class KllSketch:
    """Mergeable KLL quantile sketch over doubles."""

    __slots__ = ("k", "m", "levels", "n", "min", "max", "_coin")

    def __init__(self, k: int = DEFAULT_K, m: int = DEFAULT_M):
        if k < m:
            raise ValueError(f"k must be >= {m}")
        self.k = int(k)
        self.m = int(m)
        self.levels: List[np.ndarray] = [np.empty(0)]
        self.n = 0
        self.min = math.inf
        self.max = -math.inf
        self._coin = 0  # compaction counter -> deterministic coin stream

    # ------------------------------------------------------------------ build

    def update_values(self, values: Sequence[float]) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size == 0:
            return
        if np.isnan(v).any():
            raise ValueError("Cannot add NaN to KLL sketch")
        self.n += v.size
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        # chunked ingestion keeps level 0 near its capacity so compaction
        # sorts small arrays, not the whole batch at once
        chunk = max(8 * self.k, 4096)
        for s in range(0, v.size, chunk):
            self.levels[0] = np.concatenate([self.levels[0], v[s:s + chunk]])
            self._compress()

    def update(self, x: float) -> None:
        self.update_values([x])

    def _capacity(self) -> int:
        depth = len(self.levels)
        return sum(_level_capacity(self.k, self.m, depth, h)
                   for h in range(depth))

    def _compress(self) -> None:
        while sum(lv.size for lv in self.levels) > self._capacity():
            depth = len(self.levels)
            # compact the lowest level over its individual capacity;
            # fall back to level 0 (standard lazy scheme)
            target = 0
            for h in range(depth):
                if self.levels[h].size > _level_capacity(self.k, self.m, depth, h):
                    target = h
                    break
            self._compact_level(target)

    def _compact_level(self, h: int) -> None:
        lv = np.sort(self.levels[h])
        if lv.size < 2:
            # can't halve a single item; grow a level instead
            if h + 1 >= len(self.levels):
                self.levels.append(np.empty(0))
            return
        # random even/odd offset from the deterministic coin stream
        rng = np.random.default_rng(0x5EED ^ (self._coin * 0x9E3779B9))
        self._coin += 1
        off = int(rng.integers(0, 2))
        if lv.size % 2:
            keep = lv[-1:]     # odd size: hold one item back un-promoted
            body = lv[:-1]
        else:
            keep = np.empty(0)
            body = lv
        promote = body[off::2]  # half the body, weight doubles at level h+1
        self.levels[h] = keep
        if h + 1 >= len(self.levels):
            self.levels.append(np.empty(0))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promote])

    # ------------------------------------------------------------------ merge

    def merge(self, other: "KllSketch") -> "KllSketch":
        if self.k != other.k or self.m != other.m:
            raise ValueError("cannot merge KLL sketches with different k/m")
        if other.n == 0:
            return self
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0))
        for h, lv in enumerate(other.levels):
            if lv.size:
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._coin ^= other._coin * 0x85EB  # decorrelate coin streams
        self._compress()
        return self

    @classmethod
    def merge_all(cls, sketches: Sequence["KllSketch"]) -> "KllSketch":
        out: Optional[KllSketch] = None
        for s in sketches:
            if out is None:
                out = cls(s.k, s.m)
                out.merge(s)
            else:
                out.merge(s)
        return out if out is not None else cls()

    @classmethod
    def from_values(cls, values, k: int = DEFAULT_K, m: int = DEFAULT_M) -> "KllSketch":
        s = cls(k, m)
        s.update_values(values)
        return s

    # ---------------------------------------------------------------- queries

    def _weighted(self) -> Tuple[np.ndarray, np.ndarray]:
        items = []
        weights = []
        for h, lv in enumerate(self.levels):
            if lv.size:
                items.append(lv)
                weights.append(np.full(lv.size, float(1 << h)))
        if not items:
            return np.empty(0), np.empty(0)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def rank(self, x: float) -> float:
        """Normalized rank: (weight of items < x + half weight of items == x)/n
        (midpoint convention, matching Dist.cdf)."""
        if self.n == 0:
            return float("nan")
        it, w = self._weighted()
        less = float(w[it < x].sum())
        equal = float(w[it == x].sum())
        return (less + equal / 2.0) / self.n

    cdf = rank

    def ds_rank(self, x: float) -> float:
        """Exact KllDoublesSketch.getRank convention: normalized weight of
        retained items <= x (verified vs the compiled reference via the
        java_parity harness). `rank` keeps the midpoint-at-ties convention
        the bound contracts use."""
        if self.n == 0:
            return float("nan")
        it, w = self._weighted()
        return float(w[it <= x].sum()) / self.n

    def quantile(self, q: float) -> float:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"q must be in [0,1], got {q}")
        if self.n == 0:
            return float("nan")
        if q == 0.0:
            return self.min
        if q == 1.0:
            return self.max
        # Exact KllDoublesQuantileCalculator convention
        # (QuantilesHelper.java:50-74): zero-based position floor(q*n) clamped
        # to n-1, then the item whose preceding-cumulative-weight chunk
        # contains that position. Verified bit-compatible with the compiled
        # reference via the java_parity harness.
        it, w = self._weighted()
        cum = np.cumsum(w)
        pos = int(math.floor(q * self.n))
        if pos >= self.n:
            pos = self.n - 1
        idx = int(np.searchsorted(cum, pos, side="right"))
        idx = min(idx, it.size - 1)
        return float(it[idx])

    def quantiles(self, qs: Sequence[float]) -> np.ndarray:
        return np.asarray([self.quantile(float(q)) for q in qs])

    @property
    def num_retained(self) -> int:
        return int(sum(lv.size for lv in self.levels))

    # ------------------------------------------------------------------ serde

    def to_row(self) -> Tuple[list, list, float, float, float]:
        """(items flat, level_offsets, min, max, n) for DataFrame transport.
        level_offsets[i] = start of level i in items; len+1 entries."""
        flat = []
        offs = [0]
        for lv in self.levels:
            flat.extend(float(x) for x in np.sort(lv))
            offs.append(len(flat))
        return flat, offs, (self.min if self.n else math.nan), \
            (self.max if self.n else math.nan), float(self.n)

    @classmethod
    def from_row(cls, items, offsets, mn, mx, n, k: int = DEFAULT_K,
                 m: int = DEFAULT_M) -> "KllSketch":
        s = cls(k, m)
        arr = np.asarray(items, dtype=np.float64)
        offs = [int(o) for o in offsets]
        s.levels = [arr[offs[i]:offs[i + 1]].copy()
                    for i in range(len(offs) - 1)] or [np.empty(0)]
        s.n = int(n)
        s.min = float(mn) if s.n else math.inf
        s.max = float(mx) if s.n else -math.inf
        # The compaction-coin counter is not part of the row layout; seed it
        # from n so a restore CONTINUES a distinct coin stream instead of
        # resetting to 0 — a long-running stream restoring per micro-batch
        # would otherwise replay the same even/odd offsets every batch and
        # correlate compaction choices (weakening the i.i.d.-coin assumption
        # behind the published rank-error bound).
        s._coin = (int(n) * 0x9E3779B1) & 0x7FFFFFFF
        return s

    def to_bytes(self) -> bytes:
        flat, offs, mn, mx, n = self.to_row()
        out = bytearray(struct.pack("<iiiddq", self.k, self.m, len(offs),
                                    mn, mx, int(n)))
        out += struct.pack(f"<{len(offs)}i", *offs)
        out += np.asarray(flat, dtype=np.float64).tobytes()
        return bytes(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KllSketch":
        k, m, n_offs, mn, mx, n = struct.unpack_from("<iiiddq", data, 0)
        pos = struct.calcsize("<iiiddq")
        offs = struct.unpack_from(f"<{n_offs}i", data, pos)
        pos += 4 * n_offs
        items = np.frombuffer(data, dtype=np.float64, offset=pos)
        return cls.from_row(items, offs, mn, mx, n, k=k, m=m)

    # ------------------------------------------- DataSketches binary serde
    #
    # Interchange format of the reference's vendored KllDoublesSketch
    # (KllDoublesSketch.java:183-215 layout diagram, :300-355 heapify,
    # little-endian):
    #   byte 0  preambleInts (5 full / 2 empty-or-single)
    #   byte 1  serial version (1 full/empty, 2 single-item)
    #   byte 2  family id 15 (KLL)
    #   byte 3  flags: bit0 EMPTY, bit1 LEVEL_ZERO_SORTED, bit2 SINGLE_ITEM
    #   4-5  K (u16)   6  M (u8)   7  unused
    #   full layout only: 8-15 N (u64), 16-17 minK (u16), 18 numLevels (u8),
    #   19 unused, 20.. levels ints (numLevels entries, the last index is
    #   derived), min double, max double, retained items (level 0 first,
    #   each level ascending-sorted, packed).

    _DS_FAMILY = 15
    _DS_DATA_START = 20
    _DS_DATA_START_SINGLE = 8

    def _ds_capacity(self) -> int:
        depth = len(self.levels)
        return sum(_level_capacity(self.k, self.m, depth, h)
                   for h in range(depth))

    def to_datasketches_bytes(self) -> bytes:
        """Serialize in the DataSketches KllDoublesSketch binary format, so
        bytes interchange with the reference's vendored sketch (heapify) and
        the Apache DataSketches ecosystem. Level arrays are written sorted,
        hence the LEVEL_ZERO_SORTED flag is always set."""
        if self.n == 0:
            return struct.pack("<BBBBHBB", 2, 1, self._DS_FAMILY, 0b001,
                               self.k, self.m, 0)
        if self.n == 1:
            item = None
            for lv in self.levels:
                if lv.size:
                    item = float(lv[0])
            return (struct.pack("<BBBBHBB", 2, 2, self._DS_FAMILY, 0b110,
                                self.k, self.m, 0)
                    + struct.pack("<d", item))
        num_levels = len(self.levels)
        capacity = self._ds_capacity()
        retained = self.num_retained
        if retained > capacity:
            raise ValueError("retained items exceed DataSketches capacity")
        # absolute item indices: valid region packed at the top of items_
        idx = [capacity - retained]
        for lv in self.levels[:-1]:
            idx.append(idx[-1] + int(lv.size))
        out = bytearray(struct.pack("<BBBBHBB", 5, 1, self._DS_FAMILY, 0b010,
                                    self.k, self.m, 0))
        out += struct.pack("<q", self.n)
        out += struct.pack("<HBB", self.k, num_levels, 0)   # minK == k here
        out += struct.pack(f"<{num_levels}i", *idx)
        out += struct.pack("<dd", self.min, self.max)
        for lv in self.levels:
            out += np.sort(lv).astype("<f8").tobytes()
        return bytes(out)

    @classmethod
    def from_datasketches_bytes(cls, data: bytes) -> "KllSketch":
        """Heapify a DataSketches KllDoublesSketch byte image
        (KllDoublesSketch.java:300-355 semantics)."""
        preamble_ints, ser_ver, family, flags, k, m, _ = \
            struct.unpack_from("<BBBBHBB", data, 0)
        if family != cls._DS_FAMILY:
            raise ValueError(f"not a KLL sketch image (family {family})")
        if ser_ver not in (1, 2):
            raise ValueError(f"unsupported serial version {ser_ver}")
        is_empty = bool(flags & 0b001)
        is_single = bool(flags & 0b100)
        s = cls(k, m)
        if is_empty:
            return s
        if is_single:
            (item,) = struct.unpack_from("<d", data, cls._DS_DATA_START_SINGLE)
            s.update(item)
            return s
        (n,) = struct.unpack_from("<q", data, 8)
        min_k, num_levels, _ = struct.unpack_from("<HBB", data, 16)
        pos = cls._DS_DATA_START
        idx = list(struct.unpack_from(f"<{num_levels}i", data, pos))
        pos += 4 * num_levels
        mn, mx = struct.unpack_from("<dd", data, pos)
        pos += 16
        depth = num_levels
        capacity = sum(_level_capacity(k, m, depth, h) for h in range(depth))
        idx.append(capacity)
        retained = capacity - idx[0]
        items = np.frombuffer(data, dtype="<f8", offset=pos, count=retained)
        s.levels = [items[idx[h] - idx[0]:idx[h + 1] - idx[0]].astype(np.float64)
                    for h in range(num_levels)]
        s.n = int(n)
        s.min = float(mn)
        s.max = float(mx)
        s._coin = (int(n) * 0x9E3779B1) & 0x7FFFFFFF
        return s

    def __repr__(self) -> str:
        return (f"KllSketch(k={self.k}, n={self.n}, "
                f"retained={self.num_retained}, levels={len(self.levels)})")
