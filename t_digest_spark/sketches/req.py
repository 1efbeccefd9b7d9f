"""REQ sketch — Relative Error Quantiles (Cormode, Karnin, Liberty, Thaler,
Vesely 2021), NumPy-native.

The reference vendors Apache DataSketches' ReqSketch switched to doubles
(reference: core/src/main/java/com/tdunning/math/stats/datasketches/req/
ReqSketch.java, ReqCompactor.java) — it is the subject sketch of the fork's
KDD'21 experiments. Independent reimplementation of the documented scheme:

  * level-h compactor holds a sorted buffer of items of weight 2^h;
  * nominal capacity 2 * numSections * sectionSize
    (ReqCompactor.java getNomCapacity, NOM_CAP_MULT=2); sectionSize starts
    at k (min 4), numSections at 3 (ReqSketch.java INIT_NUMBER_OF_SECTIONS);
  * compaction takes min(trailingOnes(state)+1, numSections) sections from
    the compactable end — the LOW end under high-rank-accuracy (hra), so
    high ranks keep full resolution — promotes evens-or-odds, state += 1
    (ReqCompactor.java compact(), computeCompactionRange());
  * every 2^(numSections-1) compactions the section size shrinks by sqrt(2)
    (nearest even, min 4) and the section count doubles
    (ReqCompactor.java ensureEnoughSections());
  * merge: concatenate level buffers, OR the states, compress if over
    capacity (ReqSketch.java merge() :468-492) — mergeable like KLL/t-digest.

Guarantee shape: rank error relative to min(rank, n-rank) (HRA: accurate at
high ranks), vs KLL/t-digest's additive / scale-function-shaped error.
"""

from __future__ import annotations

import math
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

DEFAULT_K = 12          # DataSketches REQ default
INIT_SECTIONS = 3       # ReqSketch.java INIT_NUMBER_OF_SECTIONS
MIN_K = 4               # ReqSketch.java MIN_K
_SQRT2 = math.sqrt(2.0)


def _nearest_even(v: float) -> int:
    return int(round(v / 2.0)) << 1


def _trailing_ones(x: int) -> int:
    c = 0
    while x & 1:
        c += 1
        x >>= 1
    return c


class _Compactor:
    __slots__ = ("buf", "section_size", "section_size_flt", "num_sections",
                 "state", "coin", "lg_weight")

    def __init__(self, k: int, lg_weight: int):
        self.buf = np.empty(0)
        self.section_size = _nearest_even(float(k)) if k % 2 else int(k)
        self.section_size = max(self.section_size, MIN_K)
        self.section_size_flt = float(self.section_size)
        self.num_sections = INIT_SECTIONS
        self.state = 0
        self.coin = False
        self.lg_weight = lg_weight

    @property
    def nom_capacity(self) -> int:
        return 2 * self.num_sections * self.section_size

    def _ensure_sections(self) -> None:
        while (self.state >= (1 << (self.num_sections - 1))
               and self.section_size > MIN_K):
            ne = _nearest_even(self.section_size_flt / _SQRT2)
            if ne < MIN_K:
                break
            self.section_size_flt /= _SQRT2
            self.section_size = ne
            self.num_sections <<= 1

    def compact(self, hra: bool, rng: np.random.Generator) -> np.ndarray:
        """Sort, compact the compactable end, return promoted items."""
        self.buf = np.sort(self.buf)
        n = self.buf.size
        secs = min(_trailing_ones(self.state) + 1, self.num_sections)
        non_compact = self.nom_capacity // 2 + (self.num_sections - secs) * self.section_size
        if (n - non_compact) & 1:
            non_compact += 1
        if n - non_compact < 2:
            return np.empty(0)
        if hra:
            lo, hi = 0, n - non_compact          # compact the LOW end
        else:
            lo, hi = non_compact, n
        if self.state & 1:
            self.coin = not self.coin            # deterministic alternation
        else:
            self.coin = bool(rng.integers(0, 2))
        region = self.buf[lo:hi]
        promote = region[1::2] if self.coin else region[0::2]
        self.buf = np.concatenate([self.buf[:lo], self.buf[hi:]])
        self.state += 1
        self._ensure_sections()
        return promote

    def merge(self, other: "_Compactor") -> None:
        self.state |= other.state
        self._ensure_sections()
        if other.buf.size:
            self.buf = np.concatenate([self.buf, other.buf])


class ReqSketch:
    """Mergeable relative-error quantile sketch over doubles."""

    __slots__ = ("k", "hra", "compactors", "n", "min", "max", "_rng_counter")

    def __init__(self, k: int = DEFAULT_K, hra: bool = True):
        if k < MIN_K:
            raise ValueError(f"k must be >= {MIN_K}")
        self.k = int(k)
        self.hra = bool(hra)
        self.compactors: List[_Compactor] = [_Compactor(self.k, 0)]
        self.n = 0
        self.min = math.inf
        self.max = -math.inf
        self._rng_counter = 0

    def _rng(self) -> np.random.Generator:
        self._rng_counter += 1
        return np.random.default_rng(0x9E0 ^ (self._rng_counter * 0x9E3779B9))

    # ------------------------------------------------------------------ build

    def update_values(self, values: Sequence[float]) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size == 0:
            return
        if np.isnan(v).any():
            raise ValueError("Cannot add NaN to REQ sketch")
        self.n += v.size
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        c0 = self.compactors[0]
        chunk = max(2 * c0.nom_capacity, 4096)
        for s in range(0, v.size, chunk):
            c0.buf = np.concatenate([c0.buf, v[s:s + chunk]])
            self._compress_if_needed()

    def update(self, x: float) -> None:
        self.update_values([x])

    def _max_nom_size(self) -> int:
        return sum(c.nom_capacity for c in self.compactors)

    def _retained(self) -> int:
        return sum(c.buf.size for c in self.compactors)

    def _compress_if_needed(self) -> None:
        while self._retained() >= self._max_nom_size():
            progressed = False
            for h, c in enumerate(self.compactors):
                if c.buf.size >= c.nom_capacity:
                    promote = c.compact(self.hra, self._rng())
                    if h + 1 >= len(self.compactors):
                        self.compactors.append(_Compactor(self.k, h + 1))
                    nxt = self.compactors[h + 1]
                    nxt.buf = np.concatenate([nxt.buf, promote])
                    progressed = True
                    break
            if not progressed:
                break

    # ------------------------------------------------------------------ merge

    def merge(self, other: "ReqSketch") -> "ReqSketch":
        if self.hra != other.hra:
            raise ValueError("Both sketches must have the same hra setting")
        if other.n == 0:
            return self
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(_Compactor(self.k, len(self.compactors)))
        for h, oc in enumerate(other.compactors):
            self.compactors[h].merge(oc)
        self._compress_if_needed()
        return self

    @classmethod
    def merge_all(cls, sketches: Sequence["ReqSketch"]) -> "ReqSketch":
        out: Optional[ReqSketch] = None
        for s in sketches:
            if out is None:
                out = cls(s.k, s.hra)
            out.merge(s)
        return out if out is not None else cls()

    @classmethod
    def from_values(cls, values, k: int = DEFAULT_K, hra: bool = True) -> "ReqSketch":
        s = cls(k, hra)
        s.update_values(values)
        return s

    # ---------------------------------------------------------------- queries

    def _weighted(self) -> Tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for c in self.compactors:
            if c.buf.size:
                items.append(c.buf)
                weights.append(np.full(c.buf.size, float(1 << c.lg_weight)))
        if not items:
            return np.empty(0), np.empty(0)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], w[order]

    def rank(self, x: float) -> float:
        """Normalized rank with the midpoint-at-ties convention (Dist.cdf)."""
        if self.n == 0:
            return float("nan")
        it, w = self._weighted()
        less = float(w[it < x].sum())
        equal = float(w[it == x].sum())
        return (less + equal / 2.0) / self.n

    cdf = rank

    def ds_rank(self, x: float) -> float:
        """Exact ReqSketch.getRank convention (default ltEq=false):
        normalized weight of retained items STRICTLY below x
        (ReqSketch.java:247-258,369-373; verified vs the compiled
        reference)."""
        if self.n == 0:
            return float("nan")
        it, w = self._weighted()
        return float(w[it < x].sum()) / self.n

    def quantile(self, q: float) -> float:
        """Exact ReqAuxiliary.getQuantile(normRank, ltEq=false) convention
        (ReqAuxiliary.java:142-161, ReqSketch.java:85): sorted items with
        tie-collapsed cumulative weights, truncated rank = int(q*n), return
        the first item whose cumulative weight exceeds the rank. Verified
        bit-compatible with the compiled reference via the java_parity
        harness."""
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"q must be in [0,1], got {q}")
        if self.n == 0:
            return float("nan")
        it, w = self._weighted()
        cum = np.cumsum(w)
        keep = np.ones(it.size, dtype=bool)
        keep[:-1] = it[:-1] != it[1:]      # dedup: keep last of each tie run
        it, cum = it[keep], cum[keep]
        rank = int(q * self.n)
        idx = int(np.searchsorted(cum, rank, side="right"))
        return float(it[min(idx, it.size - 1)])

    @property
    def num_retained(self) -> int:
        return self._retained()

    # ------------------------------------------------------------------ serde

    def to_row(self):
        flat, offs = [], [0]
        for c in self.compactors:
            flat.extend(float(x) for x in np.sort(c.buf))
            offs.append(len(flat))
        states = [int(c.state) for c in self.compactors]
        return flat, offs, states, (self.min if self.n else math.nan), \
            (self.max if self.n else math.nan), float(self.n)

    @classmethod
    def from_row(cls, items, offsets, states, mn, mx, n,
                 k: int = DEFAULT_K, hra: bool = True) -> "ReqSketch":
        s = cls(k, hra)
        arr = np.asarray(items, dtype=np.float64)
        offs = [int(o) for o in offsets]
        s.compactors = []
        for h in range(len(offs) - 1):
            c = _Compactor(k, h)
            c.buf = arr[offs[h]:offs[h + 1]].copy()
            c.state = int(states[h])
            c._ensure_sections()
            s.compactors.append(c)
        if not s.compactors:
            s.compactors = [_Compactor(k, 0)]
        s.n = int(n)
        s.min = float(mn) if s.n else math.inf
        s.max = float(mx) if s.n else -math.inf
        return s

    # ------------------------------------------- DataSketches binary serde
    #
    # Interchange format of the reference's vendored ReqSketch
    # (ReqSerDe.java:36-127 layout doc, :132-226 heapify; native byte order
    # -> little-endian here). Header (8 bytes): preInts, serVer=1, famID=17,
    # flags (bit2 EMPTY, bit3 HRA, bit4 RAW_ITEMS, bit5 L0_SORTED), K u16,
    # numCompactors u8, numRawItems u8. Four body formats: EMPTY (header
    # only), RAWITEMS (n <= MIN_K plain doubles), EXACT (one serialized
    # compactor), ESTIMATION (N u64, min/max doubles, then compactors).
    # Compactor image (ReqCompactor.toByteArray :297-312): state u64,
    # sectionSizeFlt f32, lgWeight u8, numSections u8, 2 pad, count i32,
    # count doubles.

    _DS_FAMILY = 17

    def _ds_flags(self, raw_items: bool) -> int:
        return ((4 if self.n == 0 else 0) | (8 if self.hra else 0)
                | (16 if raw_items else 0) | 32)   # buffers written sorted

    def to_datasketches_bytes(self) -> bytes:
        """Serialize in the DataSketches ReqSketch binary format."""
        if self.n == 0:
            return struct.pack("<BBBBHBB", 2, 1, self._DS_FAMILY,
                               self._ds_flags(False), self.k, 1, 0)
        if self.n <= MIN_K:
            items = np.sort(self.compactors[0].buf)
            out = bytearray(struct.pack("<BBBBHBB", 2, 1, self._DS_FAMILY,
                                        self._ds_flags(True), self.k, 1,
                                        int(self.n)))
            out += items.astype("<f8").tobytes()
            return bytes(out)

        def compactor_bytes(c: _Compactor) -> bytes:
            buf = np.sort(c.buf)
            return (struct.pack("<qfBBxxi", int(c.state),
                                float(c.section_size_flt), int(c.lg_weight),
                                int(c.num_sections), int(buf.size))
                    + buf.astype("<f8").tobytes())

        if len(self.compactors) == 1:
            out = bytearray(struct.pack("<BBBBHBB", 2, 1, self._DS_FAMILY,
                                        self._ds_flags(False), self.k, 1, 0))
            out += compactor_bytes(self.compactors[0])
            return bytes(out)
        out = bytearray(struct.pack("<BBBBHBB", 4, 1, self._DS_FAMILY,
                                    self._ds_flags(False), self.k,
                                    len(self.compactors), 0))
        out += struct.pack("<qdd", self.n, self.min, self.max)
        for c in self.compactors:
            out += compactor_bytes(c)
        return bytes(out)

    @classmethod
    def from_datasketches_bytes(cls, data: bytes) -> "ReqSketch":
        """Heapify a DataSketches ReqSketch byte image (ReqSerDe.heapify)."""
        preints, ser_ver, family, flags, k, n_comp, n_raw = \
            struct.unpack_from("<BBBBHBB", data, 0)
        if family != cls._DS_FAMILY:
            raise ValueError(f"not a REQ sketch image (family {family})")
        if ser_ver != 1:
            raise ValueError(f"unsupported serial version {ser_ver}")
        empty = bool(flags & 4)
        hra = bool(flags & 8)
        raw_items = bool(flags & 16)
        pos = 8
        s = cls(k, hra)
        if empty:
            return s
        if raw_items:
            vals = np.frombuffer(data, dtype="<f8", offset=pos, count=n_raw)
            s.update_values(vals)
            return s

        def read_compactor(pos: int, lg_weight: int):
            state, ssf, lgw, nsec, cnt = struct.unpack_from("<qfBBxxi",
                                                            data, pos)
            pos += struct.calcsize("<qfBBxxi")
            buf = np.frombuffer(data, dtype="<f8", offset=pos, count=cnt)
            pos += 8 * cnt
            c = _Compactor(k, lgw)
            c.buf = buf.astype(np.float64)
            c.state = int(state)
            c.section_size_flt = float(ssf)
            c.section_size = int(round(ssf))
            c.num_sections = int(nsec)
            return c, pos

        if n_comp == 1:       # EXACT
            c, pos = read_compactor(pos, 0)
            s.compactors = [c]
            s.n = int(c.buf.size)
            s.min = float(c.buf.min()) if c.buf.size else math.inf
            s.max = float(c.buf.max()) if c.buf.size else -math.inf
            return s
        n, mn, mx = struct.unpack_from("<qdd", data, pos)
        pos += struct.calcsize("<qdd")
        s.compactors = []
        for h in range(n_comp):
            c, pos = read_compactor(pos, h)
            s.compactors.append(c)
        s.n = int(n)
        s.min = float(mn)
        s.max = float(mx)
        return s

    def __repr__(self) -> str:
        return (f"ReqSketch(k={self.k}, hra={self.hra}, n={self.n}, "
                f"retained={self.num_retained}, levels={len(self.compactors)})")
