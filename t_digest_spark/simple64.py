"""Simple64 word-aligned integer compression, wire-compatible with the
reference's Simple64.java (the codec FloatHistogram uses for its bin counts,
FloatHistogram.java:85,102,131).

Format (Simple64.java:28-47): each 64-bit word carries a 4-bit selector in
the LOW bits and packs n equal-width values above it:

    selector 14: 1x60   13: 2x30   12: 3x20   11: 4x15   10: 5x12
              9: 6x10    8: 7x8*    7: 8x7*    6: 10x6    5: 12x5
              4: 15x4    3: 20x3    2: 30x2    1: 60x1
    (*) the LAST value of the 7x8 / 8x7 arrangements absorbs the 4 spare
        bits, so it may use 12 / 11 bits respectively
        (Simple64.java decompressSingle STATUS_7NUM_8BITS / STATUS_8NUM_7BITS).

The greedy per-word selection is a faithful restatement of
Simple64.compressSingle (Simple64.java:436-486) including its two
spare-bit special cases, NOT a transliteration of the unrolled switch —
packing/unpacking here is a loop over regular offsets 4 + i*bits.
Cross-validated word-for-word against the compiled reference
(java_parity harness `s64-compress`/`s64-decompress`, tests/test_java_parity.py).

Counts arrays are histogram-bin sized (<= 10k), so pure-Python ints are
fine; this is a serde kernel, never a per-row hot path.
"""

from __future__ import annotations

from typing import List, Sequence

_NUM_DATA_BITS = 60
# selector -> (count, bits); last-value bit widths for selectors 8/7 differ
_SELECTOR = {14: (1, 60), 13: (2, 30), 12: (3, 20), 11: (4, 15), 10: (5, 12),
             9: (6, 10), 8: (7, 8), 7: (8, 7), 6: (10, 6), 5: (12, 5),
             4: (15, 4), 3: (20, 3), 2: (30, 2), 1: (60, 1)}
_BITS_TO_SELECTOR = {bits: sel for sel, (_, bits) in _SELECTOR.items()}
_BITS_TO_COUNT = {bits: n for _, (n, bits) in _SELECTOR.items()}


def _last_width(sel: int, bits: int) -> int:
    if sel == 8:     # 7 x 8 bits, last value gets bits 52..63 (12 bits)
        return 12
    if sel == 7:     # 8 x 7 bits, last value gets bits 53..63 (11 bits)
        return 11
    return bits


def _select(data: Sequence[int], off: int, size: int) -> int:
    """Greedy width selection for the next word — exact port of the
    compressSingle scan loop (Simple64.java:440-466)."""
    ic = 1
    min_bits = 1
    max_fit_plus1 = 1 << min_bits
    while True:
        next_data = int(data[off + ic - 1])
        if next_data < 0:
            raise ValueError(f"Cannot compress negative input {next_data}")
        if next_data >= (1 << _NUM_DATA_BITS):
            # stricter than Java: the reference's >60-bit error path is
            # unreachable (compressSingle's ic==0 branch can't trigger for a
            # first value), so oversize values silently truncate there; we
            # refuse instead of corrupting
            raise ValueError(
                f"Cannot compress input needing more than {_NUM_DATA_BITS} bits")
        while next_data >= max_fit_plus1 and min_bits < _NUM_DATA_BITS:
            if min_bits == 7 and ic == 8 and next_data < (max_fit_plus1 << 4):
                break           # 8th value may use the 4 spare bits
            if min_bits == 8 and ic == 7 and next_data < (max_fit_plus1 << 4):
                break           # 7th value may use the 4 spare bits
            min_bits += 1
            max_fit_plus1 <<= 1
            if ic * min_bits > _NUM_DATA_BITS:
                ic -= 1
                break
        ic += 1
        if not (ic * min_bits <= _NUM_DATA_BITS and ic <= size):
            break
    ic -= 1
    if ic == 0:
        raise ValueError(
            f"Cannot compress input needing more than {_NUM_DATA_BITS} bits")
    # widen to the largest bit width the value count still permits
    while ic * (min_bits + 1) <= _NUM_DATA_BITS:
        min_bits += 1
    if (ic + 1) * min_bits <= _NUM_DATA_BITS:
        min_bits += 1
    return min_bits


def compress(data: Sequence[int]) -> List[int]:
    """Compress non-negative ints into a list of 64-bit words (as Python
    ints in [0, 2^64); equivalent to Simple64.compress filling a LongBuffer,
    with Java's signed longs reinterpreted unsigned)."""
    out: List[int] = []
    off, size = 0, len(data)
    while size > 0:
        bits = _select(data, off, size)
        sel = _BITS_TO_SELECTOR[bits]
        n = _BITS_TO_COUNT[bits]
        word = sel
        for i in range(n):
            word |= int(data[off + i]) << (4 + i * bits)
        out.append(word & 0xFFFFFFFFFFFFFFFF)
        off += n
        size -= n
    return out


def decompress(words: Sequence[int], n_values: int) -> List[int]:
    """Unpack exactly n_values ints (Simple64.decompress contract: the
    caller knows the uncompressed length)."""
    out: List[int] = []
    it = iter(words)
    while len(out) < n_values:
        nxt = next(it, None)
        if nxt is None:
            raise ValueError(
                f"truncated Simple64 stream: needed {n_values} values, "
                f"got {len(out)}")
        word = int(nxt) & 0xFFFFFFFFFFFFFFFF
        sel = word & 0xF
        if sel not in _SELECTOR:
            raise ValueError(f"Unknown Simple9 status: {sel}")
        n, bits = _SELECTOR[sel]
        for i in range(n):
            width = _last_width(sel, bits) if i == n - 1 else bits
            out.append((word >> (4 + i * bits)) & ((1 << width) - 1))
    return out[:n_values]


def compress_bytes(data: Sequence[int]) -> bytes:
    """Words as big-endian bytes — the layout FloatHistogram.writeObject
    produces for its counts payload (Java ByteBuffer default order)."""
    import struct
    words = compress(data)
    return struct.pack(f">{len(words)}Q", *words)


def decompress_bytes(raw: bytes, n_values: int) -> List[int]:
    import struct
    n_words = len(raw) // 8
    return decompress(struct.unpack(f">{n_words}Q", raw[:8 * n_words]),
                      n_values)
