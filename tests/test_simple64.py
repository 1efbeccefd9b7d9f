"""Simple64 codec: self round-trips, properties, and word-for-word parity
with the compiled reference (fixtures produced by the java_parity harness).

Reference bug documented here and in simple64.py: the reference's OWN
decompressSingle corrupts the 15x4-bit packing (STATUS_15NUM_4BITS writes
outOffset+6 twice, never outOffset+7 — Simple64.java), so Java round-trips
of e.g. np.arange inputs fail in the reference while the format itself is
fine; our decoder decodes what compress wrote.
"""
import json
import pathlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from t_digest_spark.simple64 import (compress, compress_bytes, decompress,
                                     decompress_bytes)

FIXDIR = pathlib.Path(__file__).parent / "fixtures" / "java_parity"


def test_java_word_parity():
    fix = json.loads((FIXDIR / "simple64.json").read_text())
    assert len(fix) >= 6
    for name, case in fix.items():
        words = compress(case["values"])
        assert words == case["java_words"], f"{name}: compressed words differ"
        assert decompress(case["java_words"], len(case["values"])) == \
            case["values"], f"{name}: decode of Java words differs"


def test_bytes_round_trip():
    vals = [0, 1, 5, 1000, 2 ** 40, 3, 3, 3, 3]
    raw = compress_bytes(vals)
    assert len(raw) % 8 == 0
    assert decompress_bytes(raw, len(vals)) == vals


def test_rejects_negative_and_oversize():
    with pytest.raises(ValueError):
        compress([5, -1])
    with pytest.raises(ValueError):
        compress([1 << 60])
    assert compress([(1 << 60) - 1])  # 60 bits exactly fits


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 60) - 1),
                min_size=1, max_size=300))
def test_round_trip_property(vals):
    assert decompress(compress(vals), len(vals)) == vals


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=7), min_size=1,
                max_size=500))
def test_small_values_pack_densely(vals):
    words = compress(vals)
    # 3-bit packing fits 20 values/word; the greedy selection widens at
    # array tails (e.g. 11 small values -> a 10x6 word + a 1x60 word), so
    # the guaranteed bound is 10/word plus one tail word
    assert len(words) <= -(-len(vals) // 10) + 1


def test_float_histogram_wire_parity():
    """FloatHistogram payload: Python parses the Java object stream, counts
    match Java's live histogram bit-exactly, and re-serialization is
    byte-identical to the Java-written payload."""
    from t_digest_spark.operators.histogram import (
        float_histogram_from_bytes, float_histogram_to_bytes,
        java_object_stream_payload)

    jsum = json.loads((FIXDIR / "float_histogram.json").read_text())
    payload = java_object_stream_payload(
        (FIXDIR / "float_histogram.oos").read_bytes())
    spec, counts = float_histogram_from_bytes(payload)
    assert counts == jsum["counts"]
    assert spec.n_bins == len(jsum["counts"])
    assert float_histogram_to_bytes(spec, counts) == payload

    # python-built counts over the regenerated input match Java's add() path
    vals = np.random.default_rng(11).gamma(2.0, 3.0, 30_000) + 0.5
    idx = np.array([spec._float_repr_index(v) for v in vals])
    idx = np.where(vals <= spec.lo, 0,
                   np.where(vals >= spec.hi, spec.n_bins - 1, idx))
    assert np.bincount(idx, minlength=spec.n_bins).tolist() == jsum["counts"]


def test_float_histogram_bits12_stream_accepted():
    """Java legally emits bitsOfPrecision=12 for binsPerDecade in
    (6803, 10000]; the reconstructed bins_per_decade must clamp to Java's
    own <=10000 input cap instead of rejecting the stream (round-3 review
    fix)."""
    import struct

    from t_digest_spark.operators.histogram import (
        HistogramSpec, float_histogram_from_bytes, float_histogram_to_bytes)

    spec = HistogramSpec(1.0, 4.0, kind="float_repr", bins_per_decade=10000)
    assert spec.bits == 12
    counts = list(range(spec.n_bins))
    raw = float_histogram_to_bytes(spec, counts)
    spec2, counts2 = float_histogram_from_bytes(raw)
    assert spec2.bits == 12 and spec2.n_bins == spec.n_bins
    assert counts2 == counts

    # truncated payload -> explicit error, not StopIteration
    with pytest.raises(ValueError, match="truncated Simple64 stream"):
        float_histogram_from_bytes(raw[:-8])

    # negative short length (Java writeShort overflow) -> explicit error
    bad = bytearray(raw)
    struct.pack_into(">h", bad, 18, -12)
    with pytest.raises(ValueError, match="negative payload length"):
        float_histogram_from_bytes(bytes(bad))


def test_compress_bytes_length_guard():
    from t_digest_spark.operators.histogram import (HistogramSpec,
                                                    float_histogram_to_bytes)
    spec = HistogramSpec(1.0, 4.0, kind="float_repr", bins_per_decade=10000)
    big = [1 << 55] * spec.n_bins            # 1 word per value > 32767 bytes
    with pytest.raises(ValueError, match="signed-short length field"):
        float_histogram_to_bytes(spec, big)
