"""Tests for bench.py's cross-round host-normalization instruments.

Round 4 made the merge kernel itself faster (231b145), so the canary rate
stopped being a pure host-speed reading. bench.py pins the instrument by
re-running the canary through the r2 driver snapshot (git archive) and
matches instruments when forming the cross-round host ratio (BENCH.md §0).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_host_ratio_prefers_matched_r2proto_pair():
    prev = {"kernel_pts_per_sec_r2proto": 8e6,
            "kernel_pts_per_sec_single_core": 20e6}
    ratio, instrument = bench._host_ratio(prev, kernel_r2proto=16e6,
                                          kernel_now=24e6)
    assert instrument == "r2proto_vs_r2proto"
    assert ratio == pytest.approx(0.5)


def test_host_ratio_r2_era_record_uses_pinned_instrument():
    # BENCH_r02/r03 shape: only a single_core reading, taken on the r2-era
    # kernel — must pair with OUR r2proto reading, not the faster current
    # kernel (pairing with kernel_now would report 8/24 = 0.33 and charge
    # the engine's own speedup to the "host").
    prev = {"kernel_pts_per_sec_single_core": 8e6}
    ratio, instrument = bench._host_ratio(prev, kernel_r2proto=16e6,
                                          kernel_now=24e6)
    assert instrument == "prev_single_core_vs_r2proto"
    assert ratio == pytest.approx(0.5)


def test_host_ratio_falls_back_when_snapshot_unavailable():
    prev = {"kernel_pts_per_sec_single_core": 8e6}
    ratio, instrument = bench._host_ratio(prev, kernel_r2proto=None,
                                          kernel_now=24e6)
    assert instrument == "single_core_mismatched_kernels"
    assert ratio == pytest.approx(1 / 3)
    assert bench._host_ratio({}, None, None) == (None, None)


def test_host_ratio_fallback_is_matched_for_current_kernel_records():
    # A prev record that carries an r2proto key was produced by a round-4+
    # bench, so its single_core reading used the CURRENT kernel: pairing it
    # with kernel_now is instrument-matched even when our own r2proto probe
    # is unavailable (git missing), and must be labeled as such.
    prev = {"kernel_pts_per_sec_r2proto": 8e6,
            "kernel_pts_per_sec_single_core": 12e6}
    ratio, instrument = bench._host_ratio(prev, kernel_r2proto=None,
                                          kernel_now=24e6)
    assert instrument == "single_core_current_kernel_matched"
    assert ratio == pytest.approx(0.5)


def test_r2proto_canary_runs_pinned_snapshot():
    """The pinned-instrument canary extracts the r2 driver snapshot and
    measures a plausible single-core rate through it (>1M pts/s even in a
    badly degraded window; observed range 4.4M-16.4M)."""
    rate = bench._r2proto_canary_rate()
    if rate is None:
        pytest.skip("git or r2 snapshot unavailable in this environment")
    assert rate > 1e6


def _canary_stub():
    return 1e6


def test_retry_bracket_rescues_slow_query():
    # First measurement 9s vs target 2s trips the gate; the retry lands at
    # 2.5s (<= 1.5x target) and the bracket stops early with the better best.
    times = iter([2.5])
    best, entry, budget = bench._retry_bracket(
        lambda: next(times), best=9.0, target=2.0, retry_factor=1.5,
        max_retries=2, retry_budget=180.0, mini_canary=_canary_stub)
    assert best == 2.5
    assert entry["retries"] == [2.5]
    assert entry["final"] == 2.5
    assert "retry_error" not in entry
    assert budget < 180.0


def test_retry_bracket_failure_keeps_first_measurement():
    # A transient error during the retry must not discard the valid first
    # measurement (pre-fix behavior zeroed the query to None).
    def boom():
        raise RuntimeError("transient executor loss")
    best, entry, budget = bench._retry_bracket(
        boom, best=9.0, target=2.0, retry_factor=1.5,
        max_retries=2, retry_budget=180.0, mini_canary=_canary_stub)
    assert best == 9.0
    assert entry["final"] == 9.0
    assert "transient executor loss" in entry["retry_error"]


def test_retry_bracket_respects_exhausted_budget():
    best, entry, budget = bench._retry_bracket(
        lambda: 1.0, best=9.0, target=2.0, retry_factor=1.5,
        max_retries=2, retry_budget=0.0, mini_canary=_canary_stub)
    assert best == 9.0
    assert entry["budget_exhausted"] is True
    assert entry["retries"] == []


def test_pinned_canary_instrument_branches():
    """_pinned_canary must never return a current-kernel reading as if it
    were the pinned r2proto instrument (ADVICE r4: that folds the kernel
    speedup into the host span)."""
    # own probe wins
    assert bench._pinned_canary(
        {"kernel_pts_per_sec_r2proto": 10.0,
         "kernel_pts_per_sec_single_core": 12.0}) == (10.0, "r2proto")
    # deflate by the record's own measured speedup
    rate, instr = bench._pinned_canary(
        {"kernel_pts_per_sec_single_core": 12.0,
         "kernel_speedup_vs_r2proto_same_window": 1.2})
    assert rate == 10.0 and instr == "single_core_deflated"
    # pre-speedup kernel: raw reading IS the pinned instrument
    assert bench._pinned_canary(
        {"kernel_pts_per_sec_single_core": 8.0,
         "kernel_generation": "pre-231b145"}) == (8.0, "single_core_r2_era")
    # post-speedup record without a probe: excluded, not mislabeled
    rate, instr = bench._pinned_canary(
        {"kernel_pts_per_sec_single_core": 12.0,
         "kernel_generation": "post-231b145"})
    assert rate is None and instr == "excluded_current_kernel_no_probe"
    rate, instr = bench._pinned_canary(
        {"kernel_pts_per_sec_single_core": 12.0, "kernel_commit": "abc1234"})
    assert rate is None and instr == "excluded_current_kernel_no_probe"
    # legacy record with no identity info at all: assumption is labeled
    rate, instr = bench._pinned_canary(
        {"kernel_pts_per_sec_single_core": 8.0})
    assert rate == 8.0 and instr == "single_core_r2_era_assumed"
    assert bench._pinned_canary({}) == (None, None)


def test_host_ratio_branches_on_kernel_commit():
    # same kernel commit -> matched instrument against kernel_now
    ratio, instr = bench._host_ratio(
        {"kernel_pts_per_sec_single_core": 10.0, "kernel_commit": "k1"},
        kernel_r2proto=None, kernel_now=20.0, kernel_commit_now="k1")
    assert ratio == 0.5 and instr == "single_core_same_kernel_commit"
    ratio, instr = bench._host_ratio(
        {"kernel_pts_per_sec_single_core": 10.0, "kernel_commit": "k0"},
        kernel_r2proto=None, kernel_now=20.0, kernel_commit_now="k1")
    assert instr == "single_core_mismatched_kernels"


def test_compact_line_fits_budget_at_62_queries_full_precision():
    timings = {f"query_name_number_{i:02d}": 12.345678 for i in range(62)}
    line = bench._compact_summary_line(
        timings, total=765.4, sf=0.1, kernel_pts_per_sec=6.2e6,
        scaling_compact={"eff_8_32": 0.84})
    assert len(line) <= 1900
    import json
    rec = json.loads(line)
    assert len(rec["queries"]) == 62
    # some rounding of the true value survives, whatever rung was needed
    assert abs(rec["queries"]["query_name_number_00"] - 12.345678) <= 0.5


def test_compact_line_degraded_host_4digit_timings_still_fits():
    # the r4/r3 failure shape: 62 queries, 4-digit wall times; nd=3..1 all
    # exceed the budget so the ladder must drop extras, then (if needed)
    # the fastest queries — never emit an over-budget line
    timings = {f"query_name_number_{i:02d}": 1234.5678 for i in range(62)}
    line = bench._compact_summary_line(
        timings, total=76543.2, sf=0.1, kernel_pts_per_sec=1.1e6,
        scaling_compact={"eff_8_32": 0.61})
    assert len(line) <= 1900
    import json
    rec = json.loads(line)
    # whole-second rounding keeps every query in this case
    assert len(rec["queries"]) + rec.get("queries_omitted_fastest", 0) == 62


def test_compact_line_drops_fastest_with_marker_when_forced():
    # adversarial: absurdly long names force the query-dropping rung
    timings = {("q" * 120) + f"{i:03d}": float(i) for i in range(40)}
    line = bench._compact_summary_line(
        timings, total=780.0, sf=0.1, kernel_pts_per_sec=None,
        scaling_compact=None)
    assert len(line) <= 1900
    import json
    rec = json.loads(line)
    omitted = rec["queries_omitted_fastest"]
    assert omitted > 0 and len(rec["queries"]) + omitted == 40
    # the SLOWEST queries (most informative) survive
    kept_vals = sorted(rec["queries"].values())
    assert kept_vals[0] == float(omitted)
