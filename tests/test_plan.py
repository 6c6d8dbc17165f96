"""Unit tests for the measurement planner (reference: acquisition.cxx:158-198).

The hop-list arithmetic defines the frequency axis of all stitched output,
so these tests pin it against hand-computed values using the reference's
exact rounding (C double ceil, int64 truncating division)."""

import io
import math

from rtl_power_fftw_tpu.config import parse_args
from rtl_power_fftw_tpu.planning import Plan


def parse(argv):
    return parse_args(argv, stderr=io.StringIO())


def test_integration_time_sets_repeats():
    p = parse(["-t", "10"])
    Plan(p, 2_048_000)
    assert p.repeats == math.ceil(2_048_000 * 10 / 512)


def test_buffer_shrinks_for_small_measurements():
    p = parse(["-n", "10", "-b", "512"])
    Plan(p, 2_048_000)
    # 2·512·10 = 10240 bytes → 1 base_buf
    assert p.buf_length == 16384


def test_buffer_not_shrunk_when_user_set():
    p = parse(["-n", "10", "-b", "512", "-s", str(16384 * 100)])
    Plan(p, 2_048_000)
    assert p.buf_length == 16384 * 100


def test_buffer_kept_at_default_for_large_measurements():
    p = parse(["-n", "1000000", "-b", "512"])
    Plan(p, 2_048_000)
    assert p.buf_length == 16384 * 100


def test_zero_repeats_gives_one_base_buf():
    p = parse(["-n", "0"])
    Plan(p, 2_048_000)
    assert p.buf_length == 16384


def test_single_freq_plan():
    p = parse(["-f", "1420405752"])
    plan = Plan(p, 2_048_000)
    assert plan.freqs_to_tune == [1420405752]


def test_range_smaller_than_bandwidth_single_hop():
    p = parse(["-f", "100M:101M"])
    plan = Plan(p, 2_048_000)
    # span 1 MHz < rate 2.048 MHz → 1 hop at the range midpoint
    assert plan.freqs_to_tune == [(100_000_000 + 101_000_000) // 2]


def test_multi_hop_plan_matches_reference_arithmetic():
    rate = 2_048_000
    start, stop = 100_000_000, 110_000_000
    p = parse(["-f", "100M:110M"])
    plan = Plan(p, rate)

    span = stop - start
    hops = math.ceil(span / rate)
    assert hops == 5
    overhang = (hops * rate - span) // (hops - 1)
    expect = [int(start + rate / 2.0)]
    for _ in range(1, hops):
        expect.append(expect[-1] + rate - overhang)
    assert plan.freqs_to_tune == expect
    # Coverage: first hop covers start, last hop covers stop.
    assert expect[0] - rate / 2 <= start
    assert expect[-1] + rate / 2 >= stop


def test_min_overlap_increases_hops():
    rate = 2_000_000
    p = parse(["-f", "100M:110M", "-o", "25"])
    plan = Plan(p, rate)
    min_overhang = rate * 25 / 100
    hops = math.ceil((10_000_000 - min_overhang) / (rate - min_overhang))
    assert len(plan.freqs_to_tune) == hops
    # Every adjacent pair overlaps by at least min_overhang.
    for a, b in zip(plan.freqs_to_tune, plan.freqs_to_tune[1:]):
        overlap = rate - (b - a)
        assert overlap >= min_overhang


def test_doc_example_144_146MHz():
    """The man-page example (doc/rtl_power_fftw.1.md:182): -f 144.1M:146.1M
    at 2 MS/s → exactly one hop."""
    p = parse(["-f", "144100000:146100000", "-b", "500", "-n", "100"])
    plan = Plan(p, 2_000_000)
    assert plan.freqs_to_tune == [(144_100_000 + 146_100_000) // 2]
