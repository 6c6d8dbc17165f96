"""Unit tests for the flag system: parsers, defaults, validation
(reference semantics: params.cxx:29-272)."""

import io

import pytest

from rtl_power_fftw_tpu.config import parse_args, parse_frequency, parse_time
from rtl_power_fftw_tpu.exceptions import ReturnValue, RPFexception


def parse(argv):
    return parse_args(argv, stderr=io.StringIO())


# ---- parse_frequency (params.cxx:29-43) ----

def test_parse_frequency_plain():
    assert parse_frequency("1420405752") == 1420405752


def test_parse_frequency_multipliers():
    assert parse_frequency("100k") == 100_000
    assert parse_frequency("100M") == 100_000_000
    assert parse_frequency("1.5G") == 1_500_000_000
    assert parse_frequency("144.1M") == 144_100_000


def test_parse_frequency_whitespace_between():
    assert parse_frequency("100 M") == 100_000_000


def test_parse_frequency_truncates():
    assert parse_frequency("1.9") == 1


def test_parse_frequency_bad_suffix():
    assert parse_frequency("100x") == -1
    assert parse_frequency("100 MHz") == -1


def test_parse_frequency_scientific():
    assert parse_frequency("1.42e9") == 1_420_000_000


# ---- parse_time (params.cxx:45-88) ----

def test_parse_time_bare_seconds():
    assert parse_time("10") == 10.0
    assert parse_time("2.5") == 2.5


def test_parse_time_units():
    assert parse_time("5s") == 5.0
    assert parse_time("2m") == 120.0
    assert parse_time("1h") == 3600.0
    assert parse_time("1d") == 86400.0


def test_parse_time_compound():
    assert parse_time("1d2h3m4s") == 86400 + 2 * 3600 + 3 * 60 + 4
    assert parse_time("1m30") == 90.0  # trailing unitless = seconds


def test_parse_time_duplicate_unit_rejected():
    assert parse_time("1m2m") == -1.0


def test_parse_time_garbage_rejected():
    assert parse_time("abc") == -1.0
    assert parse_time("5x") == -1.0


# ---- Params defaults (params.h:33-56) ----

def test_defaults():
    p = parse([])
    assert p.N == 512
    assert p.gain == 372
    assert p.cfreq == 1420405752
    assert p.sample_rate == 2_000_000
    assert p.buffers == 5
    assert p.buf_length == 16384 * 100
    assert p.repeats == (16384 * 100) // (2 * 512)
    assert not p.endless and not p.linear and not p.strict_time


def test_odd_bins_bumped_to_even():
    p = parse(["-b", "501"])
    assert p.N == 502


def test_buffer_length_rounded_to_16384():
    p = parse(["-s", "20000"])
    assert p.buf_length == 16384  # round-half-up of 20000/16384 = 1.22 → 1
    p = parse(["-s", "25000"])
    assert p.buf_length == 2 * 16384  # 25000/16384 = 1.53 → 2


def test_default_repeats_uses_adjusted_values():
    p = parse(["-b", "1001", "-s", "20000"])
    # N → 1002, buf_length → 16384; repeats = 16384 // (2·1002) = 8
    assert p.repeats == 16384 // (2 * 1002)


def test_freq_range_parsing():
    p = parse(["-f", "100M:110M"])
    assert p.freq_hopping_isSet
    assert p.startfreq == 100_000_000
    assert p.stopfreq == 110_000_000
    assert p.cfreq == 105_000_000


def test_freq_range_descending_rejected():
    with pytest.raises(RPFexception) as e:
        parse(["-f", "110M:100M"])
    assert e.value.retval == ReturnValue.InvalidArgument


def test_freq_range_malformed_rejected():
    with pytest.raises(RPFexception) as e:
        parse(["-f", "110M:"])
    assert e.value.retval == ReturnValue.InvalidArgument


def test_single_freq():
    p = parse(["-f", "1420405752"])
    assert not p.freq_hopping_isSet
    assert p.cfreq == 1420405752


def test_n_and_t_mutually_exclusive():
    with pytest.raises(RPFexception) as e:
        parse(["-n", "10", "-t", "5"])
    assert e.value.retval == ReturnValue.InvalidArgument


def test_strict_time_without_time_warns_and_disables():
    err = io.StringIO()
    p = parse_args(["-T"], stderr=err)
    assert not p.strict_time
    assert "strict-time has no effect" in err.getvalue()


def test_negative_args_rejected():
    for argv in (["-b", "-4"], ["-r", "-1"], ["-g", "-2"],
                 ["-d", "-1"], ["--buffers", "-1"], ["-s", "-5"], ["-n", "-3"]):
        with pytest.raises(RPFexception) as e:
            parse(argv)
        assert e.value.retval == ReturnValue.InvalidArgument


def test_bad_time_value():
    with pytest.raises(RPFexception) as e:
        parse(["-t", "zzz"])
    assert e.value.retval == ReturnValue.InvalidArgument


def test_matrix_mode_filenames():
    p = parse(["-m", "myscan"])
    assert p.matrixMode
    assert p.bin_file == "myscan.bin"
    assert p.meta_file == "myscan.met"


def test_session_duration():
    p = parse(["-e", "5m"])
    assert p.session_duration_isSet
    assert p.session_duration == 300.0


def test_unknown_option_is_cli_error():
    with pytest.raises(RPFexception) as e:
        parse(["--no-such-flag"])
    assert e.value.retval == ReturnValue.TCLAPerror


def test_window_file_and_function_exclusive():
    with pytest.raises(RPFexception):
        parse(["-w", "foo.dat", "--window-function", "hann"])
