"""Aux-input tests (reference: acquisition.cxx:32-156)."""

import io

import numpy as np
import pytest

from rtl_power_fftw_tpu.auxdata import AuxData, make_window, read_inputfile
from rtl_power_fftw_tpu.config import parse_args
from rtl_power_fftw_tpu.exceptions import ReturnValue, RPFexception


def parse(argv):
    return parse_args(argv, stderr=io.StringIO())


def test_read_inputfile_last_value_wins():
    # Multi-column input: last value per line is used, so the program's own
    # output can be fed back as baseline (doc/rtl_power_fftw.1.md:125).
    text = "# comment\n1.41e9 -68.77\n1.42e9 -68.66\n\nnot-a-number\n3.0\n"
    vals = read_inputfile(io.StringIO(text))
    assert vals == [-68.77, -68.66, 3.0]


def test_read_inputfile_stops_at_non_numeric():
    # C++ `>>` stops at the first non-parsing token: "1 2 x 3" reads 1,2.
    vals = read_inputfile(io.StringIO("1 2 x 3\n"))
    assert vals == [2.0]


def test_window_from_file(tmp_path):
    N = 8
    f = tmp_path / "win.dat"
    f.write_text("".join(f"{i * 0.1}\n" for i in range(N)))
    p = parse(["-b", str(N), "-w", str(f)])
    aux = AuxData(p, stderr=io.StringIO())
    np.testing.assert_allclose(aux.window_values,
                               np.arange(N) * 0.1, rtol=1e-6)
    assert aux.window_values.dtype == np.float32


def test_baseline_from_file_is_float64(tmp_path):
    N = 4
    f = tmp_path / "base.dat"
    f.write_text("0.1\n0.2\n0.3\n0.4\n")
    p = parse(["-b", str(N), "-B", str(f)])
    aux = AuxData(p, stderr=io.StringIO())
    assert aux.baseline_values.dtype == np.float64
    np.testing.assert_array_equal(aux.baseline_values, [0.1, 0.2, 0.3, 0.4])


def test_wrong_length_rejected(tmp_path):
    f = tmp_path / "w.dat"
    f.write_text("1\n2\n3\n")
    p = parse(["-b", "8", "-w", str(f)])
    with pytest.raises(RPFexception) as e:
        AuxData(p, stderr=io.StringIO())
    assert e.value.retval == ReturnValue.InvalidInput


def test_missing_file_rejected():
    p = parse(["-w", "/nonexistent/file.dat"])
    with pytest.raises(RPFexception) as e:
        AuxData(p, stderr=io.StringIO())
    assert e.value.retval == ReturnValue.InvalidInput


def test_window_from_stdin():
    N = 4
    p = parse(["-b", str(N), "-w", "-"])
    aux = AuxData(p, stdin=io.StringIO("1\n1\n1\n1\n"), stderr=io.StringIO())
    np.testing.assert_array_equal(aux.window_values, np.ones(N))


def test_combined_stdin_baseline_first_then_window():
    """Documented order (doc/rtl_power_fftw.1.md:127): baseline then window.
    (The reference implementation has a broken split here; we follow the doc —
    see auxdata.py docstring.)"""
    N = 4
    p = parse(["-b", str(N), "-w", "-", "-B", "-"])
    stdin = io.StringIO("10\n20\n30\n40\n0.1\n0.2\n0.3\n0.4\n")
    aux = AuxData(p, stdin=stdin, stderr=io.StringIO())
    np.testing.assert_array_equal(aux.baseline_values, [10, 20, 30, 40])
    np.testing.assert_allclose(aux.window_values, [0.1, 0.2, 0.3, 0.4], rtol=1e-6)


def test_combined_stdin_wrong_count_rejected():
    p = parse(["-b", "4", "-w", "-", "-B", "-"])
    with pytest.raises(RPFexception) as e:
        AuxData(p, stdin=io.StringIO("1\n2\n3\n"), stderr=io.StringIO())
    assert e.value.retval == ReturnValue.InvalidInput


def test_builtin_windows():
    for name in ("hann", "hamming", "blackman", "blackman-harris",
                 "flattop", "bartlett", "boxcar"):
        w = make_window(name, 64)
        assert w.shape == (64,)
        assert w.dtype == np.float32
        assert np.all(np.isfinite(w))
    # Periodic Hann: w[0] = 0, symmetric about N/2.
    w = make_window("hann", 8)
    assert w[0] == 0
    np.testing.assert_allclose(w[1:], w[1:][::-1], rtol=1e-6)


def test_unknown_window_rejected():
    with pytest.raises(RPFexception):
        make_window("gaussian-nope", 16)


def test_read_inputfile_cxx_prefix_extraction():
    """`lineStream >> value` is a CHARACTER-stream extraction: it parses
    the numeric PREFIX of a token and stops after a successful parse —
    '1420e6 -95.3dB' yields -95.3 (not 1.42e9), '3,5' yields 3, and
    nan/inf/underscore tokens are rejected like C++ num_get."""
    assert read_inputfile(io.StringIO("1420e6 -95.3dB\n")) == [-95.3]
    assert read_inputfile(io.StringIO("3,5\n")) == [3.0]
    assert read_inputfile(io.StringIO("1_000\n")) == [1.0]
    assert read_inputfile(io.StringIO("nan\n")) == []
    assert read_inputfile(io.StringIO("inf 2\n")) == []
    assert read_inputfile(io.StringIO("5 garbage 7\n")) == [5.0]
