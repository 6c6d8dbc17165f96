"""Byte-level output format tests (acquisition.cxx:360-433 semantics)."""

import io

import numpy as np

from rtl_power_fftw_tpu.output.text import TextWriter, freq_precision
from rtl_power_fftw_tpu.output.matrix import MatrixWriter, read_matrix
from rtl_power_fftw_tpu.output.stats import SessionStats
from rtl_power_fftw_tpu.utils.cxxfmt import cxx_float


def test_cxx_float_matches_iostream_semantics():
    # C++ `setprecision(p)` default-float == printf %.pg.
    assert cxx_float(1419381752.0, 9) == "1.41938175e+09"
    assert cxx_float(-68.7714233, 6) == "-68.7714"
    assert cxx_float(-68.668, 6) == "-68.668"
    assert cxx_float(0.025, 6) == "0.025"
    assert cxx_float(0.0557726, 6) == "0.0557726"
    assert cxx_float(100.0, 6) == "100"
    assert cxx_float(2000000.0, 6) == "2e+06"
    assert cxx_float(float("inf")) == "inf"
    assert cxx_float(1234567.0, 3) == "1.23e+06"


def test_freq_precision_formula():
    # ceil(floor(log10(tuned)) − log10(rate//N) + 1 + 2) (acquisition.cxx:379-383)
    import math
    tuned, rate, N = 1_420_405_752, 2_048_000, 512
    expect = math.ceil(math.floor(math.log10(tuned))
                       - math.log10(rate // N) + 3)
    assert freq_precision(tuned, rate, N) == expect == 9


def test_text_spectrum_layout():
    buf = io.StringIO()
    w = TextWriter(buf)
    freqs = np.array([1.0e9, 1.000004e9])
    vals = np.array([-68.7714, -68.668])
    w.write_spectrum(freqs, vals, "2015-11-22 17:59:34 UTC",
                     "2015-11-22 17:59:34 UTC",
                     tuned_freq=1_000_002_000, actual_samplerate=2_048_000, N=512)
    lines = buf.getvalue().split("\n")
    assert lines[0] == "# rtl-power-fftw output"
    assert lines[1] == "# Acquisition start: 2015-11-22 17:59:34 UTC"
    assert lines[2] == "# Acquisition end: 2015-11-22 17:59:34 UTC"
    assert lines[3] == "#"
    assert lines[4] == "# frequency [Hz] power spectral density [dB/Hz]"
    assert lines[5] == "1e+09 -68.7714"
    assert lines[6] == "1.000004e+09 -68.668"
    assert lines[7] == ""  # spectrum separator blank line
    assert lines[8] == ""  # end of output (trailing newline)


def test_matrix_writer_roundtrip(tmp_path):
    stats = SessionStats()
    binf, metf = str(tmp_path / "m.bin"), str(tmp_path / "m.met")
    mw = MatrixWriter(binf, metf, stats)
    mw.truncate()
    N = 4
    # Two hops per pass, two passes; finalfreq = 200.
    for _pass in range(2):
        mw.append_row(np.arange(N) + 0.5, tuned_freq=100, finalfreq=200)
        mw.append_row(np.arange(N) + 10.5, tuned_freq=200, finalfreq=200)
    # metaCols counts all hops of the FIRST pass only (reference logic).
    assert stats.metaCols == 2 * N
    assert stats.metaRows == 3  # starts at 1, +1 per completed pass
    stats.startFreq, stats.endFreq, stats.stepFreq = 99, 201, 1
    stats.firstAcqTimestamp = "2026-01-01 00:00:00 UTC"
    stats.lastAcqTimestamp = "2026-01-01 00:05:00 UTC"
    stats.avgScanDur = 0.0557726
    mw.write_meta(N=N, repeats_done=100, actual_samplerate=2_000_000)

    data, meta = read_matrix(binf, metf)
    assert data.shape == (2, 8)  # 2 passes, each 8 columns (2 hops x 4 bins)
    np.testing.assert_allclose(data[0, :4], np.arange(N) + 0.5)
    np.testing.assert_allclose(data[0, 4:], np.arange(N) + 10.5)
    assert meta["cols"] == "8"
    assert meta["rows"] == "2"
    with open(metf) as f:
        content = f.read()
    assert "8 # frequency bins (columns)" in content
    assert "2 # scans (rows)" in content
    assert "0.0557726 # avgScanDur (sec)" in content
    assert "0.0002 # effective integration time secs" in content


def test_bin_file_truncated_then_appended(tmp_path):
    stats = SessionStats()
    binf = str(tmp_path / "x.bin")
    mw = MatrixWriter(binf, str(tmp_path / "x.met"), stats)
    with open(binf, "wb") as f:
        f.write(b"stale-data")
    mw.truncate()
    mw.append_row(np.zeros(4, np.float32), 1, 1)
    data = np.fromfile(binf, dtype=np.float32)
    assert len(data) == 4


def test_matrix_values_are_float32():
    stats = SessionStats()
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        binf = os.path.join(d, "v.bin")
        mw = MatrixWriter(binf, os.path.join(d, "v.met"), stats)
        mw.truncate()
        mw.append_row(np.array([1.23456789012345e-7], dtype=np.float64), 1, 1)
        data = np.fromfile(binf, dtype=np.float32)
        assert data[0] == np.float32(1.23456789012345e-7)


def test_read_matrix_tolerates_partial_trailing_row(tmp_path):
    """A session killed mid append_row leaves a partial final row; the
    loader must return the completed rows (the documented recovery
    case), not crash on the reshape."""
    stats = SessionStats()
    binf, metf = str(tmp_path / "x.bin"), str(tmp_path / "x.met")
    mw = MatrixWriter(binf, metf, stats)
    mw.truncate()
    N = 4
    mw.append_row(np.arange(N) + 0.5, tuned_freq=100, finalfreq=100)
    mw.append_row(np.arange(N) + 1.5, tuned_freq=100, finalfreq=100)
    stats.firstAcqTimestamp = "2026-01-01 00:00:00 UTC"
    stats.lastAcqTimestamp = "2026-01-01 00:05:00 UTC"
    mw.write_meta(N=N, repeats_done=10, actual_samplerate=2_000_000)
    with open(binf, "ab") as f:   # simulate a kill mid-write
        f.write(b"\x00" * 6)      # 1.5 floats of a third row
    data, meta = read_matrix(binf, metf)
    assert data.shape == (2, N)
    np.testing.assert_allclose(data[1], np.arange(N) + 1.5, rtol=1e-6)
