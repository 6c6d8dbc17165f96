"""Real-time sustainability: the reference's design goal is gap-free
acquisition at the device rate (README.md:19-20), diagnosed by the queue
histogram's first bin staying zero (doc/rtl_power_fftw.1.md:140-147).

Here a paced native loader emulates an SDR delivering at a fixed byte
rate; the session must keep up without ever starving the buffer pool.
"""

import io

import numpy as np
import pytest

from rtl_power_fftw_tpu.auxdata import AuxData
from rtl_power_fftw_tpu.config import parse_args
from rtl_power_fftw_tpu.session import run_session
from rtl_power_fftw_tpu.sources import FileSource
from rtl_power_fftw_tpu.native import native_available


@pytest.mark.skipif(not native_available(), reason="native loader unavailable")
def test_realtime_rate_sustained(tmp_path):
    rate = 2_048_000  # the RTL2832U default: 4.096 MB/s of u8 IQ
    seconds = 1.0
    n_bytes = int(2 * rate * seconds)
    rng = np.random.default_rng(77)
    rec = tmp_path / "rt.iq"
    rec.write_bytes(rng.integers(0, 256, n_bytes, dtype=np.uint8).tobytes())

    src = FileSource(str(rec), sample_rate=rate, use_native=True)
    # Pace the native reader at exactly the real-time byte rate (the
    # loader starts lazily, so install the paced one before any read).
    from rtl_power_fftw_tpu.native import NativeLoader
    src._native = NativeLoader(1 << 20, 4)
    src._native_cfg = None
    src._native.start_fd(src._file.fileno(), pace_bytes_per_s=2 * rate)

    params = parse_args(
        ["-f", "100M", "-t", str(seconds * 0.9), "-b", "512", "-r", str(rate),
         "-q"], stderr=io.StringIO())
    out, err = io.StringIO(), io.StringIO()
    rv = run_session(params, src, AuxData(params, stderr=io.StringIO()),
                     stdout=out, stderr=err, install_sigint=False)
    assert int(rv) == 0
    # Parse the queue histogram: first number = occurrences of zero free
    # buffers; nonzero means the compute side could not keep up.
    hist_line = [l for l in err.getvalue().splitlines()
                 if l.startswith("Buffer queue histogram:")][0]
    hist = [int(x) for x in hist_line.split(":")[1].split()]
    assert hist[0] == 0, f"pipeline starved: {hist_line}"
    assert "Actual number of averaged spectra:" in err.getvalue()
    src.close()
