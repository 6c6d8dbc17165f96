"""Golden byte-level fixture for the matrix-mode .met sidecar.

The reference writes nine lines at clean exit (rtl_power_fftw.cxx:207-220)
with C++ iostream formatting; scan durations come from time_t/difftime
(whole seconds, acquisition.cxx:260,336-339) accumulated in C floats
(metadata.h:31). This test freezes the clock and byte-compares a full
2-hop matrix session against a checked-in fixture."""

import io
import os
import time

import numpy as np
import pytest

from rtl_power_fftw_tpu.auxdata import AuxData
from rtl_power_fftw_tpu.config import parse_args
from rtl_power_fftw_tpu.exceptions import ReturnValue
from rtl_power_fftw_tpu.session import run_session
from rtl_power_fftw_tpu.sources import SyntheticSource

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_session.met")


def test_met_sidecar_matches_golden_fixture(tmp_path, monkeypatch):
    # Frozen clock: each time() call advances 1 s (scan durations become
    # exactly 1 s per hop — difftime semantics are integral anyway);
    # gmtime() is pinned so the UTC timestamps are reproducible.
    epoch = 1_767_323_045  # 2026-01-02 03:04:05 UTC
    calls = {"n": 0}

    def fake_time():
        calls["n"] += 1
        return float(epoch + calls["n"])

    fixed_struct = time.gmtime(epoch)
    monkeypatch.setattr(time, "time", fake_time)
    monkeypatch.setattr(time, "gmtime", lambda *a: fixed_struct)

    base = str(tmp_path / "gold")
    params = parse_args(
        ["-f", "100M:104M", "-n", "10", "-b", "64", "-r", "2048000",
         "-m", base, "--source", "synthetic:"], stderr=io.StringIO())
    src = SyntheticSource(tones=[(101_000_000, 30.0)], noise=5.0, seed=11)
    aux = AuxData(params, stderr=io.StringIO())
    rv = run_session(params, src, aux, stdout=io.StringIO(),
                     stderr=io.StringIO(), install_sigint=False)
    assert rv == ReturnValue.Success

    with open(base + ".met", "rb") as f:
        got = f.read()
    with open(FIXTURE, "rb") as f:
        want = f.read()
    assert got == want, (f"\n--- got ---\n{got.decode()}"
                         f"\n--- want ---\n{want.decode()}")

    # The .bin holds exactly rows*cols float32 (2 hops x 64 bins).
    bin_data = np.fromfile(base + ".bin", dtype=np.float32)
    assert bin_data.shape == (128,)
    assert np.isfinite(bin_data).all()
