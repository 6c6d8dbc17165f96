"""Calibration helper tests: reference-tone offset recovery and robust
noise-floor estimation over real pipeline output."""

import numpy as np

from rtl_power_fftw_tpu.models import bartlett_psd, spectral_kurtosis
from rtl_power_fftw_tpu.sources import SyntheticSource
from rtl_power_fftw_tpu.utils.calibration import (
    apply_calibration, calibration_offset, noise_floor_db, tone_power_db)


def make_capture(tone_amp, seed=50, N=512, M=200, rate=2_048_000,
                 tone_off=100_000):
    src = SyntheticSource(tones=[(100_000_000 + tone_off, tone_amp)],
                          noise=4.0, seed=seed)
    src.set_sample_rate(rate)
    src.set_frequency(100_000_000)
    iq, _ = src.read(2 * N * M)
    return bartlett_psd(iq, N, rate, center_freq=100_000_000)


def test_calibration_roundtrip():
    """A tone of known absolute power defines the offset; a second tone
    measured through the same chain then reads correctly in dBm."""
    freqs, psd = make_capture(tone_amp=40.0)
    offset = calibration_offset(freqs, psd, 100_100_000, ref_power_dbm=-30.0)
    cal = apply_calibration(psd, offset)
    assert abs(tone_power_db(freqs, cal, 100_100_000) - (-30.0)) < 1e-9

    # A tone at half the amplitude (−6.02 dB) must read ≈ −36 dBm through
    # the same calibration.
    freqs2, psd2 = make_capture(tone_amp=20.0, seed=51)
    cal2 = apply_calibration(psd2, offset)
    got = tone_power_db(freqs2, cal2, 100_100_000)
    assert abs(got - (-36.02)) < 0.3


def test_noise_floor_with_rfi_mask():
    rate, N, M = 2_048_000, 256, 256
    src = SyntheticSource(tones=[(1_200_000, 45.0)], noise=6.0, seed=52)
    src.set_sample_rate(rate)
    src.set_frequency(1_000_000)
    iq, _ = src.read(2 * N * M)
    freqs, sk, psd_lin = spectral_kurtosis(iq, N, rate, center_freq=1_000_000)
    psd_db = 10 * np.log10(psd_lin)
    mask = np.abs(sk - 1.0) > 0.5  # SK-flagged bins (the tone)
    floor_masked, sigma = noise_floor_db(psd_db, mask)
    floor_unmasked, _ = noise_floor_db(psd_db)
    # The tone is a tiny fraction of bins: medians are close, but sigma is
    # sane and the floor is near the median noise level.
    assert sigma < 1.0
    assert abs(floor_masked - floor_unmasked) < 0.5
    assert psd_db.max() > floor_masked + 10  # tone well above the floor
