"""Polyphase filterbank model: parity and channel-isolation checks."""
import numpy as np
import pytest

from rtl_power_fftw_tpu.models import bartlett_psd
from rtl_power_fftw_tpu.models.pfb import (pfb_channelize, pfb_prototype,
                                           pfb_psd)

RATE = 2_048_000


def _finalize_like(pwr, frames, M):
    """Mirror finalize_psd's linear path: fftshift, DC interpolation,
    /frames/M/rate (acquisition.cxx:376-399 semantics)."""
    s = np.fft.fftshift(np.asarray(pwr, np.float64))
    s[M // 2] = (s[M // 2 - 1] + s[M // 2 + 1]) / 2.0
    return s / frames / M / RATE


def _capture(n_complex, seed=0, tone=None, amp=30.0, noise=4.0):
    rng = np.random.default_rng(seed)
    t = np.arange(n_complex)
    x = rng.standard_normal(n_complex) * noise + 1j * (
        rng.standard_normal(n_complex) * noise)
    if tone is not None:
        x = x + amp * np.exp(2j * np.pi * tone * t)
    re = np.clip(np.round(x.real + 127), 0, 255).astype(np.uint8)
    im = np.clip(np.round(x.imag + 127), 0, 255).astype(np.uint8)
    return np.stack([re, im], axis=-1).ravel()


def test_one_tap_boxcar_prototype_is_bartlett():
    """taps=1 with an all-ones prototype collapses S_t to the raw frame,
    so the PFB PSD must equal the Bartlett estimator bit-for-class."""
    M = 256
    iq = _capture(64 * M, seed=1, tone=0.1337)
    f1, p1 = pfb_psd(iq, M, RATE, taps=1, prototype=np.ones(M))
    f2, p2 = bartlett_psd(iq, M, RATE, backend="xla")
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-9)


def test_pfb_matches_float64_direct():
    """4-tap hann-sinc PFB vs a direct float64 numpy implementation."""
    M, P = 128, 4
    iq = _capture(40 * M, seed=2, tone=0.071)
    freqs, psd = pfb_psd(iq, M, RATE, taps=P, linear=True)

    h = pfb_prototype(M, P).astype(np.float64).reshape(P, M)
    z = ((iq[0::2].astype(np.float64) - 127.0)
         + 1j * (iq[1::2].astype(np.float64) - 127.0)).reshape(-1, M)
    T = z.shape[0] - P + 1
    pwr = np.zeros(M)
    for t in range(T):
        s = sum(z[t + p] * h[p] for p in range(P))
        pwr += np.abs(np.fft.fft(s)) ** 2
    want = _finalize_like(pwr, T, M)
    np.testing.assert_allclose(psd, want, rtol=1e-5)


def test_pfb_channel_isolation_beats_plain_fft():
    """An off-grid tone leaks into far channels through the FFT's sinc
    sidelobes; the PFB prototype's stopband must cut that leakage by
    orders of magnitude."""
    M = 256
    tone = (31 + 0.5) / M  # worst case: exactly between two bins
    # Low noise so the far-channel floor is sidelobe leakage, not noise
    # (with a realistic noise floor both spectra bottom out at the same
    # noise level and the comparison measures nothing).
    iq = _capture(128 * M, seed=3, tone=tone, amp=100.0, noise=0.5)
    _, fft_psd = bartlett_psd(iq, M, RATE, backend="xla", linear=True)
    _, pfb = pfb_psd(iq, M, RATE, taps=4, linear=True)
    # Outputs are fftshifted; index far channels by circular distance
    # from each spectrum's own peak so the shift cancels.
    def leak(psd):
        peak = int(np.argmax(psd))
        dist = np.minimum(np.abs(np.arange(M) - peak),
                          M - np.abs(np.arange(M) - peak))
        return np.median(psd[dist > M // 4]) / psd.max()
    assert leak(pfb) < leak(fft_psd) / 10, (leak(fft_psd), leak(pfb))


def test_channelize_shape_and_psd_consistency():
    M, P = 64, 4
    iq = _capture(20 * M, seed=4)
    y = pfb_channelize(iq, M, taps=P)
    assert y.shape == ((20 - P + 1), M)
    assert y.dtype == np.complex64
    _, psd = pfb_psd(iq, M, RATE, taps=P, linear=True)
    direct = _finalize_like((np.abs(y.astype(np.complex128)) ** 2).sum(0),
                            y.shape[0], M)
    np.testing.assert_allclose(psd, direct, rtol=2e-5)


def test_pfb_errors():
    iq = _capture(4 * 64)
    with pytest.raises(ValueError, match="not enough samples"):
        pfb_psd(iq, 64, RATE, taps=8)
    with pytest.raises(ValueError, match="prototype"):
        pfb_psd(iq, 64, RATE, taps=2, prototype=np.ones(64))
    with pytest.raises(ValueError, match="taps"):
        pfb_psd(iq, 64, RATE, taps=0)
