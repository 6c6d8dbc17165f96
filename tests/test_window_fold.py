"""Frequency-domain window folding (ops/window_fold.py).

The reference applies windows as a per-frame time-domain multiply
(datastore.cxx:76-77). For periodic cosine-sum windows the folded form
is mathematically identical (an exact M-tap circular convolution on the
unwindowed spectrum); these tests pin the detection gate, the (k1, k2)
shift arithmetic, end-to-end parity of folded vs direct paths, and the
class-relative adversarial-tone guarantee under a window.
"""
import numpy as np
import pytest
import scipy.signal

from rtl_power_fftw_tpu.auxdata import make_window
from rtl_power_fftw_tpu.ops.spectral import PsdStep
from rtl_power_fftw_tpu.ops.window_fold import (apply_fold,
                                                cosine_sum_coeffs,
                                                fold_supported)


class TestDetection:
    @pytest.mark.parametrize("name,terms", [
        ("hann", 1), ("hamming", 1), ("blackman", 2),
        ("blackman-harris", 3), ("flattop", 4), ("boxcar", 0),
    ])
    def test_builtin_cosine_windows_detected(self, name, terms):
        w = make_window(name, 512)
        c = cosine_sum_coeffs(w)
        assert c is not None
        assert len(c) == terms + 1
        # Reconstruction really is the window.
        n = np.arange(512)
        wfit = np.full(512, c[0])
        for m, a in enumerate(c[1:], start=1):
            wfit += a * np.cos(2 * np.pi * m * n / 512)
        np.testing.assert_allclose(wfit, w.astype(np.float64),
                                   atol=2e-6 * np.abs(w).max())

    def test_bartlett_rejected(self):
        assert cosine_sum_coeffs(make_window("bartlett", 512)) is None

    def test_symmetric_hann_rejected(self):
        # Symmetric (sym=True) windows are NOT periodic cosine sums; the
        # folded form would not be exact, so the gate must reject them.
        w = scipy.signal.windows.hann(512, sym=True).astype(np.float32)
        assert cosine_sum_coeffs(w) is None

    def test_arbitrary_window_rejected(self):
        rng = np.random.default_rng(0)
        assert cosine_sum_coeffs(rng.uniform(0.1, 1.0, 512)) is None

    def test_low_precision_file_window_rejected(self):
        # A 4-significant-digit text dump deviates ~1e-4 from the exact
        # cosine sum — folding would breach the parity budget.
        w = np.round(make_window("hann", 512).astype(np.float64), 4)
        assert cosine_sum_coeffs(w) is None

    def test_high_precision_file_window_accepted(self):
        # The program's own full-precision output round-trips.
        w = np.asarray([float(f"{v:.9g}") for v in
                        make_window("hamming", 512)], dtype=np.float64)
        assert cosine_sum_coeffs(w) is not None

    def test_too_short_rejected(self):
        assert cosine_sum_coeffs(make_window("hann", 8)) is None

    def test_fold_supported_tap_guard(self):
        c = cosine_sum_coeffs(make_window("flattop", 512))  # 4 taps
        assert fold_supported(c, 8)
        assert not fold_supported(c, 4)
        assert not fold_supported(None, 1024)


class TestApplyFold:
    @pytest.mark.parametrize("N1,N2", [(8, 16), (16, 128), (4, 32)])
    @pytest.mark.parametrize("name", ["hann", "blackman", "flattop"])
    def test_matches_natural_order_convolution(self, N1, N2, name):
        N = N1 * N2
        if cosine_sum_coeffs(make_window(name, N)) is None:
            pytest.skip("window too short for its term count")
        c = cosine_sum_coeffs(make_window(name, N))
        if not fold_supported(c, N1):
            pytest.skip("N1 smaller than the tap count")
        rng = np.random.default_rng(3)
        X = rng.standard_normal((5, N))
        want = c[0] * X
        for m, a in enumerate(c[1:], start=1):
            want = want + (a / 2.0) * (np.roll(X, m, axis=1)
                                       + np.roll(X, -m, axis=1))
        # (F, N) natural order → (F, k1, k2) with k = k1 + N1·k2.
        X2 = X.reshape(5, N2, N1).transpose(0, 2, 1)
        got2 = np.asarray(apply_fold(X2.astype(np.float32), c))
        got = got2.transpose(0, 2, 1).reshape(5, N)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _f64_truth(raw, w):
    z = (raw[:, 0::2].astype(np.float64) - 127.0) \
        + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
    X = np.fft.fft(z * w.astype(np.float64), axis=1)
    return (X.real ** 2 + X.imag ** 2).sum(0)


def _rel(got, want):
    return float((np.abs(np.asarray(got, np.float64) - want)
                  / np.maximum(np.abs(want), 1e-30)).max())


class TestEndToEnd:
    @pytest.mark.parametrize("name,N,F,backend", [
        ("hann", 2048, 32, "hybrid"),
        ("hamming", 1024, 32, "fourstep"),
        ("flattop", 4096, 16, "fft4"),
    ])
    def test_fold_matches_direct_within_parity(self, name, N, F, backend):
        w = make_window(name, N)
        rng = np.random.default_rng(11)
        raw = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
        want = _f64_truth(raw, w)
        errs = {}
        for foldflag in (True, False):
            step = PsdStep(N, F, window=w, backend=backend,
                           window_fold=foldflag)
            inp = raw.view(np.uint16) if step.takes_u16 else raw
            errs[foldflag] = _rel(step(inp, F), want)
        assert errs[True] <= 1e-5, errs
        assert errs[False] <= 1e-5, errs

    def test_fold_respects_frame_mask(self):
        N, F, valid = 1024, 32, 17
        w = make_window("hann", N)
        rng = np.random.default_rng(12)
        raw = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
        want = _f64_truth(raw[:valid], w)
        step = PsdStep(N, F, window=w, backend="hybrid")
        inp = raw.copy()
        inp[valid:] = 255  # garbage in the padding rows must not leak
        inp = inp.view(np.uint16) if step.takes_u16 else inp
        assert _rel(step(inp, valid), want) <= 1e-5

    def test_auto_backend_folds_windowed(self):
        # The auto ladder's windowed default must stay within the parity
        # budget with folding active (the shipping configuration).
        N, F = 2048, 32
        w = make_window("hann", N)
        rng = np.random.default_rng(13)
        raw = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
        want = _f64_truth(raw, w)
        step = PsdStep(N, F, window=w, backend="auto")
        inp = raw.view(np.uint16) if step.takes_u16 else raw
        assert _rel(step(inp, F), want) <= 1e-5


def _tone_realization(N, F, seed):
    rng = np.random.default_rng(seed)
    f0 = rng.uniform(0.05, 0.45)
    ph = rng.uniform(0, 2 * np.pi)
    t = np.arange(F * N)
    x = 100.0 * np.exp(1j * (2 * np.pi * f0 * t + ph)) + (
        rng.standard_normal(F * N) + 1j * rng.standard_normal(F * N))
    re8 = np.clip(np.round(x.real + 127), 0, 255).astype(np.uint8)
    im8 = np.clip(np.round(x.imag + 127), 0, 255).astype(np.uint8)
    return np.stack([re8, im8], axis=-1).reshape(F, 2 * N)


def test_windowed_adversarial_tone_class_relative():
    """The class-relative guarantee (median <= 1.5x / max <= 3x the
    yardstick distribution, same form as the unwindowed test in
    test_numerics.py) must hold WITH a window. Folding is what makes
    this true: the time-domain multiply costs the hybrid its
    exact-integer stage-1 inputs (measured TPU medians 2.8-3.1x the
    scipy-f32 class at 2048/4096); the folded transform keeps the
    unwindowed accuracy class (~1.2x)."""
    import jax
    import jax.numpy as jnp
    import scipy.fft

    N, F = 2048, 32
    w = make_window("hann", N)
    w64 = w.astype(np.float64)
    mono = jax.jit(lambda z: jnp.fft.fft(z, axis=1))
    step = PsdStep(N, F, window=w, backend="auto")
    ours, yard = [], []
    for seed in range(15):
        raw = _tone_realization(N, F, 700 + seed)
        z = (raw[:, 0::2].astype(np.float64) - 127.0) \
            + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
        X = np.fft.fft(z * w64, axis=1)
        want = (X.real ** 2 + X.imag ** 2).sum(0)
        inp = raw.view(np.uint16) if step.takes_u16 else raw
        ours.append(_rel(step(inp, F), want))
        zw32 = (z.astype(np.complex64)
                * w.astype(np.complex64))
        Xc = scipy.fft.fft(zw32, axis=1)
        cls = _rel((Xc.real.astype(np.float64) ** 2
                    + Xc.imag.astype(np.float64) ** 2).sum(0), want)
        Xp = np.asarray(mono(zw32))
        plat = _rel((Xp.real.astype(np.float64) ** 2
                     + Xp.imag.astype(np.float64) ** 2).sum(0), want)
        yard.append(max(cls, plat))
    assert np.median(ours) <= 1.5 * np.median(yard), \
        (np.median(ours), np.median(yard))
    assert max(ours) <= 3.0 * max(yard), (max(ours), max(yard))
