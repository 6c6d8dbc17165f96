"""Fused Pallas PSD kernel tests (interpret mode on the CPU harness;
the compiled path is exercised on real TPU by bench.py)."""

import numpy as np
import pytest

from rtl_power_fftw_tpu.ops import PsdStep
from rtl_power_fftw_tpu.ops.kernels import fused_psd_available, make_fused_psd_fn
from rtl_power_fftw_tpu.auxdata import make_window

from golden import golden_accumulate


def unshift(x):
    return np.fft.ifftshift(np.asarray(x))


@pytest.mark.parametrize("N", [256, 512, 2048])
def test_fused_matches_golden(N):
    F = 64
    rng = np.random.default_rng(N)
    raw = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    step = PsdStep(N, F, backend="pallas")
    got = np.asarray(step(raw, F), dtype=np.float64)
    want, _ = golden_accumulate(raw.ravel(), N, F)
    np.testing.assert_allclose(got, unshift(want), rtol=1e-5)


def test_fused_masking():
    N, F = 256, 128
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    step = PsdStep(N, F, backend="pallas")
    got = np.asarray(step(raw, 70), dtype=np.float64)
    want, _ = golden_accumulate(raw[:70].ravel(), N, 70)
    np.testing.assert_allclose(got, unshift(want), rtol=1e-5)


def test_fused_windowed():
    N, F = 512, 64
    w = make_window("blackman", N)
    rng = np.random.default_rng(8)
    raw = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    step = PsdStep(N, F, window=w, backend="pallas")
    got = np.asarray(step(raw, F), dtype=np.float64)
    want, _ = golden_accumulate(raw.ravel(), N, F, window=w)
    np.testing.assert_allclose(got, unshift(want), rtol=1e-5)


def test_fused_gating():
    assert fused_psd_available(2048)
    assert fused_psd_available(1 << 20)
    assert not fused_psd_available(500)   # non-power-of-2
    assert not fused_psd_available(128)   # too small
    with pytest.raises(ValueError):
        PsdStep(500, 64, backend="pallas")


def test_fused_explicit_split():
    N, F = 1024, 64
    rng = np.random.default_rng(9)
    raw = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    raw16 = raw.reshape(F, N, 2).view(np.uint16).reshape(F, N)
    want, _ = golden_accumulate(raw.ravel(), N, F)
    for n1 in (16, 32, 64):
        fn = make_fused_psd_fn(N, F, windowed=False, tile_f=64, n1=n1)
        got = np.asarray(fn(raw16, np.int32(F)), dtype=np.float64)
        np.testing.assert_allclose(got, unshift(want), rtol=1e-5,
                                   err_msg=f"n1={n1}")


def test_fused_compiled_on_tpu():
    """Compiled (non-interpret) kernel parity — runs only in
    RPF_TEST_PLATFORM=tpu mode on real hardware; skipped on the CPU
    harness where interpret mode covers the math."""
    import jax
    if jax.default_backend() != "tpu":
        pytest.skip("needs real TPU (RPF_TEST_PLATFORM=tpu)")
    N, F = 2048, 128
    rng = np.random.default_rng(77)
    raw = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    raw16 = raw.reshape(F, N, 2).view(np.uint16).reshape(F, N)
    fn = make_fused_psd_fn(N, F, windowed=False, tile_f=64, interpret=False)
    got = np.asarray(fn(jax.device_put(raw16), np.int32(F)), dtype=np.float64)
    want, _ = golden_accumulate(raw.ravel(), N, F)
    np.testing.assert_allclose(got, unshift(want), rtol=1e-5)
