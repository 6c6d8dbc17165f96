"""Sequence-sharded large-N PSD (parallel/bigfft.py) on the 8-device
CPU mesh: one transform spread over the mesh via the distributed
four-step algorithm (local FFT -> twiddle -> all_to_all transpose ->
local FFT), validated against a float64 numpy golden."""

import numpy as np
import pytest

from rtl_power_fftw_tpu.parallel.bigfft import ShardedLargeFFTPsd, _split
from rtl_power_fftw_tpu.parallel.mesh import make_mesh


def make_frames(F, N, seed=0, tone=True):
    rng = np.random.default_rng(seed)
    if tone:
        t = np.arange(F * N)
        x = 70.0 * np.exp(2j * np.pi * 0.1237 * t) + \
            3.0 * (rng.standard_normal(F * N) + 1j * rng.standard_normal(F * N))
        re = np.clip(np.round(x.real + 127), 0, 255).astype(np.uint8)
        im = np.clip(np.round(x.imag + 127), 0, 255).astype(np.uint8)
        return np.stack([re, im], axis=-1).reshape(F, 2 * N)
    return rng.integers(0, 256, size=(F, 2 * N), dtype=np.uint8)


def golden(frames_u8, N, window=None):
    x = (frames_u8[:, 0::2].astype(np.float64) - 127.0) \
        + 1j * (frames_u8[:, 1::2].astype(np.float64) - 127.0)
    if window is not None:
        x = x * np.asarray(window, np.float64)
    return (np.abs(np.fft.fft(x, axis=1)) ** 2).sum(0)


def rel_err(got, want):
    return (np.abs(got - want) / np.maximum(np.abs(want), 1e-30)).max()


def test_parity_16k():
    # Random input (the tone-robust error floor is a fused-kernel
    # property; the complex64 large-N paths are validated on random
    # input like test_large_fft.py's 1M check, rtol 2e-4 there).
    N, F = 1 << 14, 8
    frames = make_frames(F, N, tone=False)
    step = ShardedLargeFFTPsd(make_mesh(8), N, F)
    got, used = step(frames)
    assert used == F
    assert rel_err(got, golden(frames, N)) < 2e-5


def test_parity_random_input():
    N, F = 1 << 12, 4
    frames = make_frames(F, N, seed=3, tone=False)
    step = ShardedLargeFFTPsd(make_mesh(8), N, F)
    got, _ = step(frames)
    assert rel_err(got, golden(frames, N)) < 1e-5


def test_partial_frames_masked():
    N, F = 1 << 12, 8
    frames = make_frames(5, N, seed=1, tone=False)   # only 5 of 8 frames
    step = ShardedLargeFFTPsd(make_mesh(8), N, F)
    got, used = step(frames)
    assert used == 5
    assert rel_err(got, golden(frames, N)) < 1e-5


def test_windowed_parity():
    N, F = 1 << 12, 4
    frames = make_frames(F, N, seed=2, tone=False)
    window = np.hanning(N).astype(np.float32)
    step = ShardedLargeFFTPsd(make_mesh(8), N, F, window=window)
    got, _ = step(frames)
    assert rel_err(got, golden(frames, N, window)) < 2e-5


def test_bin_convention_matches_single_device():
    """Unshifted k = k1 + N1·k2 flattening must equal np.fft bin order."""
    N, F = 1 << 12, 1
    frames = make_frames(F, N, seed=4)
    step = ShardedLargeFFTPsd(make_mesh(8), N, F)
    got, _ = step(frames)
    want = golden(frames, N)
    # The tone peak must land on the same bin index.
    assert int(np.argmax(got)) == int(np.argmax(want))


def test_mesh_must_divide():
    with pytest.raises(ValueError):
        ShardedLargeFFTPsd(make_mesh(8), 16, 2)   # N1=4 < mesh size


def test_1m_point_smoke():
    """The actual BASELINE config-3 shape, two frames."""
    N, F = 1 << 20, 2
    frames = make_frames(F, N, seed=5, tone=False)
    step = ShardedLargeFFTPsd(make_mesh(8), N, F)
    got, _ = step(frames)
    assert rel_err(got, golden(frames, N)) < 2e-5
    assert _split(N) == (1024, 1024)


def test_split_twiddle_beats_single_angle_past_2_24():
    """Pin the N > 2^24 split-twiddle formulation (bigfft.py local_step).

    Past 2^24 the f32 cast of kn = k1*n2 rounds; the shipped code splits
    kn = q*2^12 + r (both f32-exact) and multiplies the partial
    twiddles. Reproduce both formulations bit-for-bit in numpy against
    the f64 truth: the split must (a) strictly reduce the max error and
    (b) sit at the f32 trig evaluation floor (~4.5e-7), at every
    future-plan size 2^26..2^30.
    """
    rng = np.random.default_rng(7)
    for lg in (26, 28, 30):
        N = 1 << lg
        kn = rng.integers(1 << 24, N, size=50000, dtype=np.int64)
        w64 = -2.0 * np.pi / N
        ref = np.exp(1j * w64 * kn)
        ang1 = np.float32(w64) * kn.astype(np.float32)
        single = np.cos(ang1) + 1j * np.sin(ang1)
        q = (kn >> 12).astype(np.float32)
        r = (kn & 0xFFF).astype(np.float32)
        aq = np.float32(w64 * 4096.0) * q
        ar = np.float32(w64) * r
        split = (np.cos(aq) + 1j * np.sin(aq)) * (np.cos(ar) + 1j * np.sin(ar))
        e_single = np.abs(single - ref).max()
        e_split = np.abs(split - ref).max()
        assert e_split < e_single, (lg, e_split, e_single)
        assert e_split < 6e-7, (lg, e_split)


def test_call_global_subset_mesh():
    """prepare_global/call_global on a mesh that is a SUBSET of the
    visible devices (regression: iterating jax.local_devices() instead
    of the mesh's members crashed with 'device is not in list')."""
    N, F = 256, 4
    big = ShardedLargeFFTPsd(make_mesh(4), N, F)  # 8 devices visible
    frames = make_frames(F, N, seed=11)
    got, used = big.call_global(frames)
    assert used == F
    np.testing.assert_allclose(got, golden(frames, N), rtol=1e-4)
