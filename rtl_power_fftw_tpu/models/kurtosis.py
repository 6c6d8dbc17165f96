"""Spectral kurtosis: per-bin RFI detection alongside the averaged PSD.

An extension in the reference's home domain (radio astronomy — the
default center frequency is the hydrogen line, params.h:36): the
generalized spectral-kurtosis estimator of Nita & Gary (2010),

    SK = (M+1)/(M−1) · (M·S2/S1² − 1),   S1 = Σ|X|², S2 = Σ|X|⁴

over M accumulated spectra. For Gaussian noise E[SK] = 1; tones and
time-variable interference push SK away from 1, so thresholding SK flags
contaminated bins without touching the averaged spectrum.

TPU-native: the device step accumulates BOTH moments in one fused pass —
the |X|⁴ accumulation rides the same transform outputs, so the marginal
cost over a plain PSD is one elementwise square and one reduction.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spectral import (FrameSlicer, _power_backend,
                            adapt_batch, bin_frequencies, dequant_iq,
                            pad_frames)


@functools.lru_cache(maxsize=8)
def _sk_step(N: int, F: int, windowed: bool, backend: str):
    power_fn = _power_backend(backend, N)

    @jax.jit
    def step(raw, n_valid, *w):
        re, im = dequant_iq(raw, F, N, w[0] if w else None)
        p = power_fn(re, im)  # (F, N)
        mask = (jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)
                < n_valid).astype(jnp.float32)
        p = p * mask
        _, chunk = adapt_batch(F)
        g = F // chunk
        s1 = p.reshape(g, chunk, N).sum(1).sum(0)
        s2 = (p * p).reshape(g, chunk, N).sum(1).sum(0)
        return s1, s2

    return step


def spectral_kurtosis(iq_u8: np.ndarray, N: int, sample_rate: int,
                      center_freq: int = 0,
                      repeats: Optional[int] = None,
                      window: Optional[np.ndarray] = None,
                      backend: str = "auto",
                      frames_per_step: int = 1024
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compute (freqs, SK, psd_linear) over a raw u8 IQ array.

    SK ≈ 1 for well-behaved Gaussian bins; SK ≫ 1 flags impulsive RFI,
    SK ≪ 1 flags coherent tones. ``psd_linear`` is the ordinary averaged
    PSD in linear units (same normalization as ``bartlett_psd(...,
    linear=True)`` but without DC interpolation, so flagging sees the
    true DC bin).
    """
    slicer = FrameSlicer(N)
    frames = slicer.push(iq_u8, max_frames=repeats)
    M = len(frames)
    if M < 2:
        raise ValueError("spectral kurtosis needs at least 2 spectra")
    F, _ = adapt_batch(min(frames_per_step, M))
    step = _sk_step(N, F, window is not None, backend)
    w = (jnp.asarray(np.asarray(window, np.float32)),) if window is not None else ()

    s1 = np.zeros(N, dtype=np.float64)
    s2 = np.zeros(N, dtype=np.float64)
    for start in range(0, M, F):
        batch = frames[start:start + F]
        nv = len(batch)
        a, b = step(pad_frames(batch, F), np.int32(nv), *w)
        s1 += np.asarray(a, dtype=np.float64)
        s2 += np.asarray(b, dtype=np.float64)

    sk = (M + 1.0) / (M - 1.0) * (M * s2 / np.maximum(s1 * s1, 1e-300) - 1.0)
    psd = s1 / M / N / sample_rate
    shift = np.fft.fftshift
    return bin_frequencies(center_freq, N, sample_rate), shift(sk), shift(psd)
