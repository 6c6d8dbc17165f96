"""Multitaper (Thomson) PSD estimate.

The lowest-variance estimator family for a fixed data length: each frame
is windowed by K orthogonal DPSS (Slepian) tapers and the K eigenspectra
are averaged. On TPU the taper axis is just another batch dimension —
frames × tapers fold into one big batched transform, so the K× extra
FLOPs ride the same fused pipeline that does plain Bartlett averaging.

DPSS tapers come from scipy when available (gated import; everything
else in this module is jax/numpy only).
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


def dpss_tapers(N: int, NW: float, K: int) -> np.ndarray:
    """(K, N) float32 unit-energy DPSS tapers (needs scipy)."""
    try:
        from scipy.signal.windows import dpss
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "multitaper_psd requires scipy for DPSS tapers") from e
    t = dpss(N, NW, Kmax=K)
    return np.asarray(t, dtype=np.float32)


@functools.lru_cache(maxsize=8)
def _mt_step(N: int, F: int, K: int, backend: str):
    power_fn = _power_backend(backend, N)

    @jax.jit
    def step(raw, n_valid, tapers):
        # raw: (F, 2N) u8; tapers: (K, N) f32.
        re, im = dequant_iq(raw, F, N)
        # Taper axis → batch axis: (F, K, N) → (F·K, N).
        re_t = (re[:, None, :] * tapers[None]).reshape(F * K, N)
        im_t = (im[:, None, :] * tapers[None]).reshape(F * K, N)
        p = power_fn(re_t, im_t).reshape(F, K, N)
        mask = (jax.lax.broadcasted_iota(jnp.int32, (F, 1, 1), 0)
                < n_valid).astype(jnp.float32)
        p = (p * mask).mean(axis=1)  # average eigenspectra per frame
        _, chunk = adapt_batch(F)
        g = F // chunk
        return p.reshape(g, chunk, N).sum(1).sum(0)

    return step


def multitaper_psd(iq_u8: np.ndarray, N: int, sample_rate: int,
                   center_freq: int = 0,
                   NW: float = 4.0, K: Optional[int] = None,
                   repeats: Optional[int] = None,
                   linear: bool = False,
                   backend: str = "auto",
                   frames_per_step: int = 256
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Thomson multitaper PSD over a raw u8 IQ array.

    NW: time-bandwidth product; K: number of tapers (default 2·NW−1).
    Normalization matches the framework's other estimators
    (power/N/rate, fftshifted, dB unless ``linear``); taper energy is
    unit so the eigenspectrum average is directly comparable to a
    boxcar Bartlett PSD of the same data.
    """
    K = int(2 * NW - 1) if K is None else int(K)
    tapers = dpss_tapers(N, NW, K)
    # The reference convention: file windows are applied as-is; DPSS
    # tapers from scipy are unit-energy (Σw² = 1). Rescale so a flat
    # spectrum matches the boxcar normalization (Σw² = N).
    tapers = tapers * np.sqrt(np.float32(N))

    slicer = FrameSlicer(N)
    frames = slicer.push(iq_u8, max_frames=repeats)
    M = len(frames)
    if M == 0:
        raise ValueError("not enough samples for a single FFT frame")
    F, _ = adapt_batch(min(frames_per_step, M))
    step = _mt_step(N, F, K, backend)
    tp = jnp.asarray(tapers)

    acc = np.zeros(N, dtype=np.float64)
    for start in range(0, M, F):
        batch = frames[start:start + F]
        nv = len(batch)
        acc += np.asarray(step(pad_frames(batch, F), np.int32(nv), tp),
                          dtype=np.float64)

    psd = np.fft.fftshift(acc) / M / N / sample_rate
    if not linear:
        with np.errstate(divide="ignore"):
            psd = 10.0 * np.log10(psd)
    return bin_frequencies(center_freq, N, sample_rate), psd
