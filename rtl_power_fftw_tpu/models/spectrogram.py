"""Spectrogram / waterfall: per-segment (optionally group-averaged)
spectra over time.

The matrix (.bin) output of the reference is a waterfall built one scan
row at a time (acquisition.cxx:385-409); this estimator computes the same
thing as a single batched device pass over a recording: rows = time,
columns = shifted frequency bins.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.spectral import (FrameSlicer, _power_backend, bin_frequencies,
                            dequant_iq, finalize_psd, pad_frames)


@functools.lru_cache(maxsize=8)
def _spectrogram_step(N: int, F: int, windowed: bool, backend: str):
    power_fn = _power_backend(backend, N)

    @jax.jit
    def step(raw, *w):
        re, im = dequant_iq(raw, F, N, w[0] if w else None)
        pwr = power_fn(re, im)  # (F, N) unshifted
        return jnp.fft.fftshift(pwr, axes=-1)

    return step


def spectrogram(iq_u8: np.ndarray, N: int, sample_rate: int,
                center_freq: int = 0,
                hop: Optional[int] = None,
                average: int = 1,
                window: Optional[np.ndarray] = None,
                linear: bool = False,
                backend: str = "auto",
                frames_per_step: int = 1024,
                dc_interp: bool = True
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compute a waterfall.

    Returns (times[rows] segment-start seconds, freqs[N] Hz,
    S[rows, N]) where each row is the PSD of ``average`` consecutive
    segments in the reference's output units (dB/Hz unless ``linear``).
    ``dc_interp`` replaces the center bin with its neighbor average per
    row, exactly like every matrix-mode row in the reference
    (acquisition.cxx:376-377); pass False to keep the raw DC bin.
    """
    hop = N if hop is None else int(hop)
    slicer = FrameSlicer(N, hop=hop)
    frames = slicer.push(iq_u8)
    n_frames = (len(frames) // average) * average
    if n_frames == 0:
        raise ValueError("not enough samples for a single segment")
    frames = frames[:n_frames]

    w = None if window is None else jnp.asarray(np.asarray(window, np.float32))
    F = min(frames_per_step, n_frames)
    F -= F % average or 0
    F = max(F, average)
    step = _spectrogram_step(N, F, w is not None, backend)

    rows = []
    for start in range(0, n_frames, F):
        batch = frames[start:start + F]
        nb = len(batch)
        out = np.asarray(step(pad_frames(batch, F),
                              *(() if w is None else (w,))),
                         dtype=np.float64)[:nb]
        rows.append(out)
    pwr = np.concatenate(rows)  # (n_frames, N) shifted
    pwr = pwr.reshape(n_frames // average, average, N).sum(axis=1)
    if dc_interp:
        # Same row finalization as the matrix writer (finalize_psd).
        with np.errstate(divide="ignore"):
            psd = finalize_psd(pwr, average, sample_rate, linear=linear,
                               already_shifted=True)
    else:
        psd = pwr / average / N / sample_rate
        if not linear:
            with np.errstate(divide="ignore"):
                psd = 10.0 * np.log10(psd)
    times = (np.arange(n_frames // average) * average * hop) / sample_rate
    return times, bin_frequencies(center_freq, N, sample_rate), psd
