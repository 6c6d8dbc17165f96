"""Bartlett PSD estimate: average of non-overlapping windowed periodograms.

This is exactly the reference's estimator (datastore.cxx:66-88 averages
``repeats`` back-to-back N-point periodograms), packaged as a one-shot
library API over recorded IQ arrays: the equivalent of running the
reference over a recording and parsing its stdout.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

from ..ops.spectral import (FrameSlicer, PsdStep, bin_frequencies,
                            finalize_psd, pad_frames)


@functools.lru_cache(maxsize=8)
def _cached_step(N: int, F: int, window_bytes: Optional[bytes],
                 backend: str) -> PsdStep:
    window = (None if window_bytes is None
              else np.frombuffer(window_bytes, dtype=np.float32))
    return PsdStep(N, F, window=window, backend=backend)


def _accumulate(stream: np.ndarray, N: int, repeats: Optional[int],
                window: Optional[np.ndarray], backend: str,
                hop: Optional[int] = None,
                frames_per_step: int = 1024) -> Tuple[np.ndarray, int]:
    slicer = FrameSlicer(N, hop=hop)
    frames = slicer.push(stream, max_frames=repeats)
    wb = None if window is None else np.asarray(window, np.float32).tobytes()
    step = _cached_step(N, min(frames_per_step, max(len(frames), 1)),
                        wb, backend)
    pwr = np.zeros(N, dtype=np.float64)
    pending = []
    for start in range(0, len(frames), step.F):
        batch = frames[start:start + step.F]
        n_valid = len(batch)
        pending.append(step(np.ascontiguousarray(pad_frames(batch, step.F)),
                            n_valid))
        if len(pending) > 4:
            pwr += np.asarray(pending.pop(0), dtype=np.float64)
    for p in pending:
        pwr += np.asarray(p, dtype=np.float64)
    return pwr, len(frames)


def bartlett_psd(iq_u8: np.ndarray, N: int, sample_rate: int,
                 center_freq: int = 0,
                 repeats: Optional[int] = None,
                 window: Optional[np.ndarray] = None,
                 linear: bool = False,
                 baseline: Optional[np.ndarray] = None,
                 backend: str = "auto") -> Tuple[np.ndarray, np.ndarray]:
    """Averaged PSD of a raw interleaved-u8 IQ array.

    Returns (freqs[N] in Hz, psd[N]) with the reference's output semantics
    (DC-bin interpolation, /repeats/N/rate normalization, dB unless
    ``linear``, baseline in output units).
    """
    pwr, done = _accumulate(iq_u8, N, repeats, window, backend)
    if done == 0:
        raise ValueError("not enough samples for a single FFT frame")
    with np.errstate(divide="ignore"):
        psd = finalize_psd(pwr, done, sample_rate, linear=linear,
                           baseline=baseline)
    return bin_frequencies(center_freq, N, sample_rate), psd
