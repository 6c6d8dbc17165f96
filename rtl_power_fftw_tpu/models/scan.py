"""Batched wideband scan over recorded per-hop IQ captures.

BASELINE.json config 4: "256 retune hops × 2048 bins stitched into one
wideband spectrum (batched FFTs)".  The live session retunes sequentially
(like the reference's hop loop, rtl_power_fftw.cxx:132-174) because a
tuner is a serial device, but recorded hop captures have no such
constraint: this estimator folds the hop axis into the frame batch and
computes every hop's averaged spectrum in ONE device pass.

Stitching follows the reference's contract (doc/rtl_power_fftw.1.md:118):
overlapping spectra are emitted as-is, in hop order — no resampling or
blending — so downstream treatment stays the user's choice. A
``stitch="concat"`` mode returns one concatenated (freqs, psd) pair
exactly like parsing the reference's multi-spectrum output, and
``stitch="merge"`` grid-aligns the hops and averages the overlap
regions in linear power (utils/stitch.py — the combining step the
reference leaves to gnuplot users).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..ops.spectral import (PsdStep, bin_frequencies, finalize_psd,
                            pad_frames)
from ..planning import Plan


def scan_psd(hop_captures: np.ndarray,
             hop_freqs: Sequence[int],
             N: int, sample_rate: int,
             window: Optional[np.ndarray] = None,
             linear: bool = False,
             baseline: Optional[np.ndarray] = None,
             backend: str = "auto",
             stitch: str = "per-hop"):
    """Averaged PSD per hop, all hops batched through the device together.

    hop_captures: (H, samples·2) u8 — one recorded capture per hop (equal
    lengths; the frame count per hop is samples // N).
    hop_freqs: (H,) tuned center frequencies.

    Returns ``stitch="per-hop"``: list of (freqs (N,), psd (N,)) per hop;
    ``stitch="concat"``: single (freqs (H·N,), psd (H·N,)) in hop order.
    """
    caps = np.asarray(hop_captures, dtype=np.uint8)
    if caps.ndim != 2:
        raise ValueError("hop_captures must be (H, bytes)")
    H = caps.shape[0]
    if H != len(hop_freqs):
        raise ValueError("hop_freqs length must match hop_captures")
    frames_per_hop = caps.shape[1] // (2 * N)
    if frames_per_hop == 0:
        raise ValueError("captures shorter than one FFT frame")

    frames = caps[:, :frames_per_hop * 2 * N].reshape(H * frames_per_hop, 2 * N)
    # One jitted step compiled for the per-hop frame count; all H hops are
    # dispatched back-to-back (JAX async dispatch overlaps them on device),
    # so the whole scan is one pipelined device workload.
    results: List[np.ndarray] = []
    hop_step = PsdStep(N, frames_per_hop, window=window, backend=backend)
    pending = []
    for h in range(H):
        batch = frames[h * frames_per_hop:(h + 1) * frames_per_hop]
        pending.append(hop_step(pad_frames(batch, hop_step.F), frames_per_hop))
    with np.errstate(divide="ignore"):
        for h, dev_pwr in enumerate(pending):
            pwr = np.asarray(dev_pwr, dtype=np.float64)
            results.append(finalize_psd(pwr, frames_per_hop, sample_rate,
                                        linear=linear, baseline=baseline))

    out = [(bin_frequencies(int(hop_freqs[h]), N, sample_rate), results[h])
           for h in range(H)]
    if stitch == "per-hop":
        return out
    if stitch == "concat":
        freqs = np.concatenate([f for f, _ in out])
        psd = np.concatenate([p for _, p in out])
        return freqs, psd
    if stitch == "merge":
        from ..utils.stitch import merge_spectra
        return merge_spectra(out, db=not linear)
    raise ValueError(f"unknown stitch mode: {stitch}")


def plan_hop_freqs(startfreq: int, stopfreq: int, sample_rate: int,
                   min_overlap: float = 0.0) -> List[int]:
    """The session's exact hop-center arithmetic (planning.Plan) exposed
    for recorded-scan workflows."""
    from ..config import Params
    p = Params()
    p.freq_hopping_isSet = True
    p.startfreq = int(startfreq)
    p.stopfreq = int(stopfreq)
    p.min_overlap = float(min_overlap)
    p.buf_length_isSet = True  # don't touch buffer sizing
    return Plan(p, sample_rate).freqs_to_tune
