"""Frequency-domain window folding for periodic cosine-sum windows.

The reference multiplies the window into every frame before its FFT
(`/root/reference/src/datastore.cxx:76-77`). That is the only correct
general form — but for the windows people actually use (Hann/Hamming/
Blackman/…, all finite cosine sums when generated periodically, as this
package's built-in generators do) there is an exactly equivalent
frequency-domain form:

    w[n] = a0 + Σ_m a_m·cos(2πmn/N)
    ⇒  FFT(w·x)[k] = a0·X[k] + Σ_m (a_m/2)·(X[k−m] + X[k+m])   (circular)

with X the UNWINDOWED spectrum. Running the transform unwindowed and
convolving before the |·|² accumulation is a pure win on TPU:

* speed — the transform serves windowed requests at its unwindowed
  throughput (the in-kernel window multiply costs the fused Pallas
  kernel 40% at N=4096: 9.0 vs 15.1 GS/s), and the M-tap epilogue is
  a few VPU passes;
* accuracy — the hybrid four-step's tone-robustness rests on its
  stage-1 FFT seeing exactly-representable dequantized integers.  A
  time-domain window destroys that (measured 30-seed adversarial
  medians vs the FFTW-f32 class: windowed hybrid 2.8-3.1× class at
  2048/4096 vs ~1.2× unwindowed); folding keeps stage 1 on integers.

Folding is gated on an EXACT fit: `cosine_sum_coeffs` accepts a window
only if the reconstructed cosine sum matches the provided (usually
float32) vector to ~2e-6 relative — windows from files that are not
periodic cosine sums (bartlett, symmetric variants, arbitrary shapes)
fall back to the reference-faithful time-domain multiply.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

# Max cosine terms beyond a0 (flattop needs 4).
_MAX_TERMS = 4
# Relative reconstruction tolerance: a window deviation of t yields a
# ~2t relative PSD deviation; 2e-6 keeps folding well inside the 1e-5
# parity budget while accepting float32-rounded generator output
# (whose deviation is ~6e-8) and ≥7-digit text windows.
_FIT_RTOL = 2e-6


def cosine_sum_coeffs(w: np.ndarray,
                      max_terms: int = _MAX_TERMS,
                      rtol: float = _FIT_RTOL) -> Optional[Tuple[float, ...]]:
    """Fit ``w[n] = a0 + Σ_{m=1..M} a_m·cos(2πmn/N)`` (periodic).

    Returns ``(a0, a1, …, aM)`` as float64 host values when the fit is
    exact to ``rtol``·max|w|, else None. M ≤ ``max_terms``; trailing
    negligible terms are dropped (a boxcar returns ``(a0,)``).
    """
    w = np.asarray(w, dtype=np.float64)
    N = w.shape[0]
    if w.ndim != 1 or N < 2 * (max_terms + 1):
        return None
    amax = float(np.abs(w).max())
    if amax == 0.0:
        return None
    W = np.fft.rfft(w) / N
    m_avail = min(max_terms, W.shape[0] - 1)
    coeffs = [float(W[0].real)]
    coeffs += [2.0 * float(W[m].real) for m in range(1, m_avail + 1)]
    while len(coeffs) > 1 and abs(coeffs[-1]) <= rtol * amax:
        coeffs.pop()
    n = np.arange(N, dtype=np.float64)
    wfit = np.full(N, coeffs[0])
    for m, a in enumerate(coeffs[1:], start=1):
        wfit += a * np.cos(2.0 * np.pi * m * n / N)
    if float(np.abs(wfit - w).max()) > rtol * amax:
        return None
    return tuple(coeffs)


def fold_supported(coeffs: Optional[Tuple[float, ...]], N1: int) -> bool:
    """The (k1, k2) shift form needs every tap m < N1."""
    return coeffs is not None and len(coeffs) - 1 < N1


def _shift_minus(a: jax.Array, m: int) -> jax.Array:
    """a[k−m] (circular in k = k1 + N1·k2) for a (…, k1, k2) array."""
    r = jnp.roll(a, m, axis=-2)
    top = jnp.roll(r[..., :m, :], 1, axis=-1)
    return jnp.concatenate([top, r[..., m:, :]], axis=-2)


def _shift_plus(a: jax.Array, m: int) -> jax.Array:
    """a[k+m] (circular in k = k1 + N1·k2) for a (…, k1, k2) array."""
    r = jnp.roll(a, -m, axis=-2)
    bot = jnp.roll(r[..., -m:, :], -1, axis=-1)
    return jnp.concatenate([r[..., :-m, :], bot], axis=-2)


def apply_fold(a: jax.Array, coeffs: Tuple[float, ...]) -> jax.Array:
    """Circular cosine-sum convolution along bins of a (…, k1, k2) array.

    The coefficients are real, so the convolution applies to the real
    and imaginary parts independently — callers pass each separately
    (or a complex array; jnp handles both).
    """
    out = coeffs[0] * a  # python scalars stay weakly typed under jit
    for m, am in enumerate(coeffs[1:], start=1):
        out = out + (am / 2.0) * (_shift_minus(a, m) + _shift_plus(a, m))
    return out
