"""DFT-as-matmul backends for the MXU.

TPUs have no FFT hardware: the systolic array (MXU) does matmuls, the VPU
does elementwise work.  For batched power spectra there are three viable
designs, all provided here or in :mod:`spectral`:

1. ``xla``     — ``jnp.fft.fft``: XLA's decomposition. Baseline.
2. ``matmul``  — direct DFT as four real (F,N)x(N,N) matmuls. O(N²) FLOPs
                 per frame but runs entirely on the MXU; wins for small N
                 where FFT overhead dominates.
3. ``fourstep``— Bailey/Cooley-Tukey split N = N1·N2: two skinny matmul
                 passes + a twiddle multiply. O(N·(N1+N2)) FLOPs on the MXU;
                 the scalable path for large N (including the 1M-point mode).

The reference's equivalent is FFTW's plan (datastore.cxx:30-33); these are
not translations of it but MXU-native formulations.

All matmuls run with ``precision=HIGHEST`` (f32 via bf16x6 passes) — the
averaged-spectrum parity budget is 1e-5 relative, which bf16-matmul would
blow immediately.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=32)
def _dft_matrices(N: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag parts of the DFT matrix W[n,k] = exp(-2πi·n·k/N).

    Built in float64 and rounded once to float32 (cached), so every call
    sees identical constants.
    """
    n = np.arange(N, dtype=np.float64)[:, None]
    k = np.arange(N, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * ((n * k) % N) / N
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def dft_power_matmul(re: jax.Array, im: jax.Array) -> jax.Array:
    """|DFT(re + i·im)|² via four real MXU matmuls.

    re, im: (..., N) float32.  Returns (..., N) float32 power.
    """
    N = re.shape[-1]
    wr, wi = _dft_matrices(N)
    wr = jnp.asarray(wr)
    wi = jnp.asarray(wi)
    xre = jnp.matmul(re, wr, precision=_HI) - jnp.matmul(im, wi, precision=_HI)
    xim = jnp.matmul(re, wi, precision=_HI) + jnp.matmul(im, wr, precision=_HI)
    return xre * xre + xim * xim


def best_fourstep_split(N: int) -> Tuple[int, int]:
    """Pick N = N1·N2 with N1, N2 as close as possible (minimises FLOPs
    ∝ N1+N2) and both preferably multiples of MXU-friendly sizes."""
    best = (1, N)
    for n1 in range(int(math.isqrt(N)), 0, -1):
        if N % n1 == 0:
            best = (n1, N // n1)
            break
    return best


@functools.lru_cache(maxsize=32)
def _fourstep_constants(N: int, N1: int, N2: int):
    """DFT matrices for the two stages plus the twiddle factors.

    Twiddle T[k1, n2] = exp(-2πi·k1·n2/N).
    """
    c1, s1 = _dft_matrices(N1)
    c2, s2 = _dft_matrices(N2)
    k1 = np.arange(N1, dtype=np.float64)[:, None]
    n2 = np.arange(N2, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * ((k1 * n2) % N) / N
    return (c1, s1, c2, s2,
            np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def dft_power_fourstep(re: jax.Array, im: jax.Array,
                       N1: int | None = None, N2: int | None = None) -> jax.Array:
    """|DFT(re + i·im)|² via the four-step (Bailey) algorithm on the MXU.

    Index map: n = N2·n1 + n2, k = k1 + N1·k2.
      Y[k1,n2]  = Σ_{n1} x[n1,n2]·W_{N1}^{n1·k1}          (stage-1 matmul)
      Z[k1,n2]  = Y[k1,n2]·W_N^{k1·n2}                      (twiddle, VPU)
      X[k1,k2]  = Σ_{n2} Z[k1,n2]·W_{N2}^{n2·k2}           (stage-2 matmul)
    and the output is laid out so bin k = k1 + N1·k2.

    re, im: (F, N) float32. Returns (F, N) float32 power.
    """
    F, N = re.shape
    if N1 is None or N2 is None:
        N1, N2 = best_fourstep_split(N)
    assert N1 * N2 == N, (N1, N2, N)
    c1, s1, c2, s2, tc, ts = (jnp.asarray(a) for a in _fourstep_constants(N, N1, N2))

    xr = re.reshape(F, N1, N2)
    xi = im.reshape(F, N1, N2)

    # Stage 1: contract over n1 (axis 1). Y[f,k1,n2] = Σ_n1 x[f,n1,n2]·W1[n1,k1].
    def stage1(ar, ai):
        yr = (jnp.einsum("fnm,nk->fkm", ar, c1, precision=_HI)
              - jnp.einsum("fnm,nk->fkm", ai, s1, precision=_HI))
        yi = (jnp.einsum("fnm,nk->fkm", ar, s1, precision=_HI)
              + jnp.einsum("fnm,nk->fkm", ai, c1, precision=_HI))
        return yr, yi

    yr, yi = stage1(xr, xi)

    # Twiddle (elementwise on the VPU).
    zr = yr * tc - yi * ts
    zi = yr * ts + yi * tc

    # Stage 2: contract over n2 (axis 2). X[f,k1,k2] = Σ_n2 Z[f,k1,n2]·W2[n2,k2].
    xre = (jnp.einsum("fkm,ml->fkl", zr, c2, precision=_HI)
           - jnp.einsum("fkm,ml->fkl", zi, s2, precision=_HI))
    xim = (jnp.einsum("fkm,ml->fkl", zr, s2, precision=_HI)
           + jnp.einsum("fkm,ml->fkl", zi, c2, precision=_HI))

    pwr = xre * xre + xim * xim  # (F, N1, N2), bin k = k1 + N1·k2
    return jnp.transpose(pwr, (0, 2, 1)).reshape(F, N)
