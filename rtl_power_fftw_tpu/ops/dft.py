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
averaged-spectrum parity budget is 1e-5 relative. Measured on a v5e at
N=2048: HIGHEST 2.8e-7 max rel err, HIGH (bf16x3) 2.4e-5 (+19% faster but
over budget), DEFAULT (bf16) 3.8e-3. HIGH is a deliberate headroom knob
for deployments that can accept 1e-4.
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


@functools.lru_cache(maxsize=32)
def _fourstep2_constants(N: int, N1: int, N2: int):
    """Constants for the transpose-free four-step: the twiddle is stored
    pre-transposed as T[n2, k1] so it multiplies the stage-1 output layout
    (F, n2, k1) directly — no intermediate transposes touch HBM. The
    (cos+sin) sums feed the Karatsuba 3-multiplication complex matmul."""
    c1, s1 = _dft_matrices(N1)
    c2, s2 = _dft_matrices(N2)
    n2 = np.arange(N2, dtype=np.float64)[:, None]
    k1 = np.arange(N1, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * ((n2 * k1) % N) / N
    return (c1, s1, (c1 + s1).astype(np.float32),
            c2, s2, (c2 + s2).astype(np.float32),
            np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def fourstep_psd_partial(re: jax.Array, im: jax.Array, fmask: jax.Array,
                         N1: int | None = None, N2: int | None = None,
                         chunk: int = 64,
                         precision: jax.lax.Precision | None = None) -> jax.Array:
    """Masked partial PSD sum via a transpose-free four-step DFT.

    Computes Σ_f fmask[f]·|DFT(re[f] + i·im[f])|² in one matmul chain with
    no layout transposes on (F, N)-sized data: stage-1's natural
    dot_general output layout (F, n2, k1) is kept, the twiddle is stored
    pre-transposed, stage 2 contracts the n2 axis in place, and the frame
    reduction happens BEFORE the bin-order fixup so only an (N1, N2) tile
    is ever reordered. This halves HBM traffic vs the naive formulation —
    the difference between ~7 and ~9+ GS/s on a v5e.

    re, im: (F, N) float32; fmask: (F,) float32 validity mask.
    Returns (N,) float32, unshifted bins.
    """
    F, N = re.shape
    if N1 is None or N2 is None:
        N1, N2 = best_fourstep_split(N)
    assert N1 * N2 == N, (N1, N2, N)
    c1, s1, cs1, c2, s2, cs2, tc, ts = (
        jnp.asarray(a) for a in _fourstep2_constants(N, N1, N2))
    while F % chunk != 0:
        chunk //= 2
    prec = _HI if precision is None else precision

    xr = re.reshape(F, N1, N2)
    xi = im.reshape(F, N1, N2)
    dn = (((1,), (0,)), ((), ()))  # contract axis 1 with weight axis 0

    def dot(a, b):
        return jax.lax.dot_general(a, b, dn, precision=prec)

    def cmatmul(ar, ai, br, bi, bsum):
        # Karatsuba 3-multiplication complex matmul: re = t1 − t2,
        # im = (ar+ai)@(br+bi) − t1 − t2 — 3 MXU passes instead of 4
        # (measured +14% end-to-end at equal ~3e-7 accuracy).
        t1 = dot(ar, br)
        t2 = dot(ai, bi)
        t3 = dot(ar + ai, bsum)
        return t1 - t2, t3 - t1 - t2

    # Stage 1 (contract n1): natural output layout (F, n2, k1).
    yr, yi = cmatmul(xr, xi, c1, s1, cs1)
    # Twiddle in the same layout (T pre-transposed to (n2, k1)).
    zr = yr * tc - yi * ts
    zi = yr * ts + yi * tc
    # Stage 2 (contract n2, now axis 1): output (F, k1, k2).
    xr2, xi2 = cmatmul(zr, zi, c2, s2, cs2)

    p = (xr2 * xr2 + xi2 * xi2) * fmask[:, None, None]
    g = F // chunk
    s = p.reshape(g, chunk, N1, N2).sum(axis=1).sum(axis=0)  # (k1, k2)
    # Bin k = k1 + N1·k2 → row-major (k2, k1); only this small tile moves.
    return jnp.swapaxes(s, 0, 1).reshape(N)


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
