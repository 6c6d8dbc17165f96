"""Fused Pallas PSD kernel: dequant → window → four-step DFT → |X|² → reduce.

This is the TPU-native re-design of the reference's per-sample FFT worker
loop (datastore.cxx:66-88) as ONE VMEM-resident kernel:

* HBM traffic is exactly 2 bytes per IQ sample (the raw u8 pair, read as
  one u16 lane) plus a few KB of DFT constants — no (F, N) complex
  intermediate ever touches HBM, unlike the XLA-FFT path which
  materializes several;
* the IQ deinterleave is free: the interleaved (re, im) byte pair is ONE
  little-endian u16 lane, split with an integer mask/shift on the VPU
  (no strided gathers);
* the transform is the four-step (Bailey) factorization N = N1·N2 — two
  batched small-K matmuls on the MXU with an elementwise twiddle between
  them (O(N·(N1+N2)) FLOPs per frame instead of O(N²));
* frames are reduced on-chip: each grid step accumulates its masked
  |X|² partial sum into the (1, N) output block, using the TPU's
  sequential-grid guarantee.

Bins come out "unshifted" (same convention as ops.spectral: fftshift is
applied once at finalization — mathematically identical to the
reference's (−1)^n input flip, datastore.cxx:69-75).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

try:  # Pallas requires a TPU-capable jaxlib; import is cheap and safe.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except ImportError:  # pragma: no cover
    _PALLAS_OK = False

_HI = jax.lax.Precision.HIGHEST


def fused_psd_available(N: int) -> bool:
    """The fused kernel handles even power-of-two N with a clean
    N = N1·N2 split and lane-aligned width."""
    return (_PALLAS_OK and N >= 256 and (N & (N - 1)) == 0)


def _split(N: int) -> tuple[int, int]:
    """Pick N = N1·N2, both powers of two, with N2 a multiple of 128:
    Mosaic only supports lane-dim shape casts that keep the minor dim
    lane-aligned, so the (TILE_F, N) → (TILE_F, N1, N2) view must leave
    N2 % 128 == 0. Balanced-ish otherwise (FLOPs ∝ N1 + N2)."""
    half = 1 << (int(N).bit_length() - 1 >> 1)  # floor(sqrt) as a pow2
    n2 = max(128, half)
    return N // n2, n2


@functools.lru_cache(maxsize=16)
def _constants(N: int, N1: int, N2: int):
    """float32 DFT constants: stage-1 W_{N1}, twiddle W_N^{k1·n2}, stage-2
    W_{N2}, all as separate real/imag planes."""
    def dft(n):
        a = np.arange(n, dtype=np.float64)
        ang = -2.0 * np.pi * ((np.outer(a, a)) % n) / n
        return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)

    w1r, w1i = dft(N1)
    w2r, w2i = dft(N2)
    n2 = np.arange(N2, dtype=np.float64)[:, None]
    k1 = np.arange(N1, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * ((n2 * k1) % N) / N
    twr = np.cos(ang).astype(np.float32)   # (N2, N1): matches the
    twi = np.sin(ang).astype(np.float32)   # in-kernel twiddle layout
    return w1r, w1i, twr, twi, w2r, w2i


def _kernel(N: int, N1: int, N2: int, TILE_F: int, windowed: bool):
    """Kernel body: every matmul is 2D so Mosaic maps it onto the MXU.

    Layout walk (per frame tile, T = TILE_F):
      raw u16 (T, N) → dequant → (T, N) f32 planes
      view (T, N1, N2) [n = N2·n1 + n2] → transpose → (T, N2, N1)
      → merge (T·N2, N1): stage-1 2D matmul contracts n1 (K = N1)
      twiddle elementwise in (T, N2, N1) layout (pre-transposed constants)
      → transpose → merge (T·N1, N2): stage-2 2D matmul contracts n2
      |X|² → masked frame sum → (N1, N2) → (N2, N1) output tile
      (the bin flatten k = k1 + N1·k2 happens outside the kernel).
    """
    def kernel(nvalid_ref, raw_ref, w1r_ref, w1i_ref, twr_ref, twi_ref,
               w2r_ref, w2i_ref, *rest):
        if windowed:
            win_ref = rest[0]
            out_ref = rest[1]
        else:
            out_ref = rest[0]

        pid = pl.program_id(0)

        # u16 lane = interleaved (re, im) byte pair (little endian).
        v = raw_ref[:].astype(jnp.int32)          # (TILE_F, N)
        re = (v & 0xFF).astype(jnp.float32) - 127.0
        im = (v >> 8).astype(jnp.float32) - 127.0
        if windowed:
            w = win_ref[:]                         # (1, N)
            re = re * w
            im = im * w

        # n = N2·n1 + n2 → (T, N2, N1) with n1 minor, then 2D.
        def to_stage1(x):
            x3 = x.reshape(TILE_F, N1, N2)
            return jnp.swapaxes(x3, 1, 2).reshape(TILE_F * N2, N1)

        ar = to_stage1(re)
        ai = to_stage1(im)

        def cmatmul2d(ar, ai, br, bi):
            rr = jnp.dot(ar, br, precision=_HI) - jnp.dot(ai, bi, precision=_HI)
            ri = jnp.dot(ar, bi, precision=_HI) + jnp.dot(ai, br, precision=_HI)
            return rr, ri

        # Stage 1 (2D MXU matmul, K = N1): Y[(f,n2), k1].
        yr, yi = cmatmul2d(ar, ai, w1r_ref[:], w1i_ref[:])

        # Twiddle in the (T, N2, N1) layout: T2[n2, k1] = W_N^{n2·k1}.
        yr = yr.reshape(TILE_F, N2, N1)
        yi = yi.reshape(TILE_F, N2, N1)
        twr = twr_ref[:]                           # (N2, N1), pre-transposed
        twi = twi_ref[:]
        zr = yr * twr - yi * twi
        zi = yr * twi + yi * twr

        # → (T, N1, N2) → (T·N1, N2): stage-2 2D matmul, K = N2.
        def to_stage2(x):
            return jnp.swapaxes(x, 1, 2).reshape(TILE_F * N1, N2)

        xr, xi = cmatmul2d(to_stage2(zr), to_stage2(zi),
                           w2r_ref[:], w2i_ref[:])

        pwr = (xr * xr + xi * xi).reshape(TILE_F, N1, N2)  # (f, k1, k2)

        # Mask padding frames: global frame index < n_valid.
        base = pid * TILE_F
        fidx = jax.lax.broadcasted_iota(jnp.int32, (TILE_F, 1, 1), 0) + base
        pwr = jnp.where(fidx < nvalid_ref[0], pwr, 0.0)

        s = jnp.sum(pwr, axis=0)                   # (N1, N2)
        partial = jnp.swapaxes(s, 0, 1)            # (N2, N1)

        @pl.when(pid == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += partial

    return kernel


def make_fused_psd_fn(N: int, F: int, windowed: bool,
                      tile_f: int = 128, n1: Optional[int] = None,
                      interpret: Optional[bool] = None):
    """Build fn(raw_u16 (F, N), n_valid i32[, window (N,) f32]) -> (N,) f32
    partial power sum (unshifted bins), as a jittable function.

    ``raw_u16`` is the interleaved u8 IQ buffer viewed as little-endian
    uint16 — a free reinterpretation on the host (arr.view(np.uint16)) or
    via jax.lax.bitcast_convert_type.
    """
    if not fused_psd_available(N):
        raise ValueError(f"fused kernel unavailable for N={N}")
    if interpret is None:
        # Compiled Mosaic needs a TPU backend; everywhere else (the CPU
        # test harness) the kernel runs in interpreter mode.
        interpret = jax.default_backend() != "tpu"
    if not interpret:
        # Remote-attached TPU compile services may lack the accelerator
        # type in their environment, failing libtpu init with "Failed to
        # find host bounds" — the client-side env var is forwarded with
        # the compile request and fixes it. Harmless elsewhere.
        import os
        os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
    N1, N2 = _split(N) if n1 is None else (n1, N // n1)
    assert N1 * N2 == N
    TILE_F = min(tile_f, F)
    if F % TILE_F != 0:
        raise ValueError(f"F={F} must be a multiple of tile_f={TILE_F}")
    consts = tuple(jnp.asarray(c) for c in _constants(N, N1, N2))

    grid = (F // TILE_F,)
    kernel = _kernel(N, N1, N2, TILE_F, windowed)

    const_specs = [
        pl.BlockSpec((N1, N1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N1, N1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N2, N1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N2, N1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N2, N2), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((N2, N2), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
    ]
    win_spec = [pl.BlockSpec((1, N), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM)] if windowed else []

    flops_per_frame = 8 * N * (N1 + N2) + 10 * N
    cost = pl.CostEstimate(
        flops=flops_per_frame * F,
        bytes_accessed=F * N * 2 + 4 * N,
        transcendentals=0,
    )

    call = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_F, N), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                *const_specs,
                *win_spec,
            ],
            out_specs=pl.BlockSpec((N2, N1), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((N2, N1), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )

    if windowed:
        def fn(raw_u16, n_valid, window):
            nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
            out = call(nv, raw_u16, *consts, window.reshape(1, N))
            return out.reshape(N)  # (k2, k1) row-major == bin order
    else:
        def fn(raw_u16, n_valid):
            nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
            out = call(nv, raw_u16, *consts)
            return out.reshape(N)

    return fn
