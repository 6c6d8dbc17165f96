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
  |X|² partial sum into the output block, using the TPU's
  sequential-grid guarantee.

Precision + dispatch design (v5) — manual mixed-precision bf16 splits
(Ozaki-scheme-style error-free slicing onto low-precision matmul units,
cf. the mixed-precision tensor-core FFT literature, PAPERS.md) instead
of Mosaic's f32-HIGHEST (bf16x6) emulation, exploiting problem
structure, with the split terms K-STACKED into fat matmuls:

* stage 1's inputs are dequantized u8 integers (|x| ≤ 256) — EXACT in
  bfloat16, so only the DFT weights need splitting (three bf16 terms,
  residual ~2⁻²⁵ → f32-grade accuracy). All three split terms AND the
  complex combination are folded into the K axis: TWO dispatches of
  (T·N2, 6·N1)@(6·N1, N1) produce yr and yi. (Narrow K=N1 dispatches
  dominated earlier kernel versions — ablation measured ~92 µs per
  (16384,16)×(16,16) dispatch vs ~19 µs for (2048,128)×(128,128); the
  K-stack was the difference between 7.7 and 10.4 GS/s at N=2048.)
* stage 2's inputs are arbitrary f32: Karatsuba 3 real products, each a
  3-term input × 3-term weight split with the (i+j ≥ 3) cross terms
  dropped — 6 passes per product. The 3-term INPUT depth matters: with
  2 terms, the absolute error of tone-dominated bins leaks into small
  bins and blows the relative budget at high dynamic range (measured
  2.2e-5 with a 35 dB tone vs 3.2e-7 with this scheme);
* with a window the stage-1 inputs stop being integers: a runtime
  3-term input split feeds a 12·N1-K stack with the same drop rule
  (4.3e-7 under tones in simulation).

Measured on a v5e at N=2048, F=4096: 9.7 GS/s equivalent IQ at 3.2e-7
max relative error vs float64 — ahead of the XLA four-step path
(9.4 GS/s) that was the round-1 shipping step, ~3× the round-1
HIGHEST-precision Pallas kernel (3.4 GS/s), and error-robust to
high-dynamic-range (strong tone) inputs.

Bins come out "unshifted" (same convention as ops.spectral: fftshift is
applied once at finalization — mathematically identical to the
reference's (−1)^n input flip, datastore.cxx:69-75).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

try:  # Pallas requires a TPU-capable jaxlib; import is cheap and safe.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except ImportError:  # pragma: no cover
    _PALLAS_OK = False

try:
    import ml_dtypes
    _BF16 = ml_dtypes.bfloat16
except ImportError:  # pragma: no cover
    _BF16 = None
    _PALLAS_OK = False

#: VMEM budget for gating (v5e has ~128 MiB of VMEM; Mosaic's own limit
#: here is set to 100 MiB — gate against a conservative share so the
#: double-buffered pipeline always fits).
_VMEM_BUDGET = 64 * 2**20
#: live VMEM bytes per (frame, sample) in flight through the kernel body:
#: raw u16 (double-buffered) + ~8 concurrently-live f32 planes + bf16
#: split copies. Conservative liveness estimate, not an exact allocation.
_BYTES_PER_SAMPLE = 56


def _split(N: int) -> Tuple[int, int]:
    """Pick N = N1·N2, both powers of two, with N2 a multiple of 128:
    Mosaic only supports lane-dim shape casts that keep the minor dim
    lane-aligned, so the (TILE_F, N) → (TILE_F, N1, N2) view must leave
    N2 % 128 == 0. Balanced-ish otherwise (FLOPs ∝ N1 + N2)."""
    half = 1 << (int(N).bit_length() - 1 >> 1)  # floor(sqrt) as a pow2
    n2 = max(128, half)
    return N // n2, n2


def _const_bytes(N: int, N1: int, N2: int, windowed: bool) -> int:
    """Bytes of the _constants tuple as the kernel holds it in VMEM —
    keep in lockstep with _constants: the K-stacked stage-1 weights are
    (6·N1, N1) unwindowed / (12·N1, N1) windowed bf16 for EACH of WR/WI,
    and stage 2 always materializes three 3-term bf16 stacks."""
    k_stack = 12 if windowed else 6
    return (2 * k_stack * N1 * N1 * 2       # stage-1 WR + WI bf16
            + 3 * 3 * N2 * N2 * 2           # stage-2 bf16 3-term stacks ×3
            + 2 * N2 * N1 * 4               # twiddle f32 (twr + twi)
            + (N * 4 if windowed else 0)    # window
            + 2 * N * 4)                    # output accumulator (+ copy)


def _vmem_bytes(N: int, tile_f: int, windowed: bool) -> int:
    N1, N2 = _split(N)
    return tile_f * N * _BYTES_PER_SAMPLE + _const_bytes(N, N1, N2, windowed)


def pick_tile_f(N: int, F: int, windowed: bool = False) -> Optional[int]:
    """Largest frame tile that divides F and fits the VMEM budget, or
    None if even the smallest tile cannot fit (the caller must fall back
    to another backend — FFTW plans any N, datastore.cxx:30-33; we fail
    predictably instead)."""
    for t in (128, 64, 32, 16, 8):
        if F % t == 0 and _vmem_bytes(N, t, windowed) <= _VMEM_BUDGET:
            return t
    return None


def fused_psd_available(N: int, F: Optional[int] = None,
                        windowed: bool = False) -> bool:
    """True iff the fused kernel supports this configuration.

    Requirements: Pallas importable, N a power of two with a lane-aligned
    N = N1·N2 split (N ≥ 256), and — the honest part — a frame tile whose
    working set fits the VMEM budget. Very large N (e.g. the 1M-point
    mode) is rejected here and served by the XLA path instead.
    """
    if not (_PALLAS_OK and N >= 256 and (N & (N - 1)) == 0):
        return False
    # With no F given, check existence of any viable tile (F=128 proxy).
    return pick_tile_f(N, F if F is not None else 128, windowed) is not None


def _bf16_terms(w: np.ndarray, k: int) -> np.ndarray:
    """Split ``w`` (float64) into ``k`` bf16 terms by successive rounding:
    w = Σ terms + O(2^(-8k−1)). Returned stacked as (k, *w.shape) bf16."""
    terms = []
    r = np.asarray(w, np.float64)
    for _ in range(k):
        t = r.astype(_BF16)
        terms.append(t)
        r = r - t.astype(np.float64)
    return np.stack(terms)


@functools.lru_cache(maxsize=16)
def _constants(N: int, N1: int, N2: int, windowed: bool):
    """Pre-split DFT constants for the K-stacked formulation.

    Stage 1 is TWO native bf16 matmuls total — the complex combination
    AND the precision-split terms are folded into the K dimension of one
    (6·N1, N1) weight stack per output plane (yr / yi), so the MXU sees
    two fat dispatches instead of many narrow ones (measured: narrow
    K=N1 dispatches dominate the kernel; K-stacking them was the
    difference between 7.7 and 10.4 GS/s at N=2048 on a v5e).

      unwindowed (exact bf16 integer inputs, 3-term weight split):
        lhs = [ar ai ar ai ar ai]           (M, 6·N1)
        WR  = [w1r₀ −w1i₀ w1r₁ −w1i₁ w1r₂ −w1i₂]ᵀ-stacked → yr = lhs @ WR
        WI  = [w1i₀  w1r₀ w1i₁  w1r₁ w1i₂  w1r₂]  likewise → yi
      windowed (f32 inputs, 2-term input × 2-term weight, cross dropped):
        lhs = [a0r a0i a0r a0i a1r a1i]
        WR  = [w1r₀ −w1i₀ w1r₁ −w1i₁ w1r₀ −w1i₀] etc.

    The twiddle W_N^{n2·k1} stays f32 (elementwise on the native-f32
    VPU); stage-2 W_{N2} planes carry 2-term bf16 splits (Karatsuba with
    per-product z-splits in the kernel).
    """
    def dft(n):
        a = np.arange(n, dtype=np.float64)
        ang = -2.0 * np.pi * ((np.outer(a, a)) % n) / n
        return np.cos(ang), np.sin(ang)

    w1r, w1i = dft(N1)
    w2r, w2i = dft(N2)
    n2 = np.arange(N2, dtype=np.float64)[:, None]
    k1 = np.arange(N1, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * ((n2 * k1) % N) / N
    twr = np.cos(ang).astype(np.float32)   # (N2, N1): matches the
    twi = np.sin(ang).astype(np.float32)   # in-kernel twiddle layout

    r = _bf16_terms(w1r, 3).astype(np.float64)
    i = _bf16_terms(w1i, 3).astype(np.float64)
    if not windowed:
        # Exact integer inputs: weight-only 3-term split, K = 6·N1.
        order = (0, 1, 2)
    else:
        # f32 inputs: 3-term input × 3-term weight with (i+j ≥ 3) cross
        # terms dropped — the kernel stacks input terms [a0 a0 a0 a1 a1 a2]
        # so the weight-term order per block is:
        order = (0, 1, 2, 0, 1, 0)         # K = 12·N1
    WR = np.vstack([m for j in order for m in (r[j], -i[j])])
    WI = np.vstack([m for j in order for m in (i[j], r[j])])
    # Stage 2 under large dynamic range (a strong tone): absolute error
    # from the big bins leaks into small bins, so 2-term splits blow the
    # relative budget there (measured 2.2e-5 with a 35 dB tone). The
    # 3-input × 3-weight scheme with (i+j ≥ 3) dropped — products z0·c0,
    # z0·c1, z0·c2, z1·c0, z1·c1, z2·c0 — holds ~3e-7 and costs only
    # ~60 µs/step more at N=2048 (867 vs 806 µs). Three weight terms are
    # always materialized; the FAST (precision='high') kernel variant
    # simply uses fewer of them.
    return (WR.astype(_BF16), WI.astype(_BF16),
            twr, twi,
            _bf16_terms(w2r, 3), _bf16_terms(w2i, 3),
            _bf16_terms(w2r + w2i, 3))


def _kernel(N: int, N1: int, N2: int, TILE_F: int, windowed: bool,
            fast: bool = False, tiles_per_stream: int = 0):
    """Kernel body: four fat 2D native-bf16 MXU dispatches per tile.
    (Wide-N2 variants add two stage-2 refinement passes; see _constants.)

    Layout walk (per frame tile, T = TILE_F):
      raw u16 (T, N) → view (T, N1, N2) [n = N2·n1 + n2] → transpose →
      (T, N2, N1) → merge (T·N2, N1) → dequant
      → lhs [· ·]×3 (T·N2, 6·N1): stage-1 K-stacked matmuls → yr, yi
      twiddle elementwise in (T, N2, N1) layout (pre-transposed constants)
      → transpose → merge (T·N1, N2): stage-2 Karatsuba split matmuls
      |X|² → masked frame sum → (N1, N2) → (N2, N1) output tile
      (the bin flatten k = k1 + N1·k2 happens outside the kernel).
    """
    def kernel(nvalid_ref, raw_ref, wr_ref, wi_ref,
               twr_ref, twi_ref, w2r_ref, w2i_ref, w2s_ref, *rest):
        if windowed:
            win_ref = rest[0]
            out_ref = rest[1]
        else:
            out_ref = rest[0]

        pid = pl.program_id(0)
        f32 = jnp.float32
        bf16 = jnp.bfloat16

        # One 2-byte transpose on the raw data instead of two 4-byte
        # f32-plane transposes (dequant commutes with the transpose).
        vt = jnp.swapaxes(raw_ref[:].reshape(TILE_F, N1, N2), 1, 2)
        v = vt.reshape(TILE_F * N2, N1).astype(jnp.int32)

        def split3(z):
            z0 = z.astype(bf16)
            r1 = z - z0.astype(f32)
            z1 = r1.astype(bf16)
            z2 = (r1 - z1.astype(f32)).astype(bf16)
            return z0, z1, z2

        if not windowed:
            # u16 lane = interleaved (re, im) byte pair (little endian);
            # dequantized integers (|x| ≤ 256) are bf16-EXACT.
            ar = ((v & 0xFF) - 127).astype(bf16)
            ai = ((v >> 8) - 127).astype(bf16)
            lhs = jnp.concatenate([ar, ai, ar, ai, ar, ai], axis=1)
        else:
            # Window (pre-transposed to (N2, N1)) makes inputs f32: a
            # runtime 3-term input split feeds the 3×3-drop weight stack
            # (blocks [a0 a0 a0 a1 a1 a2] matching _constants' order).
            w = win_ref[:].reshape(1, N2, N1)
            arf = ((v & 0xFF).astype(f32) - 127.0).reshape(TILE_F, N2, N1)
            aif = ((v >> 8).astype(f32) - 127.0).reshape(TILE_F, N2, N1)
            arf = (arf * w).reshape(TILE_F * N2, N1)
            aif = (aif * w).reshape(TILE_F * N2, N1)
            a0r, a1r, a2r = split3(arf)
            a0i, a1i, a2i = split3(aif)
            lhs = jnp.concatenate([a0r, a0i, a0r, a0i, a0r, a0i,
                                   a1r, a1i, a1r, a1i, a2r, a2i], axis=1)

        # Stage 1: TWO dispatches total (complex combination + precision
        # splits folded into K).
        yr = jnp.dot(lhs, wr_ref[:],
                     preferred_element_type=f32).reshape(TILE_F, N2, N1)
        yi = jnp.dot(lhs, wi_ref[:],
                     preferred_element_type=f32).reshape(TILE_F, N2, N1)

        # Twiddle in the (T, N2, N1) layout: T2[n2, k1] = W_N^{n2·k1}.
        twr = twr_ref[:]                           # (N2, N1), pre-transposed
        twi = twi_ref[:]
        zr = yr * twr - yi * twi
        zi = yr * twi + yi * twr

        # → (T, N1, N2) → (T·N1, N2): stage-2 Karatsuba, 2-term z-split ×
        # 2-term weight split with the z1·c1 cross dropped (3 passes per
        # real product; scheme error ~2⁻¹⁸ given the near-exact stage 1).
        def to_stage2(x):
            return jnp.swapaxes(x, 1, 2).reshape(TILE_F * N1, N2)

        zrm = to_stage2(zr)
        zim = to_stage2(zi)
        zsm = zrm + zim

        if fast:
            # precision='high': 2×2-drop stage 2 (3 passes/product).
            # ~7% faster at N=2048 (806 vs 865 µs) but the error floor
            # rises to ~2e-6 uniform / ~4e-5 under a 35 dB tone — outside
            # the 1e-5 budget for tone-dominated inputs, hence opt-in.
            def s2(z, w2_ref):
                z0 = z.astype(bf16)
                z1 = (z - z0.astype(f32)).astype(bf16)
                return (jnp.dot(z0, w2_ref[0], preferred_element_type=f32)
                        + jnp.dot(z0, w2_ref[1], preferred_element_type=f32)
                        + jnp.dot(z1, w2_ref[0], preferred_element_type=f32))
        else:
            def s2(z, w2_ref):
                z0, z1, z2 = split3(z)
                return (jnp.dot(z0, w2_ref[0], preferred_element_type=f32)
                        + jnp.dot(z0, w2_ref[1], preferred_element_type=f32)
                        + jnp.dot(z0, w2_ref[2], preferred_element_type=f32)
                        + jnp.dot(z1, w2_ref[0], preferred_element_type=f32)
                        + jnp.dot(z1, w2_ref[1], preferred_element_type=f32)
                        + jnp.dot(z2, w2_ref[0], preferred_element_type=f32))

        u1 = s2(zrm, w2r_ref)
        u2 = s2(zim, w2i_ref)
        u3 = s2(zsm, w2s_ref)
        xr = u1 - u2
        xi = u3 - u1 - u2

        pwr = (xr * xr + xi * xi).reshape(TILE_F, N1, N2)  # (f, k1, k2)

        if tiles_per_stream:
            # Multi-stream batch: frames are grouped per stream and every
            # tile lies inside ONE stream (F % TILE_F == 0), so the valid
            # count is a per-tile scalar from the prefetched (S,) array.
            sid = pid // tiles_per_stream
            base = (pid % tiles_per_stream) * TILE_F
            nv = nvalid_ref[sid]
            first = (pid % tiles_per_stream) == 0
        else:
            base = pid * TILE_F
            nv = nvalid_ref[0]
            first = pid == 0
        fidx = jax.lax.broadcasted_iota(jnp.int32, (TILE_F, 1, 1), 0) + base
        pwr = jnp.where(fidx < nv, pwr, 0.0)

        s = jnp.sum(pwr, axis=0)                   # (N1, N2)
        partial = jnp.swapaxes(s, 0, 1)            # (N2, N1)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += partial

    return kernel


def make_fused_psd_fn(N: int, F: int, windowed: bool,
                      tile_f: Optional[int] = None, n1: Optional[int] = None,
                      interpret: Optional[bool] = None, fast: bool = False,
                      streams: int = 1):
    """Build fn(raw_u16 (F, N), n_valid i32[, window (N,) f32]) -> (N,) f32
    partial power sum (unshifted bins), as a jittable function.

    ``raw_u16`` is the interleaved u8 IQ buffer viewed as little-endian
    uint16 — a free reinterpretation on the host (arr.view(np.uint16)) or
    via jax.lax.bitcast_convert_type.

    With ``streams`` = S > 1 the signature becomes
    fn(raw_u16 (S·F, N), n_valid (S,) i32[, window]) -> (S, N): frames are
    grouped per stream (F per stream), masked per-stream, and the kernel
    accumulates one output tile per stream — the sharded multi-stream
    step runs this per mesh shard.
    """
    if not fused_psd_available(N, F, windowed):
        raise ValueError(f"fused kernel unavailable for N={N}, F={F} "
                         "(needs a power of two >= 256 within VMEM budget)")
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
    if tile_f is None:
        tile_f = pick_tile_f(N, F, windowed)
        assert tile_f is not None  # guaranteed by fused_psd_available
    TILE_F = min(tile_f, F)
    if F % TILE_F != 0:
        raise ValueError(f"F={F} must be a multiple of tile_f={TILE_F}")
    consts = tuple(jnp.asarray(c) for c in _constants(N, N1, N2, windowed))

    tiles_per_stream = F // TILE_F
    grid = (streams * tiles_per_stream,)
    kernel = _kernel(N, N1, N2, TILE_F, windowed, fast=fast,
                     tiles_per_stream=tiles_per_stream if streams > 1 else 0)

    def _whole(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, *_, z=zeros: z,
                            memory_space=pltpu.VMEM)

    k1 = (12 if windowed else 6) * N1
    const_specs = [
        _whole((k1, N1)),               # stage-1 K-stacked WR
        _whole((k1, N1)),               # stage-1 K-stacked WI
        _whole((N2, N1)),               # twiddle cos
        _whole((N2, N1)),               # twiddle sin
        _whole((3, N2, N2)),            # w2r splits
        _whole((3, N2, N2)),            # w2i splits
        _whole((3, N2, N2)),            # w2(r+i) splits
    ]
    win_spec = [_whole((N2, N1))] if windowed else []

    # Stage 1: 2 dispatches of K=(6 or 12)·N1; stage 2: 18 passes of K=N2.
    flops_per_frame = (24 if windowed else 12) * N * N1 + 36 * N * N2 + 10 * N
    cost = pl.CostEstimate(
        flops=flops_per_frame * F,
        bytes_accessed=F * N * 2 + _const_bytes(N, N1, N2, windowed),
        transcendentals=0,
    )

    if streams > 1:
        tps = tiles_per_stream
        out_spec = pl.BlockSpec((1, N2, N1),
                                lambda i, *_: (i // tps, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((streams, N2, N1), jnp.float32)
    else:
        out_spec = pl.BlockSpec((N2, N1), lambda i, *_: (0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((N2, N1), jnp.float32)

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
            out_specs=out_spec,
        ),
        out_shape=out_shape,
        cost_estimate=cost,
        interpret=interpret,
    )

    out_dims = (streams, N) if streams > 1 else (N,)
    nv_len = streams if streams > 1 else 1

    if windowed:
        def fn(raw_u16, n_valid, window):
            nv = jnp.asarray(n_valid, jnp.int32).reshape(nv_len)
            wt = jnp.swapaxes(window.reshape(N1, N2), 0, 1)  # (N2, N1)
            out = call(nv, raw_u16, *consts, wt)
            return out.reshape(out_dims)  # (k2, k1) row-major == bin order
    else:
        def fn(raw_u16, n_valid):
            nv = jnp.asarray(n_valid, jnp.int32).reshape(nv_len)
            out = call(nv, raw_u16, *consts)
            return out.reshape(out_dims)

    return fn
