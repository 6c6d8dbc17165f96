"""Probe: intra-kernel interleave of two independent half-tile chains.

s2_pipe.py showed Mosaic serializes @pl.when-predicated regions. This
probe tests whether a STRAIGHT-LINE body with two independent dataflow
chains (each half a tile) lets the VLIW scheduler overlap one half's
VPU phase (transpose/dequant/twiddle) with the other's MXU phase
(stage-2 matmuls):

  ilv:   a1 = phaseA(h1); a2 = phaseA(h2); p1 = phaseB(a1); p2 = phaseB(a2)
  base:  the shipping v6 single-chain kernel

Parity-exact. Run: python probes/s2_ilv.py [base ilv ilv4]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtl_power_fftw_tpu.ops.kernels.fused_psd import _split, _constants

import os
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

N, F = 2048, 4096
ITER_LO, ITER_HI = 32, 96
N1, N2 = _split(N)


def build(variant, tile_f=128):
    T = tile_f
    halves = {"base": 1, "ilv": 2, "ilv4": 4}[variant]
    H = T // halves
    consts = tuple(jnp.asarray(c) for c in _constants(N, N1, N2, False))

    def phase_a(raw_block, wr, wi, twrv, twiv):
        f32, bf16 = jnp.float32, jnp.bfloat16
        vt = jnp.swapaxes(raw_block.reshape(H, N1, N2), 1, 2)
        v = vt.reshape(H * N2, N1).astype(jnp.int32)
        ar = ((v & 0xFF) - 127).astype(bf16)
        ai = ((v >> 8) - 127).astype(bf16)
        lhs = jnp.concatenate([ar, ai, ar, ai, ar, ai], axis=1)
        yr = jnp.dot(lhs, wr, preferred_element_type=f32).reshape(H, N2, N1)
        yi = jnp.dot(lhs, wi, preferred_element_type=f32).reshape(H, N2, N1)
        zr = yr * twrv - yi * twiv
        zi = yr * twiv + yi * twrv

        def to2(x):
            return jnp.swapaxes(x, 1, 2).reshape(H * N1, N2)
        return to2(zr), to2(zi)

    def phase_b(zrm, zim, w2r_r, w2i_r, w2s_r):
        f32, bf16 = jnp.float32, jnp.bfloat16
        zsm = zrm + zim

        def split3(z):
            z0 = z.astype(bf16)
            r1 = z - z0.astype(f32)
            z1 = r1.astype(bf16)
            z2 = (r1 - z1.astype(f32)).astype(bf16)
            return z0, z1, z2

        def s2(z, w2_ref):
            z0, z1, z2 = split3(z)
            return (jnp.dot(z0, w2_ref[0], preferred_element_type=f32)
                    + jnp.dot(z0, w2_ref[1], preferred_element_type=f32)
                    + jnp.dot(z0, w2_ref[2], preferred_element_type=f32)
                    + jnp.dot(z1, w2_ref[0], preferred_element_type=f32)
                    + jnp.dot(z1, w2_ref[1], preferred_element_type=f32)
                    + jnp.dot(z2, w2_ref[0], preferred_element_type=f32))
        u1 = s2(zrm, w2r_r)
        u2 = s2(zim, w2i_r)
        u3 = s2(zsm, w2s_r)
        xr = u1 - u2
        xi = u3 - u1 - u2
        return (xr * xr + xi * xi).reshape(H, N1, N2)

    def kernel(nvalid_ref, raw_ref, wr_r, wi_r, twr_r, twi_r,
               w2r_r, w2i_r, w2s_r, out_ref):
        pid = pl.program_id(0)
        wr, wi = wr_r[:], wi_r[:]
        twrv, twiv = twr_r[:], twi_r[:]

        # Two (or four) independent chains: run all A phases first so the
        # scheduler is free to overlap chain i's B (MXU) with chain i+1's
        # A (VPU) — no @pl.when regions, pure dataflow.
        zs = [phase_a(raw_ref[h * H:(h + 1) * H], wr, wi, twrv, twiv)
              for h in range(halves)]
        pwrs = [phase_b(zrm, zim, w2r_r, w2i_r, w2s_r) for zrm, zim in zs]

        acc = None
        for h, pwr in enumerate(pwrs):
            base = pid * T + h * H
            fidx = jax.lax.broadcasted_iota(jnp.int32, (H, 1, 1), 0) + base
            pwr = jnp.where(fidx < nvalid_ref[0], pwr, 0.0)
            s = jnp.sum(pwr, axis=0)
            acc = s if acc is None else acc + s

        @pl.when(pid == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += jnp.swapaxes(acc, 0, 1)

    def _whole(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, *_, z=zeros: z,
                            memory_space=pltpu.VMEM)

    const_specs = [_whole((6 * N1, N1))] * 2 + [_whole((N2, N1))] * 2 \
        + [_whole((3, N2, N2))] * 3
    call = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(F // T,),
            in_specs=[pl.BlockSpec((T, N), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM), *const_specs],
            out_specs=pl.BlockSpec((N2, N1), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((N2, N1), jnp.float32),
        interpret=False)

    def fn(raw_u16, nv):
        return call(jnp.asarray(nv, jnp.int32).reshape(1), raw_u16,
                    *consts).reshape(N)
    return fn


def timed(fn, raw16, iters, reps=3):
    @partial(jax.jit, static_argnums=1)
    def many(raw, it):
        def body(c, i):
            return c + fn(raw + i.astype(jnp.uint16), F), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32), jnp.arange(it))
        return acc
    np.asarray(many(raw16, iters))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(many(raw16, iters))
        best = min(best, time.perf_counter() - t0)
    return best


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    raw8 = rng.integers(0, 256, size=(F, 2 * N), dtype=np.uint8)
    raw16 = jax.device_put(raw8.reshape(F, N, 2).view(np.uint16).reshape(F, N))
    x = (raw8[:, 0::2].astype(np.float64) - 127.0) \
        + 1j * (raw8[:, 1::2].astype(np.float64) - 127.0)
    want = (np.abs(np.fft.fft(x, axis=1)) ** 2).sum(0)
    for spec in (sys.argv[1:] or ["base", "ilv", "ilv4"]):
        tf = 128
        if ":" in spec:
            spec, tf = spec.split(":")
            tf = int(tf)
        try:
            fn = build(spec, tf)
            got = np.asarray(fn(raw16, F), dtype=np.float64)
            rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
            t_lo = timed(fn, raw16, ITER_LO)
            t_hi = timed(fn, raw16, ITER_HI)
            per = (t_hi - t_lo) / (ITER_HI - ITER_LO)
            print(f"{spec:5s} tile={tf:3d} per-step {per*1e6:8.1f} us  "
                  f"{F/per*N/1e9:7.3f} GS/s  max_rel={rel.max():.2e}")
        except Exception as e:
            print(f"{spec:5s} tile={tf:3d} FAILED: {str(e)[:300]}")
