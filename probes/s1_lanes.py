"""Probe: where does the fused-kernel tile time go, and does moving the
dequant to a full-lane layout help?

The shipping kernel lane-transposes the raw u16 FIRST, then does all
dequant / cast / concat work in (T*N2, N1=16) layout — 16 of 128 VPU
lanes active. Variants:

  full    shipping v6 scheme (baseline)
  s1only  stop after stage 1 (yr+yi reduced)   -> s2+twiddle+transpose cost
  s1tw    stage 1 + twiddle                     -> twiddle delta
  s1tw2   stage 1 + twiddle + to2 transposes    -> f32 transpose delta
  widedq  full, but dequant at full 128 lanes in (T*N1, N2) BEFORE the
          lane transpose; transpose 2 bf16 planes instead of 1 u16 plane
  dqonly  dequant+concat only, shipping layout  -> dequant cost (narrow)
  dqwide  dequant only, full-lane layout        -> dequant cost (wide)

Run: python probes/s1_lanes.py [variants...]
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
    consts = tuple(jnp.asarray(c) for c in _constants(N, N1, N2, False))

    def kernel(nvalid_ref, raw_ref, wr_r, wi_r, twr_r, twi_r,
               w2r_r, w2i_r, w2s_r, out_ref):
        pid = pl.program_id(0)
        f32, bf16 = jnp.float32, jnp.bfloat16

        if variant in ("widedq", "dqwide"):
            # dequant in the raw (T*N1, N2) layout: full 128 lanes
            vw = raw_ref[:].reshape(T * N1, N2).astype(jnp.int32)
            arw = ((vw & 0xFF) - 127).astype(bf16).reshape(T, N1, N2)
            aiw = ((vw >> 8) - 127).astype(bf16).reshape(T, N1, N2)
            if variant == "dqwide":
                s = jnp.sum(arw.astype(f32) + aiw.astype(f32), axis=0)
                sv = s.reshape(N1, N2)[:N2 % 10000 and N1, :]  # keep (N1,N2)
                out = jnp.swapaxes(jnp.zeros((N1, N2), f32) + sv, 0, 1)
                @pl.when(pid == 0)
                def _():
                    out_ref[:] = jnp.zeros_like(out_ref)
                out_ref[:] += out
                return
            ar = jnp.swapaxes(arw, 1, 2).reshape(T * N2, N1)
            ai = jnp.swapaxes(aiw, 1, 2).reshape(T * N2, N1)
        else:
            vt = jnp.swapaxes(raw_ref[:].reshape(T, N1, N2), 1, 2)
            v = vt.reshape(T * N2, N1).astype(jnp.int32)
            ar = ((v & 0xFF) - 127).astype(bf16)
            ai = ((v >> 8) - 127).astype(bf16)

        lhs = jnp.concatenate([ar, ai, ar, ai, ar, ai], axis=1)

        if variant == "dqonly":
            s = jnp.sum(lhs.astype(f32), axis=1, keepdims=True)  # (T*N2, 1)
            out = jnp.sum(s.reshape(T, N2, 1), axis=0) + jnp.zeros((N2, N1), f32)
            @pl.when(pid == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)
            out_ref[:] += out
            return

        yr = jnp.dot(lhs, wr_r[:], preferred_element_type=f32).reshape(T, N2, N1)
        yi = jnp.dot(lhs, wi_r[:], preferred_element_type=f32).reshape(T, N2, N1)

        if variant == "s1only":
            pwr = yr * yr + yi * yi
        else:
            twrv, twiv = twr_r[:], twi_r[:]
            zr = yr * twrv - yi * twiv
            zi = yr * twiv + yi * twrv
            if variant == "s1tw":
                pwr = zr * zr + zi * zi
            else:
                def to2(x):
                    return jnp.swapaxes(x, 1, 2).reshape(T * N1, N2)
                zrm, zim = to2(zr), to2(zi)
                if variant == "s1tw2":
                    pwr = (zrm * zrm + zim * zim).reshape(T, N1, N2)
                    pwr = jnp.swapaxes(pwr, 1, 2)  # back to (T, N2, N1)
                else:  # full / widedq
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
                    pwr = (xr * xr + xi * xi).reshape(T, N1, N2)
                    base = pid * T
                    fidx = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0) + base
                    pwr = jnp.where(fidx < nvalid_ref[0], pwr, 0.0)
                    s = jnp.sum(pwr, axis=0)
                    @pl.when(pid == 0)
                    def _():
                        out_ref[:] = jnp.zeros_like(out_ref)
                    out_ref[:] += jnp.swapaxes(s, 0, 1)
                    return

        base = pid * T
        fidx = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0) + base
        pwr = jnp.where(fidx < nvalid_ref[0], pwr, 0.0)
        s = jnp.sum(pwr, axis=0)
        @pl.when(pid == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += jnp.swapaxes(s, 0, 1)

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
    for spec in (sys.argv[1:] or ["full", "widedq", "s1only", "s1tw",
                                  "s1tw2", "dqonly", "dqwide"]):
        tf = 128
        if ":" in spec:
            spec, tf = spec.split(":")
            tf = int(tf)
        try:
            fn = build(spec, tf)
            got = np.asarray(fn(raw16, F), dtype=np.float64)
            rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
            parity = f"max_rel={rel.max():.2e}" if spec in ("full", "widedq") \
                else "(timing only)"
            t_lo = timed(fn, raw16, ITER_LO)
            t_hi = timed(fn, raw16, ITER_HI)
            per = (t_hi - t_lo) / (ITER_HI - ITER_LO)
            print(f"{spec:7s} tile={tf:3d} per-step {per*1e6:8.1f} us  "
                  f"{F/per*N/1e9:7.3f} GS/s  {parity}")
        except Exception as e:
            print(f"{spec:7s} tile={tf:3d} FAILED: {str(e)[:300]}")
