"""Probe: halve the u16 lane-transpose via sublane-pair u32 packing.

pltpu.bitcast(u16 (2R, C) -> u32 (R, C)) packs adjacent SUBLANE pairs
(lo = even row, hi = odd row; verified on-chip). Packing adjacent n1
rows before the lane transpose halves the transposed element count:

  raw (T*N1, N2) u16 --bitcast--> (T*N1/2, N2) u32
      --swapaxes--> (T, N2, N1/2) u32        (half the elements)
      --byte extract--> are/aie/aro/aio (M, N1/2) raw 0..255 (bf16-exact)
      --concat x3--> lhs (M, 96) with stage-1 weight ROWS permuted to
        [even n1... | odd n1...] per block; the -127 offset is folded
        into constant row subtractions after stage 1.

Everything after stage 1 is the shipping v6 scheme.

Run: python probes/s2_u32t.py [base u32t u32t:64]
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

import ml_dtypes
BF = ml_dtypes.bfloat16

N, F = 2048, 4096
ITER_LO, ITER_HI = 32, 96
N1, N2 = _split(N)


def build(variant, tile_f=128):
    T = tile_f
    WRp, WIp, twr, twi, w2r3, w2i3, w2s3 = _constants(N, N1, N2, False)
    extra = []
    if variant == "u32t":
        # permute each N1-sized K block: [0,2,4,...,14, 1,3,...,15]
        perm = np.concatenate([np.arange(0, N1, 2), np.arange(1, N1, 2)])
        full_perm = np.concatenate([b * N1 + perm for b in range(6)])
        WRu = np.ascontiguousarray(WRp[full_perm])
        WIu = np.ascontiguousarray(WIp[full_perm])
        ones = np.full((6 * N1,), 127.0)
        cR = (ones @ WRp.astype(np.float64)).astype(np.float32)
        cI = (ones @ WIp.astype(np.float64)).astype(np.float32)
        extra = [jnp.asarray(cR.reshape(1, N1)), jnp.asarray(cI.reshape(1, N1))]
        WRp, WIp = WRu, WIu
    cc = (jnp.asarray(WRp), jnp.asarray(WIp), jnp.asarray(twr),
          jnp.asarray(twi), jnp.asarray(w2r3), jnp.asarray(w2i3),
          jnp.asarray(w2s3), *extra)

    def kernel(nvalid_ref, raw_ref, wr_r, wi_r, twr_r, twi_r,
               w2r_r, w2i_r, w2s_r, *rest):
        if variant == "u32t":
            cr_r, ci_r = rest[0], rest[1]
            out_ref = rest[2]
        else:
            out_ref = rest[0]
        pid = pl.program_id(0)
        f32, bf16 = jnp.float32, jnp.bfloat16

        if variant == "u32t":
            H = N1 // 2
            packed = pltpu.bitcast(raw_ref[:].reshape(T * N1, N2),
                                   jnp.uint32)          # (T*N1/2, N2)
            vt = jnp.swapaxes(packed.reshape(T, H, N2), 1, 2)
            m = vt.reshape(T * N2, H)                    # u32, 8 lanes
            u8 = jnp.uint32(0xFF)
            are = (m & u8).astype(jnp.int32).astype(bf16)
            aie = (jax.lax.shift_right_logical(m, jnp.uint32(8)) & u8
                   ).astype(jnp.int32).astype(bf16)
            aro = (jax.lax.shift_right_logical(m, jnp.uint32(16)) & u8
                   ).astype(jnp.int32).astype(bf16)
            aio = jax.lax.shift_right_logical(m, jnp.uint32(24)
                                              ).astype(jnp.int32).astype(bf16)
            ar = jnp.concatenate([are, aro], axis=1)     # [even n1 | odd n1]
            ai = jnp.concatenate([aie, aio], axis=1)
            lhs = jnp.concatenate([ar, ai, ar, ai, ar, ai], axis=1)
            yr = (jnp.dot(lhs, wr_r[:], preferred_element_type=f32)
                  - cr_r[:]).reshape(T, N2, N1)
            yi = (jnp.dot(lhs, wi_r[:], preferred_element_type=f32)
                  - ci_r[:]).reshape(T, N2, N1)
        else:
            vt = jnp.swapaxes(raw_ref[:].reshape(T, N1, N2), 1, 2)
            v = vt.reshape(T * N2, N1).astype(jnp.int32)
            ar = ((v & 0xFF) - 127).astype(bf16)
            ai = ((v >> 8) - 127).astype(bf16)
            lhs = jnp.concatenate([ar, ai, ar, ai, ar, ai], axis=1)
            yr = jnp.dot(lhs, wr_r[:],
                         preferred_element_type=f32).reshape(T, N2, N1)
            yi = jnp.dot(lhs, wi_r[:],
                         preferred_element_type=f32).reshape(T, N2, N1)

        twrv, twiv = twr_r[:], twi_r[:]
        zr = yr * twrv - yi * twiv
        zi = yr * twiv + yi * twrv

        def to2(x):
            return jnp.swapaxes(x, 1, 2).reshape(T * N1, N2)

        def split3(z):
            z0 = z.astype(bf16)
            r1 = z - z0.astype(f32)
            z1 = r1.astype(bf16)
            z2 = (r1 - z1.astype(f32)).astype(bf16)
            return z0, z1, z2

        zrm, zim = to2(zr), to2(zi)
        zsm = zrm + zim

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

    def _whole(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, *_, z=zeros: z,
                            memory_space=pltpu.VMEM)

    const_specs = [_whole((6 * N1, N1))] * 2 + [_whole((N2, N1))] * 2 \
        + [_whole((3, N2, N2))] * 3
    if variant == "u32t":
        const_specs += [_whole((1, N1))] * 2
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
                    *cc).reshape(N)
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
    for spec in (sys.argv[1:] or ["base", "u32t"]):
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
            print(f"{spec:6s} tile={tf:3d} per-step {per*1e6:8.1f} us  "
                  f"{F/per*N/1e9:7.3f} GS/s  max_rel={rel.max():.2e}")
        except Exception as e:
            print(f"{spec:6s} tile={tf:3d} FAILED: {str(e)[:300]}")
