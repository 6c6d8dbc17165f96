"""Ablation probe: where does the fused-kernel time go?
Builds kernel variants with pieces disabled and slope-times each."""
import sys
sys.path.insert(0, "/root/repo")
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtl_power_fftw_tpu.ops.kernels.fused_psd import _split, _constants

N, F = 2048, 4096
ITER_LO, ITER_HI = 32, 96
N1, N2 = _split(N)
TILE_F = 128
import os
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")

consts_np = _constants(N, N1, N2, 3)
consts = tuple(jnp.asarray(c) for c in consts_np)


def build(variant, tile_f=TILE_F):
    T = tile_f
    def kernel(nvalid_ref, raw_ref, w1r_ref, w1i_ref, w1s_ref,
               twr_ref, twi_ref, w2r_ref, w2i_ref, w2s_ref, out_ref):
        pid = pl.program_id(0)
        f32, bf16 = jnp.float32, jnp.bfloat16
        vt = jnp.swapaxes(raw_ref[:].reshape(T, N1, N2), 1, 2)
        v = vt.reshape(T * N2, N1).astype(jnp.int32)
        ar = (v & 0xFF).astype(f32) - 127.0
        ai = (v >> 8).astype(f32) - 127.0
        asum = ar + ai

        def dotp(a, b):
            return jnp.dot(a, b, preferred_element_type=f32)

        s1_passes = 0 if variant == "nomm" else (1 if variant == "s1x1" else 3)
        s2_passes = 0 if variant == "nomm" else (1 if variant in ("s2x1", "s1x1") else 3)

        if s1_passes == 0:
            yr = ar.reshape(T, N2, N1)
            yi = ai.reshape(T, N2, N1)
        else:
            def s1(a, w3):
                ab = a.astype(bf16)
                acc = dotp(ab, w3[0])
                for j in range(1, s1_passes):
                    acc += dotp(ab, w3[j])
                return acc
            t1 = s1(ar, w1r_ref); t2 = s1(ai, w1i_ref); t3 = s1(asum, w1s_ref)
            yr = (t1 - t2).reshape(T, N2, N1)
            yi = (t3 - t1 - t2).reshape(T, N2, N1)

        if variant != "notw":
            twr, twi = twr_ref[:], twi_ref[:]
            zr = yr * twr - yi * twi
            zi = yr * twi + yi * twr
        else:
            zr, zi = yr, yi

        if variant == "dg3d":
            # stage2 via 3D dot_general contracting axis 1 (n2) in place
            def s2_3d(z, w2):
                def one(zz, ww):
                    return jax.lax.dot_general(
                        zz, ww, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                z0 = z.astype(jnp.bfloat16)
                z1 = (z - z0.astype(jnp.float32)).astype(jnp.bfloat16)
                return one(z0, w2[0]) + one(z0, w2[1]) + one(z1, w2[0])
            u1 = s2_3d(zr, w2r_ref); u2 = s2_3d(zi, w2i_ref)
            u3 = s2_3d(zr + zi, w2s_ref)
            xr = u1 - u2; xi = u3 - u1 - u2          # (T, N1, k2)
            pwr = xr * xr + xi * xi
        else:
            def to2(x):
                return jnp.swapaxes(x, 1, 2).reshape(T * N1, N2)
            zrm, zim = to2(zr), to2(zi)
            if s2_passes == 0:
                xr, xi = zrm, zim
            else:
                zsm = zrm + zim
                def s2(z, w2):
                    z0 = z.astype(bf16)
                    z1 = (z - z0.astype(f32)).astype(bf16)
                    acc = dotp(z0, w2[0])
                    if s2_passes >= 2: acc += dotp(z0, w2[1])
                    if s2_passes >= 3: acc += dotp(z1, w2[0])
                    return acc
                u1 = s2(zrm, w2r_ref); u2 = s2(zim, w2i_ref); u3 = s2(zsm, w2s_ref)
                xr = u1 - u2; xi = u3 - u1 - u2
            pwr = (xr * xr + xi * xi).reshape(T, N1, N2)

        base = pid * T
        fidx = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0) + base
        pwr = jnp.where(fidx < nvalid_ref[0], pwr, 0.0)
        s = jnp.sum(pwr, axis=0)
        partial_out = jnp.swapaxes(s, 0, 1) if variant != "dg3d" else jnp.swapaxes(s, 0, 1)
        @pl.when(pid == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += partial_out

    def _whole(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, *_, z=zeros: z,
                            memory_space=pltpu.VMEM)
    const_specs = [_whole((3, N1, N1))]*3 + [_whole((N2, N1))]*2 + [_whole((2, N2, N2))]*3
    out_sh = (N2, N1) if variant != "dg3d" else (N2, N1)
    call = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(F // T,),
            in_specs=[pl.BlockSpec((T, N), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM), *const_specs],
            out_specs=pl.BlockSpec(out_sh, lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct(out_sh, jnp.float32),
        interpret=False)
    def fn(raw_u16, nv):
        return call(jnp.asarray(nv, jnp.int32).reshape(1), raw_u16, *consts).reshape(N)
    return fn

rng = np.random.default_rng(0)
raw8 = rng.integers(0, 256, size=(F, 2 * N), dtype=np.uint8)
raw16 = jax.device_put(raw8.reshape(F, N, 2).view(np.uint16).reshape(F, N))

def timed(fn, iters, reps=3):
    @partial(jax.jit, static_argnums=1)
    def many(raw, it):
        def body(c, i):
            return c + fn(raw + i.astype(jnp.uint16), F), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32), jnp.arange(it))
        return acc
    np.asarray(many(raw16, iters))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); np.asarray(many(raw16, iters))
        best = min(best, time.perf_counter() - t0)
    return best

for variant in (sys.argv[1:] or ["full", "s2x1", "s1x1", "nomm", "notw", "dg3d"]):
    tf = TILE_F
    if ":" in variant:
        variant, tf = variant.split(":"); tf = int(tf)
    try:
        fn = build(variant, tf)
        t_lo = timed(fn, ITER_LO); t_hi = timed(fn, ITER_HI)
        per = (t_hi - t_lo) / (ITER_HI - ITER_LO)
        print(f"{variant:8s} tile={tf:3d} per-step {per*1e6:8.1f} us  {F/per*N/1e9:7.3f} GS/s")
    except Exception as e:
        print(f"{variant:8s} tile={tf:3d} FAILED: {str(e)[:200]}")

# ---- pack8 variant: stage-1 lanes packed with kron(w1, I_P) weights ----
def build_pack8(tile_f=TILE_F):
    T = tile_f
    P = max(1, 128 // N1)
    Q = N2 // P
    w1r, w1i, w1s, twr, twi, w2r, w2i, w2s = consts_np
    eye = np.eye(P)
    def packw(wk):  # (k, N1, N1) bf16 -> (k, P*N1, P*N1) bf16, p-major lanes
        return np.stack([np.kron(eye, t.astype(np.float32)).astype(t.dtype)
                         for t in wk])
    pw1r, pw1i, pw1s = packw(w1r), packw(w1i), packw(w1s)
    # twiddle packed: twp[q, p*N1+k1] = tw[P*q+p, k1] == flat reshape
    def packtw(tw):
        return np.ascontiguousarray(tw.reshape(Q, P * N1))
    ptwr, ptwi = packtw(twr), packtw(twi)
    cc = tuple(jnp.asarray(c) for c in
               (pw1r, pw1i, pw1s, ptwr, ptwi, w2r, w2i, w2s))

    def kernel(nvalid_ref, raw_ref, w1r_ref, w1i_ref, w1s_ref,
               twr_ref, twi_ref, w2r_ref, w2i_ref, w2s_ref, out_ref):
        pid = pl.program_id(0)
        f32, bf16 = jnp.float32, jnp.bfloat16
        # (T, N1, N2) --swap--> (T, N2, N1) --flat reshape--> (T*Q, P*N1):
        # row (t, q), lane l = p*N1 + n1 with n2 = P*q + p (flat-preserving).
        vt = jnp.swapaxes(raw_ref[:].reshape(T, N1, N2), 1, 2)
        v = vt.reshape(T * Q, P * N1).astype(jnp.int32)
        ar = (v & 0xFF).astype(f32) - 127.0
        ai = (v >> 8).astype(f32) - 127.0
        asum = ar + ai
        def dotp(a, b):
            return jnp.dot(a, b, preferred_element_type=f32)
        def s1(a, w3):
            ab = a.astype(bf16)
            return dotp(ab, w3[0]) + dotp(ab, w3[1]) + dotp(ab, w3[2])
        t1 = s1(ar, w1r_ref); t2 = s1(ai, w1i_ref); t3 = s1(asum, w1s_ref)
        yr = (t1 - t2).reshape(T, Q, P * N1)
        yi = (t3 - t1 - t2).reshape(T, Q, P * N1)
        twrv, twiv = twr_ref[:], twi_ref[:]
        zr = yr * twrv - yi * twiv
        zi = yr * twiv + yi * twrv
        def to2(x):  # (T, Q, (p,k1)) -> (T, k1, q, p) -> (T*N1, N2)
            x4 = x.reshape(T, Q, P, N1)
            return jnp.transpose(x4, (0, 3, 1, 2)).reshape(T * N1, N2)
        zrm, zim = to2(zr), to2(zi)
        zsm = zrm + zim
        def s2(z, w2):
            z0 = z.astype(bf16)
            z1 = (z - z0.astype(f32)).astype(bf16)
            return dotp(z0, w2[0]) + dotp(z0, w2[1]) + dotp(z1, w2[0])
        u1 = s2(zrm, w2r_ref); u2 = s2(zim, w2i_ref); u3 = s2(zsm, w2s_ref)
        xr = u1 - u2; xi = u3 - u1 - u2
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
    const_specs = ([_whole((3, P * N1, P * N1))] * 3
                   + [_whole((Q, P * N1))] * 2 + [_whole((2, N2, N2))] * 3)
    call = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(F // T,),
            in_specs=[pl.BlockSpec((T, N), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM), *const_specs],
            out_specs=pl.BlockSpec((N2, N1), lambda i, *_: (0, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((N2, N1), jnp.float32),
        interpret=False)
    def fn(raw_u16, nv):
        return call(jnp.asarray(nv, jnp.int32).reshape(1),
                    raw_u16, *cc).reshape(N)
    return fn

if "pack8" in sys.argv or len(sys.argv) == 1:
    fn = build_pack8()
    got = np.asarray(fn(raw16, F), dtype=np.float64)
    x = (raw8[:, 0::2].astype(np.float64) - 127.0) + 1j * (raw8[:, 1::2].astype(np.float64) - 127.0)
    want = (np.abs(np.fft.fft(x, axis=1)) ** 2).sum(0)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    print(f"pack8 parity: max_rel={rel.max():.3e}")
    t_lo = timed(fn, ITER_LO); t_hi = timed(fn, ITER_HI)
    per = (t_hi - t_lo) / (ITER_HI - ITER_LO)
    print(f"pack8    tile={TILE_F:3d} per-step {per*1e6:8.1f} us  {F/per*N/1e9:7.3f} GS/s")

# ---- dg3dall: both stages as 3D dot_generals, zero explicit transposes ----
def build_dg3dall(tile_f=TILE_F, s1_terms=3):
    T = tile_f
    cc = tuple(jnp.asarray(c) for c in consts_np)
    # twiddle in (n2, k1) layout already matches stage-1 output (T, n2, k1)

    def kernel(nvalid_ref, raw_ref, w1r_r, w1i_r, w1s_r, twr_r, twi_r,
               w2r_r, w2i_r, w2s_r, out_ref):
        w1r, w1i, w1s = w1r_r[:], w1i_r[:], w1s_r[:]
        twr, twi = twr_r[:], twi_r[:]
        w2r, w2i, w2s = w2r_r[:], w2i_r[:], w2s_r[:]
        pid = pl.program_id(0)
        f32, bf16 = jnp.float32, jnp.bfloat16
        v = raw_ref[:].reshape(T, N1, N2).astype(jnp.int32)
        ar = (v & 0xFF).astype(f32) - 127.0      # (T, n1, n2)
        ai = (v >> 8).astype(f32) - 127.0
        asum = ar + ai
        dn1 = (((1,), (0,)), ((), ()))           # contract n1 -> (T, n2, k1)
        def dg(a, b):
            return jax.lax.dot_general(a, b, dn1,
                                       preferred_element_type=f32)
        def s1(a, w3):
            ab = a.astype(bf16)
            acc = dg(ab, w3[0])
            for j in range(1, s1_terms):
                acc += dg(ab, w3[j])
            return acc
        t1 = s1(ar, w1r); t2 = s1(ai, w1i); t3 = s1(asum, w1s)
        yr = t1 - t2                              # (T, n2, k1)
        yi = t3 - t1 - t2
        zr = yr * twr - yi * twi
        zi = yr * twi + yi * twr
        zs = zr + zi
        def s2(z, w2):
            z0 = z.astype(bf16)
            z1 = (z - z0.astype(f32)).astype(bf16)
            return dg(z0, w2[0]) + dg(z0, w2[1]) + dg(z1, w2[0])
        u1 = s2(zr, w2r); u2 = s2(zi, w2i); u3 = s2(zs, w2s)
        xr = u1 - u2; xi = u3 - u1 - u2           # (T, k1, k2)
        pwr = xr * xr + xi * xi
        base = pid * T
        fidx = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0) + base
        pwr = jnp.where(fidx < nvalid_ref[0], pwr, 0.0)
        s = jnp.sum(pwr, axis=0)                  # (k1, k2)
        @pl.when(pid == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += jnp.swapaxes(s, 0, 1)

    def _whole(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, *_, z=zeros: z,
                            memory_space=pltpu.VMEM)
    const_specs = ([_whole((3, N1, N1))] * 3 + [_whole((N2, N1))] * 2
                   + [_whole((2, N2, N2))] * 3)
    call = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
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

# ---- s1cat: one block-diagonal stage-1 matmul + lane slices ----
def build_s1cat(tile_f=TILE_F):
    T = tile_f
    w1r, w1i, w1s, twr, twi, w2r, w2i, w2s = consts_np
    # B (144, 48): rows 16j..16j+15 within each 48-row input group hold
    # split term j; input groups (ar,ai,as) -> output cols (t1,t2,t3).
    B = np.zeros((9 * N1, 3 * N1), np.float32)
    for g, wk in enumerate((w1r, w1i, w1s)):
        for j in range(3):
            B[(3 * g + j) * N1:(3 * g + j + 1) * N1, g * N1:(g + 1) * N1] = \
                wk[j].astype(np.float32)
    cc = (jnp.asarray(B.astype(_np_bf16())), jnp.asarray(twr),
          jnp.asarray(twi), jnp.asarray(w2r), jnp.asarray(w2i),
          jnp.asarray(w2s))

    def kernel(nvalid_ref, raw_ref, bb_r, twr_r, twi_r,
               w2r_r, w2i_r, w2s_r, out_ref):
        Bb = bb_r[:]
        twrj, twij = twr_r[:], twi_r[:]
        w2rj, w2ij, w2sj = w2r_r[:], w2i_r[:], w2s_r[:]
        pid = pl.program_id(0)
        f32, bf16 = jnp.float32, jnp.bfloat16
        vt = jnp.swapaxes(raw_ref[:].reshape(T, N1, N2), 1, 2)
        v = vt.reshape(T * N2, N1).astype(jnp.int32)
        ar = (v & 0xFF).astype(f32) - 127.0
        ai = (v >> 8).astype(f32) - 127.0
        asum = ar + ai
        arb, aib, asb = ar.astype(bf16), ai.astype(bf16), asum.astype(bf16)
        lhs = jnp.concatenate([arb, arb, arb, aib, aib, aib,
                               asb, asb, asb], axis=1)   # (M, 144)
        t = jnp.dot(lhs, Bb, preferred_element_type=f32)  # (M, 48)
        t1 = t[:, 0:N1]; t2 = t[:, N1:2*N1]; t3 = t[:, 2*N1:3*N1]
        yr = (t1 - t2).reshape(T, N2, N1)
        yi = (t3 - t1 - t2).reshape(T, N2, N1)
        zr = yr * twrj - yi * twij
        zi = yr * twij + yi * twrj
        def to2(x):
            return jnp.swapaxes(x, 1, 2).reshape(T * N1, N2)
        zrm, zim = to2(zr), to2(zi)
        zsm = zrm + zim
        def s2(z, w2):
            z0 = z.astype(bf16)
            z1 = (z - z0.astype(f32)).astype(bf16)
            return (jnp.dot(z0, w2[0], preferred_element_type=f32)
                    + jnp.dot(z0, w2[1], preferred_element_type=f32)
                    + jnp.dot(z1, w2[0], preferred_element_type=f32))
        u1 = s2(zrm, w2rj); u2 = s2(zim, w2ij); u3 = s2(zsm, w2sj)
        xr = u1 - u2; xi = u3 - u1 - u2
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
    const_specs = [_whole((9 * N1, 3 * N1)), _whole((N2, N1)),
                   _whole((N2, N1)), _whole((2, N2, N2)),
                   _whole((2, N2, N2)), _whole((2, N2, N2))]
    call = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
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

def _np_bf16():
    import ml_dtypes
    return ml_dtypes.bfloat16

def check_and_time(name, fn):
    got = np.asarray(fn(raw16, F), dtype=np.float64)
    x = (raw8[:, 0::2].astype(np.float64) - 127.0) + 1j * (raw8[:, 1::2].astype(np.float64) - 127.0)
    want = (np.abs(np.fft.fft(x, axis=1)) ** 2).sum(0)
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    t_lo = timed(fn, ITER_LO); t_hi = timed(fn, ITER_HI)
    per = (t_hi - t_lo) / (ITER_HI - ITER_LO)
    print(f"{name:9s} per-step {per*1e6:8.1f} us  {F/per*N/1e9:7.3f} GS/s  max_rel={rel.max():.2e}")

if "dg3dall" in sys.argv:
    try:
        check_and_time("dg3dall", build_dg3dall())
    except Exception as e:
        print(f"dg3dall FAILED: {str(e)[:150]}")
if "s1cat" in sys.argv:
    try:
        check_and_time("s1cat", build_s1cat())
    except Exception as e:
        print(f"s1cat FAILED: {str(e)[:150]}")

# ---- s1wide: stage-1 as 2 passes with lane-concatenated split weights ----
def build_s1wide(tile_f=TILE_F):
    T = tile_f
    w1r, w1i, w1s, twr, twi, w2r, w2i, w2s = consts_np
    # (16, 96): [w1r_0 w1r_1 w1r_2 w1i_0 w1i_1 w1i_2]
    W1cat = np.concatenate([w1r[0], w1r[1], w1r[2],
                            w1i[0], w1i[1], w1i[2]], axis=1)
    cc = (jnp.asarray(W1cat), jnp.asarray(twr), jnp.asarray(twi),
          jnp.asarray(w2r), jnp.asarray(w2i), jnp.asarray(w2s))

    def kernel(nvalid_ref, raw_ref, w1c_r, twr_r, twi_r,
               w2r_r, w2i_r, w2s_r, out_ref):
        pid = pl.program_id(0)
        f32, bf16 = jnp.float32, jnp.bfloat16
        vt = jnp.swapaxes(raw_ref[:].reshape(T, N1, N2), 1, 2)
        v = vt.reshape(T * N2, N1).astype(jnp.int32)
        ar = (v & 0xFF).astype(f32) - 127.0
        ai = (v >> 8).astype(f32) - 127.0
        W1c = w1c_r[:]
        A = jnp.dot(ar.astype(bf16), W1c, preferred_element_type=f32)
        B = jnp.dot(ai.astype(bf16), W1c, preferred_element_type=f32)
        # column groups: [rr0 rr1 rr2 | ri0 ri1 ri2]
        def g(t, j):
            return t[:, j * N1:(j + 1) * N1]
        ar_w1r = g(A, 0) + g(A, 1) + g(A, 2)
        ar_w1i = g(A, 3) + g(A, 4) + g(A, 5)
        ai_w1r = g(B, 0) + g(B, 1) + g(B, 2)
        ai_w1i = g(B, 3) + g(B, 4) + g(B, 5)
        yr = (ar_w1r - ai_w1i).reshape(T, N2, N1)
        yi = (ar_w1i + ai_w1r).reshape(T, N2, N1)
        twrj, twij = twr_r[:], twi_r[:]
        zr = yr * twrj - yi * twij
        zi = yr * twij + yi * twrj
        def to2(x):
            return jnp.swapaxes(x, 1, 2).reshape(T * N1, N2)
        zrm, zim = to2(zr), to2(zi)
        zsm = zrm + zim
        def s2(z, w2):
            z0 = z.astype(bf16)
            z1 = (z - z0.astype(f32)).astype(bf16)
            return (jnp.dot(z0, w2[0], preferred_element_type=f32)
                    + jnp.dot(z0, w2[1], preferred_element_type=f32)
                    + jnp.dot(z1, w2[0], preferred_element_type=f32))
        u1 = s2(zrm, w2r_r[:]); u2 = s2(zim, w2i_r[:]); u3 = s2(zsm, w2s_r[:])
        xr = u1 - u2; xi = u3 - u1 - u2
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
    const_specs = [_whole((N1, 6 * N1)), _whole((N2, N1)), _whole((N2, N1)),
                   _whole((2, N2, N2)), _whole((2, N2, N2)),
                   _whole((2, N2, N2))]
    call = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
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

if "s1wide" in sys.argv:
    for tf in (128, 256):
        try:
            check_and_time(f"s1wide{tf}", build_s1wide(tf))
        except Exception as e:
            print(f"s1wide{tf} FAILED: {str(e)[:150]}")

# ---- pack8c: lane-packed stage 1 via slice+concat (legal relayouts) ----
def build_pack8c(tile_f=TILE_F):
    T = tile_f
    P = max(1, 128 // N1)
    Q = N2 // P
    w1r, w1i, w1s, twr, twi, w2r, w2i, w2s = consts_np
    eyeP = np.eye(P, dtype=np.float32)
    def packw(wk):  # (k, N1, N1) -> (k, 128, 128) block-diag, lanes (p, n1)
        return np.stack([np.kron(eyeP, t.astype(np.float32)).astype(t.dtype)
                         for t in wk])
    pw1r, pw1i, pw1s = packw(w1r), packw(w1i), packw(w1s)
    # twiddle: twp[q, p*N1+k1] = tw[P*q+p, k1]  (pure host reshape)
    ptwr = np.ascontiguousarray(twr.reshape(Q, P * N1))
    ptwi = np.ascontiguousarray(twi.reshape(Q, P * N1))
    # stage-2 weights with lanes reordered to (p, q): wp[p*Q+q, k2] = w2[P*q+p, k2]
    perm = np.array([P * q + p for p in range(P) for q in range(Q)])
    pw2r = np.ascontiguousarray(w2r[:, perm, :])
    pw2i = np.ascontiguousarray(w2i[:, perm, :])
    pw2s = np.ascontiguousarray(w2s[:, perm, :])
    cc = tuple(jnp.asarray(c) for c in
               (pw1r, pw1i, pw1s, ptwr, ptwi, pw2r, pw2i, pw2s))

    def kernel(nvalid_ref, raw_ref, w1r_r, w1i_r, w1s_r, twr_r, twi_r,
               w2r_r, w2i_r, w2s_r, out_ref):
        pid = pl.program_id(0)
        f32, bf16 = jnp.float32, jnp.bfloat16
        vt = jnp.swapaxes(raw_ref[:].reshape(T, N1, N2), 1, 2)  # (T, n2, n1)
        v4 = jnp.transpose(vt.reshape(T, Q, P, N1), (0, 2, 1, 3))
        u = jnp.concatenate([v4[:, p] for p in range(P)],
                            axis=-1)                    # (T, Q, P*N1) lanes (p,n1)
        v = u.reshape(T * Q, P * N1).astype(jnp.int32)
        ar = (v & 0xFF).astype(f32) - 127.0
        ai = (v >> 8).astype(f32) - 127.0
        asum = ar + ai
        def dotp(a, b):
            return jnp.dot(a, b, preferred_element_type=f32)
        def s1(a, w3):
            ab = a.astype(bf16)
            return dotp(ab, w3[0]) + dotp(ab, w3[1]) + dotp(ab, w3[2])
        t1 = s1(ar, w1r_r); t2 = s1(ai, w1i_r); t3 = s1(asum, w1s_r)
        yr = (t1 - t2).reshape(T, Q, P * N1)   # lanes (p, k1)
        yi = (t3 - t1 - t2).reshape(T, Q, P * N1)
        twrv, twiv = twr_r[:], twi_r[:]
        zr = yr * twrv - yi * twiv
        zi = yr * twiv + yi * twrv
        def to2(x):  # (T, Q, (p,k1)) -> (T*N1, (p,q)) rows (t,k1)
            slices = [jnp.swapaxes(x[:, :, p * N1:(p + 1) * N1], 1, 2)
                      for p in range(P)]     # each (T, N1, Q)
            return jnp.concatenate(slices, axis=-1).reshape(T * N1, N2)
        zrm, zim = to2(zr), to2(zi)
        zsm = zrm + zim
        def s2(z, w2):
            z0 = z.astype(bf16)
            z1 = (z - z0.astype(f32)).astype(bf16)
            return dotp(z0, w2[0]) + dotp(z0, w2[1]) + dotp(z1, w2[0])
        u1 = s2(zrm, w2r_r); u2 = s2(zim, w2i_r); u3 = s2(zsm, w2s_r)
        xr = u1 - u2; xi = u3 - u1 - u2
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
    const_specs = ([_whole((3, P * N1, P * N1))] * 3
                   + [_whole((Q, P * N1))] * 2 + [_whole((2, N2, N2))] * 3)
    call = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
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

if "pack8c" in sys.argv:
    try:
        check_and_time("pack8c", build_pack8c())
    except Exception as e:
        print(f"pack8c FAILED: {str(e)[:3000]}")

# ---- s1kN: stage-1 via K-stacked complex weights, no output slicing ----
def build_s1k(reps, tile_f=TILE_F):
    """reps=1: 6 passes of (M,32)@(32,16); reps=3: 2 passes of (M,96)@(96,16)."""
    T = tile_f
    w1r, w1i, w1s, twr, twi, w2r, w2i, w2s = consts_np
    f32c = lambda a: a.astype(np.float32)
    if reps == 1:
        WR = [np.vstack([f32c(w1r[j]), -f32c(w1i[j])]) for j in range(3)]
        WI = [np.vstack([f32c(w1i[j]), f32c(w1r[j])]) for j in range(3)]
    else:
        WR = [np.vstack(sum(([f32c(w1r[j]), -f32c(w1i[j])] for j in range(3)), []))]
        WI = [np.vstack(sum(([f32c(w1i[j]), f32c(w1r[j])] for j in range(3)), []))]
    bf = _np_bf16()
    WRb = np.stack([w.astype(bf) for w in WR])   # (n_pass, reps*32? , 16)
    WIb = np.stack([w.astype(bf) for w in WI])
    K = WRb.shape[1]
    cc = (jnp.asarray(WRb), jnp.asarray(WIb), jnp.asarray(twr),
          jnp.asarray(twi), jnp.asarray(w2r), jnp.asarray(w2i),
          jnp.asarray(w2s))

    def kernel(nvalid_ref, raw_ref, wr_r, wi_r, twr_r, twi_r,
               w2r_r, w2i_r, w2s_r, out_ref):
        pid = pl.program_id(0)
        f32, bf16 = jnp.float32, jnp.bfloat16
        vt = jnp.swapaxes(raw_ref[:].reshape(T, N1, N2), 1, 2)
        v = vt.reshape(T * N2, N1).astype(jnp.int32)
        ar = ((v & 0xFF).astype(f32) - 127.0).astype(bf16)
        ai = ((v >> 8).astype(f32) - 127.0).astype(bf16)
        pair = [ar, ai] * (K // (2 * N1))
        lhs = jnp.concatenate(pair, axis=1)       # (M, K) bf16
        n_pass = wr_r.shape[0]
        yr = jnp.dot(lhs, wr_r[0], preferred_element_type=f32)
        yi = jnp.dot(lhs, wi_r[0], preferred_element_type=f32)
        for j in range(1, n_pass):
            yr += jnp.dot(lhs, wr_r[j], preferred_element_type=f32)
            yi += jnp.dot(lhs, wi_r[j], preferred_element_type=f32)
        yr = yr.reshape(T, N2, N1)
        yi = yi.reshape(T, N2, N1)
        twrv, twiv = twr_r[:], twi_r[:]
        zr = yr * twrv - yi * twiv
        zi = yr * twiv + yi * twrv
        def to2(x):
            return jnp.swapaxes(x, 1, 2).reshape(T * N1, N2)
        zrm, zim = to2(zr), to2(zi)
        zsm = zrm + zim
        def s2(z, w2):
            z0 = z.astype(bf16)
            z1 = (z - z0.astype(f32)).astype(bf16)
            return (jnp.dot(z0, w2[0], preferred_element_type=f32)
                    + jnp.dot(z0, w2[1], preferred_element_type=f32)
                    + jnp.dot(z1, w2[0], preferred_element_type=f32))
        u1 = s2(zrm, w2r_r); u2 = s2(zim, w2i_r); u3 = s2(zsm, w2s_r)
        xr = u1 - u2; xi = u3 - u1 - u2
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
    n_pass = WRb.shape[0]
    const_specs = [_whole((n_pass, K, N1))] * 2 + [_whole((N2, N1))] * 2 \
        + [_whole((2, N2, N2))] * 3
    call = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
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

if "s1k32" in sys.argv:
    try:
        check_and_time("s1k32", build_s1k(1))
    except Exception as e:
        print(f"s1k32 FAILED: {str(e)[:300]}")
if "s1k96" in sys.argv:
    try:
        check_and_time("s1k96", build_s1k(3))
    except Exception as e:
        print(f"s1k96 FAILED: {str(e)[:300]}")

# ---- best: s1k96 + K-stacked stage 2 (2 dispatches) + direct bf16 dequant ----
def build_best(tile_f=TILE_F, s2_mode="kstack"):
    T = tile_f
    w1r, w1i, w1s, twr, twi, w2r, w2i, w2s = consts_np
    bf = _np_bf16()
    f32c = lambda a: a.astype(np.float32)
    # stage 1: lhs [ar ai]x3 (M, 96); WR -> yr, WI -> yi
    WR = np.vstack(sum(([f32c(w1r[j]), -f32c(w1i[j])] for j in range(3)), []))
    WI = np.vstack(sum(([f32c(w1i[j]), f32c(w1r[j])] for j in range(3)), []))
    # stage 2: lhs [z0r z0r z1r z0i z0i z1i] (M, 768)
    # xr = z@c2r - zi@c2i ; xi = z@c2i + zi@c2r   (z = z0+z1, weights c_0+c_1, drop z1@c_1)
    c2r0, c2r1 = f32c(w2r[0]), f32c(w2r[1])
    c2i0, c2i1 = f32c(w2i[0]), f32c(w2i[1])
    XR = np.vstack([c2r0, c2r1, c2r0, -c2i0, -c2i1, -c2i0])
    XI = np.vstack([c2i0, c2i1, c2i0, c2r0, c2r1, c2r0])
    cc = (jnp.asarray(WR.astype(bf)), jnp.asarray(WI.astype(bf)),
          jnp.asarray(twr), jnp.asarray(twi),
          jnp.asarray(XR.astype(bf)), jnp.asarray(XI.astype(bf)))

    def kernel(nvalid_ref, raw_ref, wr_r, wi_r, twr_r, twi_r,
               xr_r, xi_r, out_ref):
        pid = pl.program_id(0)
        f32, bf16 = jnp.float32, jnp.bfloat16
        vt = jnp.swapaxes(raw_ref[:].reshape(T, N1, N2), 1, 2)
        v = vt.reshape(T * N2, N1).astype(jnp.int32)
        ar = ((v & 0xFF) - 127).astype(bf16)     # exact: integers <= 256
        ai = ((v >> 8) - 127).astype(bf16)
        lhs = jnp.concatenate([ar, ai, ar, ai, ar, ai], axis=1)  # (M, 96)
        yr = jnp.dot(lhs, wr_r[:], preferred_element_type=f32).reshape(T, N2, N1)
        yi = jnp.dot(lhs, wi_r[:], preferred_element_type=f32).reshape(T, N2, N1)
        twrv, twiv = twr_r[:], twi_r[:]
        zr = yr * twrv - yi * twiv
        zi = yr * twiv + yi * twrv
        def to2(x):
            return jnp.swapaxes(x, 1, 2).reshape(T * N1, N2)
        zrm, zim = to2(zr), to2(zi)
        z0r = zrm.astype(bf16)
        z1r = (zrm - z0r.astype(f32)).astype(bf16)
        z0i = zim.astype(bf16)
        z1i = (zim - z0i.astype(f32)).astype(bf16)
        lhs2 = jnp.concatenate([z0r, z0r, z1r, z0i, z0i, z1i], axis=1)
        xr = jnp.dot(lhs2, xr_r[:], preferred_element_type=f32)
        xi = jnp.dot(lhs2, xi_r[:], preferred_element_type=f32)
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
        + [_whole((6 * N2, N2))] * 2
    call = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
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

if "best" in sys.argv:
    for tf in (128, 256):
        try:
            check_and_time(f"best{tf}", build_best(tf))
        except Exception as e:
            print(f"best{tf} FAILED: {str(e)[:300]}")

# ---- v5 line: s1k96 + tweaks ----
def build_v5(tile_f=TILE_F, dequant_bf16=True, s2_mode="kar"):
    T = tile_f
    w1r, w1i, w1s, twr, twi, w2r, w2i, w2s = consts_np
    bf = _np_bf16()
    f32c = lambda a: a.astype(np.float32)
    WR = np.vstack(sum(([f32c(w1r[j]), -f32c(w1i[j])] for j in range(3)), []))
    WI = np.vstack(sum(([f32c(w1i[j]), f32c(w1r[j])] for j in range(3)), []))
    if s2_mode == "left":
        # lhs = c2T (k2, n2) per split term; contracting rhs middle axis
        w2rT = np.stack([np.ascontiguousarray(f32c(w2r[j]).T).astype(bf)
                         for j in range(2)])
        w2iT = np.stack([np.ascontiguousarray(f32c(w2i[j]).T).astype(bf)
                         for j in range(2)])
        w2sT = np.stack([np.ascontiguousarray(f32c(w2s[j]).T).astype(bf)
                         for j in range(2)])
        s2c = (w2rT, w2iT, w2sT)
    else:
        s2c = (w2r, w2i, w2s)
    cc = (jnp.asarray(WR.astype(bf)), jnp.asarray(WI.astype(bf)),
          jnp.asarray(twr), jnp.asarray(twi)) + tuple(jnp.asarray(c) for c in s2c)

    def kernel(nvalid_ref, raw_ref, wr_r, wi_r, twr_r, twi_r,
               w2r_r, w2i_r, w2s_r, out_ref):
        pid = pl.program_id(0)
        f32, bf16 = jnp.float32, jnp.bfloat16
        vt = jnp.swapaxes(raw_ref[:].reshape(T, N1, N2), 1, 2)
        v = vt.reshape(T * N2, N1).astype(jnp.int32)
        if dequant_bf16:
            ar = ((v & 0xFF) - 127).astype(bf16)
            ai = ((v >> 8) - 127).astype(bf16)
        else:
            ar = ((v & 0xFF).astype(f32) - 127.0).astype(bf16)
            ai = ((v >> 8).astype(f32) - 127.0).astype(bf16)
        lhs = jnp.concatenate([ar, ai, ar, ai, ar, ai], axis=1)
        yr = jnp.dot(lhs, wr_r[:], preferred_element_type=f32).reshape(T, N2, N1)
        yi = jnp.dot(lhs, wi_r[:], preferred_element_type=f32).reshape(T, N2, N1)
        twrv, twiv = twr_r[:], twi_r[:]
        zr = yr * twrv - yi * twiv
        zi = yr * twiv + yi * twrv
        if s2_mode == "left":
            zs = zr + zi
            def s2(z, w2T):   # z: (T, N2, N1) f32
                z0 = z.astype(bf16)
                z1 = (z - z0.astype(f32)).astype(bf16)
                dn = (((1,), (1,)), ((), ()))   # contract n2 (lhs ax1 x rhs ax1)
                def dg(w, zz):
                    return jax.lax.dot_general(w, zz, dn,
                                               preferred_element_type=f32)
                return dg(w2T[0], z0) + dg(w2T[1], z0) + dg(w2T[0], z1)
            u1 = s2(zr, w2r_r)   # (k2, T, N1)
            u2 = s2(zi, w2i_r)
            u3 = s2(zs, w2s_r)
            xr = u1 - u2; xi = u3 - u1 - u2
            pwr = xr * xr + xi * xi              # (k2, T, k1)
            base = pid * T
            fidx = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1), 1) + base
            pwr = jnp.where(fidx < nvalid_ref[0], pwr, 0.0)
            partial = jnp.sum(pwr, axis=1)       # (k2, k1) == out layout
        else:
            def to2(x):
                return jnp.swapaxes(x, 1, 2).reshape(T * N1, N2)
            zrm, zim = to2(zr), to2(zi)
            zsm = zrm + zim
            def s2(z, w2):
                z0 = z.astype(bf16)
                z1 = (z - z0.astype(f32)).astype(bf16)
                return (jnp.dot(z0, w2[0], preferred_element_type=f32)
                        + jnp.dot(z0, w2[1], preferred_element_type=f32)
                        + jnp.dot(z1, w2[0], preferred_element_type=f32))
            u1 = s2(zrm, w2r_r); u2 = s2(zim, w2i_r); u3 = s2(zsm, w2s_r)
            xr = u1 - u2; xi = u3 - u1 - u2
            pwr = (xr * xr + xi * xi).reshape(T, N1, N2)
            base = pid * T
            fidx = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0) + base
            pwr = jnp.where(fidx < nvalid_ref[0], pwr, 0.0)
            partial = jnp.swapaxes(jnp.sum(pwr, axis=0), 0, 1)
        @pl.when(pid == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)
        out_ref[:] += partial

    def _whole(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda i, *_, z=zeros: z,
                            memory_space=pltpu.VMEM)
    if s2_mode == "left":
        s2specs = [_whole((2, N2, N2))] * 3
    else:
        s2specs = [_whole((2, N2, N2))] * 3
    const_specs = [_whole((6 * N1, N1))] * 2 + [_whole((N2, N1))] * 2 + s2specs
    call = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
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

for arg in sys.argv:
    if arg == "v5":
        try:
            check_and_time("v5", build_v5())
        except Exception as e:
            print(f"v5 FAILED: {str(e)[:300]}")
    if arg == "v5left":
        try:
            check_and_time("v5left", build_v5(s2_mode="left"))
        except Exception as e:
            print(f"v5left FAILED: {str(e)[:300]}")

# ---- v6: accurate stage-2 (3-term input x 3-term weight, drop ij>=3) ----
def build_v6(tile_f=TILE_F, kstack=False, NN=None, FF=None):
    global N, N1, N2, F, raw16, raw8
    if NN is not None and NN != N:
        N = NN; F = FF
        N1, N2 = _split(N)
        globals()["consts_np"] = _constants(N, N1, N2, 3)
        rng = np.random.default_rng(0)
        raw8_l = rng.integers(0, 256, size=(F, 2 * N), dtype=np.uint8)
        globals()["raw8"] = raw8_l
        globals()["raw16"] = jax.device_put(
            raw8_l.reshape(F, N, 2).view(np.uint16).reshape(F, N))
    T = tile_f
    # production _constants returns the K-stacked stage-1 weights directly
    WRp, WIp, twr, twi, _w2r, _w2i, _w2s = _constants(N, N1, N2, False)
    bf = _np_bf16()
    WR, WI = WRp.astype(np.float32), WIp.astype(np.float32)
    # 3-term stage-2 weight splits
    def terms3(w):
        out, r = [], w.astype(np.float64)
        for _ in range(3):
            t = r.astype(bf); out.append(t.astype(np.float64)); r = r - t
        return [o.astype(bf) for o in out]
    import numpy as _np
    def dft(n):
        a = _np.arange(n, dtype=_np.float64)
        ang = -2.0 * _np.pi * ((_np.outer(a, a)) % n) / n
        return _np.cos(ang), _np.sin(ang)
    c2r64, c2i64 = dft(N2)
    r3 = terms3(c2r64); i3 = terms3(c2i64); s3 = terms3(c2r64 + c2i64)
    if kstack:
        def stackw(t3):
            return np.vstack([t3[0].astype(np.float32), t3[1].astype(np.float32),
                              t3[2].astype(np.float32), t3[0].astype(np.float32),
                              t3[1].astype(np.float32), t3[0].astype(np.float32)]).astype(bf)
        s2c = (stackw(r3), stackw(i3), stackw(s3))
    else:
        s2c = (np.stack(r3), np.stack(i3), np.stack(s3))
    cc = (jnp.asarray(WR.astype(bf)), jnp.asarray(WI.astype(bf)),
          jnp.asarray(twr), jnp.asarray(twi)) + tuple(jnp.asarray(c) for c in s2c)

    def kernel(nvalid_ref, raw_ref, wr_r, wi_r, twr_r, twi_r,
               w2r_r, w2i_r, w2s_r, out_ref):
        pid = pl.program_id(0)
        f32, bf16 = jnp.float32, jnp.bfloat16
        vt = jnp.swapaxes(raw_ref[:].reshape(T, N1, N2), 1, 2)
        v = vt.reshape(T * N2, N1).astype(jnp.int32)
        ar = ((v & 0xFF) - 127).astype(bf16)
        ai = ((v >> 8) - 127).astype(bf16)
        lhs = jnp.concatenate([ar, ai, ar, ai, ar, ai], axis=1)
        yr = jnp.dot(lhs, wr_r[:], preferred_element_type=f32).reshape(T, N2, N1)
        yi = jnp.dot(lhs, wi_r[:], preferred_element_type=f32).reshape(T, N2, N1)
        twrv, twiv = twr_r[:], twi_r[:]
        zr = yr * twrv - yi * twiv
        zi = yr * twiv + yi * twrv
        def to2(x):
            return jnp.swapaxes(x, 1, 2).reshape(T * N1, N2)
        zrm, zim = to2(zr), to2(zi)
        zsm = zrm + zim
        def split3(z):
            z0 = z.astype(bf16)
            r1 = z - z0.astype(f32)
            z1 = r1.astype(bf16)
            z2 = (r1 - z1.astype(f32)).astype(bf16)
            return z0, z1, z2
        if kstack:
            def s2(z, wk):
                z0, z1, z2 = split3(z)
                lhs2 = jnp.concatenate([z0, z0, z0, z1, z1, z2], axis=1)
                return jnp.dot(lhs2, wk[:], preferred_element_type=f32)
        else:
            def s2(z, w3):
                z0, z1, z2 = split3(z)
                return (jnp.dot(z0, w3[0], preferred_element_type=f32)
                        + jnp.dot(z0, w3[1], preferred_element_type=f32)
                        + jnp.dot(z0, w3[2], preferred_element_type=f32)
                        + jnp.dot(z1, w3[0], preferred_element_type=f32)
                        + jnp.dot(z1, w3[1], preferred_element_type=f32)
                        + jnp.dot(z2, w3[0], preferred_element_type=f32))
        u1 = s2(zrm, w2r_r); u2 = s2(zim, w2i_r); u3 = s2(zsm, w2s_r)
        xr = u1 - u2; xi = u3 - u1 - u2
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
    s2spec = _whole((6 * N2, N2)) if kstack else _whole((3, N2, N2))
    const_specs = [_whole((6 * N1, N1))] * 2 + [_whole((N2, N1))] * 2 + [s2spec] * 3
    call = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
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

for arg in sys.argv:
    if arg.startswith("v6"):
        kst = "k" in arg[2:]
        try:
            check_and_time(arg, build_v6(kstack=kst))
        except Exception as e:
            print(f"{arg} FAILED: {str(e)[:300]}")
