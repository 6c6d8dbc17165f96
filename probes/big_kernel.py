"""Prototype: VMEM-resident 3-level 1M-point PSD kernel (1 frame/grid step)."""
import sys
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtl_power_fftw_tpu.ops.dft import _threestep_constants, best_threestep_split

N = 1 << 20
F = 8
A, B, C = best_threestep_split(N)   # (128, 128, 64)
import ml_dtypes
bf = ml_dtypes.bfloat16

(wa_r, wa_i, wa_s, t1c, t1s, wb_r, wb_i, wb_s, t2c, t2s,
 wc_r, wc_i, wc_s) = _threestep_constants(N, A, B, C)

# K-stacked weights. Stage A (exact): lhs rows [xr xi xr xi xr xi] (6A, BC);
# weights WR = rows [r0 -i0 r1 -i1 r2 -i2] etc -> but contraction axis 0:
# dot_general(lhs (6A, BC), W (6A, A), contract ((0,),(0,))) -> (BC, A)
def kstack_exact(w3r, w3i):
    r = [t.astype(np.float32) for t in w3r]
    i = [t.astype(np.float32) for t in w3i]
    WR = np.vstack([m for j in range(3) for m in (r[j], -i[j])])
    WI = np.vstack([m for j in range(3) for m in (i[j], r[j])])
    return WR.astype(bf), WI.astype(bf)

# Inexact stages: lhs rows [z0r z0i  z0r z0i  z0r z0i  z1r z1i  z1r z1i  z2r z2i]
# weight term order per block: (0,1,2,0,1,0)
def kstack_split(w3r, w3i):
    r = [t.astype(np.float32) for t in w3r]
    i = [t.astype(np.float32) for t in w3i]
    order = (0, 1, 2, 0, 1, 0)
    WR = np.vstack([m for j in order for m in (r[j], -i[j])])
    WI = np.vstack([m for j in order for m in (i[j], r[j])])
    return WR.astype(bf), WI.astype(bf)

WAr, WAi = kstack_exact(wa_r, wa_i)          # (6A, A)
WBr, WBi = kstack_split(wb_r, wb_i)          # (12B, B)
WCr, WCi = kstack_split(wc_r, wc_i)          # (12C, C)
# twiddles in the stage output layouts
T1c = t1c.reshape(B * C, A)                  # ((b,c), k1)
T1s = t1s.reshape(B * C, A)
# t2[c, k2] -> layout ((c,k1), k2): repeat each c-row A times
T2c = np.repeat(t2c, A, axis=0)              # (C*A, B)
T2s = np.repeat(t2s, A, axis=0)

consts = tuple(jnp.asarray(x) for x in
               (WAr, WAi, WBr, WBi, WCr, WCi, T1c, T1s, T2c, T2s))

def kernel(nvalid_ref, raw_ref, war, wai, wbr, wbi, wcr, wci,
           t1cr, t1sr, t2cr, t2sr, out_ref):
    pid = pl.program_id(0)
    f32, bf16 = jnp.float32, jnp.bfloat16
    dn0 = (((0,), (0,)), ((), ()))

    v = raw_ref[:].astype(jnp.int32)                     # (A, BC): n = a*BC + (b*C+c)
    ar = ((v & 0xFF) - 127).astype(bf16)
    ai = ((v >> 8) - 127).astype(bf16)
    lhs = jnp.concatenate([ar, ai, ar, ai, ar, ai], axis=0)   # (6A, BC)
    def dot(a, b):
        return jax.lax.dot_general(a, b, dn0, preferred_element_type=f32)
    yr = dot(lhs, war[:])        # (BC, A)
    yi = dot(lhs, wai[:])
    zr = yr * t1cr[:] - yi * t1sr[:]
    zi = yr * t1sr[:] + yi * t1cr[:]

    def trunc3(z):
        u = jax.lax.bitcast_convert_type(z, jnp.uint32)
        z0 = jax.lax.bitcast_convert_type(u & np.uint32(0xFFFF0000), f32)
        r1 = z - z0
        u1 = jax.lax.bitcast_convert_type(r1, jnp.uint32)
        z1 = jax.lax.bitcast_convert_type(u1 & np.uint32(0xFFFF0000), f32)
        z2 = r1 - z1
        return z0.astype(jnp.bfloat16), z1.astype(jnp.bfloat16), z2.astype(jnp.bfloat16)

    # Stage B: contract b. View ((b,c), k1) -> (B, C*A)
    def stage(zr, zi, wr, wi, view, K):
        zr_v = zr.reshape(view)       # (K, rest)
        zi_v = zi.reshape(view)
        z0r, z1r, z2r = trunc3(zr_v)
        z0i, z1i, z2i = trunc3(zi_v)
        lhs = jnp.concatenate([z0r, z0i, z0r, z0i, z0r, z0i,
                               z1r, z1i, z1r, z1i, z2r, z2i], axis=0)  # (12K, rest)
        return dot(lhs, wr[:]), dot(lhs, wi[:])   # (rest, K)

    yr, yi = stage(zr, zi, wbr, wbi, (B, C * A), B)   # (C*A, B) = ((c,k1), k2)
    zr = yr * t2cr[:] - yi * t2sr[:]
    zi = yr * t2sr[:] + yi * t2cr[:]

    yr, yi = stage(zr, zi, wcr, wci, (C, A * B), C)   # (A*B, C) = ((k1,k2), k3)
    pwr = yr * yr + yi * yi

    pwr = jnp.where(pid < nvalid_ref[0], pwr, 0.0)
    @pl.when(pid == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[:] += pwr

def _whole(shape):
    zeros = (0,) * len(shape)
    return pl.BlockSpec(shape, lambda i, *_, z=zeros: z,
                        memory_space=pltpu.VMEM)

call = pl.pallas_call(
    kernel,
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(F,),
        in_specs=[pl.BlockSpec((A, B * C), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
                  _whole((6 * A, A)), _whole((6 * A, A)),
                  _whole((12 * B, B)), _whole((12 * B, B)),
                  _whole((12 * C, C)), _whole((12 * C, C)),
                  _whole((B * C, A)), _whole((B * C, A)),
                  _whole((C * A, B)), _whole((C * A, B))],
        out_specs=pl.BlockSpec((A * B, C), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((A * B, C), jnp.float32),
    interpret=False)

def fused_big(raw16, nv):
    # free HBM reshape: (F, N) -> (F*A, B*C) so each grid step's block is
    # one frame viewed as the (A, BC) stage-A matrix
    raw_v = raw16.reshape(F * A, B * C)
    out = call(jnp.asarray(nv, jnp.int32).reshape(1), raw_v, *consts)
    # bins k = k1 + A*k2 + A*B*k3: out ((k1,k2), k3) -> (k3, k2, k1) flat
    return jnp.transpose(out.reshape(A, B, C), (2, 1, 0)).reshape(N)

rng = np.random.default_rng(0)
raw8 = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
raw16 = jax.device_put(raw8.reshape(F, N, 2).view(np.uint16).reshape(F, N))

x = ((raw8[:, 0::2].astype(np.float64) - 127.0)
     + 1j * (raw8[:, 1::2].astype(np.float64) - 127.0))
want = (np.abs(np.fft.fft(x, axis=1)) ** 2).sum(0)
got = np.asarray(jax.jit(fused_big, static_argnums=1)(raw16, F), dtype=np.float64)
rel = (np.abs(got - want) / np.maximum(np.abs(want), 1e-30)).max()
print(f"parity max_rel={rel:.3e}", flush=True)

@partial(jax.jit, static_argnums=1)
def many(raw, iters):
    def body(c, i):
        return c + fused_big(raw + i.astype(jnp.uint16), F), ()
    acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32), jnp.arange(iters))
    return acc

def t(iters):
    np.asarray(many(raw16, iters))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(many(raw16, iters))
        best = min(best, time.perf_counter() - t0)
    return best
per = (t(16) - t(4)) / 12
print(f"per-step {per*1e6:8.1f} us  {F/per*N/1e9:6.2f} GS/s", flush=True)
