"""Probe: compiled fused-Pallas kernel vs the shipping four-step path.

Run on the real TPU (default platform). Slope-method timing identical to
bench.py. Also checks compiled-kernel parity against float64 golden.
Diagnostics to stderr, one summary line per backend to stdout.
"""
import sys
sys.path.insert(0, "/root/repo")
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
F = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
ITER_LO, ITER_HI = 32, 128

dev = jax.devices()[0]
print(f"device: {dev} ({dev.platform})  N={N} F={F}", file=sys.stderr)

rng = np.random.default_rng(0)
raw8 = rng.integers(0, 256, size=(F, 2 * N), dtype=np.uint8)
raw16 = jax.device_put(raw8.reshape(F, N, 2).view(np.uint16).reshape(F, N))
raw8d = jax.device_put(raw8)

from rtl_power_fftw_tpu.ops.dft import fourstep_psd_partial
from rtl_power_fftw_tpu.ops.spectral import dequant_iq
from rtl_power_fftw_tpu.ops.kernels.fused_psd import make_fused_psd_fn

fused = make_fused_psd_fn(N, F, windowed=False, interpret=False)


@partial(jax.jit, static_argnums=1)
def many_pallas(raw, iters):
    def body(carry, i):
        part = fused(raw + i.astype(jnp.uint16), jnp.int32(F))
        return carry + part, ()
    acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32), jnp.arange(iters))
    return acc


@partial(jax.jit, static_argnums=1)
def many_fourstep(raw, iters):
    def body(carry, i):
        re, im = dequant_iq(raw + i.astype(jnp.uint8), F, N)
        part = fourstep_psd_partial(re, im, jnp.ones((F,), jnp.float32))
        return carry + part, ()
    acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32), jnp.arange(iters))
    return acc


def timed(fn, raw, iters, reps=3):
    np.asarray(fn(raw, iters))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(raw, iters))
        best = min(best, time.perf_counter() - t0)
    return best


# Parity first (single step vs float64 golden).
got = np.asarray(fused(raw16, jnp.int32(F)), dtype=np.float64)
x = (raw8[:, 0::2].astype(np.float64) - 127.0) + 1j * (raw8[:, 1::2].astype(np.float64) - 127.0)
want = (np.abs(np.fft.fft(x, axis=1)) ** 2).sum(0)
rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
print(f"pallas compiled parity: max_rel={rel.max():.3e}", file=sys.stderr)

for name, fn, raw in (("pallas", many_pallas, raw16),
                      ("fourstep", many_fourstep, raw8d)):
    t_lo = timed(fn, raw, ITER_LO)
    t_hi = timed(fn, raw, ITER_HI)
    per_step = (t_hi - t_lo) / (ITER_HI - ITER_LO)
    gsps = F / per_step * N / 1e9
    print(f"{name:9s} per-step {per_step*1e6:8.1f} us  {gsps:7.3f} GS/s")
