"""Crossover sweep: monolithic XLA FFT vs the two-level FFT four-step
(ops/dft.py fourstep_fft_psd_partial) vs the fused Pallas kernel, at
large N. Decides the auto-backend rule for the very-large-N modes.

Run on TPU: python probes/fftfourstep_sweep.py
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.ops.dft import (best_fourstep_split,
                                        fourstep_fft_psd_partial)
from rtl_power_fftw_tpu.ops.spectral import PsdStep, adapt_batch, dequant_iq
from rtl_power_fftw_tpu.ops.kernels.fused_psd import fused_psd_available

ITER_LO, ITER_HI = 8, 24


def slope(many, raw, reps=3):
    def t(iters):
        np.asarray(many(raw, iters))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(many(raw, iters))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(ITER_HI) - t(ITER_LO)) / (ITER_HI - ITER_LO)


for N in (1 << 16, 1 << 17, 1 << 18, 1 << 19, 1 << 20, 3 << 17):
    F = max(8, min(256, (1 << 23) // N))
    F, chunk = adapt_batch(F)
    rng = np.random.default_rng(0)
    raw_host = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    x = ((raw_host[:, 0::2].astype(np.float64) - 127.0)
         + 1j * (raw_host[:, 1::2].astype(np.float64) - 127.0))
    want = (np.abs(np.fft.fft(x, axis=1)) ** 2).sum(0)
    row = f"N={N:8d} F={F:3d}"

    # --- monolithic XLA ---
    step = PsdStep(N, F, backend="xla")
    raw = jax.device_put(raw_host)
    nv = jnp.int32(F)
    fn = step.lowered_fn()

    @partial(jax.jit, static_argnums=1)
    def many_x(raw, it, fn=fn, N=N):
        def body(c, i):
            return c + fn(raw + i.astype(jnp.uint8), nv), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                              jnp.arange(it))
        return acc
    got = np.asarray(step(raw_host, F), dtype=np.float64)
    rel = (np.abs(got - want) / np.maximum(np.abs(want), 1e-30)).max()
    p = slope(many_x, raw)
    row += f"  xla: {F*N/p/1e9:6.2f} GS/s ({rel:.1e})"

    # --- FFT four-step ---
    N1, N2 = best_fourstep_split(N)

    @jax.jit
    def ffs(raw, nv, N=N, F=F, N1=N1, N2=N2, chunk=chunk):
        re, im = dequant_iq(raw, F, N, None)
        fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                 < nv).astype(jnp.float32)
        return fourstep_fft_psd_partial(re, im, fmask, N1, N2, chunk=chunk)

    @partial(jax.jit, static_argnums=1)
    def many_f(raw, it, N=N):
        def body(c, i):
            return c + ffs(raw + i.astype(jnp.uint8), nv), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                              jnp.arange(it))
        return acc
    got = np.asarray(ffs(raw, nv), dtype=np.float64)
    rel = (np.abs(got - want) / np.maximum(np.abs(want), 1e-30)).max()
    p = slope(many_f, raw)
    row += f"  fft4: {F*N/p/1e9:6.2f} GS/s ({rel:.1e}) [{N1}x{N2}]"

    # --- fused pallas (where eligible) ---
    if fused_psd_available(N, F):
        stepp = PsdStep(N, F, backend="pallas")
        fnp = stepp.lowered_fn()
        rawp = jax.device_put(raw_host.view(np.uint16))

        @partial(jax.jit, static_argnums=1)
        def many_p(raw, it, fnp=fnp, N=N):
            def body(c, i):
                return c + fnp(raw + i.astype(jnp.uint16), nv), ()
            acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                                  jnp.arange(it))
            return acc
        p = slope(many_p, rawp)
        row += f"  pallas: {F*N/p/1e9:6.2f} GS/s"
    print(row, flush=True)
