"""Sweep: production fused kernel vs four-step/XLA across N (real TPU)."""
import sys
sys.path.insert(0, "/root/repo")
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.ops.spectral import PsdStep, adapt_batch
from rtl_power_fftw_tpu.ops.kernels.fused_psd import fused_psd_available

ITER_LO, ITER_HI = 16, 48

def bench_step(step, N, F, raw_host):
    fn = step.lowered_fn()
    nv = jnp.int32(step.F)
    raw = jax.device_put(
        raw_host.view(np.uint16) if step.takes_u16 else raw_host)
    pdt = jnp.uint16 if step.takes_u16 else jnp.uint8
    @partial(jax.jit, static_argnums=1)
    def many(raw, iters):
        def body(c, i):
            return c + fn(raw + i.astype(pdt), nv), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32), jnp.arange(iters))
        return acc
    np.asarray(many(raw, ITER_LO))
    def t(iters):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(many(raw, iters))
            best = min(best, time.perf_counter() - t0)
        return best
    per = (t(ITER_HI) - t(ITER_LO)) / (ITER_HI - ITER_LO)
    return per

for N in (256, 512, 1024, 2048, 4096, 8192, 65536):
    F = max(8, min(4096, (1 << 23) // N))  # ~16MB of IQ per step
    F, _ = adapt_batch(F)
    rng = np.random.default_rng(0)
    raw_host = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    row = f"N={N:6d} F={F:5d}"
    # golden for parity (host float64)
    x = ((raw_host[:, 0::2].astype(np.float64) - 127.0)
         + 1j * (raw_host[:, 1::2].astype(np.float64) - 127.0))
    want = (np.abs(np.fft.fft(x, axis=1)) ** 2).sum(0)
    for backend in ("pallas", "auto", "xla"):
        if backend == "pallas" and not fused_psd_available(N, F):
            row += f"  pallas: n/a"
            continue
        try:
            step = PsdStep(N, F, backend=backend)
            got = np.asarray(step(raw_host, F), dtype=np.float64)
            rel = (np.abs(got - want) / np.maximum(np.abs(want), 1e-30)).max()
            per = bench_step(step, N, F, raw_host)
            gsps = F / per * N / 1e9
            row += f"  {backend}: {gsps:6.2f} GS/s ({rel:.1e})"
        except Exception as e:
            row += f"  {backend}: FAIL {str(e)[:60]}"
    print(row, flush=True)
