"""Throughput vs FFT size for the ROUND-3 auto ladder (the BENCHMARKS
"Throughput vs FFT size" evidence table): every band's shipping path,
same pooled-endpoint slope protocol.

Run on TPU:  python probes/sweep_auto_r3.py [N ...]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.ops.spectral import PsdStep, adapt_batch

ITER_LO, ITER_HI = 16, 48


def path_name(step, N):
    """Best-effort label of the selected auto path."""
    if not step.takes_u16:
        return "matmul/xla(u8)"
    from rtl_power_fftw_tpu.ops.kernels.fused_psd import fused_psd_available
    if (jax.default_backend() == "tpu" and 4096 <= N <= 65536
            and fused_psd_available(N, step.F, windowed=False)):
        return "pallas"
    return "fourstep-family(u16)"


def run(N):
    F = max(8, min(4096, (1 << 23) // N))
    F, _ = adapt_batch(F)
    step = PsdStep(N, F, backend="auto")
    F = step.F
    fn = step.lowered_fn()
    nv = jnp.int32(F)
    rng = np.random.default_rng(0)
    raw_host = rng.integers(0, 256, (F, 2 * N), np.uint8)
    raw = jax.device_put(
        raw_host.view(np.uint16) if step.takes_u16 else raw_host)
    pdt = jnp.uint16 if step.takes_u16 else jnp.uint8

    @partial(jax.jit, static_argnums=1)
    def many(r, it):
        def body(c, i):
            return c + fn(r + i.astype(pdt), nv), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                              jnp.arange(it))
        return acc

    def timed(it, reps=3):
        np.asarray(many(raw, it))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(many(raw, it))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = (ITER_LO, ITER_HI) if N < (1 << 19) else (8, 24)
    t_lo = t_hi = float("inf")
    for _ in range(3):
        t_lo = min(t_lo, timed(lo))
        t_hi = min(t_hi, timed(hi))
    per = (t_hi - t_lo) / (hi - lo)
    print(f"N={N:8d} F={F:4d} {path_name(step, N):22s} "
          f"{per*1e6:8,.0f} us/step  {F*N/per/1e9:6.2f} GS/s", flush=True)


if __name__ == "__main__":
    Ns = [int(a) for a in sys.argv[1:]] or [
        256, 500, 512, 1024, 2048, 3072, 4096, 6144, 8192,
        16384, 65536, 131072, 262144, 1 << 20]
    for N in Ns:
        run(N)
