"""Windowed session-band speed: fourstep vs fourstep4m at 512-8192.

Companion to probes/windowed_tail_audit.py (accuracy): the audit showed
the compensated four-step roughly HALVES the windowed session sizes'
distance to the strict scipy-only class (fourstep med 1.8-3.4x ->
fs4m 0.9-2.1x); this probe prices the swap. Slope protocol, same frame
policy as the band tables.

Run on TPU:  python probes/windowed_small_speed.py [N,N,...]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.auxdata import make_window
from rtl_power_fftw_tpu.ops.spectral import PsdStep, adapt_batch

NS = (tuple(int(n) for n in sys.argv[1].split(","))
      if len(sys.argv) > 1 else (512, 1024, 2048, 3072, 4096))
ITER_LO, ITER_HI = 16, 48


def main():
    for N in NS:
        F = max(8, min(512, (1 << 23) // N))
        F, _ = adapt_batch(F)
        w = make_window("hann", N)
        rng = np.random.default_rng(0)
        raw0 = rng.integers(0, 256, (F, 2 * N), np.uint8)
        row = []
        for backend in ("fourstep", "fourstep4m"):
            st = PsdStep(N, F, window=w, backend=backend)
            fn = st.lowered_fn()
            dev = jax.device_put(raw0.view(np.uint16))

            @partial(jax.jit, static_argnums=1)
            def many(r, it, fn=fn):
                def body(c, i):
                    return c + fn(r + i.astype(jnp.uint16),
                                  jnp.int32(F)), ()
                acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                                      jnp.arange(it))
                return acc

            def timed(it, reps=3):
                np.asarray(many(dev, it))
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    np.asarray(many(dev, it))
                    best = min(best, time.perf_counter() - t0)
                return best

            t_lo = t_hi = float("inf")
            for _ in range(3):
                t_lo = min(t_lo, timed(ITER_LO))
                t_hi = min(t_hi, timed(ITER_HI))
            per = (t_hi - t_lo) / (ITER_HI - ITER_LO)
            gsps = F * N / per / 1e9 if per > 0 else 0.0
            row.append(f"{backend} {per*1e6:6.0f} us {gsps:5.2f} GS/s")
        print(f"N={N} windowed: " + " | ".join(row), flush=True)


if __name__ == "__main__":
    main()
