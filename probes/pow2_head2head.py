"""Pow-2 band head-to-head (round 3): the fused Pallas kernel vs the
u16-view HIGHEST matmul four-step vs the hybrid, same F, same protocol.

Motivation: the round-2 ladder gave pallas 4096-131072 based on
"alternatives 8.3-9.4 GS/s" — but those alternatives predated the
host-side u16-view input for the four-step family. The round-3 mid-band
probe then measured the plain four-step at 15.5 GS/s at N=8192 (F=512),
ABOVE the kernel's 13.8, with a better adversarial tail (1.58x vs 1.88x
class over 30 seeds). Re-decide the band on same-F evidence.

Run on TPU:  python probes/pow2_head2head.py [N ...]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.ops.spectral import PsdStep, adapt_batch
from probes.hybrid_large import make_tone_raw, want64, relerr

ITER_LO, ITER_HI = 16, 48


def run(N, F, backends):
    F, _ = adapt_batch(F)
    raw_t = make_tone_raw(N, F)
    want_t = want64(raw_t, N)
    for backend in backends:
        try:
            step = PsdStep(N, F, backend=backend)
        except ValueError as e:
            print(f"N={N} F={F} {backend:9s} unavailable: {e}", flush=True)
            continue
        fn = step.lowered_fn()
        nv = jnp.int32(F)
        raw_in = raw_t.view(np.uint16) if step.takes_u16 else raw_t
        pdt = jnp.uint16 if step.takes_u16 else jnp.uint8
        got = np.asarray(step(raw_t, F), np.float64)
        err = relerr(got, want_t)
        raw_dev = jax.device_put(raw_in)

        @partial(jax.jit, static_argnums=1)
        def many(raw, it, fn=fn, pdt=pdt):
            def body(c, i):
                return c + fn(raw + i.astype(pdt), nv), ()
            acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                                  jnp.arange(it))
            return acc

        def timed(it, reps=3):
            np.asarray(many(raw_dev, it))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(many(raw_dev, it))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo = t_hi = float("inf")
        for _ in range(3):
            t_lo = min(t_lo, timed(ITER_LO))
            t_hi = min(t_hi, timed(ITER_HI))
        per = (t_hi - t_lo) / (ITER_HI - ITER_LO)
        print(f"N={N:6d} F={F:4d} {backend:9s} tone={err:.2e}  "
              f"{F * N / per / 1e9:6.2f} GS/s", flush=True)


if __name__ == "__main__":
    Ns = [int(a) for a in sys.argv[1:]]
    if Ns:
        for N in Ns:
            run(N, (1 << 23) // N, ["pallas", "fourstep"])
    else:
        run(4096, 1024, ["pallas", "fourstep"])
        run(8192, 512, ["pallas", "fourstep"])
        run(16384, 256, ["pallas", "fourstep"])
        run(65536, 128, ["pallas", "fourstep", "hybrid"])
        run(131072, 64, ["pallas", "fourstep", "hybrid"])
