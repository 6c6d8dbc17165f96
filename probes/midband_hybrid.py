"""Mid-band (3072 < N <= 8192, non-pallas shapes) head-to-head:
matmul four-step vs hybrid. Outcome (round 3, TPU): the four-step
KEEPS the band — 12.5-15.5 GS/s and a 1.58x-class 30-seed tail vs the
near-square hybrid's 2.7x / 10.1-13.5 GS/s.

Re-checked after the lane-matched split landed (the original decision
predated it): at N=6144 the lane-matched hybrid (48x128) reads
12.73 GS/s vs the fourstep's 11.18 same-sweep (+14%), but its 30-seed
adversarial tail is 1.67e-4 = 2.69x the class max vs the fourstep's
1.36x (probes/tone_distribution.py run, seeds=30) — same 2.7x-class
tail as near-square, too close to the 3x budget ceiling to ship for a
14% edge. At N=5000 the two tie on tail (0.86x vs 0.84x class).
Decision: mid-band auto stays on the matmul four-step.

Run on TPU:  python probes/midband_hybrid.py
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.ops.dft import (best_fourstep_split,
                                        fourstep_hybrid_psd_partial,
                                        fourstep_psd_partial)
from probes.hybrid_large import make_tone_raw, want64, relerr

ITER_LO, ITER_HI = 16, 48


def run(N, F):
    raw_t = make_tone_raw(N, F)
    want_t = want64(raw_t, N)
    fmask = np.ones(F, np.float32)
    n1, n2 = best_fourstep_split(N)
    for name, fn in (("fourstep", fourstep_psd_partial),
                     ("hybrid", fourstep_hybrid_psd_partial)):
        core = jax.jit(partial(fn, N1=n1, N2=n2, chunk=64))

        def from_u16(raw16):
            v = raw16.astype(jnp.int32)
            re = ((v & 0xFF) - 127).astype(jnp.float32)
            im = ((v >> 8) - 127).astype(jnp.float32)
            return core(re, im, jnp.asarray(fmask))

        got = np.asarray(jax.jit(from_u16)(raw_t.view(np.uint16)),
                         np.float64)
        err = relerr(got, want_t)
        raw_dev = jax.device_put(raw_t.view(np.uint16))

        @partial(jax.jit, static_argnums=1)
        def many(raw, it):
            def body(c, i):
                return c + from_u16(raw + i.astype(jnp.uint16)), ()
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
        print(f"N={N} F={F} {name:9s} ({n1}x{n2})  tone={err:.2e}  "
              f"{F * N / per / 1e9:6.2f} GS/s", flush=True)


if __name__ == "__main__":
    run(6144, 512)
    run(8192, 512)
    run(4096, 1024)
