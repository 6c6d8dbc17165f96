"""Headline-band split sweep: does the hybrid at N=2048 (and 1024/512)
prefer a different (N1, N2) than best_fourstep_split's near-square one?

Stage 1 is a batched length-N1 FFT (cheap, integer inputs), stage 2 an
f32-faithful matmul contracting K=N2 (6 bf16 passes per product at
HIGHEST). Smaller N2 = fewer MXU FLOPs but a longer stage-1 FFT and a
relatively fatter twiddle; the optimum is empirical.

Run on TPU:  python probes/hybrid2048_splits.py
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.ops.dft import fourstep_hybrid_psd_partial
from probes.hybrid_large import make_tone_raw, want64, relerr

ITER_LO, ITER_HI = 16, 64


def run(N, F, splits):
    raw_t = make_tone_raw(N, F)
    want_t = want64(raw_t, N)
    fmask = np.ones(F, np.float32)
    for n1, n2 in splits:
        assert n1 * n2 == N
        core = jax.jit(partial(fourstep_hybrid_psd_partial,
                               N1=n1, N2=n2, chunk=64))

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

        per = float("inf")
        for _ in range(3):
            s = (timed(ITER_HI) - timed(ITER_LO)) / (ITER_HI - ITER_LO)
            if s > 0:
                per = min(per, s)
        print(f"N={N} F={F} ({n1:4d}x{n2:4d})  tone={err:.2e}  "
              f"{F * N / per / 1e9:6.2f} GS/s", flush=True)


if __name__ == "__main__":
    run(2048, 4096, [(32, 64), (64, 32), (16, 128), (128, 16), (8, 256)])
    run(1024, 4096, [(32, 32), (16, 64), (8, 128), (64, 16)])
