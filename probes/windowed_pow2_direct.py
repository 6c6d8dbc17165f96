"""Windowed pow-2 upper band: DIRECT hybrid/fourstep vs the pallas kernel.

The round-3 windowed ladder shipped the fused kernel at pow-2
8192-65536 from head-to-heads where the 16384/65536 alternatives were
the FOLDED (dead-end) variants only (probes/windowed_fold.py table) —
the direct time-domain-multiply hybrid and four-step were never
measured there. This probe closes that: per backend, slope-method
throughput (pooled endpoints) + a 30-seed adversarial 35 dB-tone
distribution vs the WINDOWED scipy-f32 class on the same realizations.

MEASURED (v5e): at 16384 the kernel wins (13.0 vs four-step 12.5,
p50 1.41 vs 1.72), at 32768 the kernel wins (8.7 vs 7.3), at 65536 the
four-step wins BOTH axes over 3 isolated runs (6.9-8.2 GS/s max 3.23x
vs the kernel's 5.5-7.3 max 4.29x) → windowed kernel band top = 32768.
Late follow-up at 2^20 windowed (20 seeds, F=8): fourstep 1.89 GS/s
p50 1.35 max 2.68; hybrid 6.77 p50 1.57 max 4.51; fft4 4.39 p50 2.95
max 6.19 — per-realization ratios vs the scipy class; the
budget-grade distribution comparison for the very-large-N windowed
band decision lives in probes/windowed_large_dist.py.

Run on TPU:  python probes/windowed_pow2_direct.py [seeds] [N,N,...]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import scipy.fft

from rtl_power_fftw_tpu.auxdata import make_window
from rtl_power_fftw_tpu.ops.spectral import PsdStep, adapt_batch

SEEDS = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
         else 30)
NS = (tuple(int(n) for n in sys.argv[2].split(","))
      if len(sys.argv) > 2 else (16384, 65536))
ITER_LO, ITER_HI = 8, 24


def realization(N, F, seed):
    rng = np.random.default_rng(seed)
    f0 = rng.uniform(0.05, 0.45)
    ph = rng.uniform(0, 2 * np.pi)
    t = np.arange(F * N)
    x = 100.0 * np.exp(1j * (2 * np.pi * f0 * t + ph)) + (
        rng.standard_normal(F * N) + 1j * rng.standard_normal(F * N))
    re8 = np.clip(np.round(x.real + 127), 0, 255).astype(np.uint8)
    im8 = np.clip(np.round(x.imag + 127), 0, 255).astype(np.uint8)
    return np.stack([re8, im8], axis=-1).reshape(F, 2 * N)


def rel(got, want):
    return float((np.abs(np.asarray(got, np.float64) - want)
                  / np.maximum(np.abs(want), 1e-30)).max())


def truth_and_class(raw, w):
    z64 = ((raw[:, 0::2].astype(np.float64) - 127.0)
           + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)) * w
    want = (np.abs(np.fft.fft(z64, axis=1)) ** 2).sum(0)
    w32 = w.astype(np.float32)
    z32 = (((raw[:, 0::2].astype(np.float32) - np.float32(127.0))
            + 1j * (raw[:, 1::2].astype(np.float32) - np.float32(127.0)))
           * w32).astype(np.complex64)
    X = scipy.fft.fft(z32, axis=1)
    cls = (X.real.astype(np.float64) ** 2
           + X.imag.astype(np.float64) ** 2).sum(0)
    return want, rel(cls, want)


def main():
    for N in NS:
        F = max(8, min(512, (1 << 23) // N))
        F, _ = adapt_batch(F)
        w = make_window("hann", N)
        # Precompute realizations + truths once per N, shared across
        # backends so ratios compare on identical inputs.
        rs = [realization(N, F, 1000 + s) for s in range(SEEDS)]
        tc = [truth_and_class(r, w) for r in rs]
        for backend in ("pallas", "fourstep", "hybrid", "fft4"):
            try:
                step = PsdStep(N, F, window=w, backend=backend)
            except Exception as e:
                print(f"N={N} {backend}: unavailable ({str(e)[:60]})",
                      flush=True)
                continue
            fn = step.lowered_fn()
            nv = jnp.int32(step.F)
            raw0 = rs[0]
            dev_raw = jax.device_put(
                raw0.view(np.uint16) if step.takes_u16 else raw0)
            pdt = jnp.uint16 if step.takes_u16 else jnp.uint8

            @partial(jax.jit, static_argnums=1)
            def many(raw, iters, fn=fn, nv=nv, pdt=pdt, N=N):
                def body(c, i):
                    return c + fn(raw + i.astype(pdt), nv), ()
                acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                                      jnp.arange(iters))
                return acc

            def timed(iters, reps=2):
                np.asarray(many(dev_raw, iters))
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    np.asarray(many(dev_raw, iters))
                    best = min(best, time.perf_counter() - t0)
                return best

            t_lo = t_hi = float("inf")
            for _ in range(3):
                t_lo = min(t_lo, timed(ITER_LO))
                t_hi = min(t_hi, timed(ITER_HI))
            per = (t_hi - t_lo) / (ITER_HI - ITER_LO)
            gsps = F / per * N / 1e9

            ratio = []
            for r, (want, cerr) in zip(rs, tc):
                e = rel(step(r, F), want)
                ratio.append(e / cerr)
            ratio = np.asarray(ratio)
            print(f"N={N:6d} {backend:9s} {gsps:6.2f} GS/s  "
                  f"ratio p50={np.percentile(ratio, 50):.2f} "
                  f"max={ratio.max():.2f}", flush=True)


if __name__ == "__main__":
    main()
