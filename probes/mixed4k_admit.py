"""60-seed ADMISSION audit for the mixed4k rung (round-5 ask #2):
exact-integer native-bf16 Karatsuba stage 1 at the MAC-BALANCED split
(N2 ~ sqrt(N*9/24), i.e. N1 ~ 2.7*N2) over the audited fourstep4m tail,
on the unwindowed TPU (8192, 2^18) non-pallas band.

Screens behind this probe (the decision chain):
  probes/mixed4m.py   12-seed, near-square: m4k 5.05 GS/s vs fs4m 4.43,
                      best accuracy of the pool (p99 1.59).
  probes/mixed4m2.py  16-seed, split rebalancing at 2^17: the MAC model
                      (Karatsuba native s1 = 9*N1 MACs/sample, HIGHEST
                      4-mult s2 = 24*N2) says the near-square split
                      spends 2/3 of its executed passes in stage 2;
                      m4kB:512x256 reads 7.99 GS/s (fs4m 4.47) at
                      med 0.92x / p99 1.62. Three-stage tails and
                      K-stacking LOSE at this geometry (x3:128x1024
                      6.52, fs4x-style stack 3.40).

This is the round-4 admission standard (CLAUDE.md): 60 seeds per size,
strict scipy-f32-only yard, per-seed-p99 diagnostic, med <= 1.5x /
max <= 3x. Sizes cover the band's audited cells: 12288 (mid-band),
49152 (the hybrid's 9.36x breach size), 98304 (odd chunk count
3*2^15), 131072 (the ask's headline).

Usage: python probes/mixed4k_admit.py [seeds [N,N,...]]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/probes")

import numpy as np
import jax
import jax.numpy as jnp
import scipy.fft

from rtl_power_fftw_tpu.ops.spectral import PsdStep, adapt_batch
from mixed4m import realization, rel
from mixed4m2 import make_m4k

SEEDS = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
         else 60)
NS = (tuple(int(n) for n in sys.argv[2].split(","))
      if len(sys.argv) > 2 else (12288, 49152, 98304, 131072))
ITER_LO, ITER_HI = 8, 24


def balanced_split(N):
    divs = [d for d in range(2, N) if N % d == 0]
    tgt = int(np.sqrt(N * 9 / 24))
    n2 = min(divs, key=lambda d: abs(d - tgt))
    return N // n2, n2


def main():
    for N in NS:
        F = max(8, min(512, (1 << 23) // N))
        F, chunk = adapt_batch(F)
        N1, N2 = balanced_split(N)
        print(f"N={N} F={F} m4k split {N1}x{N2}", flush=True)

        ship = PsdStep(N, F, backend="fourstep4m")
        m4k = make_m4k(N, F, chunk, N1, N2)
        cands = {
            "fs4m": (lambda r, nv: ship(r, int(nv)), ship.lowered_fn()),
            f"m4kB:{N1}x{N2}": (m4k, m4k),
        }

        errs = {b: [] for b in cands}
        cls_d = []
        for s in range(SEEDS):
            raw = realization(N, F, 3000 + s)
            u16 = raw.view(np.uint16)
            z = (raw[:, 0::2].astype(np.float64) - 127.0) \
                + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
            X = np.fft.fft(z, axis=1)
            want = (X.real ** 2 + X.imag ** 2).sum(0)
            z32 = z.astype(np.complex64)
            Xc = scipy.fft.fft(z32, axis=1)
            cls_d.append(rel((Xc.real.astype(np.float64) ** 2
                              + Xc.imag.astype(np.float64) ** 2).sum(0),
                             want))
            for b, (fn, _) in cands.items():
                errs[b].append(rel(fn(u16, jnp.int32(F)), want))
            if (s + 1) % 20 == 0:
                print(f"  ...{s + 1}/{SEEDS} seeds", flush=True)
        cls_d = np.asarray(cls_d)
        print(f"  scipy class p50={np.median(cls_d):.2e} "
              f"max={cls_d.max():.2e}", flush=True)

        speeds = {}
        for b, (_, fn) in cands.items():
            raw0 = jax.device_put(realization(N, F, 3000).view(np.uint16))

            @partial(jax.jit, static_argnums=1)
            def many(r, it, fn=fn):
                def body(c, i):
                    return c + fn(r + i.astype(jnp.uint16),
                                  jnp.int32(F)), ()
                acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                                      jnp.arange(it))
                return acc

            def timed(it, reps=2):
                np.asarray(many(raw0, it))
                best = float("inf")
                for _ in range(reps):
                    t0 = time.perf_counter()
                    np.asarray(many(raw0, it))
                    best = min(best, time.perf_counter() - t0)
                return best

            t_lo = t_hi = float("inf")
            for _ in range(3):
                t_lo = min(t_lo, timed(ITER_LO))
                t_hi = min(t_hi, timed(ITER_HI))
            per = (t_hi - t_lo) / (ITER_HI - ITER_LO)
            speeds[b] = F * N / per / 1e9 if per > 0 else 0.0

        for b in cands:
            e = np.asarray(errs[b])
            r = e / cls_d
            med_r = np.median(e) / np.median(cls_d)
            max_r = e.max() / cls_d.max()
            ok = med_r <= 1.5 and max_r <= 3.0
            print(f"  {b:14s} {speeds[b]:6.2f} GS/s  "
                  f"med={med_r:.2f}x(<=1.5) max={max_r:.2f}x(<=3) "
                  f"per-seed p99={np.quantile(r, 0.99):.2f} "
                  f"max={r.max():.2f} {'PASS' if ok else 'FAIL'}",
                  flush=True)


if __name__ == "__main__":
    main()
