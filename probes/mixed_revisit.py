"""Mixed-precision (manual native-bf16) four-step REVISIT on the current
toolchain.

Round-2 measured fourstep_psd_partial_mixed at 1.31 GS/s at 2^20 and
2x SLOWER than Precision.HIGHEST at 2048/8192 — on the OLD toolchain.
In round 4 the same probe (bench_1m.py) read the SAME function at
10.5 GS/s at 2^20: the toolchain that regressed the monolithic FFT
apparently also rewrote the native-bf16 dot lowering ~8x faster. If
that holds under the house protocol, the unwindowed large-N band (and
possibly the mid-band) should be re-decided.

Candidates per N, identical realizations (35 dB tone + unit noise),
yard = scipy-f32 class, budget med <= 1.5x / max <= 3x:

  auto     the shipping PsdStep (hybrid / pallas band pick)
  mixed2   fourstep_psd_partial_mixed (near-square split, exact-integer
           bf16 stage 1, 3-term truncation stage 2) on the u16 view
  mixed3   threestep_psd_partial_mixed (N = A*B*C ~ 128-wide stages)
           where a 3-factor split exists

Run on TPU:  python probes/mixed_revisit.py [seeds [N,N,...]]
Defaults: 20 seeds, N = 2048, 8192, 2^17, 2^20.
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import scipy.fft

from rtl_power_fftw_tpu.ops.spectral import PsdStep, adapt_batch, dequant_iq_u16
from rtl_power_fftw_tpu.ops.dft import (best_threestep_split,
                                        fourstep_psd_partial_mixed,
                                        threestep_psd_partial_mixed)

SEEDS = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
         else 20)
NS = (tuple(int(n) for n in sys.argv[2].split(","))
      if len(sys.argv) > 2 else (2048, 8192, 1 << 17, 1 << 20))
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


def main():
    for N in NS:
        F = max(8, min(512, (1 << 23) // N))
        F, chunk = adapt_batch(F)

        ship = PsdStep(N, F, backend="auto")
        steps = {"auto": (lambda r, nv, s=ship: s(r, int(nv)))}
        lowered = {"auto": ship.lowered_fn()}

        @jax.jit
        def mixed2(raw16, nv):
            re, im = dequant_iq_u16(raw16)
            fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                     < nv).astype(jnp.float32)
            return fourstep_psd_partial_mixed(re, im, fmask, chunk=chunk)

        steps["mixed2"] = mixed2
        lowered["mixed2"] = mixed2

        A, B, C = best_threestep_split(N)
        if min(A, B, C) >= 8:
            @jax.jit
            def mixed3(raw16, nv):
                re, im = dequant_iq_u16(raw16)
                fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                         < nv).astype(jnp.float32)
                return threestep_psd_partial_mixed(re, im, fmask,
                                                   chunk=min(chunk, 8))

            steps["mixed3"] = mixed3
            lowered["mixed3"] = mixed3

        errs = {b: [] for b in steps}
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
            for b, fn in steps.items():
                inp = u16 if b != "auto" or ship.takes_u16 else raw
                errs[b].append(rel(fn(inp, jnp.int32(F)), want))
        cls_d = np.asarray(cls_d)
        print(f"N={N} F={F}: scipy class p50={np.median(cls_d):.2e} "
              f"max={cls_d.max():.2e}", flush=True)

        speeds = {}
        for b, fn in lowered.items():
            raw0 = realization(N, F, 3000)
            dev = jax.device_put(raw0.view(np.uint16)
                                 if (b != "auto" or ship.takes_u16)
                                 else raw0)

            @partial(jax.jit, static_argnums=1)
            def many(r, it, fn=fn):
                def body(c, i):
                    return c + fn(r + i.astype(r.dtype), jnp.int32(F)), ()
                acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                                      jnp.arange(it))
                return acc

            def timed(it, reps=2):
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
            speeds[b] = F * N / per / 1e9 if per > 0 else 0.0

        for b in steps:
            e = np.asarray(errs[b])
            med_r = np.median(e) / np.median(cls_d)
            max_r = e.max() / cls_d.max()
            ok = med_r <= 1.5 and max_r <= 3.0
            print(f"  {b:7s} {speeds[b]:6.2f} GS/s  "
                  f"BUDGET med={med_r:.2f}x(<=1.5) max={max_r:.2f}x(<=3) "
                  f"{'PASS' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
