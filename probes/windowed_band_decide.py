"""ONE-SHOT windowed very-large-N band decision: speed + budget accuracy.

Candidates at windowed composite N > 65536 (the current hybrid band):
  - hybrid       (shipping: large-N hybrid, windowed via plain w multiply)
  - fourstep     (all-matmul four-step — windowed mid-band owner)
  - split-win    (split-window hybrid: w = w_hi(15-bit mantissa) + w_lo,
                  stage-1 FFT per plane by linearity — ops/dft.py)

Per N this prints, on identical realizations:
  - slope-method GS/s (pooled endpoint minima, 3 isolated rounds)
  - per-realization error ratios vs the scipy-f32 (FFTW) class
  - the ENFORCED budget comparison (tests/test_windowed_bands.py
    semantics): median(ours) <= 1.5 x median(yard) and
    max(ours) <= 3 x max(yard), yard = max(scipy class, platform
    monolithic f32 FFT) per realization (degrades to scipy-only when
    the platform FFT cannot compile — stricter)
and a RECOMMENDATION: among budget-passing candidates, the fastest.

Run on TPU:  python probes/windowed_band_decide.py [seeds] [N,N,...]
Defaults: 20 seeds, N = 2^17, 2^20.
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
from rtl_power_fftw_tpu.ops.spectral import PsdStep, adapt_batch, dequant_iq_u16
from rtl_power_fftw_tpu.ops.dft import (
    best_hybrid_split, fourstep_hybrid_windowed_psd_partial, split_window)

SEEDS = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
         else 20)
NS = (tuple(int(n) for n in sys.argv[2].split(","))
      if len(sys.argv) > 2 else (1 << 17, 1 << 20))
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


def make_split_win_step(N, F, w, chunk):
    """PsdStep-shaped wrapper over the split-window hybrid candidate
    (same two-stage-sum chunk as the shipping PsdStep at this F)."""
    n1h, n2h = best_hybrid_split(N, min_n1=8)
    w_hi, w_lo = (jnp.asarray(a) for a in split_window(w))

    @jax.jit
    def swh(raw16, nv):
        re, im = dequant_iq_u16(raw16)
        fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                 < nv).astype(jnp.float32)
        return fourstep_hybrid_windowed_psd_partial(
            re, im, fmask, w_hi, w_lo, n1h, n2h, chunk=chunk)

    class _SW:
        takes_u16 = True
        F_ = F

        def lowered_fn(self):
            return swh

        def __call__(self, raw, nv):
            u16 = raw.view(np.uint16) if raw.dtype == np.uint8 else raw
            return swh(u16, jnp.int32(nv))

    return _SW()


def platform_fft_ok(F: int, N: int) -> bool:
    """Probe the platform's monolithic FFT at this shape in a SUBPROCESS.

    Measured on this toolchain (2026-08-18): a refused FFT compile
    POISONS the axon client — every subsequent op in the process fails
    with the same UNIMPLEMENTED — so the yardstick must be pre-flighted
    out-of-process. The current backend refuses all long monolithic
    complex FFTs (observed at 2^16..2^20, bare or fused) while embedded
    batched stage FFTs (the shipping hybrid paths) compile fine."""
    import subprocess
    code = (
        "import numpy as np, jax, jax.numpy as jnp\n"
        f"z = np.zeros(({F}, {N}), np.complex64)\n"
        "np.asarray(jax.jit(lambda z: jnp.fft.fft(z, axis=1))(z))\n")
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, timeout=600)
    return r.returncode == 0


def main():
    mono = jax.jit(lambda z: jnp.fft.fft(z, axis=1))
    for N in NS:
        # Same frame-count policy as probes/windowed_pow2_direct.py so
        # speed numbers are comparable with the committed band tables.
        F = max(8, min(512, (1 << 23) // N))
        F, chunk = adapt_batch(F)
        w = make_window("hann", N)
        w64 = w.astype(np.float64)

        steps = {}
        for backend in ("hybrid", "fourstep"):
            try:
                steps[backend] = PsdStep(N, F, window=w, backend=backend)
            except Exception as e:
                print(f"N={N} {backend}: unavailable ({str(e)[:60]})",
                      flush=True)
        try:
            steps["split-win"] = make_split_win_step(N, F, w, chunk)
        except Exception as e:
            print(f"N={N} split-win: unavailable ({str(e)[:60]})",
                  flush=True)

        # ---- accuracy distributions on identical realizations ----
        errs = {b: [] for b in steps}
        cls_d, yard_d = [], []
        plat_dead = not platform_fft_ok(F, N)
        if plat_dead:
            print(f"N={N}: platform monolithic FFT refused out-of-process "
                  "probe — scipy-only yard (stricter)", flush=True)
        for s in range(SEEDS):
            raw = realization(N, F, 3000 + s)
            z = (raw[:, 0::2].astype(np.float64) - 127.0) \
                + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
            X = np.fft.fft(z * w64, axis=1)
            want = (X.real ** 2 + X.imag ** 2).sum(0)
            zw32 = (z * w64).astype(np.complex64)
            Xc = scipy.fft.fft(zw32, axis=1)
            cls = rel((Xc.real.astype(np.float64) ** 2
                       + Xc.imag.astype(np.float64) ** 2).sum(0), want)
            plat = 0.0
            if not plat_dead:
                try:
                    Xp = np.asarray(mono(zw32))
                    plat = rel((Xp.real.astype(np.float64) ** 2
                                + Xp.imag.astype(np.float64) ** 2).sum(0),
                               want)
                except Exception:
                    plat_dead = True  # degraded yard (stricter)
            cls_d.append(cls)
            yard_d.append(max(cls, plat))
            for b, st in steps.items():
                inp = raw.view(np.uint16) if st.takes_u16 else raw
                errs[b].append(rel(st(inp, F), want))
        cls_d, yard_d = np.asarray(cls_d), np.asarray(yard_d)
        print(f"N={N}: scipy class p50={np.median(cls_d):.2e} "
              f"max={cls_d.max():.2e}; yard p50={np.median(yard_d):.2e} "
              f"max={yard_d.max():.2e}"
              + (" [platform FFT unavailable — scipy-only yard]"
                 if plat_dead else ""), flush=True)

        # ---- slope speed per candidate ----
        speeds = {}
        for b, st in steps.items():
            fn = st.lowered_fn()
            nv = jnp.int32(F)
            raw0 = realization(N, F, 3000)
            dev_raw = jax.device_put(
                raw0.view(np.uint16) if st.takes_u16 else raw0)
            pdt = jnp.uint16 if st.takes_u16 else jnp.uint8

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
            if t_hi <= t_lo:
                speeds[b] = 0.0
                continue
            per = (t_hi - t_lo) / (ITER_HI - ITER_LO)
            speeds[b] = F / per * N / 1e9

        # ---- budget verdicts + recommendation ----
        passing = []
        for b in steps:
            e = np.asarray(errs[b])
            med_r = np.median(e) / np.median(yard_d)
            max_r = e.max() / yard_d.max()
            ok = med_r <= 1.5 and max_r <= 3.0
            if ok:
                passing.append(b)
            print(f"  {b:9s} {speeds[b]:6.2f} GS/s  "
                  f"vs scipy p50={np.median(e)/np.median(cls_d):.2f}x "
                  f"max={e.max()/cls_d.max():.2f}x  "
                  f"BUDGET med={med_r:.2f}x(<=1.5) max={max_r:.2f}x(<=3) "
                  f"{'PASS' if ok else 'FAIL'}", flush=True)
        if passing:
            best = max(passing, key=lambda b: speeds[b])
            print(f"  RECOMMEND N={N}: {best} "
                  f"({speeds[best]:.2f} GS/s, budget-passing)", flush=True)
        else:
            best = min(steps, key=lambda b: np.max(errs[b]))
            print(f"  RECOMMEND N={N}: none pass the budget; lowest max "
                  f"error is {best}", flush=True)


if __name__ == "__main__":
    main()
