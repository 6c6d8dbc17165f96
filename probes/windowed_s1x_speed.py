"""Speed shootout + K-stacking variant for the shipped fourstep4x
(round-5, after the admission audit): can the split-pass stage 1 go
FAST without giving back the budget?

The shipped fourstep4x runs stage 1 as 40 narrow (K=16, 16-wide) bf16
dots + adds — MXU lane efficiency ~16/128 per dispatch. The fused
kernel's measured cure for exactly this (fused_psd.py _constants) is
K-STACKING: fold the split terms AND the complex combination into the
K dimension of one fat dot per output plane. Here that gives two
(F·N2, 2·10·16) @ (320, 16) dispatches. The open accuracy question:
the probed failure boundary was the BASE contraction extent (K=64
fails even chunk-16-treed, K=16 passes with margin), and a stacked dot
accumulates all 320 addends in one f32 chain — but 9 of the 10 blocks
carry terms scaled by <= 2^-8..2^-24 of the dominant one, so their
accumulation error contributions are proportionally scaled too. If the
budget holds, this is the band's speed answer (and a candidate to take
windowed 8192/16384 from the budget-breaching pallas cells at real
speed).

Arms per size:
  fs4x     shipped PsdStep backend="fourstep4x" (40 narrow dots)
  w4st     K-stacked split-pass stage 1 (2 fat dots) + fs4m tail
  fs4m     shipped compensated four-step (the pre-round-5 band owner)
  auto     the shipped auto path (pallas at 8192/16384 — the cells'
           incumbent)

24-seed strict scipy-only accuracy screen + slope-protocol speed (the
repo standard: GS/s from the iter-8 vs iter-24 scan delta). RUN ALONE:
speeds on this 1-core host are garbage under any co-running load.

Run on TPU:  python probes/windowed_s1x_speed.py [seeds [N,N,...]]
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
from rtl_power_fftw_tpu.ops.spectral import (PsdStep, adapt_batch,
                                             dequant_iq_u16)
from rtl_power_fftw_tpu.ops.dft import (_fourstep4m_constants,
                                        _fourstep4m_tail,
                                        _fourstep4x_tail3,
                                        _fourstep4x_tail3_split,
                                        _s1x_weight_terms, _S1X_MAX_J)

SEEDS = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
         else 24)
NS = (tuple(int(n) for n in sys.argv[2].split(","))
      if len(sys.argv) > 2 else (1024, 2048, 4096, 8192, 16384))
ITER_LO, ITER_HI = 8, 24
_HI = jax.lax.Precision.HIGHEST


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


def make_w4st(N, F, w, chunk):
    """K-stacked split-pass four-step: stage 1 = 2 fat bf16 dots."""
    N1 = 16 if N % 16 == 0 else 8
    N2 = N // N1
    consts = tuple(jnp.asarray(a)
                   for a in _fourstep4m_constants(N, N1, N2))
    wj = jnp.asarray(w)
    f32, bf16 = jnp.float32, jnp.bfloat16
    n_terms = len(_S1X_MAX_J)
    passes = [(i, j) for i, mj in enumerate(_S1X_MAX_J)
              for j in range(mj + 1)]          # 10 (input, weight) pairs
    ct, st = _s1x_weight_terms(N1, n_terms, 0)  # numpy bf16 tuples
    c64 = [t.astype(np.float64) for t in ct]
    s64 = [t.astype(np.float64) for t in st]
    # rhs stacks: yr needs  xr@C - xi@S ; yi needs xr@S + xi@C.
    # lhs blocks: [xr_i for passes] + [xi_i for passes]  (K = 20·N1).
    import ml_dtypes
    WR = np.vstack([c64[j] for _, j in passes]
                   + [-s64[j] for _, j in passes]).astype(ml_dtypes.bfloat16)
    WI = np.vstack([s64[j] for _, j in passes]
                   + [c64[j] for _, j in passes]).astype(ml_dtypes.bfloat16)
    WRj, WIj = jnp.asarray(WR), jnp.asarray(WI)

    def trunc_terms(z):
        def trunc(v):
            u = jax.lax.bitcast_convert_type(v, jnp.uint32)
            return jax.lax.bitcast_convert_type(
                u & np.uint32(0xFFFF0000), jnp.float32)
        out, r = [], z
        for _ in range(n_terms):
            t = trunc(r)
            out.append(t.astype(bf16))
            r = r - t
        return out

    @jax.jit
    def step(raw16, nv):
        re, im = dequant_iq_u16(raw16, wj)
        fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                 < nv).astype(jnp.float32)
        xr = jnp.swapaxes(re.reshape(F, N1, N2), 1, 2)   # (F, N2, N1)
        xi = jnp.swapaxes(im.reshape(F, N1, N2), 1, 2)
        zr = trunc_terms(xr)
        zi = trunc_terms(xi)
        lhs = jnp.concatenate([zr[i] for i, _ in passes]
                              + [zi[i] for i, _ in passes], axis=-1)
        yr = jax.lax.dot_general(lhs, WRj, (((2,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        yi = jax.lax.dot_general(lhs, WIj, (((2,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        g = F // chunk
        t3 = _fourstep4x_tail3_split(N2)
        if t3 is not None:   # same tail the shipped transform uses
            P, Q = t3
            Xr, Xi = _fourstep4x_tail3(yr, yi, N, N1, N2, P, Q, _HI)
            p = (Xr * Xr + Xi * Xi) * fmask[:, None, None, None]
            s = p.reshape(g, chunk, N1, P, Q).sum(axis=1).sum(axis=0)
            return jnp.transpose(s, (2, 1, 0)).reshape(N)
        Xr, Xi = _fourstep4m_tail(yr, yi, consts, N2, _HI)
        p = (Xr * Xr + Xi * Xi) * fmask[:, None, None]
        s = p.reshape(g, chunk, N1, N2).sum(axis=1).sum(axis=0)
        return jnp.swapaxes(s, 0, 1).reshape(N)

    return step


def main():
    for N in NS:
        F = max(8, min(512, (1 << 23) // N))
        F, chunk = adapt_batch(F)
        w = make_window("hann", N)
        w64 = w.astype(np.float64)

        ship4x = PsdStep(N, F, window=w, backend="fourstep4x")
        ship4m = PsdStep(N, F, window=w, backend="fourstep4m")
        auto = PsdStep(N, F, window=w, backend="auto")
        steps = {
            "fs4x": lambda r, nv: ship4x(r, int(nv)),
            "w4st": make_w4st(N, F, w, chunk),
            "fs4m": lambda r, nv: ship4m(r, int(nv)),
        }
        if auto.path not in ("fourstep4x", "fourstep4m"):
            steps["auto"] = lambda r, nv: auto(r, int(nv))
        lowered = dict(steps)
        lowered["fs4x"] = ship4x.lowered_fn()
        lowered["fs4m"] = ship4m.lowered_fn()
        if "auto" in steps:
            lowered["auto"] = auto.lowered_fn()

        errs = {b: [] for b in steps}
        cls_d = []
        for s in range(SEEDS):
            raw = realization(N, F, 3000 + s)
            u16 = raw.view(np.uint16)
            z = (raw[:, 0::2].astype(np.float64) - 127.0) \
                + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
            X = np.fft.fft(z * w64, axis=1)
            want = (X.real ** 2 + X.imag ** 2).sum(0)
            zw32 = (z * w64).astype(np.complex64)
            Xc = scipy.fft.fft(zw32, axis=1)
            cls_d.append(rel((Xc.real.astype(np.float64) ** 2
                              + Xc.imag.astype(np.float64) ** 2).sum(0),
                             want))
            for b, fn in steps.items():
                errs[b].append(rel(fn(u16, jnp.int32(F)), want))
            if (s + 1) % 20 == 0:
                print(f"  ...{s + 1}/{SEEDS} seeds", flush=True)
        cls_d = np.asarray(cls_d)
        print(f"N={N} F={F} auto={auto.path}: scipy class "
              f"p50={np.median(cls_d):.2e} max={cls_d.max():.2e}",
              flush=True)

        speeds = {}
        for b, fn in lowered.items():
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

        for b in steps:
            e = np.asarray(errs[b])
            r = e / cls_d
            med_r = np.median(e) / np.median(cls_d)
            max_r = e.max() / cls_d.max()
            ok = med_r <= 1.5 and max_r <= 3.0
            print(f"  {b:6s} {speeds[b]:6.2f} GS/s  "
                  f"med={med_r:.2f}x(<=1.5) max={max_r:.2f}x(<=3) "
                  f"per-seed p99={np.quantile(r, 0.99):.2f} "
                  f"max={r.max():.2f} {'PASS' if ok else 'FAIL'}",
                  flush=True)


if __name__ == "__main__":
    main()
