"""Unwindowed (8192, 2^18) speed recovery: exact-integer native-bf16
stage 1 over the audited fourstep4m tail ("mixed4m", round-5 ask #2).

The round-4 contract fix moved this band from the hybrid (7.7 GS/s at
2^17, tail breaches to 9.36x) to fourstep4m (4.3 GS/s, budget-true).
fourstep4m's stage 1 runs 4 HIGHEST dots = 24 emulated bf16 passes —
but the band's inputs are EXACT 8-bit integers, bf16-exact in ONE term,
so a native-bf16 stage 1 with 3-term WEIGHT-only splits computes the
identical result in 12 native passes (4-mult) or 9 (Karatsuba) with
zero dropped products (the integer anchor: input split terms 2 and 3
are ZERO). The twiddle split and the HIGHEST chunked-tree stage 2 — the
parts the round-4 tail audit actually validated — stay unchanged.

Candidates (vs the shipping fourstep4m and, for reference, hybrid):

  fs4m     shipping PsdStep backend="fourstep4m"
  m4m      exact-bf16 4-mult stage 1 (12 native passes) + fs4m tail
  m4k      exact-bf16 Karatsuba stage 1 (9 passes; its t3-t1-t2
           cancellation only amplifies f32 ACCUMULATION here — the
           products are exact — so the tail risk that killed Karatsuba
           in stage 2 may not apply) + fs4m tail
  hybrid   shipping hybrid (the speed ceiling this band retreated from)

60 seeds, per-seed p99, unwindowed class yard (scipy-f32 on the same
realizations) — the round-4 admission standard
(probes/unwindowed_2e17_tail.py).

Run on TPU:  python probes/mixed4m.py [seeds [N,N,...]]
Defaults: 60 seeds, N = 49152, 131072.
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import scipy.fft

from rtl_power_fftw_tpu.ops.spectral import (PsdStep, adapt_batch,
                                             dequant_iq_u16)
from rtl_power_fftw_tpu.ops.dft import (_fourstep4m_constants,
                                        _fourstep4m_tail,
                                        best_fourstep_split)

SEEDS = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
         else 60)
NS = (tuple(int(n) for n in sys.argv[2].split(","))
      if len(sys.argv) > 2 else (49152, 131072))
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


def terms3(m):
    import ml_dtypes
    out, r = [], np.asarray(m, np.float64)
    for _ in range(3):
        t = r.astype(ml_dtypes.bfloat16)
        out.append(t)
        r = r - t.astype(np.float64)
    return [jnp.asarray(t) for t in out]


def make_mixed4m(N, F, chunk, karatsuba, stacked=False):
    N1, N2 = best_fourstep_split(N)
    from rtl_power_fftw_tpu.ops.dft import _dft_matrices
    c1n, s1n = (m.astype(np.float64) for m in _dft_matrices(N1))
    c1t = terms3(c1n)
    s1t = terms3(s1n)
    cst = terms3(c1n + s1n)
    consts = tuple(jnp.asarray(a)
                   for a in _fourstep4m_constants(N, N1, N2))
    dn = (((1,), (0,)), ((), ()))
    f32, bf16 = jnp.float32, jnp.bfloat16

    if stacked:
        # K-stack the weight terms AND the complex combination into the
        # contraction axis (the fused kernel's trick, fused_psd.py
        # _constants): stage 1 = TWO fat (F, 6·N1, N2)-contracting dots
        # instead of 12 narrow ones. Concat rides axis 1 — the existing
        # contraction axis — so the transpose-free layout is preserved.
        import ml_dtypes
        c64 = [np.asarray(t, np.float64) for t in c1t]
        s64 = [np.asarray(t, np.float64) for t in s1t]
        WR = np.vstack(c64 + [-m for m in s64]).astype(ml_dtypes.bfloat16)
        WI = np.vstack(s64 + c64).astype(ml_dtypes.bfloat16)
        WRj, WIj = jnp.asarray(WR), jnp.asarray(WI)

        @jax.jit
        def step(raw16, nv):
            re, im = dequant_iq_u16(raw16)
            fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                     < nv).astype(jnp.float32)
            xr = re.reshape(F, N1, N2).astype(bf16)   # exact: integers
            xi = im.reshape(F, N1, N2).astype(bf16)
            lhs = jnp.concatenate([xr, xr, xr, xi, xi, xi], axis=1)
            yr = jax.lax.dot_general(lhs, WRj, dn,
                                     preferred_element_type=f32)
            yi = jax.lax.dot_general(lhs, WIj, dn,
                                     preferred_element_type=f32)
            Xr, Xi = _fourstep4m_tail(yr, yi, consts, N2, _HI)
            p = (Xr * Xr + Xi * Xi) * fmask[:, None, None]
            g = F // chunk
            s = p.reshape(g, chunk, N1, N2).sum(axis=1).sum(axis=0)
            return jnp.swapaxes(s, 0, 1).reshape(N)

        return step

    def mm(z, wt):
        return jax.lax.dot_general(z, wt, dn, preferred_element_type=f32)

    def wdot(zb, wts):
        return mm(zb, wts[0]) + mm(zb, wts[1]) + mm(zb, wts[2])

    @jax.jit
    def step(raw16, nv):
        re, im = dequant_iq_u16(raw16)
        fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                 < nv).astype(jnp.float32)
        xr = re.reshape(F, N1, N2).astype(bf16)   # exact: integers
        xi = im.reshape(F, N1, N2).astype(bf16)
        if karatsuba:
            xs = (re + im).reshape(F, N1, N2).astype(bf16)  # |sum|<=256
            t1 = wdot(xr, c1t)
            t2 = wdot(xi, s1t)
            t3 = wdot(xs, cst)
            yr = t1 - t2
            yi = t3 - t1 - t2
        else:
            yr = wdot(xr, c1t) - wdot(xi, s1t)    # (F, n2, k1)
            yi = wdot(xr, s1t) + wdot(xi, c1t)
        Xr, Xi = _fourstep4m_tail(yr, yi, consts, N2, _HI)
        p = (Xr * Xr + Xi * Xi) * fmask[:, None, None]
        g = F // chunk
        s = p.reshape(g, chunk, N1, N2).sum(axis=1).sum(axis=0)
        return jnp.swapaxes(s, 0, 1).reshape(N)

    return step


def main():
    for N in NS:
        F = max(8, min(512, (1 << 23) // N))
        F, chunk = adapt_batch(F)

        ship = PsdStep(N, F, backend="fourstep4m")
        hyb = PsdStep(N, F, backend="hybrid")
        steps = {
            "fs4m": lambda r, nv: ship(r, int(nv)),
            "m4m": make_mixed4m(N, F, chunk, karatsuba=False),
            "m4k": make_mixed4m(N, F, chunk, karatsuba=True),
            "m4st": make_mixed4m(N, F, chunk, karatsuba=False,
                                 stacked=True),
            "hybrid": lambda r, nv: hyb(r, int(nv)),
        }
        lowered = dict(steps)
        lowered["fs4m"] = ship.lowered_fn()
        lowered["hybrid"] = hyb.lowered_fn()

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
                errs[b].append(rel(fn(u16, jnp.int32(F)), want))
            if (s + 1) % 20 == 0:
                print(f"  ...{s + 1}/{SEEDS} seeds", flush=True)
        cls_d = np.asarray(cls_d)
        print(f"N={N} F={F}: scipy class p50={np.median(cls_d):.2e} "
              f"max={cls_d.max():.2e}", flush=True)

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

        passing = []
        for b in steps:
            e = np.asarray(errs[b])
            r = e / cls_d
            med_r = np.median(e) / np.median(cls_d)
            max_r = e.max() / cls_d.max()
            ok = med_r <= 1.5 and max_r <= 3.0
            if ok:
                passing.append(b)
            print(f"  {b:6s} {speeds[b]:6.2f} GS/s  "
                  f"med={med_r:.2f}x(<=1.5) max={max_r:.2f}x(<=3) "
                  f"per-seed p99={np.quantile(r, 0.99):.2f} "
                  f"max={r.max():.2f} {'PASS' if ok else 'FAIL'}",
                  flush=True)
        if passing:
            best = max(passing, key=lambda b: speeds[b])
            print(f"  RECOMMEND N={N}: {best} ({speeds[best]:.2f} GS/s)",
                  flush=True)
        else:
            best = min(steps, key=lambda b: float(np.median(errs[b])))
            print(f"  RECOMMEND N={N}: none pass; lowest median is "
                  f"{best}", flush=True)


if __name__ == "__main__":
    main()
