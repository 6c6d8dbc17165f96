"""Multitaper device-step round 2: the attribution-informed candidates.

probes/multitaper_fast.py (round-3 probe, run at the start of round 4)
read: shipping fourstep 1584 us/step (FAIL the class budget at 5.9x),
hybrid 681 us (2.3x faster, FAIL at 15.8x), split-tap no help, taper
expansion free.  probes/windowed_attrib.py then attributed the hybrid's
windowed-class excess ENTIRELY to stage-1-internal FFT arithmetic on
non-integer input (bf16-grade input truncation in the platform FFT's
lowering — integer inputs are bf16-exact, which is why the unwindowed
hybrid holds class), and the fourstep's excess mostly to its unsplit
twiddle + Karatsuba stage arithmetic (f64-finishing after stage 1 gives
1.57x at N=2048).

Candidates here, all computing the same estimator (per frame, mean over
K DPSS eigenspectra, masked frame sum), yard = scipy-f32 multitaper:

  fourstep   shipping (models/multitaper.py _mt_core) — baseline
  bsplit     hybrid with a BF16-EXACT split of the tapered planes:
             s = x·taper → trunc_bf16(s) + residual, one stage-1 FFT per
             plane (2 total), split twiddle + HIGHEST matmul stage 2
  fs4-tw     fourstep with 4-mult complex stages (no Karatsuba) and a
             SPLIT twiddle — the compensation the attribution says the
             fourstep family responds to

Run on TPU:  python probes/multitaper_fast2.py [N [F [K [seeds]]]]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import scipy.fft

from rtl_power_fftw_tpu.models.multitaper import _session_tapers
from rtl_power_fftw_tpu.ops.spectral import adapt_batch, dequant_iq_u16
from rtl_power_fftw_tpu.ops.dft import (
    _dft_matrices, _hybrid_constants, best_fourstep_split,
    best_hybrid_split, fourstep_psd_partial)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
F = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
K = int(sys.argv[3]) if len(sys.argv) > 3 else 4
SEEDS = int(sys.argv[4]) if len(sys.argv) > 4 else 30
ITER_LO, ITER_HI = 16, 48
_HI = jax.lax.Precision.HIGHEST


def trunc_bf16(v):
    u = jax.lax.bitcast_convert_type(v, jnp.uint32)
    return jax.lax.bitcast_convert_type(u & np.uint32(0xFFFF0000),
                                        jnp.float32)


def make_steps():
    global F
    F, chunk = adapt_batch(F)
    while (F * K) % chunk != 0:
        chunk //= 2
    tap = _session_tapers(N, 4.0, K)              # (K, N) f32, sqrt(N) scale
    tap_j = jnp.asarray(tap)
    n1f, n2f = best_fourstep_split(N)
    n1h, n2h = best_hybrid_split(N, min_n1=8)

    @jax.jit
    def mt_fourstep(raw16, nv):
        re, im = dequant_iq_u16(raw16)
        fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                 < nv).astype(jnp.float32)
        re_t = (re[:, None, :] * tap_j[None]).reshape(F * K, N)
        im_t = (im[:, None, :] * tap_j[None]).reshape(F * K, N)
        fm = jnp.repeat(fmask, K)
        return fourstep_psd_partial(re_t, im_t, fm, n1f, n2f,
                                    chunk=chunk) / np.float32(K)

    thr, thi, tlr, tli, c2h, s2h = (
        jnp.asarray(a) for a in _hybrid_constants(N, n1h, n2h))

    def mm(a, b):
        return jnp.matmul(a, b, precision=_HI)

    @jax.jit
    def mt_bsplit(raw16, nv):
        re, im = dequant_iq_u16(raw16)
        fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                 < nv).astype(jnp.float32)
        re_t = re[:, None, :] * tap_j[None]       # (F, K, N)
        im_t = im[:, None, :] * tap_j[None]
        re0, im0 = trunc_bf16(re_t), trunc_bf16(im_t)
        x0 = jax.lax.complex(re0, im0).reshape(F * K, n1h, n2h)
        x1 = jax.lax.complex(re_t - re0,
                             im_t - im0).reshape(F * K, n1h, n2h)
        y = jnp.fft.fft(x0, axis=1) + jnp.fft.fft(x1, axis=1)
        yr, yi = jnp.real(y), jnp.imag(y)         # (F·K, k1, n2)
        zr = (yr * thr[None] - yi * thi[None]) \
            + (yr * tlr[None] - yi * tli[None])
        zi = (yr * thi[None] + yi * thr[None]) \
            + (yr * tli[None] + yi * tlr[None])
        Xr = mm(zr, c2h) - mm(zi, s2h)
        Xi = mm(zr, s2h) + mm(zi, c2h)
        fm = jnp.repeat(fmask, K)
        p = (Xr * Xr + Xi * Xi) * fm[:, None, None]
        g = (F * K) // chunk
        s = p.reshape(g, chunk, n1h, n2h).sum(axis=1).sum(axis=0)
        return jnp.swapaxes(s, 0, 1).reshape(N) / np.float32(K)

    c1, s1m = (jnp.asarray(a) for a in _dft_matrices(n1f))
    c2f, s2f = (jnp.asarray(a) for a in _dft_matrices(n2f))
    n2i = np.arange(n2f, dtype=np.int64)[:, None]
    k1i = np.arange(n1f, dtype=np.int64)[None, :]
    ang = -2.0 * np.pi * ((n2i * k1i) % N).astype(np.float64) / N
    tr64, ti64 = np.cos(ang), np.sin(ang)
    fthr = jnp.asarray(tr64.astype(np.float32))
    fthi = jnp.asarray(ti64.astype(np.float32))
    ftlr = jnp.asarray((tr64 - tr64.astype(np.float32)).astype(np.float32))
    ftli = jnp.asarray((ti64 - ti64.astype(np.float32)).astype(np.float32))
    dn = (((1,), (0,)), ((), ()))

    def dot(a, b):
        return jax.lax.dot_general(a, b, dn, precision=_HI)

    @jax.jit
    def mt_fs4tw(raw16, nv):
        re, im = dequant_iq_u16(raw16)
        fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                 < nv).astype(jnp.float32)
        re_t = (re[:, None, :] * tap_j[None]).reshape(F * K, n1f, n2f)
        im_t = (im[:, None, :] * tap_j[None]).reshape(F * K, n1f, n2f)
        yr = dot(re_t, c1) - dot(im_t, s1m)       # (F·K, n2, k1)
        yi = dot(re_t, s1m) + dot(im_t, c1)
        zr = (yr * fthr - yi * fthi) + (yr * ftlr - yi * ftli)
        zi = (yr * fthi + yi * fthr) + (yr * ftli + yi * ftlr)
        Xr = dot(zr, c2f) - dot(zi, s2f)          # (F·K, k1, k2)
        Xi = dot(zr, s2f) + dot(zi, c2f)
        fm = jnp.repeat(fmask, K)
        p = (Xr * Xr + Xi * Xi) * fm[:, None, None]
        g = (F * K) // chunk
        s = p.reshape(g, chunk, n1f, n2f).sum(axis=1).sum(axis=0)
        return jnp.swapaxes(s, 0, 1).reshape(N) / np.float32(K)

    @jax.jit
    def mt_kloop(raw16, nv):
        # Same estimator, K-LOOPED: one fourstep partial per taper via
        # lax.scan, keeping the working set at (F, N) instead of
        # (F·K, N) — tests whether the big-batch fourstep's ~2x GS/s
        # drop (5.3 vs the windowed band's ~10) is a working-set spill.
        re, im = dequant_iq_u16(raw16)
        fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                 < nv).astype(jnp.float32)

        def body(acc, t):
            p = fourstep_psd_partial(re * t, im * t, fmask, n1f, n2f,
                                     chunk=chunk)
            return acc + p, ()

        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32), tap_j)
        return acc / np.float32(K)

    @jax.jit
    def mt_kloop4tw(raw16, nv):
        # K-looped COMPENSATED four-step (4-mult + split twiddle) —
        # accuracy of fs4-tw at kloop's working set.
        re, im = dequant_iq_u16(raw16)
        fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                 < nv).astype(jnp.float32)

        def body(acc, t):
            re_t = (re * t).reshape(F, n1f, n2f)
            im_t = (im * t).reshape(F, n1f, n2f)
            yr = dot(re_t, c1) - dot(im_t, s1m)
            yi = dot(re_t, s1m) + dot(im_t, c1)
            zr = (yr * fthr - yi * fthi) + (yr * ftlr - yi * ftli)
            zi = (yr * fthi + yi * fthr) + (yr * ftli + yi * ftlr)
            Xr = dot(zr, c2f) - dot(zi, s2f)
            Xi = dot(zr, s2f) + dot(zi, c2f)
            p = (Xr * Xr + Xi * Xi) * fmask[:, None, None]
            g = F // chunk
            s = p.reshape(g, chunk, n1f, n2f).sum(axis=1).sum(axis=0)
            return acc + jnp.swapaxes(s, 0, 1).reshape(N), ()

        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32), tap_j)
        return acc / np.float32(K)

    return {"fourstep": mt_fourstep, "bsplit": mt_bsplit,
            "fs4-tw": mt_fs4tw, "kloop": mt_kloop,
            "kloop-4tw": mt_kloop4tw}, tap


def realization(seed):
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
    steps, tap = make_steps()
    tap64 = tap.astype(np.float64)

    errs = {b: [] for b in steps}
    cls_d = []
    for s in range(SEEDS):
        raw = realization(7000 + s)
        z = (raw[:, 0::2].astype(np.float64) - 127.0) \
            + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
        zt = z[:, None, :] * tap64[None]                     # (F, K, N)
        X = np.fft.fft(zt, axis=2)
        want = (X.real ** 2 + X.imag ** 2).mean(1).sum(0)
        zt32 = zt.astype(np.complex64)
        Xc = scipy.fft.fft(zt32.reshape(F * K, N), axis=1)
        got_c = (Xc.real.astype(np.float64) ** 2
                 + Xc.imag.astype(np.float64) ** 2
                 ).reshape(F, K, N).mean(1).sum(0)
        cls_d.append(rel(got_c, want))
        u16 = raw.view(np.uint16)
        for b, fn in steps.items():
            errs[b].append(rel(fn(u16, jnp.int32(F)), want))
    cls_d = np.asarray(cls_d)
    print(f"N={N} F={F} K={K}: scipy class p50={np.median(cls_d):.2e} "
          f"max={cls_d.max():.2e}", flush=True)

    for b, fn in steps.items():
        raw0 = jax.device_put(realization(7000).view(np.uint16))

        @partial(jax.jit, static_argnums=1)
        def many(r, it, fn=fn):
            def body(c, i):
                return c + fn(r + i.astype(jnp.uint16), jnp.int32(F)), ()
            acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                                  jnp.arange(it))
            return acc

        def timed(it, reps=3):
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
        gss = F * N / per / 1e9 if per > 0 else 0.0
        e = np.asarray(errs[b])
        med_r = np.median(e) / np.median(cls_d)
        max_r = e.max() / cls_d.max()
        ok = med_r <= 1.5 and max_r <= 3.0
        print(f"  {b:9s} {per*1e6:7.0f} us/step  {gss:5.2f} GS/s  "
              f"vs class p50={med_r:.2f}x max={max_r:.2f}x  "
              f"{'PASS' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
