"""Unwindowed (8192, 2^18) speed recovery, round 2: SPLIT REBALANCING
for the exact-integer native-bf16 stage 1 (mixed4m, round-5 ask #2).

probes/mixed4m.py run 1 (12-seed smoke, N=2^17, near-square 256x512):
fs4m 4.43 GS/s, m4m 4.85, m4k 5.05 (best accuracy of the pool: max
0.91x, p99 1.59), m4st 3.40 (the fat-dot stack LOSES at near-square —
unlike fourstep4x's K=16 case), hybrid 9.89 (passes a 12-seed pool but
is the candidate the round-4 60-100-seed audit showed breaching).

MAC model (per sample): native Karatsuba stage 1 = 9*N1, HIGHEST 4-mult
stage 2 = 24*N2 -> the near-square split spends 2/3 of its executed
passes in stage 2; the scheme's optimum is N1 ~ 2.7*N2. Candidates:

  fs4m      shipping (256x512 at 2^17)
  m4k       Karatsuba native stage 1, near-square (run-1 reference)
  m4k512    same, split 512x256 (MAC-balanced: 4608+6144/sample)
  m4k1024   same, split 1024x128 (9216+3072)
  fs4x      shipping fourstep4x (16x8192 + three-stage tail): on
            integer input its 4-term input splits are zero in terms
            2-4 - same passes as windowed, ~4800 MACs/sample
  m4kt3     Karatsuba native stage 1 at 512x256... see x3 below: the
            three-stage tail needs N2 > 256, so instead:
  x3        Karatsuba native stage 1 (K=512) + the fourstep4x
            three-stage tail over N2=256? (not viable) -> 64x2048+tail3
            (2048=32x64): stage1 9*64=576, tail3 24*(32+64)=2304 MACs.

Usage: python probes/mixed4m2.py [seeds [N,N,...]]
Defaults: 16 seeds, N = 131072.
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

from rtl_power_fftw_tpu.ops.spectral import (PsdStep, adapt_batch,
                                             dequant_iq_u16)
from rtl_power_fftw_tpu.ops.dft import (_fourstep4m_constants,
                                        _fourstep4m_tail,
                                        _fourstep4x_tail3,
                                        _fourstep4x_tail3_split,
                                        _dft_matrices)
from mixed4m import realization, rel, terms3

SEEDS = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
         else 16)
NS = (tuple(int(n) for n in sys.argv[2].split(","))
      if len(sys.argv) > 2 else (131072,))
ITER_LO, ITER_HI = 8, 24
_HI = jax.lax.Precision.HIGHEST


def make_m4k(N, F, chunk, N1, N2, tail3=False):
    """Exact-integer native-bf16 Karatsuba stage 1 (9 narrow passes)
    over the audited fourstep4m tail (split twiddle + chunked HIGHEST
    stage-2 tree), at an arbitrary (N1, N2) split; optionally the
    fourstep4x three-stage tail (stage-2 DFT as its own four-step)."""
    c1n, s1n = (m.astype(np.float64) for m in _dft_matrices(N1))
    c1t = terms3(c1n)
    s1t = terms3(s1n)
    cst = terms3(c1n + s1n)
    consts = tuple(jnp.asarray(a)
                   for a in _fourstep4m_constants(N, N1, N2))
    t3 = _fourstep4x_tail3_split(N2) if tail3 else None
    dn = (((1,), (0,)), ((), ()))
    f32, bf16 = jnp.float32, jnp.bfloat16

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
        xs = (re + im).reshape(F, N1, N2).astype(bf16)  # |sum|<=256 exact
        t1 = wdot(xr, c1t)
        t2 = wdot(xi, s1t)
        t3d = wdot(xs, cst)
        yr = t1 - t2
        yi = t3d - t1 - t2
        g = F // chunk
        if t3 is not None:
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


def candidates(N, F, chunk):
    out = {}
    ship = PsdStep(N, F, backend="fourstep4m")
    out["fs4m"] = (lambda r, nv: ship(r, int(nv)), ship.lowered_fn())
    divs = [d for d in range(2, N) if N % d == 0]
    # MAC-balanced splits for the native-Karatsuba scheme: N2 near
    # N1/2.7 -> N2 ~ sqrt(N*9/24).
    tgt = int(np.sqrt(N * 9 / 24))
    n2b = min(divs, key=lambda d: abs(d - tgt))
    for tag, n2 in (("m4kB", n2b), ("m4k128", 128)):
        if N % n2 == 0 and N // n2 >= 8:
            fn = make_m4k(N, F, chunk, N // n2, n2)
            out[f"{tag}:{N // n2}x{n2}"] = (fn, fn)
    # Three-stage: small-ish N1 with a big N2 served by its own
    # four-step (the fourstep4x shape, but with the 3-pass exact
    # integer stage 1 instead of the 10-pass windowed split set).
    for n1 in (64, 128):
        if N % n1 == 0 and _fourstep4x_tail3_split(N // n1) is not None:
            fn = make_m4k(N, F, chunk, n1, N // n1, tail3=True)
            out[f"x3:{n1}x{N // n1}"] = (fn, fn)
    x4 = PsdStep(N, F, backend="fourstep4x")
    out["fs4x"] = (lambda r, nv: x4(r, int(nv)), x4.lowered_fn())
    return out


def main():
    for N in NS:
        F = max(8, min(512, (1 << 23) // N))
        F, chunk = adapt_batch(F)
        cands = candidates(N, F, chunk)

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
        print(f"N={N} F={F}: scipy class p50={np.median(cls_d):.2e} "
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

        passing = []
        for b in cands:
            e = np.asarray(errs[b])
            r = e / cls_d
            med_r = np.median(e) / np.median(cls_d)
            max_r = e.max() / cls_d.max()
            ok = med_r <= 1.5 and max_r <= 3.0
            if ok:
                passing.append(b)
            print(f"  {b:14s} {speeds[b]:6.2f} GS/s  "
                  f"med={med_r:.2f}x(<=1.5) max={max_r:.2f}x(<=3) "
                  f"per-seed p99={np.quantile(r, 0.99):.2f} "
                  f"max={r.max():.2f} {'PASS' if ok else 'FAIL'}",
                  flush=True)
        if passing:
            best = max(passing, key=lambda b: speeds[b])
            print(f"  RECOMMEND N={N}: {best} ({speeds[best]:.2f} GS/s)",
                  flush=True)


if __name__ == "__main__":
    main()
