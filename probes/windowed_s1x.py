"""Windowed session-size stage-1: EXPLICIT split-pass contraction.

The attribution chain (probes/s1_diag.py, probes/s1_diag2.py) landed on
a mechanism: the windowed session-size excess is ENTIRELY stage-1's
Precision.HIGHEST matmul on non-integer inputs — its bf16x6 emulation
drops the (1,2)/(2,1)/(2,2) cross-products of the 3-term operand
splits. For exact 8-bit integer inputs those terms are ZERO (z1=z2=0 —
why the unwindowed bands hold class); for windowed inputs they are a
~2^-24-relative correlated error, and the windowed class yard is HALF
the unwindowed one, so the same absolute noise reads ~2.1x. Evidence:
hi-plane matmul + EXACT f64 lo term still reads 2.14x (input
representation fully ruled out); stage-1-device + all-f64 downstream
reproduces the full path's 2.13-2.42x at every probed size.

Fix measured here: stage 1 as an EXPLICIT native-bf16 split-pass
contraction — fold-proof 3-term truncation input split
(ops.dft._trunc_split3) x 3-term weight split with a CONTROLLED pass
set:

  fs4m    shipping compensated four-step (baseline; 6-pass-emulated
          HIGHEST stage 1)
  s1x9    fourstep4m tail, stage 1 = full 9-pass cross set (drops
          NOTHING; input-split exact for any f32, so stage-1 product
          error is exactly zero and only f32 accumulation remains)
  s1x8    same minus the (2,2) product (~2^-32 relative; 8 passes)

Cost: 4-mult stage 1 at 9 native passes/product-pair = 36 native bf16
passes vs HIGHEST's 4x6 = 24 emulated — but native passes skip the
emulation's split overhead, so the measured GS/s decides.

Budget semantics: median <= 1.5x / max <= 3x the scipy-f32 class,
strict scipy-only yard, 60 seeds, per-seed p99 (round-4 admission
standard).

Run on TPU:  python probes/windowed_s1x.py [seeds [N,N,...]]
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
                                        _fourstep4m_tail, _trunc_split3,
                                        best_fourstep_split)

SEEDS = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
         else 60)
NS = (tuple(int(n) for n in sys.argv[2].split(","))
      if len(sys.argv) > 2 else (2048, 4096))
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


def terms3(m, n=3):
    """n-term bf16 split of a float64 matrix, host-side."""
    import ml_dtypes
    out, r = [], np.asarray(m, np.float64)
    for _ in range(n):
        t = r.astype(ml_dtypes.bfloat16)
        out.append(t)
        r = r - t.astype(np.float64)
    return [jnp.asarray(t) for t in out]


def make_s1x(N, F, w, chunk, max_ij, chunk_k=0, split=None):
    """fourstep4m with an explicit split-pass stage 1: the input is
    truncation-split into len(max_ij) bf16 terms and pass (i, j) is
    included iff j <= max_ij[i] — e.g. (2,2,2) = the full 9-pass set on
    a 3-term split; (2,2,1,0) = 9 passes on a 4-TERM split, which drops
    the 3-term split's own ~2^-22 truncation residual (the reason the
    first 9-pass run still read 1.69x) while skipping only products
    below 2^-30 relative.

    ``chunk_k`` > 0 additionally CHUNKS the K = N1 contraction into
    depth-``chunk_k`` batched dots tree-summed in f32: with all
    products exact (bf16 x bf16 is exact in f32), the remaining stage-1
    error is the f32 ACCUMULATION of K sequential adds — the
    fundamental depth disadvantage of a matmul DFT vs the FFT's log-
    depth tree (the class yard). Chunk-8 + tree gives depth
    7 + log2(K/8), within ~2x of the FFT's.

    The number of WEIGHT terms is max(max_ij) + 1. Run 3 found the
    chunked (2,2,1,0) set passes at 2048 (1.44x) but stays 1.99x at
    4096 with the excess STILL entirely stage-1 (probes/s1x_diag.py
    cut-point run) and insensitive to chunk depth — the signature of
    the 3-term WEIGHT split's own ~2^-24 truncation residual, whose
    z0*w3 product the (2,2,1,0) set omits and whose coherent
    contribution scales with K (K doubles 2048 -> 4096 and the
    absolute excess doubled too, 8.9e-6 -> 16.9e-6). Run 4 adds the
    4th weight term with the triangular set (3,2,1,0) = 10 passes.

    ``split`` overrides the (N1, N2) factorization. Run 4 found the
    passing sizes (1024, 2048) share K = N1 = 32 while 4096's default
    near-square (64, 64) fails at 1.95x with everything else equal —
    and the cut-point diag shows the tail contributes nothing, so a
    rectangular (32, 128) split moves the hard contraction back to the
    K that passes."""
    N1, N2 = best_fourstep_split(N) if split is None else split
    assert N1 * N2 == N
    from rtl_power_fftw_tpu.ops.dft import _dft_matrices
    c1n, s1n = (m.astype(np.float64) for m in _dft_matrices(N1))
    consts = tuple(jnp.asarray(a)
                   for a in _fourstep4m_constants(N, N1, N2))
    wj = jnp.asarray(w)
    f32, bf16 = jnp.float32, jnp.bfloat16
    n_terms = len(max_ij)
    G = 1
    if chunk_k and N1 % chunk_k == 0 and N1 > chunk_k:
        G = N1 // chunk_k

    n_wterms = max(max_ij) + 1

    def terms3g(m):
        """bf16 weight split, reshaped (G, K/G, N1) when chunked."""
        ts = terms3(m, n_wterms)
        if G > 1:
            ts = [t.reshape(G, N1 // G, N1) for t in ts]
        return ts

    c1t = terms3g(c1n)
    s1t = terms3g(s1n)
    if G > 1:
        # lhs (F, n2-view, G, K/G) x rhs (G, K/G, N1), batch over G.
        dnb = (((3,), (1,)), ((2,), (0,)))
    dn = (((1,), (0,)), ((), ()))

    def mm(z, wt):
        if G > 1:
            return jax.lax.dot_general(z, wt, dnb,
                                       preferred_element_type=f32)
        return jax.lax.dot_general(z, wt, dn, preferred_element_type=f32)

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

    def prod(z, wts):
        # z: (F, N1, N2). Chunked: -> (F, N2, G, K/G) so the contraction
        # runs per chunk and the partials tree-sum in f32.
        if G > 1:
            z = jnp.swapaxes(z, 1, 2).reshape(F, N2, G, N1 // G)
        zs = trunc_terms(z)
        acc = None
        for i in range(n_terms):
            for j in range(max_ij[i] + 1):
                t = mm(zs[i], wts[j])
                acc = t if acc is None else acc + t
        if G > 1:
            # acc: (G, F-N2..., k1) — batch dim leads. Pairwise tree.
            parts = [acc[g] for g in range(G)]
            while len(parts) > 1:
                parts = [parts[i] + parts[i + 1]
                         if i + 1 < len(parts) else parts[i]
                         for i in range(0, len(parts), 2)]
            return parts[0]
        return acc

    @jax.jit
    def step(raw16, nv):
        re, im = dequant_iq_u16(raw16, wj)
        fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                 < nv).astype(jnp.float32)
        xr = re.reshape(F, N1, N2)
        xi = im.reshape(F, N1, N2)
        yr = prod(xr, c1t) - prod(xi, s1t)     # (F, n2, k1)
        yi = prod(xr, s1t) + prod(xi, c1t)
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
        w = make_window("hann", N)
        w64 = w.astype(np.float64)

        ship = PsdStep(N, F, window=w, backend="fourstep4m")
        # Run 1 (3-term split): s1x9/s1x8 med 1.69x at 2048, 2.15x
        # at 4096. Run 2: s1x10 (4-term) == s1x12 == s1x9 to the
        # digit — products are fully exact and the 1.69x floor is
        # the f32 CONTRACTION ACCUMULATION (depth K sequential vs
        # the FFT class's log-depth). Run 3 (chunk the contraction):
        # c8/c16 PASS 2048 at 1.44/1.45x but 4096 stays 1.74-1.83x,
        # all of it still stage-1 and chunk-insensitive
        # (probes/s1x_diag.py) -> the 3-term WEIGHT residual.
        # Run 4: 4th weight term, triangular (3,2,1,0) pass set —
        # PASS 1024 (1.46x, 22.1 GS/s) + 2048 (1.42x, 6.8 GS/s);
        # 4096 stays 1.95x: w4 is NOT the 4096 mechanism. The
        # passing sizes share stage-1 K=32; run 5 forced K=32/16
        # rectangular splits at the failing sizes: 4096 w4s16
        # 0.99x PASS 6.14 GS/s, w4c16s32 1.43x PASS 5.71; 3072
        # w4s16 0.84x, w4c16s32 1.33x PASS 5.13. The mechanism is
        # CONFIRMED: stage-1 contraction depth K <= 32 (chunked)
        # or K = 16 (unchunked) holds the windowed class budget.
        # Run 6: margin + coverage — w4s16 at 1024/2048 (the c16
        # medians 1.42-1.46 are too close to 1.5 for a 60-seed
        # admission), both rectangular arms at 6144/8192/16384
        # (the pallas cells ship at med 1.90x/1.55x strict).
        # Run-6 RESULT (24 seeds; speeds contaminated by a
        # co-running pytest on the 1-core host — ignore them):
        # w4s16 PASSES EVERYWHERE with margin: 1024 1.05x, 2048
        # 1.05x, 6144 0.79x, 8192 0.89x, 16384 0.73x (p99 <= 2.3);
        # w4c16s32 passes 6144/8192/16384 at 0.92-1.36x but its
        # small-size medians and per-seed tails sit close to the
        # line. SHIPPED as backend="fourstep4x" (ops/dft.py) with
        # K=16 uniform; 60-seed admission audit in
        # probes/windowed_s1x_audit.py.
        steps = {
            "w4s16": make_s1x(N, F, w, chunk, (3, 2, 1, 0),
                              split=(16, N // 16)),
        }
        if N >= 6144:
            steps["w4c16s32"] = make_s1x(N, F, w, chunk, (3, 2, 1, 0),
                                         chunk_k=16, split=(32, N // 32))
        lowered = dict(steps)
        lowered["fs4m"] = ship.lowered_fn()

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
