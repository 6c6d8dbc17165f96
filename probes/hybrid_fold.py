"""Fold the hybrid's split twiddle into per-k1 batched matmul weights.

HLO inspection of the shipping 2048 hybrid (fourstep_hybrid_psd_partial)
shows XLA materializes the split-twiddle pass four times — each stage-2
conv gets its own kLoop relayout fusion re-reading yr/yi — plus four
f32[F,16,128] copies. Folding tw[k1,n2]·W_N2[n2,k2] into ONE complex
weight tensor M[k1,n2,k2] (computed in float64 on host, rounded once to
f32) removes the twiddle pass entirely: stage 2 becomes four batched
einsums 'fkn,knm->fkm' straight off the FFT output. Accuracy argument:
the folded weight has a single f32 rounding — strictly fewer roundings
than split-twiddle (2 per term) followed by a separately rounded DFT
matrix. Weights are N1·N2·N2 floats, so this only fits the small-N
hybrid band (N1 ≤ 64 → ≤ 8.4 MB); the large-N hybrid keeps the split
twiddle.

Variants:
  ship      fourstep_hybrid_psd_partial (split twiddle + 4-mult HIGHEST)
  fold      folded f32 weights, 4 batched einsums, HIGHEST
  foldsplit folded hi+lo split weights, 8 batched einsums, HIGHEST
  stack     split twiddle + [c2|s2]-stacked 256-wide matmuls
  kara      split twiddle + Karatsuba 3-mult stage 2
  cplx      split twiddle + one real-embedding [zr zi]@[[c2,s2],[-s2,c2]]

Run on TPU:  python probes/hybrid_fold.py [N ...] [names ...]
Timing: pooled-endpoint minima slope (min t_lo, min t_hi over reps).

RESULTS (TPU v5e, measured; ship shown alongside each run): the 4-mult
HIGHEST stage 2 is a measured accuracy-speed local optimum — all five
restructurings REJECTED:
  fold       loses both axes: 2048 11.68 GS/s vs ship 12.84, tone
             1.26e-5 vs 5.99e-6 (single f32-rounded weight drops the
             split twiddle's effective-f64 product); 1024 13.33 vs
             13.83; 3072 9.09 vs 9.16 with tone 1.95e-5 vs 8.88e-6.
  foldsplit  recovers the accuracy (6.6e-6) but 8 batched matmuls cost
             7.66 GS/s at 2048 vs 12.84.
  stack      wash at 1024 (14.10 vs 14.27), loses at 2048 (11.44 vs
             13.06): the 256-wide output forces worse layouts than the
             two lhs re-reads it saves.
  kara       FASTER everywhere (2048 14.2 vs 13.0, 1024 16.0 vs 14.5,
             3072 10.6 vs 9.2; 25% fewer HIGHEST MXU passes) and fine
             on single realizations (6.05e-6 vs 5.99e-6) — but the
             30-seed adversarial distribution on IDENTICAL seeds
             (probes/hybrid_s2_dist.py) shows Xi = t3-t1-t2
             cancellation fattens the tail ~1.5x: max/class-max 2.28x
             vs ship's 1.53x, median 1.16x vs 0.95x. Same call as the
             mid-band decision (ROADMAP item 10): don't spend the 3x
             budget ceiling for <10%.
  cplx       numerically the best form (one fused accumulation per
             output element) but 10.08 GS/s at 2048 vs 13.05 — the
             [zr zi] concat + 256-wide K/N layout loses more than the
             merged accumulation saves.
  tfree      explicit pre-transpose + last-axis FFT + in-place axis-1
             stage-2 contraction: bitwise-same numerics, speed WASH
             (12.84 vs 12.97 at 2048, 14.34 vs 14.44 at 1024) — XLA
             emits the same relayouts whether the transpose is implicit
             in fft(axis=1) or explicit, so the pre-FFT copies seen in
             the HLO are not removable at the JAX level.
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.ops.dft import (best_hybrid_split,
                                        fourstep_hybrid_psd_partial)
from probes.hybrid_large import make_tone_raw, want64, relerr

_HI = jax.lax.Precision.HIGHEST
ITER_LO, ITER_HI = 32, 128


def _fold_weights(N, N1, N2, split):
    k1 = np.arange(N1, dtype=np.float64)[:, None, None]
    n2 = np.arange(N2, dtype=np.float64)[:, None][None]
    k2 = np.arange(N2, dtype=np.float64)[None, None, :]
    ang = -2.0 * np.pi * (((k1 * n2) % N) / N + ((n2 * k2) % N2) / N2)
    Mr, Mi = np.cos(ang), np.sin(ang)
    hr, hi = Mr.astype(np.float32), Mi.astype(np.float32)
    if not split:
        return (hr, hi)
    return (hr, hi, (Mr - hr).astype(np.float32), (Mi - hi).astype(np.float32))


def fold_psd_partial(re, im, fmask, N1, N2, chunk=64, split=False):
    F, N = re.shape
    w = tuple(jnp.asarray(a) for a in _fold_weights(N, N1, N2, split))
    while F % chunk != 0:
        chunk //= 2
    x = jax.lax.complex(re, im).reshape(F, N1, N2)
    y = jnp.fft.fft(x, axis=1)                    # over n1 -> (F, k1, n2)
    yr, yi = jnp.real(y), jnp.imag(y)

    def bmm(a, b):
        return jnp.einsum("fkn,knm->fkm", a, b, precision=_HI)

    hr, hi = w[0], w[1]
    Xr = bmm(yr, hr) - bmm(yi, hi)
    Xi = bmm(yr, hi) + bmm(yi, hr)
    if split:
        lr, li = w[2], w[3]
        Xr = Xr + (bmm(yr, lr) - bmm(yi, li))
        Xi = Xi + (bmm(yr, li) + bmm(yi, lr))
    p = (Xr * Xr + Xi * Xi) * fmask[:, None, None]
    g = F // chunk
    s = p.reshape(g, chunk, N1, N2).sum(axis=1).sum(axis=0)
    return jnp.swapaxes(s, 0, 1).reshape(N)


def stack_psd_partial(re, im, fmask, N1, N2, chunk=64):
    """Split twiddle kept, but stage-2 weights stacked [c2|s2] so each z
    operand feeds ONE 256-wide matmul instead of two 128-wide ones —
    halves the lhs HBM reads if XLA keeps the convs unmerged."""
    from rtl_power_fftw_tpu.ops.dft import _hybrid_constants
    F, N = re.shape
    thr, thi, tlr, tli, c2, s2 = (
        jnp.asarray(a) for a in _hybrid_constants(N, N1, N2))
    wa = jnp.concatenate([c2, s2], axis=1)        # (N2, 2*N2)
    wb = jnp.concatenate([s2, c2], axis=1)
    while F % chunk != 0:
        chunk //= 2
    x = jax.lax.complex(re, im).reshape(F, N1, N2)
    y = jnp.fft.fft(x, axis=1)
    yr, yi = jnp.real(y), jnp.imag(y)
    zr = (yr * thr[None] - yi * thi[None]) + (yr * tlr[None] - yi * tli[None])
    zi = (yr * thi[None] + yi * thr[None]) + (yr * tli[None] + yi * tlr[None])
    A = jnp.matmul(zr, wa, precision=_HI)         # [zr@c2 | zr@s2]
    B = jnp.matmul(zi, wb, precision=_HI)         # [zi@s2 | zi@c2]
    Xr = A[..., :N2] - B[..., :N2]
    Xi = A[..., N2:] + B[..., N2:]
    p = (Xr * Xr + Xi * Xi) * fmask[:, None, None]
    g = F // chunk
    s = p.reshape(g, chunk, N1, N2).sum(axis=1).sum(axis=0)
    return jnp.swapaxes(s, 0, 1).reshape(N)


def kara_psd_partial(re, im, fmask, N1, N2, chunk=64):
    """Split twiddle kept; stage 2 as a Karatsuba 3-mult complex matmul
    at HIGHEST (25% fewer MXU passes than the 4-mult form; the (zr+zi)
    operand may cost ~1 bit under a tone — that's what this measures)."""
    from rtl_power_fftw_tpu.ops.dft import _hybrid_constants, _karatsuba_weight
    F, N = re.shape
    thr, thi, tlr, tli, c2, s2 = (
        jnp.asarray(a) for a in _hybrid_constants(N, N1, N2))
    cs2 = jnp.asarray(_karatsuba_weight(N2))
    while F % chunk != 0:
        chunk //= 2
    x = jax.lax.complex(re, im).reshape(F, N1, N2)
    y = jnp.fft.fft(x, axis=1)
    yr, yi = jnp.real(y), jnp.imag(y)
    zr = (yr * thr[None] - yi * thi[None]) + (yr * tlr[None] - yi * tli[None])
    zi = (yr * thi[None] + yi * thr[None]) + (yr * tli[None] + yi * tlr[None])
    t1 = jnp.matmul(zr, c2, precision=_HI)
    t2 = jnp.matmul(zi, s2, precision=_HI)
    t3 = jnp.matmul(zr + zi, cs2, precision=_HI)
    Xr = t1 - t2
    Xi = t3 - t1 - t2
    p = (Xr * Xr + Xi * Xi) * fmask[:, None, None]
    g = F // chunk
    s = p.reshape(g, chunk, N1, N2).sum(axis=1).sum(axis=0)
    return jnp.swapaxes(s, 0, 1).reshape(N)


def cplx_psd_partial(re, im, fmask, N1, N2, chunk=64):
    """Split twiddle kept; stage 2 as ONE real-embedding matmul
    [zr zi] @ [[c2, s2], [-s2, c2]] — same FLOPs as the 4-mult form but
    a single fused accumulation per output element (no inter-matmul
    rounding, no Karatsuba cancellation), one dispatch instead of 4."""
    from rtl_power_fftw_tpu.ops.dft import _hybrid_constants
    F, N = re.shape
    consts = _hybrid_constants(N, N1, N2)
    thr, thi, tlr, tli = (jnp.asarray(a) for a in consts[:4])
    c2n, s2n = consts[4], consts[5]
    w = jnp.asarray(np.block([[c2n, s2n], [-s2n, c2n]]))  # (2*N2, 2*N2)
    while F % chunk != 0:
        chunk //= 2
    x = jax.lax.complex(re, im).reshape(F, N1, N2)
    y = jnp.fft.fft(x, axis=1)
    yr, yi = jnp.real(y), jnp.imag(y)
    zr = (yr * thr[None] - yi * thi[None]) + (yr * tlr[None] - yi * tli[None])
    zi = (yr * thi[None] + yi * thr[None]) + (yr * tli[None] + yi * tlr[None])
    zcat = jnp.concatenate([zr, zi], axis=-1)     # (F, N1, 2*N2)
    XY = jnp.matmul(zcat, w, precision=_HI)       # [Xr | Xi]
    Xr = XY[..., :N2]
    Xi = XY[..., N2:]
    p = (Xr * Xr + Xi * Xi) * fmask[:, None, None]
    g = F // chunk
    s = p.reshape(g, chunk, N1, N2).sum(axis=1).sum(axis=0)
    return jnp.swapaxes(s, 0, 1).reshape(N)


def _tfree_constants(N, N1, N2):
    """Hybrid constants with the twiddle stored (n2, k1) for the
    explicit-transpose form."""
    n2 = np.arange(N2, dtype=np.float64)[:, None]
    k1 = np.arange(N1, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * ((n2 * k1) % N) / N
    tr, ti = np.cos(ang), np.sin(ang)
    thr, thi = tr.astype(np.float32), ti.astype(np.float32)
    return (thr, thi, (tr - thr).astype(np.float32),
            (ti - thi).astype(np.float32))


def tfree_psd_partial(re, im, fmask, N1, N2, chunk=64):
    """Same math as ship (split twiddle + 4-mult HIGHEST) but the
    stage-1 FFT runs over the LAST axis of an explicitly pre-transposed
    (F, n2, n1) array — giving XLA the option to fuse the relayout into
    the dequant fusion instead of emitting separate pre-FFT copies —
    and stage 2 contracts the n2 axis in place (dot_general axis 1,
    like fourstep_psd_partial). Numerics identical to ship."""
    from rtl_power_fftw_tpu.ops.dft import _dft_matrices
    F, N = re.shape
    thr, thi, tlr, tli = (jnp.asarray(a)
                          for a in _tfree_constants(N, N1, N2))
    c2, s2 = (jnp.asarray(a) for a in _dft_matrices(N2))
    while F % chunk != 0:
        chunk //= 2
    x = jax.lax.complex(re, im).reshape(F, N1, N2)
    xt = jnp.swapaxes(x, 1, 2)                    # (F, n2, n1)
    y = jnp.fft.fft(xt, axis=-1)                  # over n1 -> (F, n2, k1)
    yr, yi = jnp.real(y), jnp.imag(y)
    zr = (yr * thr[None] - yi * thi[None]) + (yr * tlr[None] - yi * tli[None])
    zi = (yr * thi[None] + yi * thr[None]) + (yr * tli[None] + yi * tlr[None])
    dn = (((1,), (0,)), ((), ()))                 # contract n2 (axis 1)
    Xr = (jax.lax.dot_general(zr, c2, dn, precision=_HI)
          - jax.lax.dot_general(zi, s2, dn, precision=_HI))
    Xi = (jax.lax.dot_general(zr, s2, dn, precision=_HI)
          + jax.lax.dot_general(zi, c2, dn, precision=_HI))  # (F, k1, k2)
    p = (Xr * Xr + Xi * Xi) * fmask[:, None, None]
    g = F // chunk
    s = p.reshape(g, chunk, N1, N2).sum(axis=1).sum(axis=0)
    return jnp.swapaxes(s, 0, 1).reshape(N)


def run(N):
    F = 4096 if N <= 4096 else max(8, (1 << 23) // N)
    N1, N2 = best_hybrid_split(N, min_n1=8)
    raw_t = make_tone_raw(N, F)
    want_t = want64(raw_t, N)
    rng = np.random.default_rng(0)
    raw_u = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    want_u = want64(raw_u, N)
    fmask = np.ones(F, np.float32)

    all_schemes = {
        "ship": partial(fourstep_hybrid_psd_partial, N1=N1, N2=N2),
        "fold": partial(fold_psd_partial, N1=N1, N2=N2, split=False),
        "foldsplit": partial(fold_psd_partial, N1=N1, N2=N2, split=True),
        "stack": partial(stack_psd_partial, N1=N1, N2=N2),
        "kara": partial(kara_psd_partial, N1=N1, N2=N2),
        "cplx": partial(cplx_psd_partial, N1=N1, N2=N2),
        "tfree": partial(tfree_psd_partial, N1=N1, N2=N2),
    }
    names = [a for a in sys.argv[1:] if not a.isdigit()] or list(all_schemes)
    schemes = [(n, all_schemes[n]) for n in names]
    for name, fn in schemes:
        core = jax.jit(fn)

        def from_u16(raw16, fn_core=core):
            v = raw16.astype(jnp.int32)
            re = ((v & 0xFF) - 127).astype(jnp.float32)
            im = ((v >> 8) - 127).astype(jnp.float32)
            return fn_core(re, im, jnp.asarray(fmask))

        step = jax.jit(from_u16)
        e_u = relerr(np.asarray(step(raw_u.view(np.uint16)), np.float64),
                     want_u)
        e_t = relerr(np.asarray(step(raw_t.view(np.uint16)), np.float64),
                     want_t)
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

        t_lo = t_hi = float("inf")
        for _ in range(3):
            t_lo = min(t_lo, timed(ITER_LO))
            t_hi = min(t_hi, timed(ITER_HI))
        per = (t_hi - t_lo) / (ITER_HI - ITER_LO)
        print(f"N={N:6d} F={F:4d} {name:9s} ({N1}x{N2})  uni={e_u:.2e} "
              f"tone={e_t:.2e}  {F * N / per / 1e9:6.2f} GS/s", flush=True)


if __name__ == "__main__":
    Ns = [int(a) for a in sys.argv[1:] if a.isdigit()] or [1024, 2048, 3072]
    for N in Ns:
        run(N)
