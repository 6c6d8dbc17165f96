"""3-level hybrid at very large N: FFT(NA) -> tw1 -> FFT(NB) -> split
tw2 -> HIGHEST matmul(N2), vs the shipping 2-level large-N hybrid
(FFT(N1) with N1 = N/128 -> split twiddle -> matmul(128)).

Motivation: at N = 2^20 the 2-level's stage 1 is one batched 8192-point
FFT — if XLA lowers long batched FFTs poorly (it lowers the monolithic
2^20 one terribly), splitting stage 1 into two short FFT stages may
recover throughput at the cost of one extra (F, N) twiddle pass.

Index map (n = na*NB*N2 + nb*N2 + n2, k = ka + NA*kb + NA*NB*k2):
  fft over na -> ka; tw1 = W_N^(ka*(nb*N2+n2)); fft over nb -> kb;
  tw2 = W_(NB*N2)^(kb*n2) split hi+lo; matmul over n2 -> k2.

Run on TPU:  python probes/hybrid3_large.py [N ...]

RESULT (TPU v5e, measured): the 3-level LOSES everywhere — the extra
full-(F, N) complex twiddle pass costs more than the shorter FFT stages
save.  N=2^20: 8.26 GS/s best (64x128x128; 6.6/6.1 for the other
splits) vs the shipping 2-level large-N hybrid's 9.33 isolated, with no
accuracy gain (tone 1.05e-3 vs the 2-level's 0.94x class).  N=2^17:
8.1-8.4 vs ~13 shipping.  The 2-level asymmetric split stays; XLA's
batched medium-length FFT stage (8192-point) is NOT the bottleneck the
monolithic-2^20 lowering was.
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.ops.dft import best_hybrid_split, _dft_matrices
from rtl_power_fftw_tpu.ops.spectral import adapt_batch
from probes.hybrid_large import make_tone_raw, want64, relerr

_HI = jax.lax.Precision.HIGHEST
ITER_LO, ITER_HI = 8, 24


def _tw1(N, NA, NB, N2):
    ka = np.arange(NA, dtype=np.float64)[:, None, None]
    r = (np.arange(NB, dtype=np.float64)[:, None] * N2
         + np.arange(N2, dtype=np.float64)[None, :])[None]
    ang = -2.0 * np.pi * ((ka * r) % N) / N
    return (np.cos(ang) + 1j * np.sin(ang)).astype(np.complex64)


def _tw2_split(NB, N2):
    M = NB * N2
    kb = np.arange(NB, dtype=np.float64)[:, None]
    n2 = np.arange(N2, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * ((kb * n2) % M) / M
    tr, ti = np.cos(ang), np.sin(ang)
    thr, thi = tr.astype(np.float32), ti.astype(np.float32)
    return thr, thi, (tr - thr).astype(np.float32), (ti - thi).astype(np.float32)


def hybrid3_psd_partial(re, im, fmask, NA, NB, N2, chunk=8, split_tw2=True):
    F, N = re.shape
    assert NA * NB * N2 == N
    tw1 = jnp.asarray(_tw1(N, NA, NB, N2))
    thr, thi, tlr, tli = (jnp.asarray(a) for a in _tw2_split(NB, N2))
    c2, s2 = (jnp.asarray(a) for a in _dft_matrices(N2))
    while F % chunk != 0:
        chunk //= 2

    x = jax.lax.complex(re, im).reshape(F, NA, NB, N2)
    y = jnp.fft.fft(x, axis=1) * tw1[None]        # ka
    z = jnp.fft.fft(y, axis=2)                    # kb; (F, ka, kb, n2)
    zr, zi = jnp.real(z), jnp.imag(z)
    if split_tw2:
        wr = (zr * thr - zi * thi) + (zr * tlr - zi * tli)
        wi = (zr * thi + zi * thr) + (zr * tli + zi * tlr)
    else:
        wr = zr * thr - zi * thi
        wi = zr * thi + zi * thr
    Xr = (jnp.matmul(wr, c2, precision=_HI)
          - jnp.matmul(wi, s2, precision=_HI))    # (F, ka, kb, k2)
    Xi = (jnp.matmul(wr, s2, precision=_HI)
          + jnp.matmul(wi, c2, precision=_HI))
    p = (Xr * Xr + Xi * Xi) * fmask[:, None, None, None]
    g = F // chunk
    s = p.reshape(g, chunk, NA, NB, N2).sum(axis=1).sum(axis=0)
    # k = ka + NA*kb + NA*NB*k2 -> row-major (k2, kb, ka).
    return jnp.transpose(s, (2, 1, 0)).reshape(N)


def run(N, splits):
    F = max(8, min(64, (1 << 23) // N))
    F, chunk = adapt_batch(F)
    raw_t = make_tone_raw(N, F)
    want_t = want64(raw_t, N)
    fmask = np.ones(F, np.float32)
    for NA, NB, N2 in splits:
        core = jax.jit(partial(hybrid3_psd_partial, NA=NA, NB=NB, N2=N2,
                               chunk=chunk))

        def from_u16(raw16):
            v = raw16.astype(jnp.int32)
            re = ((v & 0xFF) - 127).astype(jnp.float32)
            im = ((v >> 8) - 127).astype(jnp.float32)
            return core(re, im, jnp.asarray(fmask))

        step = jax.jit(from_u16)
        got = np.asarray(step(raw_t.view(np.uint16)), np.float64)
        err = relerr(got, want_t)
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
        print(f"N={N:8d} F={F:3d} hyb3 ({NA}x{NB}x{N2})  tone={err:.2e}  "
              f"{F * N / per / 1e9:6.2f} GS/s", flush=True)


if __name__ == "__main__":
    run(1 << 20, [(64, 128, 128), (128, 64, 128), (32, 256, 128)])
    run(1 << 17, [(8, 128, 128), (64, 16, 128)])
