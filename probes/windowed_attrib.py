"""Windowed large-N ERROR ATTRIBUTION: which stage carries the excess?

The round-3 verdict: at windowed 2^17-2^19 the shipping paths sit above
the 1.5x-median class budget (hybrid p50 1.88x at 2^19; fourstep is the
only passer at 2^17/2^18 and fails 2^19 at 1.94x).  The split-window
probe proved the excess is NOT input-representation rounding.  Before
building a compensated stage 2 (round-4 ask #1) this probe decides WHERE
the error actually lives, by replacing everything downstream of each
stage with exact float64 host math on identical realizations:

  hybrid    A0 = all-device shipping step
            A1 = device stage-1 FFT (windowed)     -> f64 twiddle+stage2
            A2 = device split-window stage-1 FFT   -> f64 twiddle+stage2
  fourstep  F0 = all-device shipping step
            F1 = device stage-1 HIGHEST matmul     -> f64 twiddle+stage2

If A1 ~= A0, stage 1 dominates and no stage-2 compensation can close the
budget; if A1 ~= class, the twiddle+stage-2 chain dominates and the
compensated candidates (probes/windowed_comp.py) are worth running.

Run on TPU:  python probes/windowed_attrib.py [seeds [N,N,...]]
Defaults: 10 seeds, N = 2^17, 2^19.
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import scipy.fft

from rtl_power_fftw_tpu.auxdata import make_window
from rtl_power_fftw_tpu.ops.spectral import PsdStep, adapt_batch, dequant_iq_u16
from rtl_power_fftw_tpu.ops.dft import (
    best_fourstep_split, best_hybrid_split, split_window, _dft_matrices)

SEEDS = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
         else 10)
NS = (tuple(int(n) for n in sys.argv[2].split(","))
      if len(sys.argv) > 2 else (1 << 17, 1 << 19))


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


def finish_f64(y, N, N1, N2):
    """Exact twiddle + stage-2 + power-sum in float64 on the host for
    the hybrid layout: ``y`` = stage-1 output (F, k1, n2), complex128."""
    k1 = np.arange(N1, dtype=np.float64)
    n2 = np.arange(N2, dtype=np.float64)
    tw = np.exp(-2j * np.pi * ((k1[:, None] * n2[None, :]) % N) / N)
    z = y * tw[None]                           # (F, k1, n2)
    w2 = np.exp(-2j * np.pi * ((n2[:, None] * n2[None, :]) % N2) / N2)
    X = z @ w2                                 # (F, k1, k2)
    p = (X.real ** 2 + X.imag ** 2).sum(0)     # (k1, k2)
    return np.swapaxes(p, 0, 1).reshape(N)     # bin k = k1 + N1*k2


def finish_f64_n2k1(y, N, N1, N2):
    """f64 finish for the fourstep layout (F, n2, k1)."""
    n2 = np.arange(N2, dtype=np.float64)
    k1 = np.arange(N1, dtype=np.float64)
    tw = np.exp(-2j * np.pi * ((n2[:, None] * k1[None, :]) % N) / N)
    z = np.asarray(y) * tw[None]               # (F, n2, k1)
    w2 = np.exp(-2j * np.pi * ((n2[:, None] * n2[None, :]) % N2) / N2)
    X = np.einsum("fnk,nm->fkm", z, w2)        # (F, k1, k2)
    p = (X.real ** 2 + X.imag ** 2).sum(0)
    return np.swapaxes(p, 0, 1).reshape(N)


def main():
    for N in NS:
        F = max(8, min(512, (1 << 23) // N))
        F, chunk = adapt_batch(F)
        w = make_window("hann", N)
        w64 = w.astype(np.float64)
        n1h, n2h = best_hybrid_split(N, min_n1=8)
        n1f, n2f = best_fourstep_split(N)
        w_hi, w_lo = split_window(w)

        ship_h = PsdStep(N, F, window=w, backend="hybrid")
        ship_f = PsdStep(N, F, window=w, backend="fourstep")

        @jax.jit
        def s1_hyb(raw16):
            re, im = dequant_iq_u16(raw16, jnp.asarray(w))
            x = jax.lax.complex(re, im).reshape(F, n1h, n2h)
            y = jnp.fft.fft(x, axis=1)         # (F, k1, n2)
            # complex64 device->host transfer is UNIMPLEMENTED on this
            # backend; ship the planes.
            return jnp.real(y), jnp.imag(y)

        @jax.jit
        def s1_hyb_split(raw16):
            re, im = dequant_iq_u16(raw16)
            x = jax.lax.complex(re, im).reshape(F, n1h, n2h)
            wh = jnp.asarray(w_hi).reshape(n1h, n2h)[None]
            wl = jnp.asarray(w_lo).reshape(n1h, n2h)[None]
            y = jnp.fft.fft(x * wh, axis=1) + jnp.fft.fft(x * wl, axis=1)
            return jnp.real(y), jnp.imag(y)

        c1, s1m = (jnp.asarray(a) for a in _dft_matrices(n1f))
        dn = (((1,), (0,)), ((), ()))
        HI = jax.lax.Precision.HIGHEST

        @jax.jit
        def s1_four(raw16):
            re, im = dequant_iq_u16(raw16, jnp.asarray(w))
            xr = re.reshape(F, n1f, n2f)
            xi = im.reshape(F, n1f, n2f)
            yr = (jax.lax.dot_general(xr, c1, dn, precision=HI)
                  - jax.lax.dot_general(xi, s1m, dn, precision=HI))
            yi = (jax.lax.dot_general(xr, s1m, dn, precision=HI)
                  + jax.lax.dot_general(xi, c1, dn, precision=HI))
            return yr, yi                      # (F, n2, k1)

        names = ["class", "A0 hybrid", "A1 dev-s1+f64",
                 "A2 splitw-s1+f64", "F0 fourstep", "F1 dev-s1+f64"]
        errs = {k: [] for k in names}
        for s in range(SEEDS):
            raw = realization(N, F, 3000 + s)
            u16 = raw.view(np.uint16)
            z = (raw[:, 0::2].astype(np.float64) - 127.0) \
                + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
            X = np.fft.fft(z * w64, axis=1)
            want = (X.real ** 2 + X.imag ** 2).sum(0)
            zw32 = (z * w64).astype(np.complex64)
            Xc = scipy.fft.fft(zw32, axis=1)
            errs["class"].append(rel(
                (Xc.real.astype(np.float64) ** 2
                 + Xc.imag.astype(np.float64) ** 2).sum(0), want))

            errs["A0 hybrid"].append(rel(ship_h(u16.copy(), F), want))
            errs["F0 fourstep"].append(rel(ship_f(u16.copy(), F), want))

            yr_, yi_ = s1_hyb(u16)
            y = (np.asarray(yr_, np.float64) + 1j * np.asarray(yi_, np.float64))
            errs["A1 dev-s1+f64"].append(
                rel(finish_f64(y, N, n1h, n2h), want))
            yr_, yi_ = s1_hyb_split(u16)
            y = (np.asarray(yr_, np.float64) + 1j * np.asarray(yi_, np.float64))
            errs["A2 splitw-s1+f64"].append(
                rel(finish_f64(y, N, n1h, n2h), want))
            yr, yi = s1_four(u16)
            yc = (np.asarray(yr, np.float64)
                  + 1j * np.asarray(yi, np.float64))
            errs["F1 dev-s1+f64"].append(rel(
                finish_f64_n2k1(yc, N, n1f, n2f), want))
        cls = np.asarray(errs["class"])
        print(f"N={N} F={F} hyb=({n1h},{n2h}) four=({n1f},{n2f}): "
              f"class p50={np.median(cls):.2e} max={cls.max():.2e}",
              flush=True)
        for k in names[1:]:
            e = np.asarray(errs[k])
            print(f"  {k:18s} p50={np.median(e):.2e} "
                  f"({np.median(e)/np.median(cls):.2f}x) "
                  f"max={e.max():.2e} ({e.max()/cls.max():.2f}x)",
                  flush=True)


if __name__ == "__main__":
    main()
