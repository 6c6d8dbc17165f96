"""PFB estimator accuracy yard (round 4): does the shipping PFB hold
the class budget, and what does the compensated four-step buy?

The PFB's polyphase sums are windowed-class (non-integer) planes, so
its "fourstep" TPU transform carries the same uncompensated-twiddle
error the windowed band had (probes/windowed_attrib.py).  This probe
measures, per realization (35 dB tone + noise), max-rel error of the
P-tap PFB PSD vs the float64 truth for:

  class      scipy-f32 FFT on the f32 polyphase sums (FFTW class)
  ship       models/pfb.py _pfb_core mode="fourstep" (the TPU pick)
  fs4m       the same body with the COMPENSATED fourstep4m partial

Budget semantics as everywhere: median <= 1.5x / max <= 3x class.

Run on TPU:  python probes/pfb_accuracy.py [N [F [P [seeds]]]]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import scipy.fft

from rtl_power_fftw_tpu.models.pfb import _pfb_core, pfb_prototype
from rtl_power_fftw_tpu.ops.spectral import adapt_batch, dequant_iq_u16
from rtl_power_fftw_tpu.ops.dft import (best_fourstep_split,
                                        fourstep4m_psd_partial)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
F = int(sys.argv[2]) if len(sys.argv) > 2 else 256
P = int(sys.argv[3]) if len(sys.argv) > 3 else 4
SEEDS = int(sys.argv[4]) if len(sys.argv) > 4 else 20


def realization(seed):
    rng = np.random.default_rng(seed)
    f0 = rng.uniform(0.05, 0.45)
    ph = rng.uniform(0, 2 * np.pi)
    t = np.arange((F + P - 1) * N)
    x = 100.0 * np.exp(1j * (2 * np.pi * f0 * t + ph)) + (
        rng.standard_normal(len(t)) + 1j * rng.standard_normal(len(t)))
    re8 = np.clip(np.round(x.real + 127), 0, 255).astype(np.uint8)
    im8 = np.clip(np.round(x.imag + 127), 0, 255).astype(np.uint8)
    return np.stack([re8, im8], axis=-1).reshape(F + P - 1, 2 * N)


def rel(got, want):
    return float((np.abs(np.asarray(got, np.float64) - want)
                  / np.maximum(np.abs(want), 1e-30)).max())


def main():
    F_, chunk = adapt_batch(F)
    assert F_ == F, "pass a multiple of 8"
    h64 = pfb_prototype(N, P).astype(np.float64).reshape(P, N)
    h = jnp.asarray(h64.astype(np.float32))
    n1, n2 = best_fourstep_split(N)

    @jax.jit
    def ship(raw16, nv):
        re, im = dequant_iq_u16(raw16)
        fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                 < nv).astype(jnp.float32)
        return _pfb_core(re, im, h, F, N, P, chunk, fmask,
                         mode="fourstep")

    @jax.jit
    def fs4m(raw16, nv):
        re, im = dequant_iq_u16(raw16)
        fmask = (jax.lax.broadcasted_iota(jnp.int32, (F,), 0)
                 < nv).astype(jnp.float32)
        sr = sum(re[p:p + F] * h[p][None] for p in range(P))
        si = sum(im[p:p + F] * h[p][None] for p in range(P))
        return fourstep4m_psd_partial(sr, si, fmask, n1, n2, chunk=chunk)

    errs = {"ship": [], "fs4m": []}
    cls_d = []
    for s in range(SEEDS):
        raw = realization(6000 + s)
        z = (raw[:, 0::2].astype(np.float64) - 127.0) \
            + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
        S = sum(z[p:p + F] * h64[p][None] for p in range(P))
        X = np.fft.fft(S, axis=1)
        want = (X.real ** 2 + X.imag ** 2).sum(0)
        S32 = S.astype(np.complex64)
        Xc = scipy.fft.fft(S32, axis=1)
        cls_d.append(rel((Xc.real.astype(np.float64) ** 2
                          + Xc.imag.astype(np.float64) ** 2).sum(0), want))
        u16 = raw.view(np.uint16)
        errs["ship"].append(rel(ship(u16, jnp.int32(F)), want))
        errs["fs4m"].append(rel(fs4m(u16, jnp.int32(F)), want))
    cls_d = np.asarray(cls_d)
    print(f"N={N} F={F} P={P}: scipy class p50={np.median(cls_d):.2e} "
          f"max={cls_d.max():.2e}", flush=True)
    for b, e in errs.items():
        e = np.asarray(e)
        med_r = np.median(e) / np.median(cls_d)
        max_r = e.max() / cls_d.max()
        ok = med_r <= 1.5 and max_r <= 3.0
        print(f"  {b:5s} p50={med_r:.2f}x max={max_r:.2f}x "
              f"{'PASS' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
