"""Stage-1 mechanism diagnostic for the split-window fourstep4m.

probes/windowed_s1.py measured (60 seeds, strict yard):
  * s1sw-bf (lo plane at DEFAULT) BEATS the shipped fourstep4m at
    1024-3072 (med 2.04->1.01 at 1024) but LOSES by 4096;
  * s1sw-h3 (lo at HIGH) and s1sw-hi (lo at HIGHEST) are
    INDISTINGUISHABLE from the unsplit baseline at every size.

That pattern contradicts the simple input-representation story (an
accurate lo plane should preserve the split's benefit). This probe
isolates STAGE 1 ONLY: compute y = S1(x*w) directly in each arm on the
device, compare against the float64 stage-1, and bit-compare arms to
detect XLA rewrites (dot(a,W)+dot(b,W) -> dot(a+b,W) would make the
split arms literally identical to the baseline).

Arms:
  base     dot(f32(x*w), c1) at HIGHEST          (the shipped stage 1)
  sw-bf    dot(x*wh, HI) + dot(x*wl, DEFAULT)
  sw-h3    dot(x*wh, HI) + dot(x*wl, HIGH)
  sw-hi    dot(x*wh, HI) + dot(x*wl, HIGHEST)
  sw-sep   dot(x*wh, HI) + shard-blocked lo: the lo dot wrapped in
           optimization_barrier so NO rewrite can merge it
  int      dot(x_integer, HI) (no window) — the unwindowed anchor, for
           scale

Run on TPU:  python probes/s1_diag.py [N [seeds]]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.auxdata import make_window
from rtl_power_fftw_tpu.ops.dft import _dft_matrices, split_window, \
    best_fourstep_split

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
SEEDS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
F = 8
_HI = jax.lax.Precision.HIGHEST


def main():
    N1, N2 = best_fourstep_split(N)
    c1, s1 = _dft_matrices(N1)
    c1j, s1j = jnp.asarray(c1), jnp.asarray(s1)
    w = make_window("hann", N)
    w64 = w.astype(np.float64)
    wh, wl = split_window(w64)
    whj = jnp.asarray(wh).reshape(N1, N2)[None]
    wlj = jnp.asarray(wl).reshape(N1, N2)[None]
    wj = jnp.asarray(w).reshape(N1, N2)[None]
    dn = (((1,), (0,)), ((), ()))

    def dot(a, b, p):
        return jax.lax.dot_general(a, b, dn, precision=p)

    def stage1(xr, xi, p):
        return (dot(xr, c1j, p) - dot(xi, s1j, p),
                dot(xr, s1j, p) + dot(xi, c1j, p))

    @jax.jit
    def arms(re, im):
        xr = re.reshape(F, N1, N2)
        xi = im.reshape(F, N1, N2)
        out = {}
        out["base"] = stage1(xr * wj, xi * wj, _HI)
        for name, lp in (("sw-bf", jax.lax.Precision.DEFAULT),
                         ("sw-h3", jax.lax.Precision.HIGH),
                         ("sw-hi", _HI)):
            yh = stage1(xr * whj, xi * whj, _HI)
            yl = stage1(xr * wlj, xi * wlj, lp)
            out[name] = (yh[0] + yl[0], yh[1] + yl[1])
        # Rewrite-proof split: the lo plane passes through an
        # optimization barrier before its HIGHEST dot, so no algebraic
        # rewrite can recombine the planes.
        xrl, xil = jax.lax.optimization_barrier((xr * wlj, xi * wlj))
        yh = stage1(xr * whj, xi * whj, _HI)
        yl = stage1(xrl, xil, _HI)
        out["sw-sep"] = (yh[0] + yl[0], yh[1] + yl[1])
        out["int"] = stage1(xr, xi, _HI)
        return out

    labels = ["base", "sw-bf", "sw-h3", "sw-hi", "sw-sep", "int"]
    errs = {k: [] for k in labels}
    ident = {k: True for k in labels}
    for s in range(SEEDS):
        rng = np.random.default_rng(4000 + s)
        f0 = rng.uniform(0.05, 0.45)
        t = np.arange(F * N)
        x = 100.0 * np.exp(1j * 2 * np.pi * f0 * t) + (
            rng.standard_normal(F * N) + 1j * rng.standard_normal(F * N))
        re = np.round(np.clip(x.real, -127, 128)).astype(np.float32)
        im = np.round(np.clip(x.imag, -127, 128)).astype(np.float32)
        out = {k: (np.asarray(v[0], np.float64), np.asarray(v[1], np.float64))
               for k, v in arms(jnp.asarray(re), jnp.asarray(im)).items()}
        # float64 reference of stage 1 on the EXACT windowed input.
        xr64 = (re.astype(np.float64).reshape(F, N1, N2)
                * w64.reshape(N1, N2))
        xi64 = (im.astype(np.float64).reshape(F, N1, N2)
                * w64.reshape(N1, N2))
        c164, s164 = (np.cos, np.sin)
        n_ = np.arange(N1, dtype=np.float64)[:, None]
        k_ = np.arange(N1, dtype=np.float64)[None, :]
        ang = -2.0 * np.pi * ((n_ * k_) % N1) / N1
        c164, s164 = np.cos(ang), np.sin(ang)
        ref_r = (np.einsum("fnm,nk->fmk", xr64, c164)
                 - np.einsum("fnm,nk->fmk", xi64, s164))
        ref_i = (np.einsum("fnm,nk->fmk", xr64, s164)
                 + np.einsum("fnm,nk->fmk", xi64, c164))
        scale = np.sqrt(ref_r ** 2 + ref_i ** 2).max()
        # integer arm compares against the unwindowed f64 stage 1
        iref_r = (np.einsum("fnm,nk->fmk", re.astype(np.float64).reshape(
            F, N1, N2), c164)
            - np.einsum("fnm,nk->fmk", im.astype(np.float64).reshape(
                F, N1, N2), s164))
        iref_i = (np.einsum("fnm,nk->fmk", re.astype(np.float64).reshape(
            F, N1, N2), s164)
            + np.einsum("fnm,nk->fmk", im.astype(np.float64).reshape(
                F, N1, N2), c164))
        iscale = np.sqrt(iref_r ** 2 + iref_i ** 2).max()
        for k in labels:
            rr, ii = out[k]
            if k == "int":
                e = max(np.abs(rr - iref_r).max(),
                        np.abs(ii - iref_i).max()) / iscale
            else:
                e = max(np.abs(rr - ref_r).max(),
                        np.abs(ii - ref_i).max()) / scale
            errs[k].append(e)
            if k != "base":
                ident[k] &= bool(np.array_equal(rr, out["base"][0])
                                 and np.array_equal(ii, out["base"][1]))
    print(f"N={N} N1={N1} N2={N2} F={F} seeds={SEEDS} "
          "(stage-1 output max-abs error / max |y|):")
    for k in labels:
        e = np.asarray(errs[k])
        tag = "  == base BIT-IDENTICAL" if (k != "base" and ident[k]) else ""
        print(f"  {k:7s} med={np.median(e):.3e} max={e.max():.3e}{tag}",
              flush=True)


if __name__ == "__main__":
    main()
