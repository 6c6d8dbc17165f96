"""Cut-point attribution for the chunked split-pass stage 1 (round 5).

probes/windowed_s1x.py run 3: the explicit split-pass stage 1 with a
CHUNKED f32 contraction (chunk_k=16, tree-summed) takes windowed 2048
from the shipped 2.05x to 1.44-1.45x class (PASS) — confirming the
round-5 mechanism chain (dropped HIGHEST cross-products + f32
contraction accumulation depth). But 4096 still reads 1.74-1.83x.

Suspect: the fourstep4m TAIL. Its stage-2 chunking is
``s2_chunks = N2 // 256`` (ops/dft.py _fourstep4m_tail) — tuned for the
LARGE-N bands it was built for — so at session sizes (N2 <= 128) stage
2 is a single UNCHUNKED Precision.HIGHEST matmul carrying exactly the
two error terms stage 1 just shed: the emulation's dropped
cross-products on non-integer operands and a depth-N2 sequential f32
accumulation.

This probe cuts the chunk-16 split-pass pipeline at four points and
finishes everything after the cut in f64 on the host, so each arm
reads the cumulative device error up to its cut:

  base     unsplit HIGHEST stage 1 (shipping fs4m stage 1) | f64 rest
           — calibration vs probes/s1_diag2.py's base arm (2.1-2.4x)
  c16      chunked split-pass stage 1                      | f64 rest
  c16-tw   + device split twiddle                          | f64 stage2+power
  c16-s2   + device HIGHEST stage 2 (the shipped tail)     | f64 power+sum

c16 ~= class and c16-s2 ~= the full-path excess would pin the residual
on the tail's stage-2 matmul (then the fix is the same split-pass +
chunked contraction treatment for stage 2); c16-s2 well below the full
path would instead implicate the f32 power/frame-sum.

Run on TPU:  python probes/s1x_diag.py [seeds [N,N,...]]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import scipy.fft

from rtl_power_fftw_tpu.auxdata import make_window
from rtl_power_fftw_tpu.ops.dft import (_dft_matrices,
                                        _fourstep4m_constants,
                                        best_fourstep_split)

SEEDS = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
         else 20)
NS = (tuple(int(n) for n in sys.argv[2].split(","))
      if len(sys.argv) > 2 else (4096, 2048))
F = 512
_HI = jax.lax.Precision.HIGHEST
CHUNK_K = 16
N_TERMS = 4
MAX_IJ = (2, 2, 1, 0)


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
    return out


def main():
    for N in NS:
        N1, N2 = best_fourstep_split(N)
        w = make_window("hann", N)
        w64 = w.astype(np.float64)
        wj = jnp.asarray(w).reshape(N1, N2)[None]
        consts = tuple(jnp.asarray(a)
                       for a in _fourstep4m_constants(N, N1, N2))
        c1j, s1j = consts[0], consts[1]
        c2j, s2j, thr, thi, tlr, tli = consts[2:]
        c1n, s1n = (m.astype(np.float64) for m in _dft_matrices(N1))
        G = N1 // CHUNK_K if (N1 % CHUNK_K == 0 and N1 > CHUNK_K) else 1
        Kc = N1 // G

        def split_w(m):
            ts = [jnp.asarray(t) for t in terms3(m)]
            if G > 1:
                ts = [t.reshape(G, Kc, N1) for t in ts]
            return ts

        c1t, s1t = split_w(c1n), split_w(s1n)
        dnb = (((3,), (1,)), ((2,), (0,)))
        dn = (((1,), (0,)), ((), ()))
        f32, bf16 = jnp.float32, jnp.bfloat16

        def mm(z, wt):
            if G > 1:
                return jax.lax.dot_general(z, wt, dnb,
                                           preferred_element_type=f32)
            return jax.lax.dot_general(z, wt, dn,
                                       preferred_element_type=f32)

        def trunc_terms(z):
            def trunc(v):
                u = jax.lax.bitcast_convert_type(v, jnp.uint32)
                return jax.lax.bitcast_convert_type(
                    u & np.uint32(0xFFFF0000), jnp.float32)
            out, r = [], z
            for _ in range(N_TERMS):
                t = trunc(r)
                out.append(t.astype(bf16))
                r = r - t
            return out

        def prod(z, wts):
            if G > 1:
                z = jnp.swapaxes(z, 1, 2).reshape(F, N2, G, Kc)
            zs = trunc_terms(z)
            acc = None
            for i in range(N_TERMS):
                for j in range(MAX_IJ[i] + 1):
                    t = mm(zs[i], wts[j])
                    acc = t if acc is None else acc + t
            if G > 1:
                parts = [acc[g] for g in range(G)]
                while len(parts) > 1:
                    parts = [parts[i] + parts[i + 1]
                             if i + 1 < len(parts) else parts[i]
                             for i in range(0, len(parts), 2)]
                return parts[0]
            return acc

        def hdot(a, b):
            return jax.lax.dot_general(a, b, dn, precision=_HI)

        @jax.jit
        def arms(re, im):
            xr = (re.reshape(F, N1, N2) * wj)
            xi = (im.reshape(F, N1, N2) * wj)
            # base: shipping unsplit HIGHEST stage 1.
            ybr = hdot(xr, c1j) - hdot(xi, s1j)
            ybi = hdot(xr, s1j) + hdot(xi, c1j)
            # c16: chunked split-pass stage 1.
            yr = prod(xr, c1t) - prod(xi, s1t)
            yi = prod(xr, s1t) + prod(xi, c1t)
            # c16-tw: + split twiddle on device.
            zr = (yr * thr - yi * thi) + (yr * tlr - yi * tli)
            zi = (yr * thi + yi * thr) + (yr * tli + yi * tlr)
            # c16-s2: + HIGHEST stage 2 on device (the shipped tail's
            # session-size branch: s2_chunks == 1).
            Xr = hdot(zr, c2j) - hdot(zi, s2j)
            Xi = hdot(zr, s2j) + hdot(zi, c2j)
            return (ybr, ybi), (yr, yi), (zr, zi), (Xr, Xi)

        # f64 downstream pieces.
        n2_ = np.arange(N2, dtype=np.int64)[:, None]
        k1_ = np.arange(N1, dtype=np.int64)[None, :]
        ang = -2.0 * np.pi * ((n2_ * k1_) % N).astype(np.float64) / N
        tw = np.cos(ang) + 1j * np.sin(ang)
        i2 = np.arange(N2, dtype=np.float64)
        ang2 = -2.0 * np.pi * (np.outer(i2, i2) % N2) / N2
        W2 = np.cos(ang2) + 1j * np.sin(ang2)

        def from_y(yr, yi):
            z = (yr.astype(np.float64) + 1j * yi.astype(np.float64)) \
                * tw[None]
            return from_z(z.real, z.imag)

        def from_z(zr, zi):
            z = zr.astype(np.float64) + 1j * zi.astype(np.float64)
            X = np.einsum("fmk,ml->fkl", z, W2)
            return from_X(X.real, X.imag)

        def from_X(Xr, Xi):
            p = (Xr.astype(np.float64) ** 2 + Xi.astype(np.float64) ** 2
                 ).sum(0)
            return np.swapaxes(p, 0, 1).reshape(N)

        labels = ["base", "c16", "c16-tw", "c16-s2"]
        errs = {k: [] for k in labels}
        cls_d = []
        for s in range(SEEDS):
            rng = np.random.default_rng(3000 + s)
            f0 = rng.uniform(0.05, 0.45)
            ph = rng.uniform(0, 2 * np.pi)
            t = np.arange(F * N)
            x = 100.0 * np.exp(1j * (2 * np.pi * f0 * t + ph)) + (
                rng.standard_normal(F * N)
                + 1j * rng.standard_normal(F * N))
            re8 = np.clip(np.round(x.real + 127), 0, 255).astype(np.uint8)
            im8 = np.clip(np.round(x.imag + 127), 0, 255).astype(np.uint8)
            re = re8.astype(np.float32).reshape(F, N) - 127
            im = im8.astype(np.float32).reshape(F, N) - 127
            z = re.astype(np.float64) + 1j * im.astype(np.float64)
            X = np.fft.fft(z * w64, axis=1)
            want = (X.real ** 2 + X.imag ** 2).sum(0)
            zw32 = (z * w64).astype(np.complex64)
            Xc = scipy.fft.fft(zw32, axis=1)
            cls_d.append(rel((Xc.real.astype(np.float64) ** 2
                              + Xc.imag.astype(np.float64) ** 2).sum(0),
                             want))
            yb, yc, zc, Xc_dev = arms(jnp.asarray(re), jnp.asarray(im))
            errs["base"].append(rel(from_y(np.asarray(yb[0]),
                                           np.asarray(yb[1])), want))
            errs["c16"].append(rel(from_y(np.asarray(yc[0]),
                                          np.asarray(yc[1])), want))
            errs["c16-tw"].append(rel(from_z(np.asarray(zc[0]),
                                             np.asarray(zc[1])), want))
            errs["c16-s2"].append(rel(from_X(np.asarray(Xc_dev[0]),
                                             np.asarray(Xc_dev[1])),
                                      want))
            if (s + 1) % 10 == 0:
                print(f"  ...{s + 1}/{SEEDS}", flush=True)
        cls_d = np.asarray(cls_d)
        print(f"N={N} ({N1}x{N2}) F={F} seeds={SEEDS}: class "
              f"p50={np.median(cls_d):.2e}", flush=True)
        for k in labels:
            e = np.asarray(errs[k])
            print(f"  {k:7s} [cut->f64] med={np.median(e) / np.median(cls_d):.2f}x "
                  f"max={e.max() / cls_d.max():.2f}x", flush=True)


if __name__ == "__main__":
    main()
