"""Adversarial-tone distribution for hybrid STAGE-2 variants.

The committed guarantee (BENCHMARKS.md, test_numerics) is stated as
median(ours) <= 1.5*median(class) and max(ours) <= 3*max(class) over
seeded 35 dB-tone realizations. This probe measures those two statistics
per stage-2 form so a faster form only ships if the tail holds:
  ship  4-mult HIGHEST (the tone-robustness anchor)
  kara  Karatsuba 3-mult (25% fewer MXU passes; Xi = t3-t1-t2 cancels)
  cplx  one real-embedding matmul [zr zi]@[[c2,s2],[-s2,c2]]

Run on TPU:  python probes/hybrid_s2_dist.py [seeds] [N] [names...]
"""
import sys
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import scipy.fft

from rtl_power_fftw_tpu.ops.dft import (best_hybrid_split,
                                        fourstep_hybrid_psd_partial)
from probes.hybrid_fold import kara_psd_partial, cplx_psd_partial
from probes.tone_distribution import realization, f64_truth, rel

ints = [a for a in sys.argv[1:] if a.isdigit()]
SEEDS = int(ints[0]) if ints else 30
N = int(ints[1]) if len(ints) > 1 else 2048
F = 64


def main():
    N1, N2 = best_hybrid_split(N, min_n1=8)
    variants = {
        "ship": fourstep_hybrid_psd_partial,
        "kara": kara_psd_partial,
        "cplx": cplx_psd_partial,
    }
    names = [a for a in sys.argv[1:] if not a.isdigit()] or list(variants)

    raws = [realization(N, F, 1000 + s) for s in range(SEEDS)]
    wants = [f64_truth(r) for r in raws]
    cls = []
    for raw, want in zip(raws, wants):
        z32 = ((raw[:, 0::2].astype(np.float32) - np.float32(127.0))
               + 1j * (raw[:, 1::2].astype(np.float32) - np.float32(127.0))
               ).astype(np.complex64)
        X = scipy.fft.fft(z32, axis=1)
        cls.append(rel((X.real.astype(np.float64) ** 2
                        + X.imag.astype(np.float64) ** 2).sum(0), want))
    c50, cmax = float(np.median(cls)), float(max(cls))
    print(f"class: p50={c50:.2e} max={cmax:.2e}  (N={N}, {N1}x{N2}, "
          f"F={F}, seeds={SEEDS})", flush=True)

    fmask = jnp.ones(F, jnp.float32)
    for name in names:
        core = jax.jit(partial(variants[name], N1=N1, N2=N2))

        @jax.jit
        def step(raw16, fn_core=core):
            v = raw16.astype(jnp.int32)
            re = ((v & 0xFF) - 127).astype(jnp.float32)
            im = ((v >> 8) - 127).astype(jnp.float32)
            return fn_core(re, im, fmask)

        ours = [rel(np.asarray(step(r.view(np.uint16)), np.float64), w)
                for r, w in zip(raws, wants)]
        o50, omax = float(np.median(ours)), float(max(ours))
        print(f"{name:5s} p50={o50:.2e} max={omax:.2e}  "
              f"p50/class-p50={o50 / c50:.2f}  max/class-max={omax / cmax:.2f}",
              flush=True)


if __name__ == "__main__":
    main()
