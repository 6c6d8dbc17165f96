"""Large-N tone-robust hybrid: error + throughput vs the fft4 default.

Decides the round-3 auto ladder for composite N > 8192 (VERDICT item 1):
can a hybrid four-step with an ASYMMETRIC split (FFT stage 1 over the
integer inputs, split twiddle, small-K Precision.HIGHEST matmul stage 2)
hold FFTW-f32-class tone accuracy (~1.5e-5) at >= 3 GS/s where the pure
FFT four-step leaks ~9e-5?

Run on TPU:  python probes/hybrid_large.py [N ...]
Each scheme prints: adversarial 35 dB-tone max rel error, uniform-input
max rel error, and slope-method GS/s.
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.ops.dft import (best_fourstep_split,
                                        best_hybrid_split,
                                        fourstep_fft_psd_partial,
                                        fourstep_hybrid_psd_partial)
from rtl_power_fftw_tpu.ops.spectral import adapt_batch

ITER_LO, ITER_HI = 8, 24


def make_tone_raw(N, F, seed=12, amp=100.0, f0=0.1303):
    t = np.arange(F * N)
    rng = np.random.default_rng(seed)
    x = amp * np.exp(2j * np.pi * f0 * t) + (
        rng.standard_normal(F * N) + 1j * rng.standard_normal(F * N))
    re8 = np.clip(np.round(x.real + 127), 0, 255).astype(np.uint8)
    im8 = np.clip(np.round(x.imag + 127), 0, 255).astype(np.uint8)
    return np.stack([re8, im8], axis=-1).reshape(F, 2 * N)


def want64(raw, N):
    z = (raw[:, 0::2].astype(np.float64) - 127.0) \
        + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
    return (np.abs(np.fft.fft(z, axis=1)) ** 2).sum(0)


def relerr(got, want):
    return float((np.abs(got - want) / np.maximum(np.abs(want), 1e-30)).max())


def run(N):
    F = max(8, min(256, (1 << 23) // N))
    F, chunk = adapt_batch(F)
    rng = np.random.default_rng(0)
    raw_u = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    raw_t = make_tone_raw(N, F)
    want_u = want64(raw_u, N)
    want_t = want64(raw_t, N)
    nv = jnp.int32(F)
    fmask_host = np.ones(F, np.float32)

    schemes = []
    n1s, n2s = best_fourstep_split(N)
    schemes.append(("fft4-sym", fourstep_fft_psd_partial, n1s, n2s))
    n1h, n2h = best_hybrid_split(N)
    schemes.append((f"hyb-{n2h}", fourstep_hybrid_psd_partial, n1h, n2h))
    n1q, n2q = best_hybrid_split(N, target=256)
    if n2q != n2h:
        schemes.append((f"hyb-{n2q}", fourstep_hybrid_psd_partial, n1q, n2q))
    if n2s != n2h and n2s != n2q and N <= (1 << 18):
        schemes.append((f"hyb-sym-{n2s}", fourstep_hybrid_psd_partial,
                        n1s, n2s))

    for name, fn, n1, n2 in schemes:
        label = f"N={N:8d} F={F:3d} {name:12s} ({n1}x{n2})"
        try:
            core = jax.jit(partial(fn, N1=n1, N2=n2, chunk=chunk))

            def from_u16(raw16, fn_core=core):
                v = raw16.astype(jnp.int32)
                re = ((v & 0xFF) - 127).astype(jnp.float32)
                im = ((v >> 8) - 127).astype(jnp.float32)
                return fn_core(re, im, jnp.asarray(fmask_host))

            step = jax.jit(from_u16)
            errs = []
            for raw_host, want in ((raw_u, want_u), (raw_t, want_t)):
                got = np.asarray(step(raw_host.view(np.uint16)),
                                 dtype=np.float64)
                errs.append(relerr(got, want))

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

            per = float("inf")
            for _ in range(2):
                s = (timed(ITER_HI) - timed(ITER_LO)) / (ITER_HI - ITER_LO)
                per = min(per, s)
            gsps = F * N / per / 1e9
            print(f"{label}  uni={errs[0]:.2e} tone={errs[1]:.2e} "
                  f"{gsps:6.2f} GS/s", flush=True)
        except Exception as e:
            print(f"{label}  FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    Ns = [int(a) for a in sys.argv[1:]] or [1 << 17, 1 << 20]
    for N in Ns:
        run(N)
