"""1M-point config: XLA FFT vs mixed-precision four-step (real TPU)."""
import sys
sys.path.insert(0, "/root/repo")
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.ops.dft import fourstep_psd_partial_mixed, threestep_psd_partial_mixed
from rtl_power_fftw_tpu.ops.spectral import dequant_iq

N, F = 1 << 20, 8
ITER_LO, ITER_HI = 4, 16
rng = np.random.default_rng(0)
raw_host = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
raw = jax.device_put(raw_host)

def make(kind):
    @partial(jax.jit, static_argnums=1)
    def many(raw, iters):
        def body(c, i):
            re, im = dequant_iq(raw + i.astype(jnp.uint8), F, N)
            fm = jnp.ones((F,), jnp.float32)
            if kind == "xla":
                X = jnp.fft.fft(jax.lax.complex(re, im), axis=-1)
                p = jnp.real(X) ** 2 + jnp.imag(X) ** 2
                part = (p * fm[:, None]).sum(0)
            elif kind == "mixed":
                part = fourstep_psd_partial_mixed(re, im, fm, chunk=8)
            else:
                part = threestep_psd_partial_mixed(re, im, fm, chunk=8)
            return c + part, ()
        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                              jnp.arange(iters))
        return acc
    return many

x = ((raw_host[:, 0::2].astype(np.float64) - 127.0)
     + 1j * (raw_host[:, 1::2].astype(np.float64) - 127.0))
want = (np.abs(np.fft.fft(x, axis=1)) ** 2).sum(0)

for kind in ("three", "mixed", "xla"):
    many = make(kind)
    # parity (single step)
    re, im = dequant_iq(jnp.asarray(raw_host), F, N)
    if kind == "mixed":
        got = np.asarray(jax.jit(lambda r, i: fourstep_psd_partial_mixed(
            r, i, jnp.ones((F,), jnp.float32), chunk=8))(re, im), dtype=np.float64)
        rel = (np.abs(got - want) / np.maximum(np.abs(want), 1e-30)).max()
    elif kind == "three":
        got = np.asarray(jax.jit(lambda r, i: threestep_psd_partial_mixed(
            r, i, jnp.ones((F,), jnp.float32), chunk=8))(re, im), dtype=np.float64)
        rel = (np.abs(got - want) / np.maximum(np.abs(want), 1e-30)).max()
    else:
        rel = float("nan")
    def t(iters):
        np.asarray(many(raw, iters))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(many(raw, iters))
            best = min(best, time.perf_counter() - t0)
        return best
    per = (t(ITER_HI) - t(ITER_LO)) / (ITER_HI - ITER_LO)
    print(f"{kind:6s} per-step {per*1e6:8.1f} us  {F/per*N/1e9:6.2f} GS/s  max_rel={rel:.2e}",
          flush=True)
