"""Mixed-precision four-step vs HIGHEST four-step at XLA level (TPU)."""
import sys
sys.path.insert(0, "/root/repo")
import time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from rtl_power_fftw_tpu.ops.dft import (fourstep_psd_partial,
                                        fourstep_psd_partial_mixed)
from rtl_power_fftw_tpu.ops.spectral import dequant_iq

for N, F in ((2048, 4096), (500, 4096), (8192, 1024)):
    rng = np.random.default_rng(0)
    raw_host = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    raw = jax.device_put(raw_host)
    x = ((raw_host[:, 0::2].astype(np.float64) - 127)
         + 1j * (raw_host[:, 1::2].astype(np.float64) - 127))
    want = (np.abs(np.fft.fft(x, axis=1)) ** 2).sum(0)
    for name, fn in (("HIGHEST", fourstep_psd_partial),
                     ("mixed", fourstep_psd_partial_mixed)):
        @partial(jax.jit, static_argnums=1)
        def many(r, iters, fn=fn):
            def body(c, i):
                re, im = dequant_iq(r + i.astype(jnp.uint8), F, N)
                return c + fn(re, im, jnp.ones((F,), jnp.float32)), ()
            a, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                                jnp.arange(iters))
            return a
        re, im = dequant_iq(jnp.asarray(raw_host), F, N)
        got = np.asarray(jax.jit(lambda r, i, fn=fn: fn(
            r, i, jnp.ones((F,), jnp.float32)))(re, im), dtype=np.float64)
        rel = (np.abs(got - want) / np.maximum(np.abs(want), 1e-30)).max()
        def t(it):
            np.asarray(many(raw, it)); best = 9e9
            for _ in range(3):
                t0 = time.perf_counter(); np.asarray(many(raw, it))
                best = min(best, time.perf_counter() - t0)
            return best
        lo, hi = (32, 128) if N <= 2048 else (16, 64)
        per = (t(hi) - t(lo)) / (hi - lo)
        print(f"N={N:5d} {name:8s}: {per*1e6:7.1f} us  "
              f"{F/per*N/1e9:6.2f} GS/s  max_rel={rel:.2e}", flush=True)
