"""Estimator-family device-step timing (ROADMAP "PFB / multitaper / SK
TPU timing" open item): the plain PSD step vs --pfb-taps 4,
--multitaper 4, --sk-file (two moments), and --sk-excise 3 (two moments
+ gate) at the same (N, F), pooled-endpoint slope protocol (same
artifact-immune scheme as sweep_auto_r3.py).

Expected (from op counts): PFB ≈ plain + P multiply-add passes;
multitaper ≈ K× the tapered-transform cost; SK ≈ plain per-frame + one
square + one extra reduction; excise adds only (N,)-wide VPU arithmetic.

Run on TPU:  python probes/estimator_timing.py [N [F]]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

ITER_LO, ITER_HI = 16, 48


def slope_time(fn, raw, extra, N, reduce0=False):
    """us/step via the pooled-endpoint slope: scan ITER times varying the
    input, best-of over repeats, slope between two iteration counts."""
    nv = jnp.int32(raw.shape[0])

    @partial(jax.jit, static_argnums=1)
    def many(r, it):
        def body(c, i):
            out = fn(r + i.astype(r.dtype), nv, *extra)
            if reduce0:
                out = out[0]
            return c + out, ()
        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                              jnp.arange(it))
        return acc

    def timed(it, reps=3):
        np.asarray(many(raw, it))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(many(raw, it))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = t_hi = float("inf")
    for _ in range(3):
        t_lo = min(t_lo, timed(ITER_LO))
        t_hi = min(t_hi, timed(ITER_HI))
    return (t_hi - t_lo) / (ITER_HI - ITER_LO)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    from rtl_power_fftw_tpu.ops.spectral import (PsdStep, adapt_batch,
                                                 tapered_batch_mode)
    from rtl_power_fftw_tpu.models.kurtosis import _sk_step
    from rtl_power_fftw_tpu.models.multitaper import (_mt_partial_step,
                                                      _session_tapers)
    from rtl_power_fftw_tpu.models.pfb import (_pfb_session_step,
                                               pfb_prototype)

    F, chunk = adapt_batch(F)
    mode = tapered_batch_mode(N)
    rng = np.random.default_rng(0)
    raw = jax.device_put(rng.integers(0, 256, (F, 2 * N), np.uint8))
    print(f"N={N} F={F} estimator mode={mode} "
          f"backend={jax.default_backend()}", flush=True)

    rows = []

    # Plain PSD (auto ladder) — the baseline.
    step = PsdStep(N, F, backend="auto")
    praw = raw
    if step.takes_u16:
        praw = jax.device_put(np.asarray(raw).view(np.uint16))
    per = slope_time(step.lowered_fn(), praw, (), N)
    base = per
    rows.append(("plain auto", per))

    # SK sidecar / excise (the steps take the host u16 lane view).
    raw16 = jax.device_put(np.asarray(raw).view(np.uint16))
    for label, sigma in (("sk (2 moments)", 0.0), ("sk-excise 3", 3.0)):
        per = slope_time(_sk_step(N, F, False, mode, sigma), raw16, (), N,
                         reduce0=True)
        rows.append((label, per))

    # PFB 4 taps.
    P = 4
    h = jnp.asarray(pfb_prototype(N, P).reshape(P, N))
    xraw = jax.device_put(
        rng.integers(0, 256, (F + P - 1, 2 * N), np.uint8).view(np.uint16))
    per = slope_time(_pfb_session_step(N, P, F, chunk, mode), xraw, (h,), N)
    rows.append((f"pfb {P} taps", per))

    # Multitaper K=4.
    K = 4
    tapers = jnp.asarray(_session_tapers(N, 4.0, K))
    per = slope_time(_mt_partial_step(N, F, K, chunk, mode), raw16,
                     (tapers,), N)
    rows.append((f"multitaper K={K}", per))

    for label, per in rows:
        print(f"{label:18s} {per*1e6:9,.0f} us/step  "
              f"{F*N/per/1e9:6.2f} GS/s  ({per/base:4.2f}x plain)",
              flush=True)


if __name__ == "__main__":
    main()
