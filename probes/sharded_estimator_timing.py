"""Sharded estimator-variant device-step timing on a 1-chip mesh
(round-4 ask #7): ShardedPsdStep / ShardedSkStep (plain + excise) /
ShardedPfbStep / ShardedMultitaperStep at the BASELINE config-5 shape
(16 streams x 256 frames, N=2048), pooled-endpoint slope protocol —
so config-5-style deployments of the estimator family have committed
numbers, comparable with the single-stream estimator table
(probes/estimator_timing.py at the same total F·N per step).

Timing is the jitted sharded step only (the PFB's host tail update is
host-side state outside the step, same as the single-stream table).

Run on TPU:  python probes/sharded_estimator_timing.py [N [S [F]]]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

ITER_LO, ITER_HI = 16, 48

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
S = int(sys.argv[2]) if len(sys.argv) > 2 else 16
F = int(sys.argv[3]) if len(sys.argv) > 3 else 256


def slope_time(fn, raw, extra, pick):
    """us/step: scan ITER times varying the input, pooled endpoint
    minima slope (same scheme as estimator_timing.py)."""
    nv = np.full(raw.shape[0], raw.shape[1], np.int32)

    @partial(jax.jit, static_argnums=1)
    def many(r, it):
        def body(c, i):
            out = fn(r + i.astype(r.dtype), nv, *extra)
            return c + pick(out), ()
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
    from rtl_power_fftw_tpu.parallel.sharded import ShardedPsdStep
    from rtl_power_fftw_tpu.models.kurtosis import ShardedSkStep
    from rtl_power_fftw_tpu.models.pfb import ShardedPfbStep
    from rtl_power_fftw_tpu.models.multitaper import ShardedMultitaperStep

    mesh = Mesh(np.array(jax.devices()[:1]), ("stream",))
    rng = np.random.default_rng(0)
    print(f"N={N} S={S} F={F} (total {S*F} frames/step) mesh=1 "
          f"backend={jax.default_backend()}", flush=True)

    rows = []

    psd = ShardedPsdStep(mesh, N, F, streams=S)
    raw = rng.integers(0, 256, (S, psd.F, 2 * N), np.uint8)
    raw16 = jax.device_put(raw.view(np.uint16), psd._raw_sharding)
    per = slope_time(psd._step, raw16, (), lambda o: o[1])
    base = per
    rows.append((f"sharded plain ({psd.path})", per))

    for label, sigma in (("sharded sk", 0.0), ("sharded sk-excise 3", 3.0)):
        sk = ShardedSkStep(mesh, N, F, streams=S, excise_sigma=sigma)
        per = slope_time(sk._step, raw16, tuple(sk._w),
                         lambda o: o[1][0])
        rows.append((label, per))

    P = 4
    pfb = ShardedPfbStep(mesh, N, F, streams=S, taps=P)
    xraw = rng.integers(0, 256, (S, pfb.F + P - 1, 2 * N),
                        np.uint8).view(np.uint16)
    xdev = jax.device_put(xraw, pfb._raw_sharding)
    per = slope_time(pfb._step, xdev, (pfb._h,), lambda o: o[1])
    rows.append((f"sharded pfb {P} taps", per))

    K = 4
    mt = ShardedMultitaperStep(mesh, N, F, streams=S, K=K)
    per = slope_time(mt._step, raw16, (mt._tapers,), lambda o: o[1])
    rows.append((f"sharded multitaper K={K}", per))

    for label, per in rows:
        print(f"{label:26s} {per*1e6:9,.0f} us/step  "
              f"{S*F*N/per/1e9:6.2f} GS/s  ({per/base:4.2f}x plain)",
              flush=True)


if __name__ == "__main__":
    main()
