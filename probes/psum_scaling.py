"""psum scaling shape on the virtual 8-device CPU mesh (VERDICT r1 #10).

Measures the sharded multi-stream step (ShardedPsdStep: local fused PSD
accumulation + one psum over the mesh) at fixed TOTAL work (16 streams x
F frames) across mesh sizes 1/2/4/8, plus a no-collective control (the
same local step without the psum), so the collective's cost is isolated
from compute scaling.

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python probes/psum_scaling.py
"""
import sys
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import time
from functools import partial

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rtl_power_fftw_tpu.parallel import ShardedPsdStep, make_mesh

S, N, F = 16, 512, 64
ITERS = 30
rng = np.random.default_rng(0)
raw = rng.integers(0, 256, (S, F, 2 * N), dtype=np.uint8)
nv = np.full((S,), F, dtype=np.int32)

print(f"total work fixed: {S} streams x {F} frames x {N} bins", flush=True)
print("(CPU wall-clock does not scale with virtual devices: XLA-CPU already",
      flush=True)
print(" multithreads one device across cores; the psum column is the point.)",
      flush=True)
for n_dev in (1, 2, 4, 8):
    mesh = make_mesh(n_dev)
    step = ShardedPsdStep(mesh, N, F, streams=S, backend="auto")
    raw_d = jax.device_put(raw, NamedSharding(mesh, P(step.axis)))

    @jax.jit
    def only_local(raw_d, nv, step=step):
        ps, comb = step._step(raw_d, nv)
        return ps

    @jax.jit
    def with_psum(raw_d, nv, step=step):
        ps, comb = step._step(raw_d, nv)
        return comb

    times = {}
    for name, fn in (("local", only_local), ("psum", with_psum)):
        np.asarray(fn(raw_d, nv))
        best = float("inf")
        for _rep in range(3):
            t0 = time.perf_counter()
            for _ in range(ITERS):
                out = fn(raw_d, nv)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / ITERS)
        times[name] = best
    over = times["psum"] - times["local"]
    print(f"devices={n_dev}: local {times['local']*1e3:6.2f} ms  "
          f"+psum {times['psum']*1e3:6.2f} ms  "
          f"collective overhead {max(over,0)*1e3:5.2f} ms "
          f"({max(over,0)/times['psum']*100:4.1f}%)", flush=True)

