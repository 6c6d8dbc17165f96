"""all_to_all cost shape of the sequence-sharded transform (bigfft.py).

Fixed total work (F frames x N bins, one distributed transform per
frame) across mesh sizes 1/2/4/8 on the virtual CPU mesh, with a
no-collective control: the same local FFT stages with the all_to_all
replaced by a local reshape of the SAME data volume (mesh size 1 == the
true no-collective case). The delta isolates the distributed
transpose's cost — on a real pod it rides ICI; here it's host memcpy,
so the SHAPE (flat vs growing with device count) is the evidence, not
the absolute number.

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     python probes/bigfft_scaling.py
"""
import sys
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
import time

import numpy as np

from rtl_power_fftw_tpu.parallel.bigfft import ShardedLargeFFTPsd
from rtl_power_fftw_tpu.parallel.mesh import make_mesh

N, F = 1 << 18, 4          # 256k-point transforms (512x512 four-step)
ITERS = 8
rng = np.random.default_rng(0)
frames = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)

print(f"total work fixed: {F} frames x {N}-point distributed transforms",
      flush=True)
for n_dev in (1, 2, 4, 8):
    step = ShardedLargeFFTPsd(make_mesh(n_dev), N, F)
    x, nv = step.prepare(frames)
    import jax.numpy as jnp
    nv = jnp.int32(nv)
    np.asarray(step._fn(x, nv))    # compile + warm
    best = float("inf")
    for _rep in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            np.asarray(step._fn(x, nv))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    print(f"devices={n_dev}: {best*1e3:7.2f} ms/step "
          f"({F*N/best/1e9:5.2f} GS/s equivalent)", flush=True)
