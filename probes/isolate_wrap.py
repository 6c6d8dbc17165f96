import sys
sys.path.insert(0, "/root/repo")
import time
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from rtl_power_fftw_tpu.ops.kernels.fused_psd import make_fused_psd_fn

N, F = 2048, 4096
ITER_LO, ITER_HI = 32, 128
rng = np.random.default_rng(0)
raw8 = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
raw16 = jax.device_put(raw8.reshape(F, N, 2).view(np.uint16).reshape(F, N))
raw8d = jax.device_put(raw8)
fused = make_fused_psd_fn(N, F, windowed=False, interpret=False)

@partial(jax.jit, static_argnums=1)
def many_u16(raw, iters):
    def body(c, i):
        return c + fused(raw + i.astype(jnp.uint16), jnp.int32(F)), ()
    acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32), jnp.arange(iters))
    return acc

@partial(jax.jit, static_argnums=1)
def many_u8(raw, iters):
    def body(c, i):
        r16 = jax.lax.bitcast_convert_type(
            (raw + i.astype(jnp.uint8)).reshape(F, N, 2), jnp.uint16)
        return c + fused(r16, jnp.int32(F)), ()
    acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32), jnp.arange(iters))
    return acc

for name, many, raw in (("u16-direct", many_u16, raw16),
                        ("u8+bitcast", many_u8, raw8d)):
    np.asarray(many(raw, ITER_LO))
    def t(iters):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(many(raw, iters))
            best = min(best, time.perf_counter() - t0)
        return best
    per = (t(ITER_HI) - t(ITER_LO)) / (ITER_HI - ITER_LO)
    print(f"{name}: {per*1e6:7.1f} us  {F/per*N/1e9:6.2f} GS/s", flush=True)
