import sys
sys.path.insert(0, "/root/repo")
import os
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_cast(name, in_shape, out_shape, body):
    def kernel(in_ref, out_ref):
        out_ref[:] = body(in_ref[:])
    try:
        x = jnp.arange(np.prod(in_shape), dtype=jnp.float32).reshape(in_shape)
        r = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=False)(x)
        want = np.asarray(body(np.asarray(x)))  # numpy equivalent via jnp on cpu? use jax cpu
        ok = np.array_equal(np.asarray(r), want)
        print(f"{name}: COMPILED correct={ok}")
    except Exception as e:
        msg = str(e)
        key = "unsupported shape cast" if "shape cast" in msg else msg[:80].replace("\n", " ")
        print(f"{name}: FAIL ({key})")

T, N1, N2, P, Q = 8, 16, 128, 8, 16
# A: sublane->lane merge (T*N2, N1) -> (T*Q, P*N1)
try_cast("A merge16to128", (T*N2, N1), (T*Q, P*N1), lambda x: x.reshape(T*Q, P*N1))
# B: lane split (T*Q, 128) -> (T, Q, P, N1)  + transpose (0,3,1,2) + merge
try_cast("B split+perm", (T*Q, P*N1), (T*N1, N2),
         lambda x: jnp.transpose(x.reshape(T, Q, P, N1), (0, 3, 1, 2)).reshape(T*N1, N2))
# C: the v4a-style swap (works today, control)
try_cast("C control", (T, N1, N2), (T*N2, N1),
         lambda x: jnp.swapaxes(x, 1, 2).reshape(T*N2, N1))
# D: 3D swap without merge
try_cast("D 4dperm", (T, Q, P, N1), (T, N1, Q, P),
         lambda x: jnp.transpose(x, (0, 3, 1, 2)))

T, Q, P, N1, N2 = 8, 16, 8, 16, 128
# E: middle-axis index + lane concat
try_cast("E idx+concat", (T, Q, P, N1), (T, Q, P*N1),
         lambda x: jnp.concatenate([x[:, :, p, :] for p in range(P)], axis=-1))
# F: lane slice + swap + concat + sublane merge
try_cast("F slice+swap+cat", (T, Q, P*N1), (T*N1, N2),
         lambda x: jnp.concatenate(
             [jnp.swapaxes(x[:, :, p*N1:(p+1)*N1], 1, 2) for p in range(P)],
             axis=-1).reshape(T*N1, N2))
# G: sublane split (control)
try_cast("G sublane split", (T, N2, N1), (T, Q, P, N1),
         lambda x: x.reshape(T, Q, P, N1))

# H: strided sublane slice + lane concat
try_cast("H strided+cat", (T, N2, N1), (T, Q, P*N1),
         lambda x: jnp.concatenate([x[:, p::P, :] for p in range(P)], axis=-1))
# I: 4D perm then leading-ish index + concat
try_cast("I perm+idx+cat", (T, Q, P, N1), (T, Q, P*N1),
         lambda x: jnp.concatenate(
             [jnp.transpose(x, (0, 2, 1, 3))[:, p] for p in range(P)], axis=-1))
