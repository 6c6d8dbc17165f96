"""Map the large-N hybrid step's optimized-HLO fusions to pipeline roles.

trace_step.py showed the 2^20 step as ~10 similar-sized fusions with
opaque names (fusion.126 etc.). This dumps the optimized HLO of the
same scan-wrapped step and prints, per fusion computation, the op kinds
and major operand shapes inside — enough to attribute trace time to
dequant / stage-1 FFT / twiddle / stage-2 matmul / psd-reduce.

Run on TPU:  python probes/hlo_map_large.py [N] [F]
"""
import re
import sys
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.ops.spectral import PsdStep

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
F = int(sys.argv[2]) if len(sys.argv) > 2 else 8
IT = 32


def main():
    step = PsdStep(N, F, backend="auto")
    fn = step.lowered_fn()
    perturb = jnp.uint16 if step.takes_u16 else jnp.uint8

    @partial(jax.jit, static_argnums=1)
    def many(r, it):
        def body(c, i):
            return c + fn(r + i.astype(perturb), jnp.int32(F)), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                              jnp.arange(it))
        return acc

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (F, 2 * N), np.uint8)
    arg = raw.view(np.uint16) if step.takes_u16 else raw
    txt = many.lower(jax.device_put(arg), IT).compile().as_text()

    # Parse computations: name -> list of (op, shape) lines.
    comps = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"\s*(%?[\w\.\-]+)\s*\([^)]*\)\s*->", line)
        if line.lstrip().startswith(("ENTRY", "%fused", "fused",
                                     "%wide", "wide")) and "{" in line:
            nm = line.split("(")[0].split()[-1].lstrip("%")
            cur = nm
            comps[cur] = []
            continue
        if cur is None:
            continue
        if line.strip() == "}":
            cur = None
            continue
        m = re.search(r"=\s+(\S+)\s+(\w+)\(", line)
        if m:
            shape, op = m.group(1), m.group(2)
            comps[cur].append((op, shape))

    # For each fusion computation print the heavy ops.
    interesting = ("fft", "dot", "convolution", "transpose", "convert",
                   "multiply", "reduce", "bitcast", "reshape", "copy",
                   "exponential", "concatenate", "subtract", "add",
                   "iota", "cosine", "sine", "complex", "real", "imag",
                   "slice", "dynamic")
    for nm, ops in comps.items():
        if not ops:
            continue
        heavy = [f"{op}:{shape}" for op, shape in ops
                 if any(k in op for k in interesting)]
        if heavy:
            print(f"== {nm} ({len(ops)} ops)")
            from collections import Counter
            c = Counter(op for op, _ in ops)
            print("   kinds:", dict(c))
            big = [h for h in heavy
                   if any(s in h for s in ("1048576", "8388608", "8192",
                                           "c64", "fft", "dot"))][:8]
            for h in big:
                print("   ", h)

    # Also: map trace-style names (fusion.N) appearing in the entry/while
    # body to the computations they call.
    for line in txt.splitlines():
        m = re.search(r"(%?[\w\.\-]+)\s*=\s*\S+\s+fusion\(.*calls=(%?[\w\.\-]+)", line)
        if m:
            print(f"CALL {m.group(1).lstrip('%')} -> {m.group(2).lstrip('%')}")
        m2 = re.search(r"(%?[\w\.\-]+)\s*=\s*\S+\s+custom-call\(.*custom_call_target=\"(\w+)\"", line)
        if m2:
            print(f"CUSTOM {m2.group(1).lstrip('%')} -> {m2.group(2)}")


if __name__ == "__main__":
    main()
