"""Device-trace cross-validation of the shipping step (round-3 refresh).

Wraps the bench loop (32 scan-chained steps of PsdStep auto) in
jax.profiler.trace and sums the XLA-Modules lane of the TPU process in
the emitted trace.json.gz — device-side op timelines recorded by the
TPU runtime, immune to the tunnel's early block_until_ready returns —
then compares against the slope-method per-step time.

Measured (TPU v5e, N=2048 F=4096, hybrid auto path): 19.7 ms for the
32-iteration module = 616 us/step vs 624 us by slope — within 1.3%.
Per-fusion attribution (trace op lane + HLO fusion mapping):
  dequant/reshape producer        ~103 us
  stage-1 FFT convs (2 fusions)   ~156 us
  stage-2 HIGHEST matmuls (4)     ~291 us   <- 47% of the step: the
                                             price of the f32-faithful
                                             tone-robustness anchor
  epilogue + loop copies           ~53 us
(Round 2's equivalent trace of the then-shipping Pallas step agreed
with its slope number within ~1% the same way.)

Run on TPU:  python probes/trace_step.py [N] [F]
"""
import collections
import glob
import gzip
import json
import sys
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.ops.spectral import PsdStep

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
F = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
IT = 32
OUT = "/tmp/jtrace_step"


def main():
    step = PsdStep(N, F, backend="auto")
    fn = step.lowered_fn()
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (F, 2 * N), np.uint8)
    raw_dev = jax.device_put(raw.view(np.uint16) if step.takes_u16 else raw)
    perturb = jnp.uint16 if step.takes_u16 else jnp.uint8

    @partial(jax.jit, static_argnums=1)
    def many(r, it):
        def body(c, i):
            return c + fn(r + i.astype(perturb), jnp.int32(F)), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                              jnp.arange(it))
        return acc

    np.asarray(many(raw_dev, IT))          # compile + warm
    with jax.profiler.trace(OUT):
        np.asarray(many(raw_dev, IT))

    path = sorted(glob.glob(f"{OUT}/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(path))
    ev = d["traceEvents"]
    procs, threads = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            procs[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e["tid"])] = e["args"].get("name", "")
    tpu_pids = [p for p, n in procs.items() if "TPU" in n]
    mod_us = 0.0
    ops = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        lane = threads.get((e["pid"], e["tid"]), "")
        if lane == "XLA Modules":
            mod_us += e["dur"]
        elif lane == "XLA Ops":
            ops[e["name"]] += e["dur"]
    print(f"module device time: {mod_us / 1e3:.2f} ms for {IT} iters "
          f"= {mod_us / IT:.0f} us/step", flush=True)
    for name, t in ops.most_common(12):
        print(f"  {t / IT:8.1f} us/step  {name}", flush=True)


if __name__ == "__main__":
    main()
