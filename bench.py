"""Benchmark: averaged-spectra throughput on one chip at 2048 bins.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: sustained equivalent IQ throughput in GS/s on the fused
dequant → window → batched FFT → |X|² accumulate step at N=2048
(BASELINE.json: north star is 1 GS/s ≈ 488k averaged spectra/s/chip;
``vs_baseline`` is the fraction of that north star).

Method: device-resident u8 frame batches (the recorded-buffer config 1
setup), warmed-up steady-state timing over enough steps to amortize
dispatch. Backend is chosen by a quick rehearsal among the available FFT
paths; diagnostics go to stderr, the JSON line to stdout.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _time_step(step_fn, args, n_iters: int) -> float:
    import jax
    # Chain-independent repeated dispatch; async dispatch pipelines them.
    results = [step_fn(*args) for _ in range(n_iters)]
    jax.block_until_ready(results[-1])
    t0 = time.perf_counter()
    results = [step_fn(*args) for _ in range(n_iters)]
    jax.block_until_ready(results)
    return time.perf_counter() - t0


def main() -> None:
    import jax

    from rtl_power_fftw_tpu.auxdata import make_window
    from rtl_power_fftw_tpu.ops import PsdStep

    N = 2048
    frames = 4096  # 16.8 MB of u8 IQ per step
    window = make_window("hann", N)
    dev = jax.devices()[0]
    print(f"bench device: {dev} ({dev.platform})", file=sys.stderr)

    rng = np.random.default_rng(0)
    raw_host = rng.integers(0, 256, size=(frames, 2 * N), dtype=np.uint8)

    best = None
    for backend in ("xla", "fourstep"):
        try:
            step = PsdStep(N, frames, window=window, backend=backend)
            raw = jax.device_put(raw_host, dev)
            n_valid = np.int32(step.F)
            # Rehearsal: compile + 2 iters.
            dt = _time_step(step, (raw, n_valid), 2)
            rate = 2 * step.F / dt
            print(f"  backend={backend}: rehearsal {rate:,.0f} spectra/s",
                  file=sys.stderr)
            if best is None or rate > best[1]:
                best = (backend, rate, step, raw, n_valid)
        except Exception as e:  # pragma: no cover
            print(f"  backend={backend} failed: {e}", file=sys.stderr)

    backend, _, step, raw, n_valid = best
    # Steady-state measurement: scale iteration count to ~1s of work.
    iters = max(4, min(64, int(2.0e9 / (step.F * N))))
    dt = _time_step(step, (raw, n_valid), iters)
    spectra_per_s = iters * step.F / dt
    gsps = spectra_per_s * N / 1e9

    print(f"steady state: backend={backend} iters={iters} "
          f"{spectra_per_s:,.0f} spectra/s  {gsps:.3f} GS/s", file=sys.stderr)

    print(json.dumps({
        "metric": "equivalent IQ throughput per chip @2048-bin averaged PSD",
        "value": round(gsps, 4),
        "unit": "GS/s",
        "vs_baseline": round(gsps / 1.0, 4),
    }))


if __name__ == "__main__":
    main()
