"""Windowed-band measurements + the window-folding dead-end record.

== Round-3 windowed measurements (hann, v5e, slope protocol; dist =
30-seed adversarial 35 dB tone vs the scipy-f32 class on the SAME
realizations, p50r/maxr = ratio of medians / ratio of maxima) ==

Direct time-domain multiply (reference semantics):
  N=2048  pallas  5.75 GS/s            | hybrid 13.51, p50r 2.80 maxr 2.40
          fourstep 10.41 GS/s          | (1024: 13.28, 3072: 10.64)
  N=4096  pallas  9.02, p50r 1.77/1.82 | hybrid 12.93, 3.12/2.10
          fourstep 10.27, 1.62/1.13    |
  N=8192  pallas 12.50, 1.50/2.46      | fourstep 10.52, 1.41/1.98
  N=16384 pallas 13.35                 | folded fourstep/hybrid 6.2-6.3
  N=65536 pallas  7.78                 | folded fourstep 5.24, hybrid 4.37
CPU (2048): XLA FFT p50r 1.00 (it IS the class); hybrid 1.62-1.83,
fourstep 2.45-2.71 — BLAS stage-2 accumulation, platform fact.

Ladder decisions (shipped in ops/spectral.py + parallel/sharded.py):
  * TPU windowed: four-step matmul 512-8192 (hybrid skipped — its
    integer-input stage-1 anchor is gone under a multiply; the
    all-matmul four-step is indifferent and stays 1.1-2.0x class);
    fused kernel (direct multiply) pow-2 8192-65536.
  * CPU windowed: XLA FFT everywhere the matmul bands would apply.

== The folding dead end ==

A frequency-domain rewrite was built and measured: for periodic
cosine-sum windows w[n] = a0 + Σ a_m cos(2πmn/N) (every built-in
generator), FFT(w·x)[k] = a0·X[k] + Σ (a_m/2)(X[k−m] + X[k+m]) exactly,
so the transform can run UNWINDOWED (integer stage-1 inputs) with an
M-tap circular convolution before |·|². Two implementations measured:

  1. post-stage-2, on the (F, k1, k2) output via k1-rolls + a lane roll
     on the m wrapped rows: 2048 9.07 / 4096 8.80 / 8192 7.44 GS/s —
     the slice+concat+lane-shift epilogue cost 30-40% of the step;
  2. pre-stage-2, on the stage-2 input where a k2-shift is the phase
     e^{+2πi n2/N2} (elementwise where + static k1-rolls only):
     2048 7.28 GS/s — WORSE; small-sublane rolls relayout.

Accuracy killed it independently: folding preserves the UNWINDOWED
absolute tone leak, but windowing shrinks the class denominator ~2x
(the windowed scipy-f32 class p50 at 2048 is 1.92e-5 vs ~4e-5
unwindowed), so the folded hybrid measured p50r 2.07 / maxr 3.56 —
over the documented max budget. (The folded FOURSTEP measured a
beautiful 1.22/1.02 — but at fold speeds there is no reason to prefer
it over the direct four-step's 10.4 GS/s at 1.4-1.6x.) Both
implementations verified exact vs numpy (3e-14) before measuring; the
losing code was removed, this record remains.

Run on TPU:  python probes/windowed_fold.py [speed|dist]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from rtl_power_fftw_tpu.ops.spectral import PsdStep, adapt_batch
from rtl_power_fftw_tpu.auxdata import make_window

ITER_LO, ITER_HI = 16, 48


def speed(backend, N, F):
    w32 = make_window("hann", N)
    rng = np.random.default_rng(0)
    raw_host = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    try:
        step = PsdStep(N, F, window=w32, backend=backend)
    except ValueError as e:
        print(f"{backend:9s} N={N:6d} unavailable: {e}", flush=True)
        return
    inp = raw_host.view(np.uint16) if step.takes_u16 else raw_host
    fn = step.lowered_fn()
    nv = jnp.int32(step.F)
    raw = jax.device_put(inp)
    dt = inp.dtype.type

    @partial(jax.jit, static_argnums=1)
    def many(r, iters, fn=fn, nv=nv, dt=dt):
        def body(c, i):
            return c + fn(r + i.astype(dt), nv), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                              jnp.arange(iters))
        return acc

    np.asarray(many(raw, ITER_LO))

    def t(iters):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(many(raw, iters))
            best = min(best, time.perf_counter() - t0)
        return best

    tlo = thi = float("inf")
    for _ in range(3):
        tlo = min(tlo, t(ITER_LO))
        thi = min(thi, t(ITER_HI))
    per = (thi - tlo) / (ITER_HI - ITER_LO)
    print(f"{backend:9s} windowed N={N:6d} F={F}  "
          f"{F * N / per / 1e9:6.2f} GS/s", flush=True)


def dist(backend, N, F, seeds=30):
    import scipy.fft
    from probes.tone_distribution import realization, rel, pct
    F, _ = adapt_batch(F)
    w64 = make_window("hann", N).astype(np.float64)
    w32 = w64.astype(np.float32)
    step = PsdStep(N, F, window=w32, backend=backend)
    ours, cls = [], []
    for seed in range(seeds):
        raw = realization(N, F, 1000 + seed)
        z = (raw[:, 0::2].astype(np.float64) - 127.0) \
            + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
        X = np.fft.fft(z * w64, axis=1)
        want = (X.real ** 2 + X.imag ** 2).sum(0)
        z32 = z.astype(np.complex64) * w32.astype(np.complex64)
        Xc = scipy.fft.fft(z32, axis=1)
        gotc = (Xc.real.astype(np.float64) ** 2
                + Xc.imag.astype(np.float64) ** 2).sum(0)
        inp = raw.view(np.uint16) if step.takes_u16 else raw
        ours.append(rel(np.asarray(step(inp, F), np.float64), want))
        cls.append(rel(gotc, want))
    print(f"{backend:9s} windowed N={N:6d} seeds={seeds} "
          f"ours p50={pct(ours, 50):.2e} max={max(ours):.2e} | "
          f"class p50={pct(cls, 50):.2e} max={max(cls):.2e} | "
          f"p50-ratio {pct(ours, 50) / pct(cls, 50):.2f} "
          f"max-ratio {max(ours) / max(cls):.2f}", flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "speed"
    if what == "speed":
        speed("auto", 2048, 4096)       # windowed ladder: four-step
        speed("auto", 4096, 2048)       # four-step
        speed("auto", 8192, 1024)       # pallas (windowed band start)
        speed("auto", 16384, 512)       # pallas
    else:
        dist("auto", 2048, 64)
        dist("auto", 4096, 64)
        dist("auto", 8192, 64)
