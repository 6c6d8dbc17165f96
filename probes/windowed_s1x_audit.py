"""60-seed admission audit of the shipped windowed session band
(fourstep4x, round-5 ask #1) through ``PsdStep(backend="auto")``.

Protocol = the round-4 admission standard (CLAUDE.md): 60 seeds per
size, hann, 35 dB adversarial tones, STRICT scipy-only yard (the
platform FFT leg is compile-refused at every probed size on the
2026-08-19 axon toolchain, so scipy-f32 IS the enforced yard here),
budget med <= 1.5x / max <= 3x, with the per-seed-p99 diagnostic that
caught the round-4 hybrid tail breaches.

Sizes: every probed band size (1024-6144 + 12288 — 8192/16384 stay
pallas pending the kernel-side decision), plus unprobed in-band
coverage: 1536 (16 | N), 1800 and 1048 (the K=8 fallback), and 512 as
a sanity pin that the band bottom (fourstep4m, 0.89x PASS round 4)
still holds.

Run on TPU:  python probes/windowed_s1x_audit.py [seeds [N,N,...]]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp
import scipy.fft

from rtl_power_fftw_tpu.auxdata import make_window
from rtl_power_fftw_tpu.ops.spectral import PsdStep, adapt_batch

SEEDS = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
         else 60)
NS = (tuple(int(n) for n in sys.argv[2].split(","))
      if len(sys.argv) > 2 else
      (1024, 1536, 2048, 3072, 4096, 6144, 12288, 1800, 1048, 512))


def realization(N, F, seed):
    rng = np.random.default_rng(seed)
    f0 = rng.uniform(0.05, 0.45)
    ph = rng.uniform(0, 2 * np.pi)
    t = np.arange(F * N)
    x = 100.0 * np.exp(1j * (2 * np.pi * f0 * t + ph)) + (
        rng.standard_normal(F * N) + 1j * rng.standard_normal(F * N))
    re8 = np.clip(np.round(x.real + 127), 0, 255).astype(np.uint8)
    im8 = np.clip(np.round(x.imag + 127), 0, 255).astype(np.uint8)
    return np.stack([re8, im8], axis=-1).reshape(F, 2 * N)


def rel(got, want):
    return float((np.abs(np.asarray(got, np.float64) - want)
                  / np.maximum(np.abs(want), 1e-30)).max())


def main():
    for N in NS:
        F = max(8, min(512, (1 << 23) // N))
        F, _ = adapt_batch(F)
        w = make_window("hann", N)
        w64 = w.astype(np.float64)
        step = PsdStep(N, F, window=w, backend="auto")
        errs, cls_d = [], []
        for s in range(SEEDS):
            raw = realization(N, F, 3000 + s)
            z = (raw[:, 0::2].astype(np.float64) - 127.0) \
                + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
            X = np.fft.fft(z * w64, axis=1)
            want = (X.real ** 2 + X.imag ** 2).sum(0)
            zw32 = (z * w64).astype(np.complex64)
            Xc = scipy.fft.fft(zw32, axis=1)
            cls_d.append(rel((Xc.real.astype(np.float64) ** 2
                              + Xc.imag.astype(np.float64) ** 2).sum(0),
                             want))
            inp = raw.view(np.uint16) if step.takes_u16 else raw
            errs.append(rel(step(inp, F), want))
            if (s + 1) % 20 == 0:
                print(f"  ...{s + 1}/{SEEDS}", flush=True)
        e, c = np.asarray(errs), np.asarray(cls_d)
        r = e / c
        med_r = np.median(e) / np.median(c)
        max_r = e.max() / c.max()
        ok = med_r <= 1.5 and max_r <= 3.0
        print(f"N={N} F={F} path={step.path}: class p50={np.median(c):.2e}"
              f" max={c.max():.2e} | med={med_r:.2f}x(<=1.5) "
              f"max={max_r:.2f}x(<=3) per-seed p99={np.quantile(r, 0.99):.2f}"
              f" max={r.max():.2f} {'PASS' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
