"""Windowed shipped-band tail confirmation at audit depth (round 4).

The unwindowed tail audit (probes/unwindowed_2e17_tail.py) showed that
30-seed pools do not sample heavy per-seed tails (a shipping band
breached at 9.36x class on 60 seeds). This probe re-confirms the
WINDOWED shipped cells at the same depth — the shipping path per size
plus the compensated alternative — with the per-seed p99 diagnostic:

  2048   fourstep (the windowed session-band owner)
  8192   pallas kernel (windowed band 8192-32768)
  65536  fourstep (the round-3 table's only >3x-looking cell; the
         20-seed round-4 re-run read 1.22x/1.99x)

Both yards are reported: the strict scipy-only class (the FFTW-f32
floor reference) and the ENFORCED-contract yard — max(scipy, platform
monolithic f32 FFT) per realization, the form
tests/test_windowed_bands.py::test_windowed_adversarial_tone_class_relative
asserts (degrading to scipy-only where the platform FFT refuses to
compile, probed out-of-process to avoid client poisoning).

Run on TPU:  python probes/windowed_tail_audit.py [seeds [N,N,...]]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import scipy.fft

from rtl_power_fftw_tpu.auxdata import make_window
from rtl_power_fftw_tpu.ops.spectral import PsdStep, adapt_batch

SEEDS = (int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit()
         else 60)
NS = (tuple(int(n) for n in sys.argv[2].split(","))
      if len(sys.argv) > 2 else (2048, 8192, 65536))


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


def platform_fft_ok(F, N):
    import subprocess
    code = ("import numpy as np, jax, jax.numpy as jnp\n"
            f"z = np.zeros(({F}, {N}), np.complex64)\n"
            "np.asarray(jax.jit(lambda z: "
            "jnp.abs(jnp.fft.fft(z, axis=1)))(z))\n")
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, timeout=600)
    return r.returncode == 0


def main():
    for N in NS:
        F = max(8, min(512, (1 << 23) // N))
        F, chunk = adapt_batch(F)
        w = make_window("hann", N)
        w64 = w.astype(np.float64)
        auto = PsdStep(N, F, window=w, backend="auto")
        steps = {f"auto={auto.path}": auto,
                 "fourstep4m": PsdStep(N, F, window=w,
                                       backend="fourstep4m")}
        plat_ok = platform_fft_ok(F, N)
        mono = None
        if plat_ok:
            import jax.numpy as jnp
            mono = jax.jit(lambda zz: jnp.fft.fft(zz, axis=1))
        else:
            print(f"N={N}: platform FFT refused out-of-process — "
                  "enforced yard degrades to scipy-only", flush=True)
        errs = {b: [] for b in steps}
        cls_d, yard_d = [], []
        for s in range(SEEDS):
            raw = realization(N, F, 3000 + s)
            u16 = raw.view(np.uint16)
            z = (raw[:, 0::2].astype(np.float64) - 127.0) \
                + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
            X = np.fft.fft(z * w64, axis=1)
            want = (X.real ** 2 + X.imag ** 2).sum(0)
            zw32 = (z * w64).astype(np.complex64)
            Xc = scipy.fft.fft(zw32, axis=1)
            cls = rel((Xc.real.astype(np.float64) ** 2
                       + Xc.imag.astype(np.float64) ** 2).sum(0), want)
            plat = 0.0
            if mono is not None:
                Xp = np.asarray(mono(zw32))
                plat = rel((Xp.real.astype(np.float64) ** 2
                            + Xp.imag.astype(np.float64) ** 2).sum(0),
                           want)
            cls_d.append(cls)
            yard_d.append(max(cls, plat))
            for b, st in steps.items():
                inp = u16.copy() if st.takes_u16 else raw.copy()
                errs[b].append(rel(st(inp, F), want))
            if (s + 1) % 20 == 0:
                print(f"  ...{s+1}/{SEEDS} seeds", flush=True)
        cls_d, yard_d = np.asarray(cls_d), np.asarray(yard_d)
        print(f"N={N} F={F} windowed seeds={SEEDS}: "
              f"scipy p50={np.median(cls_d):.2e} max={cls_d.max():.2e}; "
              f"enforced yard p50={np.median(yard_d):.2e} "
              f"max={yard_d.max():.2e}", flush=True)
        for b in steps:
            e = np.asarray(errs[b])
            for label, y in (("scipy-only", cls_d), ("ENFORCED", yard_d)):
                r = e / y
                med_r = np.median(e) / np.median(y)
                max_r = e.max() / y.max()
                ok = med_r <= 1.5 and max_r <= 3.0
                print(f"  {b:16s} [{label:10s}] med={med_r:.2f}x "
                      f"max={max_r:.2f}x per-seed "
                      f"p99={np.quantile(r, 0.99):.2f} max={r.max():.2f} "
                      f"{'PASS' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
