"""Cheap config-3 levers: precision tier, twiddle split, frames/step.

HLO mapping of the shipping 2^20 hybrid (probes/hlo_map_large.py) says
the step is ~60% XLA's internal conv-FFT (fixed HIGHEST, 6 conv passes)
and ~30% our stage-2 HIGHEST matmuls + split twiddle. The cheap levers
that leave the FFT untouched:
  - stage-2 Precision.HIGH (3-pass) instead of HIGHEST (6-pass),
  - plain f32 twiddle instead of the split hi+lo (half the VPU
    multiplies),
  - frames/step 16/32 instead of 8 (amortize per-step glue).
Each variant prints single-seed adversarial-tone + uniform max rel
error vs f64 (with the scipy-f32 class error on the same realization
for scale) and pooled-endpoint slope GS/s. Distribution-grade accuracy
(30+ seeds) is only worth running for variants that win speed here.

MEASURED (v5e, Aug 17 2026) — every lever LOSES; the shipping config
is a sharp local optimum:
  F= 8 split-tw HIGHEST   uni=9.8e-07 tone=5.8e-04  13.54 GS/s (620 us)
  F= 8 split-tw HIGH      uni=5.4e-05 tone=5.8e-02   7.67 GS/s (1094)
  F= 8 plain-tw HIGHEST   uni=1.1e-06 tone=6.6e-04   7.76 GS/s (1081)
  F= 8 plain-tw HIGH      uni=5.4e-05 tone=5.8e-02  10.84 GS/s (774)
  F=16 split-tw HIGHEST   (same accuracy)            5.06 GS/s (3315)
  F=32 split-tw HIGHEST   (same accuracy)            3.58 GS/s (9385)
(class f32 on the same realizations: uni=7.2e-07, tone=1.45e-03.)
Reading: (a) Precision.HIGH stage-2 is SLOWER than HIGHEST here and
~100x less accurate — with the conv emitters XLA picks for these
shapes there is no fast 3-pass path, so the HIGH tier is a pure loss
at large N; (b) dropping the twiddle's lo-residual DEslows the step —
the split multiply fuses into the conv operand production, removing it
changes the fusion layout for the worse, and costs 15% tone accuracy;
(c) F>8 falls off an emitter/working-set cliff (5.3x/15x per-sample
time at 2x/4x the data) — keep frames-per-step at 8 for N=2^20. The
baseline itself read 620 us/step = 13.5 GS/s on a quiet chip (the
committed 5-isolated protocol figure was 899 us — re-benched after
this finding).

Run on TPU:  python probes/large_n_fast.py [N]
"""
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import scipy.fft

from rtl_power_fftw_tpu.ops.dft import (_hybrid_constants,
                                        best_hybrid_split,
                                        fourstep_hybrid_psd_partial)
from rtl_power_fftw_tpu.ops.spectral import adapt_batch

_HI = jax.lax.Precision.HIGHEST
ITER_LO, ITER_HI = 8, 24


def hybrid_plain_twiddle(re, im, fmask, N1, N2, chunk=64, precision=_HI):
    """fourstep_hybrid_psd_partial with an UNSPLIT f32 twiddle."""
    F, N = re.shape
    thr, thi, _tlr, _tli, c2, s2 = (
        jnp.asarray(a) for a in _hybrid_constants(N, N1, N2))
    while F % chunk != 0:
        chunk //= 2
    x = jax.lax.complex(re, im).reshape(F, N1, N2)
    y = jnp.fft.fft(x, axis=1)
    yr, yi = jnp.real(y), jnp.imag(y)
    zr = yr * thr[None] - yi * thi[None]
    zi = yr * thi[None] + yi * thr[None]
    Xr = (jnp.matmul(zr, c2, precision=precision)
          - jnp.matmul(zi, s2, precision=precision))
    Xi = (jnp.matmul(zr, s2, precision=precision)
          + jnp.matmul(zi, c2, precision=precision))
    p = (Xr * Xr + Xi * Xi) * fmask[:, None, None]
    g = F // chunk
    s = p.reshape(g, chunk, N1, N2).sum(axis=1).sum(axis=0)
    return jnp.swapaxes(s, 0, 1).reshape(N)


def make_tone_raw(N, F, seed=12, amp=100.0, f0=0.1303):
    t = np.arange(F * N)
    rng = np.random.default_rng(seed)
    x = amp * np.exp(2j * np.pi * f0 * t) + (
        rng.standard_normal(F * N) + 1j * rng.standard_normal(F * N))
    re8 = np.clip(np.round(x.real + 127), 0, 255).astype(np.uint8)
    im8 = np.clip(np.round(x.imag + 127), 0, 255).astype(np.uint8)
    return np.stack([re8, im8], axis=-1).reshape(F, 2 * N)


def want64(raw):
    z = (raw[:, 0::2].astype(np.float64) - 127.0) \
        + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
    return (np.abs(np.fft.fft(z, axis=1)) ** 2).sum(0)


def class32(raw):
    z = ((raw[:, 0::2].astype(np.float32) - np.float32(127.0))
         + 1j * (raw[:, 1::2].astype(np.float32)
                 - np.float32(127.0))).astype(np.complex64)
    X = scipy.fft.fft(z, axis=1)
    return (X.real.astype(np.float64) ** 2
            + X.imag.astype(np.float64) ** 2).sum(0)


def relerr(got, want):
    return float((np.abs(np.asarray(got, np.float64) - want)
                  / np.maximum(np.abs(want), 1e-30)).max())


def measure(N, F, fn, n1, n2, precision, label, raws, wants):
    F, chunk = adapt_batch(F)
    fmask_host = np.ones(F, np.float32)
    core = jax.jit(partial(fn, N1=n1, N2=n2, chunk=chunk,
                           precision=precision))

    def from_u16(raw16):
        v = raw16.astype(jnp.int32)
        re = ((v & 0xFF) - 127).astype(jnp.float32)
        im = ((v >> 8) - 127).astype(jnp.float32)
        return core(re, im, jnp.asarray(fmask_host))

    step = jax.jit(from_u16)
    errs = []
    for raw_host, want in zip(raws, wants):
        got = np.asarray(step(raw_host[:F].view(np.uint16)), np.float64)
        errs.append(relerr(got, want))

    raw_dev = jax.device_put(raws[1][:F].view(np.uint16))

    @partial(jax.jit, static_argnums=1)
    def many(raw, it):
        def body(c, i):
            return c + from_u16(raw + i.astype(jnp.uint16)), ()
        acc, _ = jax.lax.scan(body, jnp.zeros(N, jnp.float32),
                              jnp.arange(it))
        return acc

    def timed(it, reps=3):
        np.asarray(many(raw_dev, it))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(many(raw_dev, it))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = t_hi = float("inf")
    rounds = 3
    while True:
        for _ in range(rounds):
            t_lo = min(t_lo, timed(ITER_LO))
            t_hi = min(t_hi, timed(ITER_HI))
        if t_hi > t_lo:
            break
        rounds += 2
        if rounds > 9:
            print(f"{label}: endpoints never ordered, skipping")
            return
    per = (t_hi - t_lo) / (ITER_HI - ITER_LO)
    print(f"{label:34s} uni={errs[0]:.2e} tone={errs[1]:.2e} "
          f"{F * N / per / 1e9:6.2f} GS/s ({per * 1e6:7.0f} us/step)",
          flush=True)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    n1, n2 = best_hybrid_split(N)
    FMAX = 32
    rng = np.random.default_rng(0)
    raw_u = rng.integers(0, 256, (FMAX, 2 * N), dtype=np.uint8)
    raw_t = make_tone_raw(N, FMAX)
    print(f"N={N} split {n1}x{n2}; class(f32) errors on these "
          f"realizations (F=8): uni={relerr(class32(raw_u[:8]), want64(raw_u[:8])):.2e} "
          f"tone={relerr(class32(raw_t[:8]), want64(raw_t[:8])):.2e}",
          flush=True)

    for F in (8, 16, 32):
        raws = (raw_u[:F], raw_t[:F])
        wants = (want64(raw_u[:F]), want64(raw_t[:F]))
        measure(N, F, fourstep_hybrid_psd_partial, n1, n2, _HI,
                f"F={F:2d} hyb split-tw HIGHEST", raws, wants)
        if F == 8:
            measure(N, F, fourstep_hybrid_psd_partial, n1, n2,
                    jax.lax.Precision.HIGH,
                    f"F={F:2d} hyb split-tw HIGH   ", raws, wants)
            measure(N, F, hybrid_plain_twiddle, n1, n2, _HI,
                    f"F={F:2d} hyb plain-tw HIGHEST", raws, wants)
            measure(N, F, hybrid_plain_twiddle, n1, n2,
                    jax.lax.Precision.HIGH,
                    f"F={F:2d} hyb plain-tw HIGH   ", raws, wants)


if __name__ == "__main__":
    main()
