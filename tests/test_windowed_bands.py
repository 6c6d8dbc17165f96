"""Windowed-path numerics and band selection.

The reference applies windows as a per-frame time-domain multiply before
the FFT (datastore.cxx:76-77). Windowing changes the accuracy landscape:
under a strong tone the windowed FFTW-f32 class error is ~2x SMALLER
(relative) than unwindowed, and paths whose stage-1 FFT relied on
exactly-representable integer inputs (the hybrid) lose that anchor —
measured TPU medians 2.8-3.1x the scipy-f32 class. The windowed auto
ladder therefore differs from the unwindowed one (all measured —
probes/windowed_fold.py, round-4 probes/windowed_tail_audit.py): the
COMPENSATED four-step (fourstep4m) serves windowed composite N < 65536
except pow-2 8192/16384 (the fused kernel), the plain four-step serves
[65536, 262144], and non-TPU windowed auto uses the XLA FFT (on CPU it
IS the class yardstick, ratio 1.00).

A frequency-domain "window folding" rewrite (unwindowed transform + an
exact cosine-sum convolution before |.|^2) was built and measured as a
dead end on BOTH axes — see probes/windowed_fold.py for the record.
"""
import numpy as np
import pytest

from rtl_power_fftw_tpu.auxdata import make_window
from rtl_power_fftw_tpu.ops.spectral import PsdStep


def _f64_truth(raw, w):
    z = (raw[:, 0::2].astype(np.float64) - 127.0) \
        + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
    X = np.fft.fft(z * w.astype(np.float64), axis=1)
    return (X.real ** 2 + X.imag ** 2).sum(0)


def _rel(got, want):
    return float((np.abs(np.asarray(got, np.float64) - want)
                  / np.maximum(np.abs(want), 1e-30)).max())


class TestWindowedParity:
    @pytest.mark.parametrize("name,N,F,backend", [
        ("hann", 2048, 32, "hybrid"),
        ("hamming", 1024, 32, "fourstep"),
        ("blackman", 2048, 32, "fourstep"),
        ("flattop", 4096, 16, "fft4"),
        ("bartlett", 1024, 32, "fourstep"),
        ("hann", 2048, 32, "auto"),
    ])
    def test_windowed_within_parity(self, name, N, F, backend):
        w = make_window(name, N)
        rng = np.random.default_rng(11)
        raw = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
        want = _f64_truth(raw, w)
        step = PsdStep(N, F, window=w, backend=backend)
        inp = raw.view(np.uint16) if step.takes_u16 else raw
        assert _rel(step(inp, F), want) <= 1e-5

    def test_windowed_respects_frame_mask(self):
        N, F, valid = 1024, 32, 17
        w = make_window("hann", N)
        rng = np.random.default_rng(12)
        raw = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
        want = _f64_truth(raw[:valid], w)
        step = PsdStep(N, F, window=w, backend="fourstep")
        inp = raw.copy()
        inp[valid:] = 255  # garbage in the padding rows must not leak
        inp = inp.view(np.uint16) if step.takes_u16 else inp
        assert _rel(step(inp, valid), want) <= 1e-5


def test_windowed_cpu_auto_uses_xla_fft():
    """Non-TPU windowed auto must fall through to the XLA FFT — on CPU
    it is the FFTW-class yardstick itself (measured 30-seed windowed
    p50 ratio 1.00 vs the matmul-stage paths' 1.6-2.7)."""
    import jax
    if jax.default_backend() == "tpu":  # pragma: no cover - CPU harness
        pytest.skip("CPU-ladder assertion")
    N, F = 2048, 32
    w = make_window("hann", N)
    auto = PsdStep(N, F, window=w, backend="auto")
    # The XLA fallback path takes plain u8 frames, not the u16 view the
    # fused four-step family uses — that distinguishes the ladders.
    assert not auto.takes_u16
    unwindowed = PsdStep(N, F, backend="auto")
    assert unwindowed.takes_u16  # hybrid band still owns unwindowed 2048


def _tone_realization(N, F, seed):
    rng = np.random.default_rng(seed)
    f0 = rng.uniform(0.05, 0.45)
    ph = rng.uniform(0, 2 * np.pi)
    t = np.arange(F * N)
    x = 100.0 * np.exp(1j * (2 * np.pi * f0 * t + ph)) + (
        rng.standard_normal(F * N) + 1j * rng.standard_normal(F * N))
    re8 = np.clip(np.round(x.real + 127), 0, 255).astype(np.uint8)
    im8 = np.clip(np.round(x.imag + 127), 0, 255).astype(np.uint8)
    return np.stack([re8, im8], axis=-1).reshape(F, 2 * N)


def test_windowed_adversarial_tone_class_relative():
    """The class-relative guarantee must hold WITH a window on the auto
    ladder against the ENFORCED yard: max(scipy-f32, platform f32 FFT)
    per realization, median <= 1.5x / max <= 3x — in BOTH yard regimes.

    History: round 4 waived the median to <= 2.75x on toolchains whose
    platform FFT refuses to compile (degrading the yard to scipy-only),
    under a "measured hardware floor" claim for the windowed session
    sizes. Round 5 REFUTED the floor at stage 1 itself and shipped the
    split-pass four-step (fourstep4x): the 60-seed strict-yard
    admission audit reads med 0.40-1.06x across windowed 1024-12288
    (probes/windowed_s1x_audit.py, BENCHMARKS "Windowed session-size
    stage-1 fix"), so the waiver is deleted and the headline budget is
    enforced even on the degraded (stricter) yard."""
    import jax
    import jax.numpy as jnp
    import scipy.fft
    from rtl_power_fftw_tpu.ops.spectral import platform_fft_preflight_ok

    N, F = 2048, 32
    w = make_window("hann", N)
    w64 = w.astype(np.float64)
    # A refused in-process compile POISONS the client on the measured
    # toolchain, so the platform leg must be pre-flighted
    # out-of-process before the first mono() call. Only worth doing on
    # a real TPU run: on the CPU harness the platform FFT IS the class
    # (plat ~ cls), so the scipy-only yard loses nothing — and the
    # subprocess would ride the flaky remote tunnel for minutes.
    if jax.default_backend() == "tpu":
        plat_dead = not platform_fft_preflight_ok(N)
    else:
        plat_dead = True  # degraded (stricter) yard; see note above
    mono = None if plat_dead else jax.jit(lambda z: jnp.fft.fft(z, axis=1))
    step = PsdStep(N, F, window=w, backend="auto")
    ours, yard = [], []
    for seed in range(15):
        raw = _tone_realization(N, F, 700 + seed)
        z = (raw[:, 0::2].astype(np.float64) - 127.0) \
            + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)
        X = np.fft.fft(z * w64, axis=1)
        want = (X.real ** 2 + X.imag ** 2).sum(0)
        inp = raw.view(np.uint16) if step.takes_u16 else raw
        ours.append(_rel(step(inp, F), want))
        zw32 = z.astype(np.complex64) * w.astype(np.complex64)
        Xc = scipy.fft.fft(zw32, axis=1)
        cls = _rel((Xc.real.astype(np.float64) ** 2
                    + Xc.imag.astype(np.float64) ** 2).sum(0), want)
        plat = 0.0
        if mono is not None:
            try:
                Xp = np.asarray(mono(zw32))
                plat = _rel((Xp.real.astype(np.float64) ** 2
                             + Xp.imag.astype(np.float64) ** 2).sum(0),
                            want)
            except Exception:
                mono, plat_dead = None, True  # degraded (stricter) yard
        yard.append(max(cls, plat))
    assert np.median(ours) <= 1.5 * np.median(yard), \
        (np.median(ours), np.median(yard), plat_dead)
    assert max(ours) <= 3.0 * max(yard), (max(ours), max(yard))


def test_windowed_tpu_band_selection(monkeypatch):
    """Pin the windowed TPU auto ladder's band boundaries (construction
    only — the probe evidence lives in probes/windowed_pow2_direct.py;
    selection is pure Python so it can be asserted on the CPU harness by
    pinning the platform answer).

    Windowed (round 4): fourstep4m below 65536 wherever the kernel
    doesn't take it, pallas pow-2 8192-16384, plain four-step
    [65536, 262144] (strict-yard compliant there), fourstep4m again at
    (2^18, 2^19], hybrid only past 2^19, fft4 for composite
    very-large N only when the hybrid split is unsuitable."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def path(N, F=32, windowed=True):
        w = make_window("hann", N) if windowed else None
        return PsdStep(N, F, window=w, backend="auto").path

    # Windowed session sizes (round 5): the SPLIT-PASS four-step takes
    # 1024-16384 (N divisible by 8) — the round-4 "hardware floor"
    # (fourstep4m med 2.0-2.4x strict class there) was refuted at
    # stage 1 itself: all-exact-products native-bf16 stage 1 with the
    # contraction depth held <= 16 reads med 0.84-1.46x
    # (probes/windowed_s1x.py; BENCHMARKS "Windowed session-size
    # stage-1 fix"). 512 keeps fourstep4m (0.89x PASS outright, ~3x
    # faster there).
    assert path(512) == "fourstep4m"
    assert path(2048) == "fourstep4x"
    assert path(4096) == "fourstep4x"
    assert path(6144) == "fourstep4x"     # non-pow-2 <= 8192
    # The kernel's windowed cells moved too (round 5): pallas fails the
    # strict-yard median there (1.90x/1.55x, 60 seeds) while the
    # split-pass four-step passes with margin; the kernel stays the
    # windowed relaxed tier (--precision high) and explicit backend.
    assert path(8192) == "fourstep4x"
    assert path(16384) == "fourstep4x"
    # Windowed (8192, 65536) non-pallas: the plain fourstep BREACHED
    # the max budget at 12288 (3.27x) and the kernel fails the strict
    # median at 32768 where fourstep4m strictly passes — both cells
    # moved in round 4; 12288 rides the split-pass band since round 5.
    assert path(12288) == "fourstep4x"
    assert path(32768) == "fourstep4m"
    assert path(20480) == "fourstep4m"    # non-pow-2 mid-band
    assert path(65536) == "fourstep"      # strict-yard PASS 1.38x
    # The windowed very-large-N decision (probes/windowed_band_decide,
    # round-4 update probes/windowed_comp.py): fourstep is the fastest
    # budget-passing candidate at 2^17/2^18 (1.50x/1.29x median); at
    # 2^19 - where round 3 shipped the hybrid as a documented budget
    # EXCEPTION - the compensated four-step (4-mult stages + split
    # twiddle + chunked stage-2) is now the budget-TRUE path; the
    # hybrid takes over above 2^19 (2^20 median 1.16x class at
    # 15.6 GS/s).
    assert path(1 << 17) == "fourstep"
    assert path(1 << 18) == "fourstep"
    assert path(1 << 19, F=16) == "fourstep4m"
    assert path(3 << 17, F=16) == "fourstep4m"   # non-pow-2 in-band
    assert path(1 << 20, F=8) == "hybrid"
    # Unwindowed boundaries after the round-4 tail audit
    # (probes/unwindowed_2e17_tail.py): every audited hybrid breach
    # lies in (8192, 2^18) — distribution maxima to 9.36x class,
    # per-seed ratios to 28x — so the compensated four-step (the only
    # candidate passing every audited size) takes that range wherever
    # the kernel doesn't, and the hybrid keeps N >= 2^18 where its
    # tail thins monotonically (maxima <=1.46 at 2^18/2^19, <=2.1 at
    # 2^20) at 2-3x the compensated speed.
    assert path(65536, windowed=False) == "pallas"
    assert path(2048, windowed=False) == "hybrid"
    assert path(6144, windowed=False) == "fourstep"
    assert path(12288, windowed=False) == "fourstep4m"
    assert path(49152, windowed=False) == "fourstep4m"
    assert path(1 << 17, windowed=False) == "fourstep4m"
    assert path(196608, windowed=False, F=32) == "fourstep4m"
    assert path(1 << 18, windowed=False, F=32) == "hybrid"
    assert path(1 << 19, windowed=False, F=16) == "hybrid"
    assert path(1 << 20, windowed=False, F=8) == "hybrid"


def test_precision_high_clamped_on_large_n_hybrid(monkeypatch, capsys):
    """--precision high on the large-N hybrid band is a measured PURE
    LOSS (slower AND ~100x less tone-accurate — probes/large_n_fast.py
    at 2^20: 1094 vs 620 us/step), so the step keeps HIGHEST and prints
    a note instead of honoring a strictly-worse request."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    step = PsdStep(1 << 17, 32, backend="auto", precision="high")
    assert step.path == "hybrid"
    err = capsys.readouterr().err
    assert "measured pure loss" in err and "using highest" in err
    # The small-N hybrid band keeps honoring the relaxed tier (no note).
    step2 = PsdStep(2048, 32, backend="auto", precision="high")
    err2 = capsys.readouterr().err
    assert "measured pure loss" not in err2
    # Windowed relaxed tier (round 5): the kernel is the fastest
    # relaxed-parity step at its windowed shapes, so --precision high
    # moves the fourstep4x band's pow-2 cells back onto it; non-kernel
    # shapes keep the budget-true split-pass path.
    w8 = make_window("hann", 8192)
    step3 = PsdStep(8192, 32, window=w8, backend="auto", precision="high")
    assert step3.path == "pallas"
    w6 = make_window("hann", 6144)
    step4 = PsdStep(6144, 32, window=w6, backend="auto", precision="high")
    assert step4.path == "fourstep4x"


def test_split_window_exactness_and_parity():
    """split_window: w reconstructs exactly and x*w_hi is bit-exact for
    every dequant value (the 15-bit-mantissa truncation claim); the
    split-window hybrid matches the f64 truth within the f32 budget.
    (Whether it beats the plain windowed hybrid is a TPU measurement —
    probes/windowed_large_dist.py.)"""
    import jax
    import jax.numpy as jnp
    from rtl_power_fftw_tpu.ops.dft import (
        best_hybrid_split, fourstep_hybrid_windowed_psd_partial,
        split_window)

    N, F = 1024, 8
    w = make_window("hamming", N)
    w_hi, w_lo = split_window(w)
    x = np.arange(-127, 129, dtype=np.float64)
    exact = x[:, None] * w_hi.astype(np.float64)[None, :]
    f32 = (x.astype(np.float32)[:, None] * w_hi[None, :]).astype(np.float64)
    assert np.array_equal(exact, f32)
    np.testing.assert_array_equal(
        w_hi.astype(np.float64) + w_lo.astype(np.float64),
        w.astype(np.float64))

    rng = np.random.default_rng(11)
    raw = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    re = raw[:, 0::2].astype(np.float32) - 127
    im = raw[:, 1::2].astype(np.float32) - 127
    n1, n2 = best_hybrid_split(N, min_n1=8)
    got = np.asarray(fourstep_hybrid_windowed_psd_partial(
        jnp.asarray(re), jnp.asarray(im), jnp.ones(F, jnp.float32),
        jnp.asarray(w_hi), jnp.asarray(w_lo), n1, n2), np.float64)
    want = _f64_truth(raw, w)
    assert _rel(got, want) < 1e-5


def test_fourstep4m_parity_and_explicit_backend():
    """The compensated four-step (round-4 budget-truth path for windowed
    2^19): 4-mult stages + hi/lo split twiddle + chunked stage-2 tree
    accumulation — parity vs the f64 truth, explicit-backend PsdStep,
    and the sharded step land on the same partial."""
    from rtl_power_fftw_tpu.ops.dft import fourstep4m_psd_partial
    import jax.numpy as jnp

    N, F = 2048, 8
    w = make_window("hann", N)
    rng = np.random.default_rng(13)
    raw = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    re = (raw[:, 0::2].astype(np.float32) - 127) * w
    im = (raw[:, 1::2].astype(np.float32) - 127) * w
    fmask = np.ones(F, np.float32)
    fmask[-1] = 0
    got = np.asarray(fourstep4m_psd_partial(
        jnp.asarray(re), jnp.asarray(im), jnp.asarray(fmask)), np.float64)
    z = re.astype(np.float64) + 1j * im.astype(np.float64)
    X = np.fft.fft(z, axis=1)
    want = ((X.real ** 2 + X.imag ** 2)
            * fmask[:, None].astype(np.float64)).sum(0)
    assert _rel(got, want) < 1e-5

    # Explicit backend on the session step (any composite N, windowed or
    # not), chunked stage-2 exercised via a large-N2 split.
    step = PsdStep(N, F, window=w, backend="fourstep4m")
    assert step.path == "fourstep4m" and step.takes_u16
    got2 = np.asarray(step(raw.view(np.uint16), F - 1), np.float64)
    assert _rel(got2, want) < 1e-5

    big = np.asarray(fourstep4m_psd_partial(
        jnp.asarray(re), jnp.asarray(im), jnp.asarray(fmask),
        2, 1024), np.float64)          # N2=1024 → 4 stage-2 chunks
    assert _rel(big, want) < 1e-5

    import pytest as _pytest
    with _pytest.raises(ValueError, match="composite"):
        from rtl_power_fftw_tpu.ops.spectral import select_transform_rung
        select_transform_rung(1009, 8, False, "fourstep4m", tpu=False)


def test_fourstep4m_odd_chunk_tree():
    """Regression (round-5 advisor HIGH): the stage-2 pairwise tree sum
    crashed with IndexError whenever the chunk count was odd — e.g. the
    auto split at N=393216 gives 512x768 → 768//256 = 3 chunks, so 8408
    in-band windowed sizes (and the fourstep4m estimator paths) crashed
    at trace time. The odd tail must carry through each tree level."""
    import jax
    import jax.numpy as jnp
    from rtl_power_fftw_tpu.ops.dft import (best_fourstep_split,
                                            fourstep4m_psd_partial)

    # Small-N numeric check with a forced 3-chunk stage 2 (N2=768).
    N, F = 3072, 8
    rng = np.random.default_rng(23)
    raw = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    re = raw[:, 0::2].astype(np.float32) - 127
    im = raw[:, 1::2].astype(np.float32) - 127
    fmask = np.ones(F, np.float32)
    got = np.asarray(fourstep4m_psd_partial(
        jnp.asarray(re), jnp.asarray(im), jnp.asarray(fmask),
        4, 768), np.float64)           # N2=768 → s2_chunks=3 (odd)
    z = re.astype(np.float64) + 1j * im.astype(np.float64)
    X = np.fft.fft(z, axis=1)
    want = (X.real ** 2 + X.imag ** 2).sum(0)
    assert _rel(got, want) < 1e-5

    # Trace-only check at the advisor's exact crashing size (the auto
    # split itself lands on the odd chunk count: 512x768).
    Nbig = 393216
    n1, n2 = best_fourstep_split(Nbig)
    assert (n1, n2) == (512, 768) and (n2 // 256) % 2 == 1
    out = jax.eval_shape(
        lambda r, i, m: fourstep4m_psd_partial(r, i, m, n1, n2),
        jax.ShapeDtypeStruct((4, Nbig), jnp.float32),
        jax.ShapeDtypeStruct((4, Nbig), jnp.float32),
        jax.ShapeDtypeStruct((4,), jnp.float32))
    assert out.shape == (Nbig,)


def test_fourstep4x_parity_and_explicit_backend():
    """The split-pass four-step (round-5 windowed session-band
    budget-truth path): explicit native-bf16 stage 1 (4-term input ×
    4-term weight truncation splits, triangular pass set, shallow
    contraction) over the audited fourstep4m tail — parity vs the f64
    truth, explicit-backend PsdStep, frame mask, per-frame sibling,
    and the divisible-by-8 requirement."""
    import jax.numpy as jnp
    import pytest as _pytest
    from rtl_power_fftw_tpu.ops.dft import (best_fourstep4x_split,
                                            dft_power_fourstep4x,
                                            fourstep4x_psd_partial)

    # Split rule: K=16 direct when 16 | N (med 0.73-1.05x across the
    # probed band), K=8 when only 8 | N (strictly shallower).
    assert best_fourstep4x_split(2048) == (16, 128)
    assert best_fourstep4x_split(4096) == (16, 256)
    assert best_fourstep4x_split(1800) == (8, 225)   # 8 | N only
    assert best_fourstep4x_split(1048) == (8, 131)

    N, F = 2048, 8
    w = make_window("hann", N)
    rng = np.random.default_rng(29)
    raw = rng.integers(0, 256, (F, 2 * N), dtype=np.uint8)
    re = (raw[:, 0::2].astype(np.float32) - 127) * w
    im = (raw[:, 1::2].astype(np.float32) - 127) * w
    fmask = np.ones(F, np.float32)
    fmask[-1] = 0
    got = np.asarray(fourstep4x_psd_partial(
        jnp.asarray(re), jnp.asarray(im), jnp.asarray(fmask)), np.float64)
    z = re.astype(np.float64) + 1j * im.astype(np.float64)
    X = np.fft.fft(z, axis=1)
    pwr = X.real ** 2 + X.imag ** 2
    want = (pwr * fmask[:, None].astype(np.float64)).sum(0)
    assert _rel(got, want) < 1e-5

    # The unchunked K=16 split computes the same transform.
    got16 = np.asarray(fourstep4x_psd_partial(
        jnp.asarray(re), jnp.asarray(im), jnp.asarray(fmask),
        16, 128), np.float64)
    assert _rel(got16, want) < 1e-5

    # Explicit backend on the session step.
    step = PsdStep(N, F, window=w, backend="fourstep4x")
    assert step.path == "fourstep4x" and step.takes_u16
    got2 = np.asarray(step(raw.view(np.uint16), F - 1), np.float64)
    assert _rel(got2, want) < 1e-5

    # Per-frame sibling (the windowed SK family's transform).
    pf = np.asarray(dft_power_fourstep4x(
        jnp.asarray(re), jnp.asarray(im)), np.float64)
    assert _rel(pf.sum(0), pwr.sum(0)) < 1e-5

    with _pytest.raises(ValueError, match="divisible by 8"):
        PsdStep(1028, F, backend="fourstep4x")   # 1028 = 4·257


@pytest.mark.parametrize("backend", ["fourstep4m", "fourstep4x"])
def test_fourstep4m_sharded_parity(backend):
    import jax
    from jax.sharding import Mesh
    from rtl_power_fftw_tpu.parallel.sharded import ShardedPsdStep

    devs = jax.devices()
    if len(devs) < 8:
        import pytest as _pytest
        _pytest.skip("needs an 8-device mesh (CPU harness)")
    mesh = Mesh(np.array(devs[:8]), ("stream",))
    N, F, S = 1024, 8, 8
    w = make_window("hann", N)
    sh = ShardedPsdStep(mesh, N, F, streams=S, window=w,
                        backend=backend)
    assert sh.path == backend
    rng = np.random.default_rng(17)
    raw = rng.integers(0, 256, (S, sh.F, 2 * N), dtype=np.uint8)
    per_stream, combined = sh(raw, np.full(S, sh.F, np.int32))
    total = np.zeros(N)
    for s in range(S):
        re = (raw[s, :, 0::2].astype(np.float32) - 127) * w
        im = (raw[s, :, 1::2].astype(np.float32) - 127) * w
        z = re.astype(np.float64) + 1j * im.astype(np.float64)
        X = np.fft.fft(z, axis=1)
        want = (X.real ** 2 + X.imag ** 2).sum(0)
        assert _rel(np.asarray(per_stream[s], np.float64), want) < 1e-5, s
        total += want
    assert _rel(np.asarray(combined, np.float64), total) < 1e-5
