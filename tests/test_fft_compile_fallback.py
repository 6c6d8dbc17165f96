"""Compile-failure resilience of auto's monolithic-FFT rung.

Auto's measured ladder covers composite N; prime and 2·prime N delegate
to the platform's monolithic FFT — the one rung whose lowering the
framework does not control. A live remote-compile window on this
toolchain returned UNIMPLEMENTED for exactly such bare FFT jits, which
would have killed a running session at e.g. -b 509 (N=1018=2·509). The
PsdStep falls back to the matmul DFT (plain dot-generals, same u8
convention) and warns instead (ops/spectral.py _fallback_to_matmul).
"""
import numpy as np
import pytest

from rtl_power_fftw_tpu.ops.spectral import PsdStep


def _golden(raw, F, N):
    z = (raw[:F, 0::2].astype(np.float64) - 127.0) \
        + 1j * (raw[:F, 1::2].astype(np.float64) - 127.0)
    return (np.abs(np.fft.fft(z, axis=1)) ** 2).sum(0)


def _fail_once(exc):
    state = {"fired": False}

    def step(*args):
        if not state["fired"]:
            state["fired"] = True
            raise exc
        raise AssertionError("failing stub called twice")

    return step


def test_unimplemented_fft_falls_back_to_matmul(capsys):
    N = 1018  # 2·509: degenerate split → auto lands on the xla rung
    step = PsdStep(N, 8, backend="auto")
    assert step.path == "xla"
    # Simulate the backend refusing to lower the FFT at first dispatch.
    step._step = _fail_once(RuntimeError(
        "UNIMPLEMENTED: FFT shape not supported by this emitter"))
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, size=(step.F, 2 * N), dtype=np.uint8)
    got = np.asarray(step(raw, 8), dtype=np.float64)
    want = _golden(raw, 8, N)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert step.path == "matmul"
    assert step.backend == "auto"  # the user's request stays introspectable
    assert "falls back to the matmul DFT" in capsys.readouterr().err
    # Subsequent dispatches use the rebuilt step directly.
    got2 = np.asarray(step(raw, 8), dtype=np.float64)
    np.testing.assert_allclose(got2, want, rtol=1e-5)


def test_other_errors_propagate():
    N = 1018
    step = PsdStep(N, 8, backend="auto")
    step._step = _fail_once(ValueError("boom"))
    raw = np.zeros((step.F, 2 * N), dtype=np.uint8)
    with pytest.raises(ValueError, match="boom"):
        step(raw, 8)
    assert step.path == "xla"  # no silent rebuild


def test_no_fallback_on_composite_paths():
    # A measured rung (hybrid/fourstep/...) must never be silently
    # swapped for matmul, even on an UNIMPLEMENTED-class message.
    step = PsdStep(2048, 8, backend="auto")
    assert step.path != "xla"
    step._step = _fail_once(RuntimeError("UNIMPLEMENTED: nope"))
    raw = np.zeros((step.F, 2048), dtype=np.uint16)
    with pytest.raises(RuntimeError, match="UNIMPLEMENTED"):
        step(raw, 8)


@pytest.mark.parametrize("windowed", [False, True])
def test_sharded_step_falls_back_too(windowed):
    import jax
    from rtl_power_fftw_tpu.auxdata import make_window
    from rtl_power_fftw_tpu.parallel import ShardedPsdStep, make_mesh

    N = 1018
    w = make_window("hann", N) if windowed else None
    mesh = make_mesh(min(8, len(jax.devices())))
    step = ShardedPsdStep(mesh, N, 8, streams=8, window=w, backend="auto")
    assert step.path == "xla"
    # _fail_once asserts the dead step is never dispatched twice (the
    # retry must go through the REBUILT step, not the broken one).
    step._step = _fail_once(RuntimeError("UNIMPLEMENTED: FFT emitter refused"))
    rng = np.random.default_rng(5)
    raw = rng.integers(0, 256, size=(8, step.F, 2 * N), dtype=np.uint8)
    nv = np.full((8,), 8, dtype=np.int32)
    per_stream, combined = step(raw, nv)
    assert step.path == "matmul"
    assert step.backend == "auto"
    z0 = (raw[0, :8, 0::2].astype(np.float64) - 127.0) \
        + 1j * (raw[0, :8, 1::2].astype(np.float64) - 127.0)
    if w is not None:
        z0 = z0 * w.astype(np.float64)  # window survives the re-init
    want0 = (np.abs(np.fft.fft(z0, axis=1)) ** 2).sum(0)
    np.testing.assert_allclose(np.asarray(per_stream)[0], want0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(per_stream).sum(0),
                               np.asarray(combined), rtol=1e-5)


def test_pfb_session_step_falls_back(capsys):
    """The PFB estimator's "xla" mode has the same fallback; filter
    history survives the rebuild."""
    from rtl_power_fftw_tpu.models.pfb import PfbSessionStep
    from test_pfb_session import _direct_pfb_pwr

    N, P, F = 64, 3, 8
    step = PfbSessionStep(N, F, taps=P)
    assert step._mode == "xla"
    step._step = _fail_once(RuntimeError("UNIMPLEMENTED: FFT refused"))
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, size=(F, 2 * N), dtype=np.uint8)
    got = np.asarray(step(raw, F), dtype=np.float64)
    want = _direct_pfb_pwr(raw, N, P)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert step._mode == "matmul" and step.path == "pfb"
    assert "PFB step falls back" in capsys.readouterr().err
    # History carried into the next (rebuilt) dispatch as usual.
    raw2 = rng.integers(0, 256, size=(F, 2 * N), dtype=np.uint8)
    got2 = np.asarray(step(raw2, F), dtype=np.float64)
    want2 = _direct_pfb_pwr(np.vstack([raw, raw2]), N, P) - want
    np.testing.assert_allclose(got2, want2, rtol=1e-4)


def test_sharded_pfb_step_falls_back(capsys):
    import jax
    from rtl_power_fftw_tpu.models.pfb import ShardedPfbStep
    from test_pfb_session import _direct_pfb_pwr

    N, P, F, S = 64, 3, 8, 8
    mesh_size = min(8, len(jax.devices()))
    from rtl_power_fftw_tpu.parallel import make_mesh
    step = ShardedPfbStep(make_mesh(mesh_size), N, F, streams=S, taps=P)
    assert step._mode == "xla"
    step._step = _fail_once(RuntimeError("UNIMPLEMENTED: FFT refused"))
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 256, size=(S, F, 2 * N), dtype=np.uint8)
    nv = np.full((S,), F, dtype=np.int32)
    per_stream, combined = step(raw, nv)
    assert step._mode == "matmul"
    assert "sharded PFB step falls back" in capsys.readouterr().err
    want0 = _direct_pfb_pwr(raw[0], N, P)
    np.testing.assert_allclose(np.asarray(per_stream)[0], want0, rtol=1e-5)


class _FakeRun:
    """subprocess.run stub for the preflight probe: scripted
    (returncode, stderr) per call, counting invocations."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = 0

    def __call__(self, *a, **k):
        import types
        self.calls += 1
        rc, err = self.script.pop(0)
        return types.SimpleNamespace(returncode=rc, stderr=err, stdout=b"")


def test_preflight_retries_transient_failures_once(monkeypatch, tmp_path):
    """Round-4 advisor finding: a child probe that dies of device
    contention / a flaky tunnel (no compile-refusal signature in its
    stderr) must be retried once before a refusal is cached — one
    unlucky probe must not permanently downgrade a healthy session."""
    import subprocess
    from rtl_power_fftw_tpu.ops import spectral

    monkeypatch.delenv("RPF_FFT_PREFLIGHT_FORCE", raising=False)
    # Isolate the on-disk verdict store: a real verdict persisted by a
    # previous suite run (or live session) at these N would satisfy the
    # probe before the counting fake ever runs.
    monkeypatch.setenv("RPF_FFT_PREFLIGHT_CACHE_DIR", str(tmp_path))

    # Transient failure then success → ok, two child invocations.
    fake = _FakeRun([(1, b"Connection reset by peer (transport error)"),
                     (0, b"")])
    monkeypatch.setattr(subprocess, "run", fake)
    monkeypatch.setitem(spectral._PREFLIGHT_CACHE, 7777, None)
    spectral._PREFLIGHT_CACHE.pop(7777, None)
    assert spectral.platform_fft_preflight_ok(7777) is True
    assert fake.calls == 2
    assert spectral._PREFLIGHT_CACHE[7777] is True

    # A genuine compile refusal is cached immediately — no retry.
    fake2 = _FakeRun([(1, b"UNIMPLEMENTED: FFT shape not supported")])
    monkeypatch.setattr(subprocess, "run", fake2)
    spectral._PREFLIGHT_CACHE.pop(7779, None)
    assert spectral.platform_fft_preflight_ok(7779) is False
    assert fake2.calls == 1

    # Two consecutive transient failures still degrade (recoverable)…
    fake3 = _FakeRun([(1, b"socket closed"), (1, b"socket closed")])
    monkeypatch.setattr(subprocess, "run", fake3)
    spectral._PREFLIGHT_CACHE.pop(7781, None)
    assert spectral.platform_fft_preflight_ok(7781) is False
    assert fake3.calls == 2
    for n in (7777, 7779, 7781):
        spectral._PREFLIGHT_CACHE.pop(n, None)


def test_preflight_disk_cache_skips_second_process(monkeypatch, tmp_path):
    """Round-5 ask #4: a DEFINITIVE preflight verdict (ok or genuine
    refusal) is persisted on disk keyed by the toolchain fingerprint,
    so a second process at the same N skips the 20-150 s child compile
    (simulated here by clearing the in-process cache); transient
    double-failures stay in-process only."""
    import subprocess
    from rtl_power_fftw_tpu.ops import spectral

    monkeypatch.delenv("RPF_FFT_PREFLIGHT_FORCE", raising=False)
    monkeypatch.delenv("RPF_FFT_PREFLIGHT_CACHE", raising=False)
    monkeypatch.setenv("RPF_FFT_PREFLIGHT_CACHE_DIR", str(tmp_path))

    # Process 1: compiles ok → persisted.
    fake = _FakeRun([(0, b"")])
    monkeypatch.setattr(subprocess, "run", fake)
    spectral._PREFLIGHT_CACHE.pop(8881, None)
    assert spectral.platform_fft_preflight_ok(8881) is True
    assert fake.calls == 1
    assert (tmp_path / "preflight.json").exists()
    # "Process 2" (fresh in-process cache): disk hit, NO child probe.
    spectral._PREFLIGHT_CACHE.pop(8881, None)
    fake2 = _FakeRun([])          # any call would IndexError
    monkeypatch.setattr(subprocess, "run", fake2)
    assert spectral.platform_fft_preflight_ok(8881) is True
    assert fake2.calls == 0

    # Genuine refusal is persisted too.
    fake3 = _FakeRun([(1, b"UNIMPLEMENTED: no fft")])
    monkeypatch.setattr(subprocess, "run", fake3)
    spectral._PREFLIGHT_CACHE.pop(8883, None)
    assert spectral.platform_fft_preflight_ok(8883) is False
    spectral._PREFLIGHT_CACHE.pop(8883, None)
    fake4 = _FakeRun([])
    monkeypatch.setattr(subprocess, "run", fake4)
    assert spectral.platform_fft_preflight_ok(8883) is False
    assert fake4.calls == 0

    # Transient double-failure: NOT persisted — the next process
    # re-probes (and here succeeds).
    fake5 = _FakeRun([(1, b"socket closed"), (1, b"socket closed")])
    monkeypatch.setattr(subprocess, "run", fake5)
    spectral._PREFLIGHT_CACHE.pop(8885, None)
    assert spectral.platform_fft_preflight_ok(8885) is False
    assert fake5.calls == 2
    spectral._PREFLIGHT_CACHE.pop(8885, None)
    fake6 = _FakeRun([(0, b"")])
    monkeypatch.setattr(subprocess, "run", fake6)
    assert spectral.platform_fft_preflight_ok(8885) is True
    assert fake6.calls == 1

    # RPF_FFT_PREFLIGHT_CACHE=0 disables both read and write.
    monkeypatch.setenv("RPF_FFT_PREFLIGHT_CACHE", "0")
    spectral._PREFLIGHT_CACHE.pop(8881, None)
    fake7 = _FakeRun([(0, b"")])
    monkeypatch.setattr(subprocess, "run", fake7)
    assert spectral.platform_fft_preflight_ok(8881) is True
    assert fake7.calls == 1       # disk hit existed but was ignored
    for n in (8881, 8883, 8885):
        spectral._PREFLIGHT_CACHE.pop(n, None)


def test_sk_explicit_backend_honored_windowed():
    """Round-4 advisor finding: an explicit --fft-backend fourstep on a
    WINDOWED SK session must stay the plain four-step (and say so in
    ``path``); only the auto-derived windowed TPU mode upgrades to the
    compensated form."""
    import jax
    from rtl_power_fftw_tpu.auxdata import make_window
    from rtl_power_fftw_tpu.models.kurtosis import SkSessionStep, _sk_mode

    N, F = 1024, 8
    w = make_window("hann", N)
    step = SkSessionStep(N, F, window=w, backend="fourstep")
    assert step.path == "fourstep"
    # Explicit compensated request is honored too (parity with PsdStep).
    step4m = SkSessionStep(N, F, window=w, backend="fourstep4m")
    assert step4m.path == "fourstep4m"
    rng = np.random.default_rng(9)
    raw = rng.integers(0, 256, size=(F, 2 * N), dtype=np.uint8)
    z = ((raw[:, 0::2].astype(np.float64) - 127.0)
         + 1j * (raw[:, 1::2].astype(np.float64) - 127.0)) * w
    want1 = (np.abs(np.fft.fft(z, axis=1)) ** 2).sum(0)
    want2 = ((np.abs(np.fft.fft(z, axis=1)) ** 2) ** 2).sum(0)
    for st in (step, step4m):
        s1, s2 = st(raw.view(np.uint16), F)
        np.testing.assert_allclose(np.asarray(s1, np.float64), want1,
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s2, np.float64), want2,
                                   rtol=1e-4)
    # The auto-derived windowed TPU mode is where the upgrade lives:
    # the split-pass four-step on the session band (round 5), the
    # compensated four-step outside it.
    assert _sk_mode(N, True, "auto") == (
        "fourstep4x" if jax.default_backend() == "tpu" else "xla")
    assert _sk_mode(512, True, "auto") == (
        "fourstep4m" if jax.default_backend() == "tpu" else "xla")
    assert _sk_mode(N, False, "fourstep") == "fourstep"
    # Explicit split-pass request honored verbatim too.
    assert _sk_mode(N, True, "fourstep4x") == "fourstep4x"


def test_multitaper_steps_fall_back(capsys):
    import jax
    from rtl_power_fftw_tpu.models.multitaper import (
        MultitaperSessionStep, ShardedMultitaperStep)
    from rtl_power_fftw_tpu.parallel import make_mesh
    from test_multitaper_session import _direct_mt_pwr

    N, K, F, S = 64, 3, 8, 8
    step = MultitaperSessionStep(N, F, K=K)
    assert step._mode == "xla"
    step._step = _fail_once(RuntimeError("UNIMPLEMENTED: FFT refused"))
    rng = np.random.default_rng(6)
    raw = rng.integers(0, 256, size=(F, 2 * N), dtype=np.uint8)
    got = np.asarray(step(raw, F), dtype=np.float64)
    np.testing.assert_allclose(got, _direct_mt_pwr(raw, N, K), rtol=1e-5)
    assert step._mode == "matmul"

    sstep = ShardedMultitaperStep(make_mesh(min(8, len(jax.devices()))),
                                  N, F, streams=S, K=K)
    assert sstep._mode == "xla"
    sstep._step = _fail_once(RuntimeError("UNIMPLEMENTED: FFT refused"))
    sraw = rng.integers(0, 256, size=(S, F, 2 * N), dtype=np.uint8)
    ps, comb = sstep(sraw, np.full((S,), F, np.int32))
    assert sstep._mode == "matmul"
    np.testing.assert_allclose(np.asarray(ps)[0],
                               _direct_mt_pwr(sraw[0], N, K), rtol=1e-5)
    errtext = capsys.readouterr().err
    assert "multitaper step falls back" in errtext
