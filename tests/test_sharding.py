"""Multi-device mesh tests on the virtual 8-device CPU mesh (conftest).

Validates that sharded multi-stream accumulation with psum matches the
single-device result exactly — the TPU equivalent of multi-node testing
without a cluster (SURVEY §4)."""

import jax
import numpy as np
import pytest

from rtl_power_fftw_tpu.ops import PsdStep
from rtl_power_fftw_tpu.parallel import ShardedPsdStep, make_mesh
from rtl_power_fftw_tpu.auxdata import make_window


def make_streams(S, F, N, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(S, F, 2 * N), dtype=np.uint8)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8
    assert jax.devices()[0].platform == "cpu"


@pytest.mark.parametrize("streams", [8, 16])
def test_sharded_psum_matches_single_device(streams):
    N, F = 64, 64
    mesh = make_mesh(8)
    sh = ShardedPsdStep(mesh, N, F, streams=streams, backend="xla")
    raw = make_streams(streams, sh.F, N, seed=1)
    n_valid = np.full((streams,), sh.F, dtype=np.int32)
    per_stream, combined = sh(raw, n_valid)

    single = PsdStep(N, F, backend="xla")
    expect_streams = np.stack(
        [np.asarray(single(raw[s], sh.F)) for s in range(streams)])
    np.testing.assert_allclose(np.asarray(per_stream), expect_streams,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(combined), expect_streams.sum(0),
                               rtol=1e-6)


def test_sharded_per_stream_masking():
    N, F, S = 32, 64, 8
    mesh = make_mesh(8)
    sh = ShardedPsdStep(mesh, N, F, streams=S, backend="xla")
    raw = make_streams(S, sh.F, N, seed=2)
    n_valid = np.arange(S, dtype=np.int32) * 8  # uneven progress per stream
    per_stream, combined = sh(raw, n_valid)
    single = PsdStep(N, F, backend="xla")
    for s in range(S):
        np.testing.assert_allclose(
            np.asarray(per_stream)[s],
            np.asarray(single(raw[s], int(n_valid[s]))), rtol=1e-6)


def test_sharded_with_window():
    N, F, S = 64, 64, 8
    mesh = make_mesh(8)
    w = make_window("hann", N)
    sh = ShardedPsdStep(mesh, N, F, streams=S, window=w, backend="xla")
    raw = make_streams(S, sh.F, N, seed=3)
    per_stream, combined = sh(raw, np.full((S,), sh.F, dtype=np.int32))
    single = PsdStep(N, F, window=w, backend="xla")
    np.testing.assert_allclose(
        np.asarray(per_stream)[0], np.asarray(single(raw[0], sh.F)), rtol=1e-6)


def test_sharded_windowed_parity_per_stream():
    """Windowed sharded steps hold the parity budget vs the f64 truth
    per stream, with uneven per-stream masking in play, on both the
    explicit hybrid (the TPU unwindowed-shipping config exercised on
    CPU) and the windowed-ladder four-step."""
    N, F, S = 1024, 32, 8
    mesh = make_mesh(8)
    w = make_window("hann", N)
    raw = make_streams(S, F, N, seed=7)
    # Uneven progress, but >= 8 frames each: near-empty accumulations
    # have deep spectral nulls where RELATIVE error is meaningless.
    n_valid = np.asarray([F, F // 2, F, 8, F, F, 16, F], dtype=np.int32)
    outs = {}
    for backend in ("hybrid", "fourstep"):
        sh = ShardedPsdStep(mesh, N, F, streams=S, window=w,
                            backend=backend)
        inp = raw.view(np.uint16) if sh.takes_u16 else raw
        per_stream, _ = sh(inp, n_valid)
        outs[backend] = np.asarray(per_stream, np.float64)
    for s in range(S):
        z = (raw[s, :n_valid[s], 0::2].astype(np.float64) - 127.0) \
            + 1j * (raw[s, :n_valid[s], 1::2].astype(np.float64) - 127.0)
        X = np.fft.fft(z * w.astype(np.float64), axis=1)
        want = (X.real ** 2 + X.imag ** 2).sum(0)
        scale = np.maximum(np.abs(want), 1e-30)
        for backend in ("hybrid", "fourstep"):
            # 2e-5 rather than the 1e-5 TPU budget: the explicit hybrid
            # backend uses the lane-matched split everywhere, and this
            # CPU harness's BLAS matmuls accumulate K=128 sequentially
            # in f32 (see ops/spectral.py's auto-band note) — measured
            # 1.15e-5 worst-stream here.
            assert (np.abs(outs[backend][s] - want) / scale).max() <= 2e-5


def test_sharded_windowed_cpu_auto_ladder():
    """Windowed auto on the CPU mesh must take the XLA path (plain u8
    input), mirroring PsdStep's windowed ladder — the CPU XLA FFT is
    the FFTW-class yardstick itself; matmul-stage paths leak 1.6-2.7x
    there (probes/windowed_fold.py)."""
    N, F, S = 2048, 32, 8
    mesh = make_mesh(8)
    w = make_window("hann", N)
    sh = ShardedPsdStep(mesh, N, F, streams=S, window=w, backend="auto")
    assert not sh.takes_u16
    unwindowed = ShardedPsdStep(mesh, N, F, streams=S, backend="auto")
    assert unwindowed.takes_u16  # hybrid still owns unwindowed 2048


def test_streams_not_divisible_rejected():
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        ShardedPsdStep(mesh, 64, 64, streams=12)


def test_mesh_subset():
    mesh = make_mesh(4)
    assert mesh.devices.size == 4
    sh = ShardedPsdStep(mesh, 32, 64, streams=4, backend="xla")
    raw = make_streams(4, sh.F, 32, seed=4)
    per_stream, combined = sh(raw, np.full((4,), 10, dtype=np.int32))
    assert np.asarray(combined).shape == (32,)
    np.testing.assert_allclose(np.asarray(per_stream).sum(0),
                               np.asarray(combined), rtol=1e-6)


def test_multistream_acquisition_matches_sum_of_streams():
    """16 synthetic streams on the 8-device mesh: combined psum result must
    equal the float64 sum of per-stream golden accumulations."""
    import io
    from rtl_power_fftw_tpu.config import parse_args
    from rtl_power_fftw_tpu.parallel.multistream import MultiStreamAcquisition
    from rtl_power_fftw_tpu.sources import SyntheticSource
    from golden import golden_accumulate

    S, N, repeats, rate = 16, 64, 12, 2_048_000
    params = parse_args(["-b", str(N), "-n", str(repeats), "-r", str(rate)],
                        stderr=io.StringIO())

    def mk(seed):
        s = SyntheticSource(tones=[(100_200_000, 30.0)], noise=5.0, seed=seed)
        s.set_sample_rate(rate)
        return s

    sources = [mk(seed) for seed in range(S)]
    acq = MultiStreamAcquisition(params, sources)
    res = acq.run(freq=100_000_000)
    assert res.repeats_done.tolist() == [repeats] * S

    want = np.zeros(N)
    for seed in range(S):
        src = mk(seed)
        src.set_frequency(100_000_000)
        stream, _ = src.read(2 * N * repeats)
        pwr, _ = golden_accumulate(stream, N, repeats)
        want += np.fft.ifftshift(pwr)  # golden is pre-shifted; ours isn't
    np.testing.assert_allclose(res.pwr, want, rtol=1e-5)
    np.testing.assert_allclose(res.per_stream_pwr.sum(0), want, rtol=1e-5)


def test_multistream_distinct_seeds_and_flaky_tune():
    """Review regressions: extra synthetic streams must get distinct seeds,
    and transient tune failures in extra streams must be retried, with
    persistent failures surfacing as TuneError (hop dropped), not a fatal
    hardware error."""
    import io
    from rtl_power_fftw_tpu.config import parse_args
    from rtl_power_fftw_tpu.exceptions import TuneError
    from rtl_power_fftw_tpu.parallel.multistream import MultiStreamAcquisition
    from rtl_power_fftw_tpu.sources import SyntheticSource
    from rtl_power_fftw_tpu.sources.registry import make_sources

    # Seed distinctness through the registry used by --streams.
    extras = make_sources("synthetic:noise=5,seed=0", 2)
    a = extras[0]; b = extras[1]
    a.set_frequency(1_000_000); b.set_frequency(1_000_000)
    da, _ = a.read(1000); db, _ = b.read(1000)
    assert not np.array_equal(da, db)

    params = parse_args(["-b", "64", "-n", "8"], stderr=io.StringIO())

    # Transient failure on an extra stream: retried, acquisition succeeds.
    flaky = SyntheticSource(noise=5.0, seed=1, flaky_freqs={2_000_000: 2})
    ok = SyntheticSource(noise=5.0, seed=2)
    acq = MultiStreamAcquisition(params, [ok, flaky])
    res = acq.run(freq=2_000_000)
    assert res.repeats_done.tolist() == [8, 8]

    # Persistent failure: TuneError so the session drops the hop.
    dead = SyntheticSource(noise=5.0, seed=3, dead_freqs=[3_000_000])
    acq2 = MultiStreamAcquisition(params, [ok, dead])
    with pytest.raises(TuneError):
        acq2.run(freq=3_000_000)


def test_sharded_long_integration_matches_single_device():
    """Frame-axis sharding of one stream (the 1M-point mode at mesh scale)
    must equal single-device accumulation exactly."""
    from rtl_power_fftw_tpu.parallel.longint import sharded_accumulate
    from golden import golden_accumulate

    N, M = 128, 37  # non-divisible by 8 devices: exercises padding/masking
    rng = np.random.default_rng(55)
    stream = rng.integers(0, 256, 2 * N * M, dtype=np.uint8)
    frames = stream.reshape(M, 2 * N)
    pwr, m = sharded_accumulate(frames, N)
    assert m == M
    want, _ = golden_accumulate(stream, N, M)
    np.testing.assert_allclose(pwr, np.fft.ifftshift(want), rtol=1e-5)


def test_multistream_honors_welch_overlap():
    import io
    from rtl_power_fftw_tpu.config import parse_args
    from rtl_power_fftw_tpu.parallel.multistream import MultiStreamAcquisition
    from rtl_power_fftw_tpu.sources import SyntheticSource

    N, repeats, rate = 64, 16, 1_000_000
    params = parse_args(["-b", str(N), "-n", str(repeats), "-r", str(rate),
                         "--welch-overlap", "50"], stderr=io.StringIO())
    srcs = [SyntheticSource(noise=5.0, seed=s) for s in range(2)]
    for s in srcs:
        s.set_sample_rate(rate)
    acq = MultiStreamAcquisition(params, srcs)
    res = acq.run(freq=1_000_000)
    # 50% overlap: `repeats` spectra need only ~half the bytes, and the
    # producer reads 2*N*repeats bytes -> every stream reaches repeats.
    assert res.repeats_done.tolist() == [repeats, repeats]
    assert acq._hop == N // 2


def test_multistream_streams_incrementally():
    """The engine must overlap production and device stepping with bounded
    queues (VERDICT r1 #3): at least one device step completes before the
    producers finish reading — the whole measurement is never buffered."""
    import io
    import threading
    from rtl_power_fftw_tpu.config import parse_args
    from rtl_power_fftw_tpu.parallel.multistream import MultiStreamAcquisition
    from rtl_power_fftw_tpu.sources import SyntheticSource

    S, N, repeats, rate = 2, 64, 1024, 2_048_000
    params = parse_args(["-b", str(N), "-n", str(repeats), "-r", str(rate),
                         "-s", "16384"], stderr=io.StringIO())
    srcs = [SyntheticSource(noise=5.0, seed=s) for s in range(S)]
    for s in srcs:
        s.set_sample_rate(rate)

    log = []
    lock = threading.Lock()

    def wrap_read(src):
        orig = src.read

        def read(nbytes):
            out = orig(nbytes)
            with lock:
                log.append("read")
            return out
        src.read = read

    for s in srcs:
        wrap_read(s)
    acq = MultiStreamAcquisition(params, srcs, frames_per_step=64)
    orig_step = acq.step

    class StepSpy:
        def __init__(self, inner):
            self._inner = inner
            self.F = inner.F

        def __call__(self, *a, **k):
            with lock:
                log.append("step")
            return self._inner(*a, **k)

    acq.step = StepSpy(orig_step)
    res = acq.run(freq=100_000_000)
    assert res.repeats_done.tolist() == [repeats] * S
    first_step = log.index("step")
    last_read = len(log) - 1 - log[::-1].index("read")
    assert first_step < last_read, (
        f"no overlap: first step at {first_step}, last read at {last_read}")
    # Queue-pressure diagnostics were recorded.
    assert sum(acq.queue_histogram) > 0
    # Summary counters are truthful (one read per 16384-byte buffer).
    assert res.device_readouts == S * (2 * N * repeats) // 16384
    assert res.successful_readouts == res.device_readouts


def test_multistream_honors_strict_time():
    """--strict-time bounds a multistream acquisition even when repeats is
    effectively unbounded (acquisition.cxx:326-327 semantics)."""
    import io
    import time as _t
    from rtl_power_fftw_tpu.config import parse_args
    from rtl_power_fftw_tpu.parallel.multistream import MultiStreamAcquisition
    from rtl_power_fftw_tpu.sources import SyntheticSource

    S, N, rate = 2, 64, 2_048_000
    params = parse_args(["-b", str(N), "-r", str(rate), "-s", "16384",
                         "-t", "10", "--strict-time"], stderr=io.StringIO())
    params.repeats = 10**6           # would take forever without the deadline
    params.integration_time = 0.25   # the strict deadline under test

    class SlowSource(SyntheticSource):
        def read(self, nbytes):
            _t.sleep(0.02)
            return super().read(nbytes)

    srcs = [SlowSource(noise=5.0, seed=s) for s in range(S)]
    for s in srcs:
        s.set_sample_rate(rate)
    acq = MultiStreamAcquisition(params, srcs, frames_per_step=64)
    t0 = _t.monotonic()
    res = acq.run(freq=100_000_000)
    elapsed = _t.monotonic() - t0
    assert elapsed < 5.0
    assert 0 < res.repeats_done.sum() < 10**6


def test_multistream_stream_eof_partial(tmp_path):
    """A recorded stream running dry mid-acquisition yields a partial
    multistream result with stream_eof set, not an exception."""
    import io
    from rtl_power_fftw_tpu.config import parse_args
    from rtl_power_fftw_tpu.parallel.multistream import MultiStreamAcquisition
    from rtl_power_fftw_tpu.sources import FileSource

    N, repeats = 64, 32
    rng = np.random.default_rng(0)
    paths = []
    for s, frames in enumerate((repeats, 10)):  # second stream is short
        p = tmp_path / f"s{s}.iq"
        p.write_bytes(rng.integers(0, 256, frames * 2 * N,
                                   dtype=np.uint8).tobytes())
        paths.append(str(p))
    params = parse_args(["-b", str(N), "-n", str(repeats), "-s", "16384"],
                        stderr=io.StringIO())
    srcs = [FileSource(p, use_native=False) for p in paths]
    acq = MultiStreamAcquisition(params, srcs, frames_per_step=16)
    res = acq.run(freq=1_000_000)
    assert res.stream_eof
    assert res.repeats_done.tolist() == [repeats, 10]


@pytest.mark.parametrize("streams", [8, 16])
def test_sharded_pallas_kernel_matches(streams):
    """The fused Pallas kernel's streams variant composes with shard_map
    over the 8-device mesh (interpret mode on this CPU harness): per-
    stream masking + psum parity against the xla sharded path."""
    N, F = 2048, 16
    mesh = make_mesh(8)
    raw = make_streams(streams, F, N, seed=5)
    nv = np.resize(np.array([F, 3, 0, F, 7, F, 1, F], dtype=np.int32),
                   streams)
    ref_step = ShardedPsdStep(mesh, N, F, streams=streams, backend="xla")
    want_ps, want_comb = ref_step(raw, nv)
    step = ShardedPsdStep(mesh, N, F, streams=streams, backend="pallas")
    assert step.takes_u16
    ps, comb = step(raw, nv)
    np.testing.assert_allclose(np.asarray(ps), np.asarray(want_ps),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(comb), np.asarray(want_comb),
                               rtol=1e-4, atol=1e-2)


def test_sharded_pallas_kernel_windowed():
    N, F, streams = 2048, 16, 8
    mesh = make_mesh(8)
    w = make_window("hann", N)
    raw = make_streams(streams, F, N, seed=6)
    nv = np.full((streams,), F, dtype=np.int32)
    ref_step = ShardedPsdStep(mesh, N, F, streams=streams, backend="xla",
                              window=w)
    _, want_comb = ref_step(raw, nv)
    step = ShardedPsdStep(mesh, N, F, streams=streams, backend="pallas",
                          window=w)
    _, comb = step(raw, nv)
    np.testing.assert_allclose(np.asarray(comb), np.asarray(want_comb),
                               rtol=1e-4, atol=1e-2)


def test_multistream_slow_stream_isolation():
    """One stalled stream must not throttle the fast producers
    (acquisition.cxx:276-332: backpressure without a global barrier):
    partial rounds ship after the straggler window, so fast streams drain
    at their own pace — and the combined result stays exact.

    The gate is EVENT CAUSALITY, not wall-clock (the round-4 form
    asserted a finish-time ratio and could flake under a co-running
    process on this 1-core host — VERDICT weak #5): the slow stream's
    reads BLOCK until every fast stream has completed ALL of its reads.
    Under the isolation contract that event must fire — the consumer
    ships fast-only partial rounds, so the fast queues keep draining
    while the slow stream is stalled. Under a lockstep regression the
    fast producers would wedge on their bounded queues (depth 4 < 8
    batches) waiting for rounds that need the slow stream's data, the
    event would never fire, and the watchdog timeout records the
    violation (without deadlocking the suite). CPU contention only
    stretches the run; it cannot reorder the causality."""
    import io
    import threading
    from rtl_power_fftw_tpu.config import parse_args
    from rtl_power_fftw_tpu.parallel.multistream import MultiStreamAcquisition
    from rtl_power_fftw_tpu.sources import SyntheticSource
    from golden import golden_accumulate

    S, N, rate = 4, 64, 2_048_000
    repeats = 1024                      # 8 reads (= 8 batches) per stream
    params = parse_args(["-b", str(N), "-n", str(repeats), "-r", str(rate),
                         "-s", "16384"], stderr=io.StringIO())

    fast_all_done = threading.Event()
    reads_left = [8] * 3                # fast streams' outstanding reads
    reads_lock = threading.Lock()
    violation = []

    class Fast(SyntheticSource):
        def __init__(self, idx, **kw):
            super().__init__(**kw)
            self._idx = idx

        def read(self, nbytes):
            out = super().read(nbytes)
            with reads_lock:
                reads_left[self._idx] -= 1
                if not any(reads_left):
                    fast_all_done.set()
            return out

    class Stalled(SyntheticSource):
        def read(self, nbytes):
            # Block until the fast streams have fully drained. 120 s is a
            # watchdog, not a pacing constant — it fires only if the
            # isolation contract is broken (or the host is wedged), and
            # the run still completes so the suite cannot deadlock.
            if not fast_all_done.wait(timeout=120.0):
                violation.append("slow stream unblocked by watchdog, not "
                                 "by fast-stream completion")
            return super().read(nbytes)

    srcs = [Fast(i, noise=5.0, seed=i) for i in range(3)]
    srcs.append(Stalled(noise=5.0, seed=3))
    for s in srcs:
        s.set_sample_rate(rate)
    acq = MultiStreamAcquisition(params, srcs, frames_per_step=128)
    # Warm the jitted device step: the first dispatch compiles (~0.4 s on
    # this harness) and would stall the consumer mid-run.
    np.asarray(acq.step(
        np.zeros((S, acq.step.F, 2 * N), np.uint8),
        np.zeros(S, np.int32))[1])
    res = acq.run(freq=100_000_000)

    assert not violation, violation
    assert fast_all_done.is_set()
    assert res.repeats_done.tolist() == [repeats] * S

    # Numerical identity is independent of round composition.
    want = np.zeros(N)
    for i in range(S):
        src = SyntheticSource(noise=5.0, seed=i)
        src.set_sample_rate(rate)
        src.set_frequency(100_000_000)
        stream, _ = src.read(2 * N * repeats)
        pwr, _ = golden_accumulate(stream, N, repeats)
        want += np.fft.ifftshift(pwr)
    np.testing.assert_allclose(res.pwr, want, rtol=1e-5)


def test_multistream_phase_offset_streams_coalesce():
    """Same-rate streams whose batch completions are phase-offset by
    more than the jitter floor must still coalesce into (mostly) full
    rounds: the straggler window adapts to the measured batch cadence
    (PACE_WINDOW x median period), so phase offset alone cannot
    fragment S streams into S single-stream device rounds each cycle
    (up to S x the dispatches and staging memsets)."""
    import io
    import time as _t
    from rtl_power_fftw_tpu.config import parse_args
    from rtl_power_fftw_tpu.parallel.multistream import MultiStreamAcquisition
    from rtl_power_fftw_tpu.sources import SyntheticSource

    S, N, rate = 4, 64, 2_048_000
    repeats = 1024                      # 8 batches per stream, 32 total
    params = parse_args(["-b", str(N), "-n", str(repeats), "-r", str(rate),
                         "-s", "16384"], stderr=io.StringIO())

    class Phased(SyntheticSource):
        def __init__(self, phase, cadence, **kw):
            super().__init__(**kw)
            self._phase, self._cadence = phase, cadence
            self._first = True

        def read(self, nbytes):
            if self._first:
                self._first = False
                _t.sleep(self._phase)
            _t.sleep(self._cadence)
            return super().read(nbytes)

    # 60 ms cadence, phases spread 0/15/30/45 ms: arrivals are cyclically
    # 15 ms apart — every gap exceeds the 10 ms jitter floor, so a fixed
    # window ships ~every batch alone (measured 31/32 dispatches with
    # PACE_WINDOW=0 vs 12 adaptive on this harness).
    srcs = [Phased(i * 0.015, 0.06, noise=5.0, seed=i) for i in range(S)]
    for s in srcs:
        s.set_sample_rate(rate)
    acq = MultiStreamAcquisition(params, srcs, frames_per_step=128)
    np.asarray(acq.step(
        np.zeros((S, acq.step.F, 2 * N), np.uint8),
        np.zeros(S, np.int32))[1])      # warm the jit before counting

    calls = []

    class CountingStep:
        def __init__(self, inner):
            self._inner = inner

        def __call__(self, *a, **kw):
            calls.append(1)
            return self._inner(*a, **kw)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    acq.step = CountingStep(acq.step)
    res = acq.run(freq=100_000_000)

    assert res.repeats_done.tolist() == [repeats] * S
    # 32 batches: ideal 8 coalesced rounds, fully fragmented 32. The
    # pace estimate needs ~2 arrivals per stream, so the first cycle or
    # two may fragment; after that rounds must coalesce.
    assert len(calls) <= 20, len(calls)


# --- 2-D grid composition (streams x sequence, parallel/grid.py) ------


def _grid_truth(frames, n_valid, N, window=None):
    """f64 truth: sum |FFT|^2 over every stream's valid frames."""
    want = np.zeros(N)
    for s in range(frames.shape[0]):
        part = frames[s, :n_valid[s]]
        z = (part[:, 0::2].astype(np.float64) - 127.0) \
            + 1j * (part[:, 1::2].astype(np.float64) - 127.0)
        if window is not None:
            z = z * window.astype(np.float64)
        X = np.fft.fft(z, axis=1)
        want += (X.real ** 2 + X.imag ** 2).sum(0)
    return want


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_grid_streams_x_seq_parity(shape):
    """The 2-D (streams x seq) composition matches the f64 truth: each
    stream group's transform is sequence-sharded over its mesh row
    (all_to_all on the seq axis), rows combine with one stream-axis
    psum."""
    from rtl_power_fftw_tpu.parallel import GridPsdStep, make_grid_mesh

    Ds, Dq = shape
    mesh = make_grid_mesh(Ds, Dq)
    N, F = 256, 5
    rng = np.random.default_rng(42)
    frames = rng.integers(0, 256, (Ds, F, 2 * N), dtype=np.uint8)
    n_valid = np.array([F - (s % 2) for s in range(Ds)], np.int32)
    step = GridPsdStep(mesh, N, F)
    got, total = step.accumulate(frames, n_valid)
    assert total == int(n_valid.sum())
    want = _grid_truth(frames, n_valid, N)
    np.testing.assert_allclose(got, want, rtol=2e-5)
    # Per-stream partials sum to the combined spectrum and each match
    # the stream's own f64 truth.
    ps, comb = step(frames, n_valid)
    ps = np.asarray(ps, np.float64)
    np.testing.assert_allclose(ps.sum(axis=0), np.asarray(comb), rtol=1e-5)
    for s in range(Ds):
        want_s = _grid_truth(frames[s:s + 1], n_valid[s:s + 1], N)
        np.testing.assert_allclose(ps[s], want_s, rtol=2e-5)


def test_grid_windowed_parity():
    from rtl_power_fftw_tpu.parallel import GridPsdStep, make_grid_mesh

    mesh = make_grid_mesh(2, 4)
    N, F = 512, 4
    w = make_window("hann", N)
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (2, F, 2 * N), dtype=np.uint8)
    n_valid = np.array([F, F - 1], np.int32)
    step = GridPsdStep(mesh, N, F, window=w)
    got, _ = step.accumulate(frames, n_valid)
    want = _grid_truth(frames, n_valid, N, window=w)
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_grid_validation():
    from rtl_power_fftw_tpu.parallel import GridPsdStep, make_grid_mesh

    mesh = make_grid_mesh(2, 4)
    with pytest.raises(ValueError, match="power of two"):
        GridPsdStep(mesh, 500, 4)
    with pytest.raises(ValueError, match="seq axis"):
        GridPsdStep(make_grid_mesh(1, 8), 16, 4)   # Dq=8 ∤ N1=N2=4
    with pytest.raises(ValueError, match="need 16 devices"):
        make_grid_mesh(4, 4)


def test_sharded_and_single_stream_select_the_same_rung():
    """The auto-ladder selection is single-sourced
    (ops.spectral.select_transform_rung): for every size and windowing,
    ShardedPsdStep and PsdStep must land on the same path."""
    from rtl_power_fftw_tpu.auxdata import make_window
    from rtl_power_fftw_tpu.ops.spectral import PsdStep
    mesh = make_mesh(8)
    for N in (96, 500, 512, 1024, 2048, 3072, 4096, 8192):
        for windowed in (False, True):
            w = make_window("hann", N) if windowed else None
            single = PsdStep(N, 8, window=w)
            sharded = ShardedPsdStep(mesh, N, 8, streams=8, window=w)
            assert sharded.path == single.path, (N, windowed)
    # Explicit ineligible pallas raises on BOTH (was a silent downgrade
    # on the sharded step).
    import pytest as _pytest
    with _pytest.raises(ValueError, match="pallas backend unavailable"):
        ShardedPsdStep(mesh, 3000, 8, streams=8, backend="pallas")
    with _pytest.raises(ValueError, match="window must have shape"):
        ShardedPsdStep(mesh, 1024, 8, streams=8,
                       window=make_window("hann", 512))
