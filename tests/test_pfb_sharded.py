"""Sharded PFB over the stream mesh (--streams combined with --pfb-taps)."""
import io

import numpy as np
import pytest

from rtl_power_fftw_tpu.config import parse_args
from rtl_power_fftw_tpu.models.pfb import PfbSessionStep, ShardedPfbStep
from rtl_power_fftw_tpu.parallel import make_mesh
from test_pfb_session import _direct_pfb_pwr


def test_sharded_pfb_matches_per_stream_session_steps():
    """Combined psum result == float64 sum of per-stream PfbSessionStep
    accumulations across rounds with UNEVEN n_valid (straggler rounds,
    zero-valid misses), exercising the per-stream host history seams."""
    S, N, P, F = 8, 64, 4, 8
    mesh = make_mesh(8)
    step = ShardedPfbStep(mesh, N, F, streams=S, taps=P)
    assert step.path == "pfb" and not step.takes_u16
    singles = [PfbSessionStep(N, F, taps=P) for _ in range(S)]
    rng = np.random.default_rng(5)
    per = np.zeros((S, N))
    comb = np.zeros(N)
    want = np.zeros((S, N))
    rounds = ([F] * S, [3, F, 0, 5, F, F, 1, 7], [F] * S)
    for nvals in rounds:
        raw = np.zeros((S, F, 2 * N), np.uint8)
        for s in range(S):
            raw[s, :nvals[s]] = rng.integers(
                0, 256, (nvals[s], 2 * N), dtype=np.uint8)
        ps, c = step(raw.copy(), np.asarray(nvals, np.int32))
        per += np.asarray(ps, np.float64)
        comb += np.asarray(c, np.float64)
        for s in range(S):
            want[s] += np.asarray(singles[s](raw[s], nvals[s]), np.float64)
    np.testing.assert_allclose(per, want, rtol=1e-6)
    np.testing.assert_allclose(comb, want.sum(0), rtol=1e-6)


def test_sharded_pfb_reset_clears_history():
    S, N, P, F = 8, 32, 3, 8
    mesh = make_mesh(8)
    step = ShardedPfbStep(mesh, N, F, streams=S, taps=P)
    rng = np.random.default_rng(9)
    raw = rng.integers(0, 256, (S, F, 2 * N), dtype=np.uint8)
    nv = np.full(S, F, np.int32)
    _, first = step(raw, nv)
    first = np.asarray(first, np.float64)
    assert not (step._tails == 127).all()
    step.reset()
    assert (step._tails == 127).all()
    # Post-reset result identical to a fresh step on the same data.
    _, again = step(raw, nv)
    np.testing.assert_array_equal(np.asarray(again, np.float64), first)


def test_sharded_pfb_streams_not_divisible_rejected():
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="divisible"):
        ShardedPfbStep(mesh, 64, 8, streams=6, taps=4)
    with pytest.raises(ValueError, match="taps"):
        ShardedPfbStep(mesh, 64, 8, streams=8, taps=1)


def test_multistream_pfb_matches_sum_of_streams_and_resets():
    """--streams + --pfb-taps end to end at the acquisition level: the
    psum-combined accumulator equals the float64 direct PFB summed over
    every stream's data, and run() resets poisoned filter history (the
    per-acquisition reset that keeps retunes leak-free)."""
    from rtl_power_fftw_tpu.parallel.multistream import MultiStreamAcquisition
    from rtl_power_fftw_tpu.sources import SyntheticSource

    S, N, P, repeats, rate = 8, 64, 3, 12, 2_048_000
    params = parse_args(["-b", str(N), "-n", str(repeats), "-r", str(rate),
                         "--pfb-taps", str(P), "--streams", str(S)],
                        stderr=io.StringIO())

    def mk(seed):
        s = SyntheticSource(tones=[(100_200_000, 30.0)], noise=5.0, seed=seed)
        s.set_sample_rate(rate)
        return s

    acq = MultiStreamAcquisition(params, [mk(seed) for seed in range(S)])
    assert acq.step.path == "pfb"
    # Poison the history: run() must reset it before the first dispatch.
    acq.step._tails[:] = 255
    res = acq.run(freq=100_000_000)
    assert res.repeats_done.tolist() == [repeats] * S

    want = np.zeros(N)
    for seed in range(S):
        src = mk(seed)
        src.set_frequency(100_000_000)
        stream, _ = src.read(2 * N * repeats)
        want += _direct_pfb_pwr(np.asarray(stream).reshape(repeats, 2 * N),
                                N, P)
    np.testing.assert_allclose(res.pwr, want, rtol=1e-5)
    np.testing.assert_allclose(res.per_stream_pwr.sum(0), want, rtol=1e-5)


def test_multistream_pfb_session_e2e():
    """Full session: --streams 8 --pfb-taps 4 — banner says pfb, the tone
    lands in the right channel, spectra counting is S x repeats."""
    from test_session_e2e import run
    from rtl_power_fftw_tpu.sources import SyntheticSource

    src = SyntheticSource(tones=[(100_100_000, 30.0)], noise=5.0, seed=0)
    rv, out, err, params = run(
        ["-f", "100M", "-n", "16", "-b", "64", "--streams", "8",
         "--pfb-taps", "4",
         "--source", "synthetic:tone=100.1M/30,noise=5,seed=0"], src)
    assert int(rv) == 0
    assert "Parallel streams: 8 (mesh size 8)" in err
    assert "Actual number of averaged spectra: 128" in err  # 8 x 16
    line = [l for l in err.split("\n") if l.startswith("Transform path:")]
    assert line and "pfb" in line[0]
    vals = np.array([float(l.split()[1]) for l in out.split("\n")
                     if l and not l.startswith("#")])
    freqs = np.array([float(l.split()[0]) for l in out.split("\n")
                      if l and not l.startswith("#")])
    assert abs(freqs[vals.argmax()] - 100_100_000) < 2_048_000 / 64
