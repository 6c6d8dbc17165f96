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
