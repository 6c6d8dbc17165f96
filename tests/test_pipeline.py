"""Datastore pipeline unit/stress tests: backpressure, carry, error
propagation, histogram shape."""

import io
import threading
import time

import numpy as np
import pytest

from rtl_power_fftw_tpu.config import parse_args
from rtl_power_fftw_tpu.pipeline import Datastore

from golden import golden_accumulate


def parse(argv):
    return parse_args(argv, stderr=io.StringIO())


def run_buffers(params, buffers):
    data = Datastore(params)
    data.begin_acquisition()
    for b in buffers:
        data.acquire_slot()
        data.push_buffer(b)
    return data, data.finish_acquisition()


def test_awkward_buffer_sizes_accumulate_exactly():
    """Buffers never aligned to frames: the result must equal a straight
    float64 pass over the concatenated stream."""
    N, repeats = 96, 41
    params = parse(["-b", str(N), "-n", str(repeats)])
    rng = np.random.default_rng(1)
    stream = rng.integers(0, 256, 2 * N * repeats + 77, dtype=np.uint8)
    cuts = sorted(rng.integers(1, len(stream), 13))
    buffers = np.array_split(stream, cuts)
    data, res = run_buffers(params, buffers)
    assert res.repeats_done == repeats
    want, _ = golden_accumulate(stream, N, repeats)
    np.testing.assert_allclose(res.pwr, np.fft.ifftshift(want), rtol=1e-5)


def test_reuse_after_aborted_acquisition():
    """A producer-side abort (no finish_acquisition) must not leak the
    failed hop's buffers or its consumer thread into the next
    acquisition: begin_acquisition sanitizes stale state, so the retried
    acquisition's spectrum matches a clean single-pass golden."""
    N, repeats = 64, 8
    params = parse(["-b", str(N), "-n", str(repeats)])
    rng = np.random.default_rng(9)
    data = Datastore(params)

    # Aborted acquisition: push garbage, never finish.
    data.begin_acquisition()
    data.acquire_slot()
    data.push_buffer(rng.integers(0, 256, 2 * N * 3, dtype=np.uint8))

    # Retried acquisition on the same Datastore.
    stream = rng.integers(0, 256, 2 * N * repeats, dtype=np.uint8)
    data.begin_acquisition()
    data.acquire_slot()
    data.push_buffer(stream.copy())
    res = data.finish_acquisition()
    assert res.repeats_done == repeats
    want, _ = golden_accumulate(stream, N, repeats)
    np.testing.assert_allclose(res.pwr, np.fft.ifftshift(want), rtol=1e-5)


def test_reuse_across_acquisitions():
    N, repeats = 64, 10
    params = parse(["-b", str(N), "-n", str(repeats)])
    rng = np.random.default_rng(2)
    data = Datastore(params)
    for trial in range(3):
        stream = rng.integers(0, 256, 2 * N * repeats, dtype=np.uint8)
        data.begin_acquisition()
        data.acquire_slot()
        data.push_buffer(stream)
        res = data.finish_acquisition()
        assert res.repeats_done == repeats
        want, _ = golden_accumulate(stream, N, repeats)
        np.testing.assert_allclose(res.pwr, np.fft.ifftshift(want), rtol=1e-5)


def test_histogram_has_buffers_plus_one_entries():
    params = parse(["--buffers", "7"])
    data = Datastore(params)
    assert len(data.queue_histogram) == 8


def test_consumer_error_unblocks_producer():
    """A consumer crash must not deadlock a producer waiting for slots."""
    params = parse(["-b", "64", "-n", "1000000", "--buffers", "2"])
    data = Datastore(params)
    data.begin_acquisition()
    # Break the consumer: poison the step so the next dispatch raises.
    data.step._step = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom"))
    big = np.zeros(params.buf_length, np.uint8)
    with pytest.raises(RuntimeError, match="boom"):
        for _ in range(50):  # producer must fail fast, not hang
            data.acquire_slot()
            data.push_buffer(big)
    # Cleanup: consumer already dead; finish should re-raise too.
    with pytest.raises(RuntimeError):
        data.finish_acquisition()


def test_backpressure_blocks_and_releases():
    params = parse(["-b", "64", "-n", "100000", "--buffers", "2"])
    data = Datastore(params)
    data.begin_acquisition()
    released = []

    def producer():
        for i in range(6):
            data.acquire_slot()
            data.push_buffer(np.zeros(16384, np.uint8))
            released.append(i)

    t = threading.Thread(target=producer)
    t.start()
    t.join(timeout=30)
    assert not t.is_alive()
    assert released == list(range(6))
    data.finish_acquisition()
