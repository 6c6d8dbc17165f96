"""Native C++ loader tests: build, stream, backpressure, pacing, looping."""

import os
import time

import numpy as np
import pytest

from rtl_power_fftw_tpu.native import NativeLoader, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


def write_stream(tmp_path, n_bytes, seed=0):
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, n_bytes, dtype=np.uint8)
    p = tmp_path / "stream.iq"
    p.write_bytes(data.tobytes())
    return p, data


def drain(ld):
    chunks = []
    while True:
        item = ld.acquire(timeout_ms=5000)
        if item is None:
            break
        slot, view = item
        chunks.append(view.copy())
        ld.release(slot)
    return np.concatenate(chunks) if chunks else np.zeros(0, np.uint8)


def test_reads_exact_bytes(tmp_path):
    p, data = write_stream(tmp_path, 100_000)
    fd = os.open(str(p), os.O_RDONLY)
    try:
        with NativeLoader(buf_bytes=16384, n_buffers=4) as ld:
            ld.start_fd(fd)
            got = drain(ld)
            np.testing.assert_array_equal(got, data)
            assert ld.bytes_read() == len(data)
            assert ld.at_eof()
    finally:
        os.close(fd)


def test_partial_final_buffer(tmp_path):
    p, data = write_stream(tmp_path, 16384 + 1000)
    fd = os.open(str(p), os.O_RDONLY)
    try:
        with NativeLoader(buf_bytes=16384, n_buffers=3) as ld:
            ld.start_fd(fd)
            first = ld.acquire()
            assert first is not None and len(first[1]) == 16384
            ld.release(first[0])
            second = ld.acquire()
            assert second is not None and len(second[1]) == 1000
            ld.release(second[0])
            assert ld.acquire(timeout_ms=1000) is None
    finally:
        os.close(fd)


def test_backpressure_histogram(tmp_path):
    """Without releasing buffers the reader must stall; the histogram
    records the zero-free event (the documented overload diagnostic)."""
    p, data = write_stream(tmp_path, 16384 * 10)
    fd = os.open(str(p), os.O_RDONLY)
    try:
        ld = NativeLoader(buf_bytes=16384, n_buffers=2)
        ld.start_fd(fd)
        a = ld.acquire()
        b = ld.acquire()
        time.sleep(0.15)  # reader now blocked on an empty free queue
        hist = ld.histogram()
        assert hist[0] >= 1  # grabbed with zero free buffers at least once
        ld.release(a[0])
        ld.release(b[0])
        drain(ld)
        ld.stop()
        ld.close()
    finally:
        os.close(fd)


def test_looping_stream(tmp_path):
    p, data = write_stream(tmp_path, 4096)
    fd = os.open(str(p), os.O_RDONLY)
    try:
        with NativeLoader(buf_bytes=4096, n_buffers=2) as ld:
            ld.start_fd(fd, loop=True)
            for _ in range(5):  # 5 wraps of the 1-buffer file
                slot, view = ld.acquire(timeout_ms=5000)
                np.testing.assert_array_equal(view, data)
                ld.release(slot)
            ld.stop()
    finally:
        os.close(fd)


def test_pacing_limits_rate(tmp_path):
    p, data = write_stream(tmp_path, 16384 * 6)
    fd = os.open(str(p), os.O_RDONLY)
    try:
        with NativeLoader(buf_bytes=16384, n_buffers=6) as ld:
            t0 = time.perf_counter()
            ld.start_fd(fd, pace_bytes_per_s=16384 * 20)  # ~0.3 s for 6 bufs
            drain(ld)
            elapsed = time.perf_counter() - t0
            assert elapsed >= 0.25, f"pacing ignored: {elapsed:.3f}s"
    finally:
        os.close(fd)


def test_pipe_source():
    """Non-seekable fd (pipe) streams fine; EOF on writer close."""
    r, w = os.pipe()
    payload = (np.arange(3000) % 256).astype(np.uint8)
    try:
        with NativeLoader(buf_bytes=1024, n_buffers=3) as ld:
            ld.start_fd(r)
            os.write(w, payload.tobytes())
            os.close(w)
            w = -1
            got = drain(ld)
            np.testing.assert_array_equal(got, payload.astype(np.uint8))
    finally:
        os.close(r)
        if w >= 0:
            os.close(w)


# --- multi-reader (parallel pread with ordered delivery) ---------------------

def test_multireader_byte_parity(tmp_path):
    """4 parallel readers must produce the exact sequential byte stream,
    including a partial tail chunk (file size not a multiple of the slot)."""
    p, data = write_stream(tmp_path, 16384 * 7 + 777)
    fd = os.open(str(p), os.O_RDONLY)
    try:
        with NativeLoader(buf_bytes=16384, n_buffers=8) as ld:
            ld.start_fd(fd, readers=4)
            got = drain(ld)
            np.testing.assert_array_equal(got, data)
            assert ld.bytes_read() == len(data)
            assert ld.at_eof()
    finally:
        os.close(fd)


def test_multireader_loop_parity(tmp_path):
    """Loop mode with parallel readers: several wraps of an odd-sized file
    must match the infinite repetition of the recording byte-for-byte."""
    size = 5000  # not a multiple of the slot: chunks wrap mid-file
    p, data = write_stream(tmp_path, size)
    fd = os.open(str(p), os.O_RDONLY)
    try:
        with NativeLoader(buf_bytes=2048, n_buffers=8) as ld:
            ld.start_fd(fd, loop=True, readers=4)
            got = []
            for _ in range(12):  # ~5 wraps
                slot, view = ld.acquire(timeout_ms=5000)
                got.append(view.copy())
                ld.release(slot)
            ld.stop()
        got = np.concatenate(got)
        want = np.tile(data, int(np.ceil(len(got) / size)) + 1)[:len(got)]
        np.testing.assert_array_equal(got, want)
    finally:
        os.close(fd)


def test_multireader_respects_start_offset(tmp_path):
    """The stream begins at the fd's current offset, same as sequential."""
    p, data = write_stream(tmp_path, 16384 * 3)
    fd = os.open(str(p), os.O_RDONLY)
    try:
        os.lseek(fd, 1000, os.SEEK_SET)
        with NativeLoader(buf_bytes=4096, n_buffers=8) as ld:
            ld.start_fd(fd, readers=3)
            got = drain(ld)
            np.testing.assert_array_equal(got, data[1000:])
    finally:
        os.close(fd)


def test_multireader_pipe_falls_back():
    """Non-seekable fds silently use the sequential reader."""
    r, w = os.pipe()
    payload = (np.arange(3000) % 256).astype(np.uint8)
    try:
        with NativeLoader(buf_bytes=1024, n_buffers=4) as ld:
            ld.start_fd(r, readers=4)
            os.write(w, payload.tobytes())
            os.close(w)
            w = -1
            got = drain(ld)
            np.testing.assert_array_equal(got, payload)
    finally:
        os.close(r)
        if w >= 0:
            os.close(w)


def test_multireader_backpressure_stop(tmp_path):
    """Readers blocked on a full pool must stop cleanly (no hang/leak)."""
    p, data = write_stream(tmp_path, 16384 * 40)
    fd = os.open(str(p), os.O_RDONLY)
    try:
        ld = NativeLoader(buf_bytes=16384, n_buffers=6)
        ld.start_fd(fd, readers=3)
        a = ld.acquire(timeout_ms=5000)
        time.sleep(0.1)  # let readers fill the pool and block
        ld.release(a[0])
        ld.stop()   # must join all readers promptly
        ld.close()
    finally:
        os.close(fd)


def test_loader_streams_once(tmp_path):
    """A Loader streams once; a second start_fd is rejected (-1 -> raise)."""
    p, data = write_stream(tmp_path, 16384)
    fd = os.open(str(p), os.O_RDONLY)
    try:
        with NativeLoader(buf_bytes=16384, n_buffers=2) as ld:
            ld.start_fd(fd)
            drain(ld)
            ld.stop()
            with pytest.raises(RuntimeError):
                ld.start_fd(fd)
    finally:
        os.close(fd)


def test_mmap_tail_offset_parity(tmp_path):
    """mmap mode (round-5 copy-free ingest): a seekable unpaced file with
    a non-slot-multiple size, started at a nonzero offset, must deliver
    byte-identically to the forced-pread path — in-bounds chunks are
    zero-copy views of the mapping, the tail chunk is a short view."""
    p, data = write_stream(tmp_path, 16384 * 3 + 777)
    for start in (0, 1000):
        got = {}
        for mode in ("auto", False, True):
            fd = os.open(str(p), os.O_RDONLY)
            try:
                os.lseek(fd, start, os.SEEK_SET)
                with NativeLoader(buf_bytes=4096, n_buffers=8) as ld:
                    ld.start_fd(fd, readers=2, mmap=mode)
                    got[mode] = drain(ld)
            finally:
                os.close(fd)
        np.testing.assert_array_equal(got["auto"], data[start:])
        np.testing.assert_array_equal(got[True], data[start:])
        np.testing.assert_array_equal(got[False], data[start:])


def test_mmap_loop_wrap_parity(tmp_path):
    """mmap loop mode: chunks crossing the file end are assembled from
    two mapped pieces (copy path) while in-bounds chunks stay views —
    several wraps of an odd-sized recording must match the infinite
    repetition byte-for-byte, same as the pread multi-reader."""
    size = 5000  # not a multiple of the slot: chunks wrap mid-file
    p, data = write_stream(tmp_path, size, seed=7)
    fd = os.open(str(p), os.O_RDONLY)
    try:
        with NativeLoader(buf_bytes=2048, n_buffers=8) as ld:
            ld.start_fd(fd, loop=True, readers=4, mmap=True)
            got = []
            for _ in range(12):  # ~5 wraps
                slot, view = ld.acquire(timeout_ms=5000)
                got.append(view.copy())
                ld.release(slot)
            ld.stop()
        got = np.concatenate(got)
        want = np.tile(data, int(np.ceil(len(got) / size)) + 1)[:len(got)]
        np.testing.assert_array_equal(got, want)
    finally:
        os.close(fd)


def test_mmap_single_reader_views(tmp_path):
    """mmap with readers=1 still runs the chunked view path (the auto
    default for FileSource), and a held view stays valid until release
    even while later chunks are delivered."""
    p, data = write_stream(tmp_path, 8192 * 4, seed=3)
    fd = os.open(str(p), os.O_RDONLY)
    try:
        with NativeLoader(buf_bytes=8192, n_buffers=4) as ld:
            ld.start_fd(fd, readers=1, mmap=True)
            first = ld.acquire(timeout_ms=5000)
            rest = []
            while True:
                item = ld.acquire(timeout_ms=5000)
                if item is None:
                    break
                rest.append(item[1].copy())
                ld.release(item[0])
            np.testing.assert_array_equal(first[1], data[:8192])
            ld.release(first[0])
        got = np.concatenate([data[:8192]] + rest)
        np.testing.assert_array_equal(got, data)
    finally:
        os.close(fd)
