"""Recorded-stream IQ source: raw interleaved u8 IQ from a file.

The reference can only read from live hardware; recorded input is the
natural TPU-framework equivalent for reproducible runs and benchmarks
(BASELINE.json config 1: "recorded 2.048 MS/s int8 IQ buffer").
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..exceptions import ReturnValue, RPFexception, StreamEOF
from .base import IQSource


class FileSource(IQSource):
    """Raw u8 IQ from a file.

    When the native C++ loader is available (rtl_power_fftw_tpu.native),
    reads are served from its buffer pool: a C++ reader thread prefetches
    ahead of the Python consumer, so the byte-moving path stays out of
    Python (set ``use_native=False`` to force the plain path).
    """

    def __init__(self, path: str, sample_rate: int = 2_048_000,
                 loop: bool = False, use_native: bool = True,
                 native_buf_bytes: int = 1 << 20, native_buffers: int = 4):
        self.path = path
        self._rate = int(sample_rate)
        self.loop = loop
        try:
            self._file = open(path, "rb")
        except OSError as e:
            raise RPFexception(
                f"Could not open IQ file {path}: {e}", ReturnValue.InvalidInput)
        self._freq = 0
        self._gain = 0
        self._native = None
        self._pending = []          # list of numpy chunks from the native pool
        self._pending_bytes = 0
        if use_native:
            try:
                from ..native import NativeLoader, native_available
                if native_available():
                    self._native = NativeLoader(native_buf_bytes, native_buffers)
                    self._native.start_fd(self._file.fileno(), loop=loop)
            except Exception:
                self._native = None  # silent fallback to the Python path

    def gains(self) -> List[int]:
        return [0]

    def sample_rate(self) -> int:
        return self._rate

    def frequency(self) -> int:
        return self._freq

    def set_frequency(self, frequency: int) -> None:
        # Recorded data has no tuner; record the request so the frequency
        # axis of the output is labeled as asked.
        self._freq = int(frequency)

    def set_sample_rate(self, sample_rate: int) -> None:
        self._rate = int(sample_rate)

    def set_gain(self, gain: int) -> None:
        self._gain = int(gain)

    def _eof(self, chunks=None):
        """End of the recording: a definite stop, not a transient
        dropped-samples condition.  Raised as ``StreamEOF`` so the session
        finishes the partial spectrum instead of dying with exit 6 — a
        file-based framework hits stream ends constantly where the
        reference's live hardware cannot (acquisition.cxx:326-331 partial
        semantics)."""
        partial = None
        if chunks:
            partial = np.concatenate(chunks) if len(chunks) > 1 else chunks[0]
        raise StreamEOF(f"End of recorded IQ stream {self.path}.", partial)

    def _read_native(self, nbytes: int) -> Tuple[np.ndarray, bool]:
        while self._pending_bytes < nbytes:
            try:
                item = self._native.acquire(timeout_ms=30_000)
            except TimeoutError:
                # I/O stall (slow or network-mounted recording): report
                # dropped samples so the caller retries; already-buffered
                # bytes stay queued, keeping the stream contiguous.
                return np.zeros(nbytes, dtype=np.uint8), False
            if item is None:
                tail, self._pending = self._pending, []
                self._pending_bytes = 0
                self._eof(tail)
            slot, view = item
            # Copy out so the pool slot recycles immediately; the copy is a
            # single memcpy of a large chunk, still far cheaper than Python
            # per-read file IO.
            self._pending.append(view.copy())
            self._pending_bytes += len(view)
            self._native.release(slot)
        buf = self._pending[0] if (len(self._pending) == 1
                                   and len(self._pending[0]) == nbytes) \
            else np.concatenate(self._pending)
        out = buf[:nbytes]
        rest = buf[nbytes:]
        self._pending = [rest] if len(rest) else []
        self._pending_bytes = len(rest)
        return out, True

    def read(self, nbytes: int) -> Tuple[np.ndarray, bool]:
        if self._native is not None:
            return self._read_native(nbytes)
        chunks = []
        remaining = nbytes
        while remaining > 0:
            data = self._file.read(remaining)
            if not data:
                if self.loop:
                    self._file.seek(0)
                    continue
                self._eof(chunks)
            chunks.append(np.frombuffer(data, dtype=np.uint8))
            remaining -= len(data)
        return np.concatenate(chunks) if len(chunks) > 1 else chunks[0], True

    def close(self) -> None:
        if self._native is not None:
            self._native.stop()
            self._native.close()
            self._native = None
        self._file.close()
