"""Recorded-stream IQ source: raw interleaved u8 IQ from a file.

The reference can only read from live hardware; recorded input is the
natural TPU-framework equivalent for reproducible runs and benchmarks
(BASELINE.json config 1: "recorded 2.048 MS/s int8 IQ buffer").
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..exceptions import ReturnValue, RPFexception
from .base import IQSource


class FileSource(IQSource):
    def __init__(self, path: str, sample_rate: int = 2_048_000,
                 loop: bool = False):
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

    def read(self, nbytes: int) -> Tuple[np.ndarray, bool]:
        chunks = []
        remaining = nbytes
        while remaining > 0:
            data = self._file.read(remaining)
            if not data:
                if self.loop:
                    self._file.seek(0)
                    continue
                # End of the recording: a definite stop, not a transient
                # dropped-samples condition.
                raise RPFexception(
                    f"End of recorded IQ stream {self.path}.",
                    ReturnValue.AcquisitionError)
            chunks.append(np.frombuffer(data, dtype=np.uint8))
            remaining -= len(data)
        return np.concatenate(chunks) if len(chunks) > 1 else chunks[0], True

    def close(self) -> None:
        self._file.close()
