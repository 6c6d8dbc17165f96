"""Real RTL-SDR hardware via pyrtlsdr (optional; gated import).

This image does not ship pyrtlsdr; the class exists so deployments with the
package installed get real-hardware parity with the reference's direct
librtlsdr path (device.cxx). Import errors surface as NoDeviceFound at the
registry level.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from rtlsdr import RtlSdr  # type: ignore  # pragma: no cover

from .base import IQSource, hardware_error


class RtlSdrSource(IQSource):  # pragma: no cover - needs hardware
    def __init__(self, dev_index: int = 0):
        try:
            self._sdr = RtlSdr(device_index=dev_index)
        except Exception as e:
            raise hardware_error(f"Could not open rtl_sdr device {dev_index}: {e}")

    def gains(self) -> List[int]:
        return [int(g * 10) for g in self._sdr.valid_gains_db] or [0]

    def sample_rate(self) -> int:
        return int(self._sdr.sample_rate)

    def frequency(self) -> int:
        return int(self._sdr.center_freq)

    def set_frequency(self, frequency: int) -> None:
        try:
            self._sdr.center_freq = frequency
        except Exception:
            raise hardware_error("RTL device: could not set center frequency.")

    def set_sample_rate(self, sample_rate: int) -> None:
        try:
            self._sdr.sample_rate = sample_rate
        except Exception:
            raise hardware_error("RTL device: could not set sample rate.")

    def set_gain(self, gain: int) -> None:
        try:
            self._sdr.gain = gain / 10.0
        except Exception:
            raise hardware_error("RTL device: could not set gain.")

    def set_freq_correction(self, ppm_error: int) -> None:
        try:
            if ppm_error:
                self._sdr.freq_correction = ppm_error
        except Exception:
            raise hardware_error("RTL device: could not set frequency correction.")

    def read(self, nbytes: int) -> Tuple[np.ndarray, bool]:
        raw = self._sdr.read_bytes(nbytes)
        data = np.frombuffer(raw, dtype=np.uint8)
        return data, len(data) == nbytes

    def close(self) -> None:
        self._sdr.close()
