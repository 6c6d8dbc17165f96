"""rtl_tcp network IQ source: stream from real RTL-SDR hardware without
librtlsdr, over the standard rtl_tcp wire protocol.

Protocol (rtl_tcp from the rtl-sdr distribution): on connect the server
sends a 12-byte dongle info header (magic "RTL0", tuner type u32, tuner
gain count u32, big-endian), then streams raw interleaved u8 IQ.  Commands
are 5 bytes: u8 opcode + u32 big-endian argument:

  0x01 set center frequency   0x02 set sample rate
  0x03 set gain mode (manual) 0x04 set tuner gain (1/10 dB)
  0x05 set freq correction (ppm)
"""

from __future__ import annotations

import socket
import struct
from typing import List, Tuple

import numpy as np

from ..exceptions import ReturnValue, RPFexception
from .base import IQSource, hardware_error

_SET_FREQ = 0x01
_SET_SAMPLE_RATE = 0x02
_SET_GAIN_MODE = 0x03
_SET_GAIN = 0x04
_SET_FREQ_CORRECTION = 0x05

# Gain tables per tuner type index in the rtl_tcp header.
_R820T_GAINS = [0, 9, 14, 27, 37, 77, 87, 125, 144, 157, 166, 197, 207,
                229, 254, 280, 297, 328, 338, 364, 372, 386, 402, 421,
                434, 439, 445, 480, 496]


class RtlTcpSource(IQSource):
    def __init__(self, host: str, port: int = 1234, timeout: float = 10.0):
        try:
            self._sock = socket.create_connection((host, port), timeout=timeout)
        except OSError as e:
            raise RPFexception(
                f"Could not connect to rtl_tcp at {host}:{port}: {e}",
                ReturnValue.NoDeviceFound)
        self._sock.settimeout(timeout)
        header = self._recv_exact(12)
        if header[:4] != b"RTL0":
            self._sock.close()
            raise RPFexception(
                f"Not an rtl_tcp server at {host}:{port} (bad magic).",
                ReturnValue.NoDeviceFound)
        self.tuner_type, self.tuner_gain_count = struct.unpack(">II", header[4:])
        self._rate = 2_048_000
        self._freq = 0
        self._pending = bytearray()  # partial data kept across timeouts
        self._send_cmd(_SET_GAIN_MODE, 1)

    def _send_cmd(self, opcode: int, arg: int) -> None:
        try:
            self._sock.sendall(struct.pack(">BI", opcode, arg & 0xFFFFFFFF))
        except OSError:
            raise hardware_error("rtl_tcp: connection lost while sending command.")

    def _recv_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise hardware_error("rtl_tcp: connection closed by server.")
            buf.extend(chunk)
        return bytes(buf)

    def gains(self) -> List[int]:
        return list(_R820T_GAINS)

    def sample_rate(self) -> int:
        return self._rate  # rtl_tcp has no readback; trust the request

    def frequency(self) -> int:
        return self._freq

    def set_frequency(self, frequency: int) -> None:
        self._send_cmd(_SET_FREQ, int(frequency))
        self._freq = int(frequency)

    def set_sample_rate(self, sample_rate: int) -> None:
        self._send_cmd(_SET_SAMPLE_RATE, int(sample_rate))
        self._rate = int(sample_rate)

    def set_gain(self, gain: int) -> None:
        self._send_cmd(_SET_GAIN, int(gain))

    def set_freq_correction(self, ppm_error: int) -> None:
        if ppm_error != 0:
            self._send_cmd(_SET_FREQ_CORRECTION, int(ppm_error))

    def read(self, nbytes: int) -> Tuple[np.ndarray, bool]:
        # Partial data from a previous timeout is kept (not discarded):
        # throwing away an odd number of bytes would swap I/Q alignment
        # for the rest of the session. A timed-out read reports dropped
        # samples (like rtlsdr_read_sync, device.cxx:92-97) but the byte
        # stream itself stays contiguous.
        try:
            while len(self._pending) < nbytes:
                chunk = self._sock.recv(nbytes - len(self._pending))
                if not chunk:
                    raise hardware_error("rtl_tcp: connection closed by server.")
                self._pending.extend(chunk)
        except socket.timeout:
            return np.zeros(nbytes, dtype=np.uint8), False
        data = bytes(self._pending[:nbytes])
        del self._pending[:nbytes]
        return np.frombuffer(data, dtype=np.uint8), True

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass
