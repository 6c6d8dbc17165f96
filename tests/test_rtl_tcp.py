"""rtl_tcp network source tests against an in-process fake server
implementing the rtl_tcp wire protocol."""

import socket
import struct
import threading

import numpy as np
import pytest

from rtl_power_fftw_tpu.exceptions import ReturnValue, RPFexception
from rtl_power_fftw_tpu.sources.rtl_tcp import RtlTcpSource


class FakeRtlTcpServer:
    """Accepts one client: sends the dongle header, records commands,
    streams a deterministic byte pattern."""

    def __init__(self, magic=b"RTL0", tuner_type=5, gain_count=29,
                 stream_bytes=1 << 16):
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.magic = magic
        self.header = magic + struct.pack(">II", tuner_type, gain_count)
        self.stream_bytes = stream_bytes
        self.commands = []
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self):
        conn, _ = self.sock.accept()
        conn.sendall(self.header)
        conn.settimeout(0.2)
        payload = (np.arange(self.stream_bytes) % 251).astype(np.uint8).tobytes()
        sent = 0
        while sent < len(payload):
            try:
                data = conn.recv(5)
                while len(data) >= 5:
                    self.commands.append(struct.unpack(">BI", data[:5]))
                    data = data[5:]
            except socket.timeout:
                pass
            except OSError:
                break
            try:
                n = conn.send(payload[sent:sent + 8192])
                sent += n
            except OSError:
                break
        conn.close()

    def close(self):
        self.sock.close()


def test_rtl_tcp_handshake_commands_and_stream():
    srv = FakeRtlTcpServer()
    try:
        src = RtlTcpSource("127.0.0.1", srv.port, timeout=5.0)
        assert src.tuner_type == 5
        src.set_frequency(100_000_000)
        src.set_sample_rate(2_048_000)
        src.set_gain(372)
        src.set_freq_correction(12)
        data, ok = src.read(10_000)
        assert ok and len(data) == 10_000
        np.testing.assert_array_equal(
            data, (np.arange(10_000) % 251).astype(np.uint8))
        src.close()
        # Commands: gain mode (on connect), freq, rate, gain, ppm.
        import time
        time.sleep(0.3)
        ops = [c[0] for c in srv.commands]
        assert ops[0] == 0x03            # gain mode manual at connect
        assert (0x01, 100_000_000) in srv.commands
        assert (0x02, 2_048_000) in srv.commands
        assert (0x04, 372) in srv.commands
        assert (0x05, 12) in srv.commands
    finally:
        srv.close()


def test_rtl_tcp_bad_magic_rejected():
    srv = FakeRtlTcpServer(magic=b"HTTP")
    try:
        with pytest.raises(RPFexception) as e:
            RtlTcpSource("127.0.0.1", srv.port, timeout=5.0)
        assert e.value.retval == ReturnValue.NoDeviceFound
    finally:
        srv.close()


def test_rtl_tcp_no_server():
    with pytest.raises(RPFexception) as e:
        RtlTcpSource("127.0.0.1", 1, timeout=0.5)  # port 1: nothing there
    assert e.value.retval == ReturnValue.NoDeviceFound
