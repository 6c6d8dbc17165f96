"""IQ source tests: synthetic signal correctness, fault injection,
file sources, registry semantics."""

import io

import numpy as np
import pytest

from rtl_power_fftw_tpu.config import parse_args
from rtl_power_fftw_tpu.exceptions import ReturnValue, RPFexception, StreamEOF
from rtl_power_fftw_tpu.sources import FileSource, SyntheticSource, make_source, open_device
from rtl_power_fftw_tpu.sources.synthetic import parse_synthetic_spec


def parse(argv):
    return parse_args(argv, stderr=io.StringIO())


def test_synthetic_tone_lands_in_expected_bin():
    rate, N = 2_048_000, 512
    tone = 100_000_000 + 64 * (rate // N)  # exactly bin +64 from center
    src = SyntheticSource(tones=[(tone, 40.0)], noise=1.0, seed=1)
    src.set_sample_rate(rate)
    src.set_frequency(100_000_000)
    data, ok = src.read(2 * N * 64)
    assert ok
    iq = data.astype(np.float64)
    z = (iq[0::2] - 127.0) + 1j * (iq[1::2] - 127.0)
    frames = z.reshape(64, N)
    pwr = np.abs(np.fft.fft(frames, axis=1)) ** 2
    avg = pwr.mean(axis=0)
    assert avg.argmax() == 64  # unshifted bin index for +64 bins offset


def test_synthetic_phase_continuity():
    src = SyntheticSource(tones=[(1000, 50.0)], noise=0.0)
    src.set_sample_rate(10_000)
    src.set_frequency(0)
    a, _ = src.read(2000)
    src2 = SyntheticSource(tones=[(1000, 50.0)], noise=0.0)
    src2.set_sample_rate(10_000)
    src2.set_frequency(0)
    b1, _ = src2.read(1000)
    b2, _ = src2.read(1000)
    np.testing.assert_array_equal(a, np.concatenate([b1, b2]))


def test_synthetic_dead_frequency_raises():
    src = SyntheticSource(dead_freqs=[100_000_000])
    with pytest.raises(RPFexception):
        src.set_frequency(100_000_000)
    assert src.frequency() == 0  # readback reports failure


def test_synthetic_flaky_frequency_recovers():
    src = SyntheticSource(flaky_freqs={50_000_000: 2})
    for _ in range(2):
        with pytest.raises(RPFexception):
            src.set_frequency(50_000_000)
    src.set_frequency(50_000_000)  # third try succeeds
    assert src.frequency() == 50_000_000


def test_synthetic_drop_every():
    src = SyntheticSource(drop_every=3)
    src.set_frequency(1_000_000)
    oks = [src.read(100)[1] for _ in range(6)]
    assert oks == [True, True, False, True, True, False]


def test_file_source_reads_and_eof(tmp_path):
    p = tmp_path / "iq.bin"
    p.write_bytes(bytes(range(100)))
    src = FileSource(str(p))
    data, ok = src.read(60)
    assert ok and list(data) == list(range(60))
    with pytest.raises(StreamEOF) as e:
        src.read(60)  # only 40 left
    # The tail bytes ride along so the session can finish the partial
    # spectrum (acquisition.cxx:326-331 strict-time semantics).
    assert list(e.value.partial) == list(range(60, 100))


def test_file_source_loop(tmp_path):
    p = tmp_path / "iq.bin"
    p.write_bytes(bytes([1, 2, 3, 4]))
    src = FileSource(str(p), loop=True)
    data, ok = src.read(10)
    assert ok
    assert list(data) == [1, 2, 3, 4, 1, 2, 3, 4, 1, 2]


def test_nearest_gain():
    src = SyntheticSource()
    assert src.nearest_gain(372) == 372
    assert src.nearest_gain(371) == 372
    assert src.nearest_gain(-100) == 0
    assert src.nearest_gain(10_000) == 496


def test_registry_no_device_exit_code_1():
    p = parse([])
    with pytest.raises(RPFexception) as e:
        open_device(p)
    assert e.value.retval == ReturnValue.NoDeviceFound


def test_registry_invalid_index_exit_code_2():
    p = parse(["-d", "3", "--source", "synthetic:"])
    with pytest.raises(RPFexception) as e:
        open_device(p)
    assert e.value.retval == ReturnValue.InvalidDeviceIndex


def test_make_source_specs():
    s = make_source("synthetic:tone=100M/25,noise=2,seed=7")
    assert isinstance(s, SyntheticSource)
    assert s.tones == [(100_000_000.0, 25.0)]
    assert s.noise == 2.0
    with pytest.raises(RPFexception) as e:
        make_source("warp-drive:")
    assert e.value.retval == ReturnValue.InvalidArgument


def test_parse_synthetic_spec_defaults():
    s = parse_synthetic_spec("")
    assert s.tones == [] and s.noise == 8.0


def test_file_source_native_path(tmp_path):
    from rtl_power_fftw_tpu.native import native_available
    if not native_available():
        pytest.skip("native loader unavailable")
    p = tmp_path / "iq2.bin"
    data = (np.arange(300000) % 256).astype(np.uint8)
    p.write_bytes(data.tobytes())
    src = FileSource(str(p), use_native=True, native_buf_bytes=65536)
    assert src._native_cfg is not None  # native path armed (starts lazily)
    got1, ok1 = src.read(100000)
    assert src._native is not None
    got2, ok2 = src.read(150000)
    assert ok1 and ok2
    np.testing.assert_array_equal(np.concatenate([got1, got2]), data[:250000])
    with pytest.raises(StreamEOF) as e:
        src.read(100000)  # only 50000 left
    np.testing.assert_array_equal(e.value.partial, data[250000:])
    src.close()


def test_file_source_native_loop(tmp_path):
    from rtl_power_fftw_tpu.native import native_available
    if not native_available():
        pytest.skip("native loader unavailable")
    p = tmp_path / "iq3.bin"
    data = (np.arange(4096) % 256).astype(np.uint8)
    p.write_bytes(data.tobytes())
    src = FileSource(str(p), loop=True, use_native=True,
                     native_buf_bytes=4096, native_buffers=2)
    got, ok = src.read(4096 * 3)
    assert ok
    np.testing.assert_array_equal(got, np.tile(data, 3))
    src.close()


def test_rtlsdr_wrapper_parity(monkeypatch):
    """Live-hardware parity of the pyrtlsdr wrapper, with a mocked driver:
    a 5 ms settle after every retune (device.cxx:117-121) and a USB-buffer
    flush before every read (device.cxx:92-97)."""
    import sys
    import types
    import time as _time

    calls = []

    class FakeRtlSdr:
        valid_gains_db = [0.0, 9.7, 37.2]

        def __init__(self, device_index=0):
            calls.append(("open", device_index))
            self.center_freq = 0
            self.sample_rate = 2_048_000
            self.gain = 0.0

        def reset_buffer(self):
            calls.append(("reset_buffer",))

        def read_bytes(self, n):
            calls.append(("read_bytes", n))
            return bytes(n)

        def close(self):
            calls.append(("close",))

    fake_mod = types.ModuleType("rtlsdr")
    fake_mod.RtlSdr = FakeRtlSdr
    monkeypatch.setitem(sys.modules, "rtlsdr", fake_mod)
    sys.modules.pop("rtl_power_fftw_tpu.sources.rtlsdr", None)
    from rtl_power_fftw_tpu.sources.rtlsdr import RtlSdrSource

    src = RtlSdrSource(0)
    t0 = _time.monotonic()
    src.set_frequency(100_000_000)
    assert _time.monotonic() - t0 >= 0.005  # post-retune settle
    assert src.frequency() == 100_000_000

    data, ok = src.read(1024)
    assert ok and len(data) == 1024
    # The flush precedes the read, every time.
    assert calls[-2:] == [("reset_buffer",), ("read_bytes", 1024)]
    assert src.gains() == [0, 97, 372]
    src.close()
    sys.modules.pop("rtl_power_fftw_tpu.sources.rtlsdr", None)


def test_file_source_zero_copy_slot_passthrough(tmp_path):
    """Auto-sized pool slots: full reads return pool VIEWS (no copy) and
    slots recycle via refcount finalizers, so many reads flow through a
    small pool; tail + EOF still behave."""
    from rtl_power_fftw_tpu.native import native_available
    if not native_available():
        pytest.skip("native loader unavailable")
    from rtl_power_fftw_tpu.sources import FileSource
    chunk = 1 << 17
    n_chunks = 10
    data = np.arange(n_chunks * chunk + 1000, dtype=np.int64) % 256
    data = data.astype(np.uint8)
    p = tmp_path / "zc.iq"
    p.write_bytes(data.tobytes())
    src = FileSource(str(p), use_native=True, native_buffers=3)
    for i in range(n_chunks):
        got, ok = src.read(chunk)   # views recycle through the 3-slot pool
        assert ok
        np.testing.assert_array_equal(got, data[i * chunk:(i + 1) * chunk])
        del got                     # drop the view -> slot recycles
    with pytest.raises(StreamEOF) as e:
        src.read(chunk)             # only 1000 bytes left
    np.testing.assert_array_equal(e.value.partial, data[-1000:])
    src.close()


def test_make_source_applies_sample_rate_to_synthetic():
    """Library callers of make_source(spec, rate) must get a source
    generating at that rate, not the synthetic default (the session
    re-applies params.sample_rate itself, but one-shot model users
    don't)."""
    from rtl_power_fftw_tpu.sources.registry import make_source
    src = make_source("synthetic:noise=5,seed=1", 2_400_000)
    assert src.sample_rate() == 2_400_000


def test_registry_bad_numeric_specs_are_typed_errors():
    """Non-numeric rtl_tcp port / rtlsdr index must exit InvalidArgument
    (3), not crash with a ValueError traceback."""
    for spec in ("rtl_tcp:host:abc",):
        with pytest.raises(RPFexception) as e:
            make_source(spec)
        assert e.value.retval == ReturnValue.InvalidArgument
    pytest.importorskip("rtlsdr", reason="pyrtlsdr not installed")
    with pytest.raises(RPFexception) as e:
        make_source("rtlsdr:x")
    assert e.value.retval == ReturnValue.InvalidArgument


def test_make_sources_applies_sample_rate_and_seeds():
    """--streams extras must honor the requested rate (library callers
    must not silently get the default) and carry distinct seeds."""
    from rtl_power_fftw_tpu.sources import make_sources
    extras = make_sources("synthetic:noise=5,seed=3", 3,
                          sample_rate=1_000_000)
    assert all(s.sample_rate() == 1_000_000 for s in extras)
    reads = [s.read(64)[0].tobytes() for s in extras]
    assert len(set(reads)) == 3  # distinct noise seeds
