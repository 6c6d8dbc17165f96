"""Estimator-family tests: Bartlett (reference semantics), Welch, spectrogram."""

import numpy as np
import pytest

from rtl_power_fftw_tpu.auxdata import make_window
from rtl_power_fftw_tpu.models import bartlett_psd, spectrogram, welch_psd

from golden import golden_accumulate, golden_finalize
from test_numerics import make_stream


def test_bartlett_matches_golden():
    N, repeats, rate = 128, 25, 2_048_000
    stream = make_stream(2 * N * repeats, seed=21)
    freqs, psd = bartlett_psd(stream, N, rate, center_freq=10_000_000)
    pwr, done = golden_accumulate(stream, N, repeats)
    want = golden_finalize(pwr, done, rate)
    np.testing.assert_allclose(psd, want, rtol=0, atol=1e-4)
    assert freqs[N // 2] == 10_000_000


def test_bartlett_repeats_cap():
    N, rate = 64, 1_000_000
    stream = make_stream(2 * N * 20, seed=22)
    _, psd_all = bartlett_psd(stream, N, rate)
    _, psd_five = bartlett_psd(stream, N, rate, repeats=5)
    pwr, done = golden_accumulate(stream, N, 5)
    want = golden_finalize(pwr, done, rate)
    np.testing.assert_allclose(psd_five, want, rtol=0, atol=1e-4)
    assert not np.allclose(psd_all, psd_five)


def test_welch_overlap_reduces_variance():
    """On a pure-noise stream, 50%-overlap Welch should have lower
    bin-to-bin variance than Bartlett with the same data and window."""
    N, rate = 128, 1_000_000
    rng = np.random.default_rng(23)
    stream = rng.integers(0, 256, 2 * N * 64, dtype=np.uint8)
    w = make_window("hann", N)
    _, bart = bartlett_psd(stream, N, rate, window=w, linear=True)
    _, welch = welch_psd(stream, N, rate, overlap_percent=50.0, window=w,
                         linear=True)
    assert np.var(welch) < np.var(bart)


def test_welch_zero_overlap_equals_bartlett():
    N, rate = 64, 1_000_000
    stream = make_stream(2 * N * 10, seed=24)
    w = make_window("hann", N)
    _, bart = bartlett_psd(stream, N, rate, window=w)
    _, welch = welch_psd(stream, N, rate, overlap_percent=0.0, window=w)
    np.testing.assert_allclose(bart, welch, rtol=1e-6)


def test_welch_rejects_bad_overlap():
    with pytest.raises(ValueError):
        welch_psd(np.zeros(1024, np.uint8), 64, 1_000_000,
                  overlap_percent=100.0)


def test_spectrogram_shape_and_values():
    N, rate = 64, 1_000_000
    n_rows = 12
    stream = make_stream(2 * N * n_rows, seed=25)
    times, freqs, S = spectrogram(stream, N, rate, linear=True,
                                  dc_interp=False)
    assert S.shape == (n_rows, N)
    assert len(times) == n_rows and times[0] == 0.0
    assert times[1] == N / rate
    # Row 0 equals the single-frame golden accumulation (shifted), without
    # DC interpolation (spectrogram keeps raw bins).
    pwr, _ = golden_accumulate(stream[:2 * N], N, 1)
    want = pwr / 1 / N / rate
    np.testing.assert_allclose(S[0], want, rtol=2e-5)


def test_spectrogram_group_averaging():
    N, rate = 32, 500_000
    stream = make_stream(2 * N * 8, seed=26)
    t1, f1, S1 = spectrogram(stream, N, rate, average=4, linear=True)
    assert S1.shape == (2, N)
    t2, f2, S2 = spectrogram(stream, N, rate, average=1, linear=True)
    np.testing.assert_allclose(S1[0], S2[:4].mean(axis=0), rtol=1e-6)


def test_scan_psd_batched_hops():
    from rtl_power_fftw_tpu.models.scan import plan_hop_freqs, scan_psd
    from rtl_power_fftw_tpu.sources import SyntheticSource

    rate, N, frames = 2_048_000, 128, 10
    hops = plan_hop_freqs(100_000_000, 106_000_000, rate)
    assert len(hops) == 3
    # Record one capture per hop from a source with a tone inside hop 2.
    caps = []
    for freq in hops:
        src = SyntheticSource(tones=[(hops[1] + 300_000, 35.0)], noise=4.0,
                              seed=freq)
        src.set_sample_rate(rate)
        src.set_frequency(freq)
        data, _ = src.read(2 * N * frames)
        caps.append(data)
    caps = np.stack(caps)

    per_hop = scan_psd(caps, hops, N, rate)
    assert len(per_hop) == 3
    # Each hop's result equals the golden single-hop pipeline.
    for h, freq in enumerate(hops):
        pwr, done = golden_accumulate(caps[h], N, frames)
        want = golden_finalize(pwr, done, rate)
        np.testing.assert_allclose(per_hop[h][1], want, rtol=0, atol=1e-4)
        assert per_hop[h][0][N // 2] == freq
    # The tone shows up in hop 2's spectrum near its absolute frequency.
    f1, p1 = per_hop[1]
    assert abs(f1[p1.argmax()] - (hops[1] + 300_000)) <= rate / N

    freqs, psd = scan_psd(caps, hops, N, rate, stitch="concat")
    assert freqs.shape == psd.shape == (3 * N,)


def test_spectral_kurtosis_flags_tone():
    from rtl_power_fftw_tpu.models import spectral_kurtosis
    from rtl_power_fftw_tpu.sources import SyntheticSource
    rate, N, M = 2_048_000, 256, 256
    src = SyntheticSource(tones=[(1_000_000 + 64 * rate // N, 40.0)],
                          noise=8.0, seed=33)
    src.set_sample_rate(rate)
    src.set_frequency(1_000_000)
    iq, _ = src.read(2 * N * M)
    freqs, sk, psd = spectral_kurtosis(iq, N, rate, center_freq=1_000_000)
    # Gaussian bins: SK ~ 1 within ~4/sqrt(M); coherent tone: SK << 1.
    tone_bin = N // 2 + 64
    clean = np.delete(sk, [tone_bin - 1, tone_bin, tone_bin + 1, N // 2])
    assert np.abs(np.median(clean) - 1.0) < 0.2
    assert sk[tone_bin] < 0.5
    assert psd[tone_bin] == psd.max()


def test_multitaper_matches_bartlett_on_white_noise():
    """Unit check: on white noise the multitaper PSD must agree with the
    Bartlett PSD in level (same normalization), with lower variance."""
    from rtl_power_fftw_tpu.models import multitaper_psd
    rate, N, M = 1_000_000, 128, 64
    rng = np.random.default_rng(34)
    iq = rng.integers(0, 256, 2 * N * M, dtype=np.uint8)
    f_mt, mt = multitaper_psd(iq, N, rate, NW=3.0, linear=True)
    f_b, b = bartlett_psd(iq, N, rate, linear=True)
    assert abs(np.mean(mt) / np.mean(b) - 1.0) < 0.05  # same level
    assert np.var(mt / np.mean(mt)) < np.var(b / np.mean(b))  # lower variance


def test_coherence_common_tone():
    """Two streams sharing a common tone with independent noise:
    coherence ~1 at the tone bin, low elsewhere; CSD phase ~0."""
    from rtl_power_fftw_tpu.models import coherence
    rate, N, M = 2_048_000, 256, 512
    tone = 1_000_000 + 32 * rate // N
    rng = np.random.default_rng(60)
    t = np.arange(N * M) / rate
    common = 25.0 * np.exp(2j * np.pi * (tone - 1_000_000) * t)

    def quantize(z, seed):
        r = np.random.default_rng(seed)
        buf = np.empty(2 * N * M)
        buf[0::2] = z.real + r.normal(0, 6.0, N * M) + 127.0
        buf[1::2] = z.imag + r.normal(0, 6.0, N * M) + 127.0
        return np.clip(np.rint(buf), 0, 255).astype(np.uint8)

    iq_x = quantize(common, 61)
    iq_y = quantize(common, 62)
    freqs, g2, csd = coherence(iq_x, iq_y, N, rate, center_freq=1_000_000)
    tone_bin = N // 2 + 32
    assert g2[tone_bin] > 0.95
    others = np.delete(g2, [tone_bin - 1, tone_bin, tone_bin + 1])
    assert np.median(others) < 0.05
    assert abs(np.angle(csd[tone_bin])) < 0.05  # in-phase common signal
    assert 0.0 <= g2.min() and g2.max() <= 1.0 + 1e-9


def test_coherence_independent_streams_low():
    from rtl_power_fftw_tpu.models import coherence
    rng = np.random.default_rng(63)
    N, M, rate = 128, 256, 1_000_000
    iq_x = rng.integers(0, 256, 2 * N * M, dtype=np.uint8)
    iq_y = rng.integers(0, 256, 2 * N * M, dtype=np.uint8)
    _, g2, _ = coherence(iq_x, iq_y, N, rate)
    assert np.median(g2) < 0.05


def test_coherence_dc_bin_not_spurious():
    """Regression: the common (u8-127) quantizer offset must not create
    fake coherence at the DC bin for independent streams."""
    from rtl_power_fftw_tpu.models import coherence
    rng = np.random.default_rng(64)
    N, M, rate = 256, 2000, 1_000_000
    # Offset +0.5 LSB: means ~127.5, the typical RTL-SDR case.
    def white(seed):
        r = np.random.default_rng(seed)
        return np.clip(np.rint(127.5 + r.normal(0, 5.0, 2 * N * M)),
                       0, 255).astype(np.uint8)
    _, g2, _ = coherence(white(65), white(66), N, rate)
    assert g2[N // 2] < 0.05, g2[N // 2]
    assert np.median(g2) < 0.05


def test_spectral_correlation_numpy_parity():
    """SCF vs a literal float64 numpy transcription on random data."""
    from rtl_power_fftw_tpu.models import spectral_correlation
    N, M, rate = 64, 24, 1_000_000
    rng = np.random.default_rng(5)
    iq = rng.integers(0, 256, M * 2 * N, dtype=np.uint8)
    alphas, scf, coh = spectral_correlation(iq, N, rate, max_alpha_bins=5)
    assert alphas.shape == (5,) and scf.shape == (5, N)
    x = (iq[0::2].astype(np.float64) - 127.0) \
        + 1j * (iq[1::2].astype(np.float64) - 127.0)
    X = np.fft.fft(x.reshape(M, N), axis=1)
    want = np.stack([
        (np.roll(X, -k, axis=1) * np.conj(X)).mean(axis=0)
        for k in range(5)])
    np.testing.assert_allclose(scf, want, rtol=2e-5, atol=1e-3)
    assert np.all(coh <= 1.0 + 1e-9)
    # alpha=0 row is the plain averaged PSD.
    np.testing.assert_allclose(scf[0].real,
                               (np.abs(X) ** 2).mean(axis=0), rtol=2e-5)


def test_spectral_correlation_detects_am_cyclostationarity():
    """An AM signal (tone modulated at fm = j bins) has a cyclic feature
    at alpha = fm that pure noise lacks."""
    from rtl_power_fftw_tpu.models import spectral_correlation
    N, M, rate = 128, 200, 1_000_000
    t = np.arange(M * N)
    fm_bins = 4                                # modulation = 4 bin widths
    carrier = np.exp(2j * np.pi * (17 / N) * t)
    am = (1.0 + 0.9 * np.cos(2 * np.pi * fm_bins / N * t)) * 40.0 * carrier
    rng = np.random.default_rng(6)
    x = am + 3.0 * (rng.standard_normal(M * N)
                    + 1j * rng.standard_normal(M * N))
    re = np.clip(np.round(x.real + 127), 0, 255).astype(np.uint8)
    im = np.clip(np.round(x.imag + 127), 0, 255).astype(np.uint8)
    iq = np.stack([re, im], axis=-1).reshape(-1)
    alphas, scf, coh = spectral_correlation(iq, N, rate, max_alpha_bins=8)
    # Peak coherence off alpha=0 must land at the modulation lag, and be
    # decisively stronger than a non-feature lag.
    scores = coh[1:].max(axis=1)               # per-alpha peak coherence
    assert int(np.argmax(scores)) + 1 == fm_bins
    assert scores[fm_bins - 1] > 3 * np.median(np.delete(scores, fm_bins - 1))
