"""Golden tests for maua_tpu.audio spectral ops against torch/scipy
oracles (reference parity-harness style, SURVEY.md section 4)."""

import numpy as np
import pytest

from maua_tpu.audio import convert as C
from maua_tpu.audio import spectral as S

SR = 22050


@pytest.fixture(scope="module")
def tone():
    t = np.arange(SR * 2) / SR
    y = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 880 * t)
    return y.astype(np.float32)


def test_stft_matches_torch(tone):
    torch = pytest.importorskip("torch")
    out = np.asarray(S.stft(tone, n_fft=1024, hop_length=256))
    ref = torch.stft(
        torch.from_numpy(tone), n_fft=1024, hop_length=256, center=True,
        window=torch.hann_window(1024), pad_mode="reflect", return_complex=True,
    ).numpy()
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-2
    assert np.abs(np.abs(out) - np.abs(ref)).max() < 1e-2


def test_istft_roundtrip(tone):
    spec = S.stft(tone, n_fft=1024, hop_length=256)
    rec = np.asarray(S.istft(spec, n_fft=1024, hop_length=256, length=len(tone)))
    assert rec.shape == tone.shape
    # the un-framed tail (< n_fft samples) is unrecoverable, as in torch
    covered = len(tone) - 1024
    assert np.abs(rec[:covered] - tone[:covered]).max() < 1e-3


def test_dct_matches_scipy():
    from scipy.fft import dct as sdct

    rs = np.random.RandomState(0)
    x = rs.randn(4, 64).astype(np.float32)
    out = np.asarray(S.dct(x, norm="ortho"))
    ref = sdct(x, type=2, norm="ortho", axis=-1)
    assert np.abs(out - ref).max() < 1e-4
    out2 = np.asarray(S.dct(x))
    ref2 = sdct(x, type=2, axis=-1)
    assert np.abs(out2 - ref2).max() < 1e-3


def test_hz_mel_known_values():
    assert float(C.hz_to_mel(1000.0)) == pytest.approx(15.0, abs=1e-4)
    assert float(C.hz_to_mel(100.0)) == pytest.approx(1.5, abs=1e-4)
    assert float(C.mel_to_hz(15.0)) == pytest.approx(1000.0, rel=1e-4)
    # htk variant ~ identity near 1000 Hz
    assert float(C.hz_to_mel(1000.0, htk=True)) == pytest.approx(999.99, abs=1.0)
    # roundtrip
    f = np.array([50.0, 440.0, 2000.0, 8000.0])
    rt = np.asarray(C.mel_to_hz(C.hz_to_mel(f)))
    assert np.allclose(rt, f, rtol=1e-4)


def test_mel_filterbank_tone_peak(tone):
    fb = C.mel_filterbank(SR, 2048, n_mels=128)
    assert fb.shape == (128, 1025)
    mel_spec = np.asarray(S.melspectrogram(tone, SR))
    peak_bin = mel_spec.mean(axis=1).argmax()
    mel_center = np.asarray(C.mel_frequencies(130)[1:-1])
    assert abs(mel_center[peak_bin] - 440.0) < 100.0


def test_spectrogram_drops_last_frame(tone):
    spec = S.stft(tone, n_fft=2048, hop_length=1024)
    mag = S.spectrogram(tone, n_fft=2048, hop_length=1024)
    assert mag.shape[-1] == spec.shape[-1] - 1


def test_magphase_softmask():
    rs = np.random.RandomState(1)
    D = rs.randn(16, 8) + 1j * rs.randn(16, 8)
    mag, phase = S.magphase(D)
    assert np.allclose(np.asarray(mag) * np.asarray(phase), D, atol=1e-5)
    X = np.abs(rs.randn(8, 8)).astype(np.float32)
    Xr = np.abs(rs.randn(8, 8)).astype(np.float32)
    m = np.asarray(S.softmask(X, Xr, power=2.0))
    assert np.all(m >= 0) and np.all(m <= 1)
    ref = (X**2) / (X**2 + Xr**2)
    assert np.allclose(m, ref, atol=1e-5)


def test_hpss_masks_sum_to_one(tone):
    mag = np.abs(np.asarray(S.stft(tone, n_fft=1024, hop_length=256)))
    h, p = S.hpss(mag, mask=True)
    total = np.asarray(h) + np.asarray(p)
    valid = mag > 1e-6
    assert np.allclose(total[valid], 1.0, atol=1e-4)
    # harmonic mask should dominate for a steady tone
    assert np.asarray(h)[valid].mean() > np.asarray(p)[valid].mean()


def test_harmonic_percussive_time_domain(tone):
    rs = np.random.RandomState(2)
    clicks = np.zeros_like(tone)
    clicks[::2205] = 1.0  # percussive impulses
    y = tone + clicks
    h = np.asarray(S.harmonic(y, margin=3.0))
    p = np.asarray(S.percussive(y, margin=3.0))
    assert h.shape == y.shape and p.shape == y.shape
    # tone energy mostly in h, click energy mostly in p
    corr_tone_h = np.corrcoef(h, tone)[0, 1]
    corr_tone_p = np.corrcoef(p, tone)[0, 1]
    assert corr_tone_h > 0.8 and corr_tone_h > corr_tone_p


def test_rms_envelope(tone):
    env = np.asarray(S.rms(tone))
    assert env.ndim == 1
    assert np.all(env >= 0)
    # constant-amplitude tone -> flat rms in the interior
    interior = env[4:-4]
    assert interior.std() / interior.mean() < 0.05


def test_mfcc_shape(tone):
    out = np.asarray(S.mfcc(tone, SR))
    assert out.shape[0] == 20
    assert np.all(np.isfinite(out))


def test_median_filter2d():
    from scipy.ndimage import median_filter

    rs = np.random.RandomState(3)
    x = rs.rand(20, 30).astype(np.float32)
    out = np.asarray(S.median_filter2d(x, (1, 7)))
    ref = median_filter(x, size=(1, 7), mode="nearest")
    assert np.allclose(out, ref, atol=1e-6)
    out2 = np.asarray(S.median_filter2d(x, (5, 1)))
    ref2 = median_filter(x, size=(5, 1), mode="nearest")
    assert np.allclose(out2, ref2, atol=1e-6)
    out3 = np.asarray(S.median_filter2d(x, (3, 5)))
    ref3 = median_filter(x, size=(3, 5), mode="nearest")
    assert np.allclose(out3, ref3, atol=1e-6)


def test_frame_gcd_block_paths():
    """frame() gcd-block decomposition matches direct gathers for
    overlapping, non-overlapping, and hop>frame windows, batched and
    time-major."""
    rs = np.random.RandomState(11)
    for T, fl, hop in [(1000, 256, 512), (2048, 2048, 512), (5000, 512, 8), (999, 100, 35)]:
        y = rs.randn(T).astype(np.float32)
        n_frames = 1 + (T - fl) // hop
        want = np.stack([y[i * hop : i * hop + fl] for i in range(n_frames)], -1)
        got = np.asarray(S.frame(S.jnp.asarray(y), fl, hop))
        assert np.array_equal(got, want), (T, fl, hop)
        got_tm = np.asarray(S.frame(S.jnp.asarray(y), fl, hop, time_major=True))
        assert np.array_equal(got_tm, want.T), (T, fl, hop, "time_major")
        yb = rs.randn(2, T).astype(np.float32)
        gb = np.asarray(S.frame(S.jnp.asarray(yb), fl, hop))
        assert np.array_equal(gb[1], np.stack([yb[1, i * hop : i * hop + fl] for i in range(n_frames)], -1))


def test_cqt_batched_and_cache_keys():
    """Batched single-octave vqt keeps its axes, and filterbanks with
    different bin spacing at matched Q don't collide in the basis
    cache (review finding: key must include alpha + full freqs)."""
    from maua_tpu.audio.constantq import cqt

    rs = np.random.RandomState(12)
    y = rs.randn(22050).astype(np.float32)
    c1 = np.abs(np.asarray(cqt(S.jnp.asarray(y), sr=22050, fmin=200.0, n_bins=12, bins_per_octave=12)))
    a12, a24 = 2 ** (1 / 12) - 1, 2 ** (1 / 24) - 1
    np.abs(np.asarray(cqt(S.jnp.asarray(y), sr=22050, fmin=200.0, n_bins=12,
                          bins_per_octave=24, filter_scale=a24 / a12)))
    c1b = np.abs(np.asarray(cqt(S.jnp.asarray(y), sr=22050, fmin=200.0, n_bins=12, bins_per_octave=12)))
    assert np.array_equal(c1, c1b)  # second config must not poison the first's basis
    yb = rs.randn(2, 22050).astype(np.float32)
    cb = np.abs(np.asarray(cqt(S.jnp.asarray(yb), sr=22050, fmin=200.0, n_bins=12, bins_per_octave=12)))
    c0 = np.abs(np.asarray(cqt(S.jnp.asarray(yb[0]), sr=22050, fmin=200.0, n_bins=12, bins_per_octave=12)))
    assert cb.shape[:2] == (2, 12)
    assert np.allclose(cb[0], c0, atol=1e-4)


def test_median_selection_network():
    """The pruned compare-exchange network is an exact order statistic:
    identical to jnp.median for odd and even k, including ties."""
    rs = np.random.RandomState(7)
    for k in (1, 2, 3, 4, 5, 9, 16, 25, 31, 32):
        vals = rs.randint(0, 4, size=(k, 6, 9)).astype(np.float32)  # heavy ties
        got = np.asarray(S._median_of([S.jnp.asarray(v) for v in vals], k))
        assert np.array_equal(got, np.median(vals, axis=0)), k


def test_spectral_flatness_range(tone):
    rs = np.random.RandomState(4)
    noise = rs.randn(len(tone)).astype(np.float32)
    flat_tone = float(np.median(np.asarray(S.spectral_flatness(tone))))
    flat_noise = float(np.median(np.asarray(S.spectral_flatness(noise))))
    assert flat_tone < 0.1
    assert flat_noise > 0.3
