"""Tests for CQT, chroma, onsets, tempo, pitch, segmentation
(reference: audioreactive/mir.py + rosa/{constantq,beat,pitch,segment})."""

import numpy as np
import pytest

import jax.numpy as jnp

from maua_tpu.audio import beat as B
from maua_tpu.audio import chroma as CH
from maua_tpu.audio import constantq as CQ
from maua_tpu.audio import convert as C
from maua_tpu.audio import mir
from maua_tpu.audio import pitch as P
from maua_tpu.audio import segment as SEG

SR = 22050


@pytest.fixture(scope="module")
def click_track():
    """120 BPM click track: impulses every 0.5 s over 8 s."""
    y = np.zeros(SR * 8, np.float32)
    period = SR // 2
    for i in range(0, len(y), period):
        y[i : i + 64] += np.hanning(64).astype(np.float32)
    rs = np.random.RandomState(0)
    return y + 0.01 * rs.randn(len(y)).astype(np.float32)


@pytest.fixture(scope="module")
def a440():
    t = np.arange(SR * 3) / SR
    return (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)


def test_cqt_tone_peak(a440):
    Cmat = np.abs(np.asarray(CQ.cqt(a440, sr=SR, n_bins=84, bins_per_octave=12)))
    fmin = C.note_to_hz("C1")
    freqs = C.cqt_frequencies(84, fmin, 12)
    peak = Cmat.mean(axis=1).argmax()
    assert abs(freqs[peak] - 440.0) / 440.0 < 0.03, freqs[peak]


def test_cqt_octave_consistency(a440):
    """The same tone analyzed in different octaves of the transform
    should have comparable magnitude normalization."""
    t = np.arange(SR * 2) / SR
    low = (0.5 * np.sin(2 * np.pi * 110.0 * t)).astype(np.float32)  # A2
    Chigh = np.abs(np.asarray(CQ.cqt(a440, sr=SR)))
    Clow = np.abs(np.asarray(CQ.cqt(low, sr=SR)))
    ph, pl = Chigh.mean(1).max(), Clow.mean(1).max()
    assert 0.3 < ph / pl < 3.0, (ph, pl)


def test_chroma_cqt_a440_is_A(a440):
    ch = np.asarray(CH.chroma_cqt(a440, sr=SR))
    assert ch.shape[0] == 12
    # base_c ordering: C=0 ... A=9
    assert ch.mean(axis=1).argmax() == 9


def test_chroma_stft_a440_is_A(a440):
    ch = np.asarray(CH.chroma_stft(a440, sr=SR))
    assert ch.mean(axis=1).argmax() == 9


def test_chroma_cens_shape_and_range(a440):
    ch = np.asarray(CH.chroma_cens(a440, sr=SR))
    assert ch.shape[0] == 12
    assert np.all(ch >= -1e-6) and np.all(ch <= 1 + 1e-6)
    assert ch.mean(axis=1).argmax() == 9


def test_nn_filter_chunked_matches_unchunked():
    rs = np.random.RandomState(5)
    x = np.asarray(rs.rand(12, 500), np.float32)
    import jax.numpy as jnp

    full = np.asarray(CH.nn_filter_cosine_median(jnp.asarray(x)))
    chunked = np.asarray(CH.nn_filter_cosine_median(jnp.asarray(x), chunk=128))
    assert np.allclose(full, chunked, atol=1e-6)


def _click_contrast(env, hop=512, tol=2):
    """Mean envelope at click frames vs away from clicks."""
    period = (SR // 2) / hop
    click_frames = np.round(np.arange(0, len(env), period)).astype(int)
    click_frames = click_frames[click_frames < len(env)]
    mask = np.zeros(len(env), bool)
    for c in click_frames:
        mask[max(c - tol, 0) : c + tol + 1] = True
    return env[mask].mean() / max(env[~mask].mean(), 1e-10)


def test_onset_strength_peaks_at_clicks(click_track):
    env = np.asarray(B.onset_strength(click_track, sr=SR, hop_length=512))
    assert _click_contrast(env) > 2.0


def test_onset_ensemble_finite_and_periodic(click_track):
    env = np.asarray(mir.onset_ensemble(click_track, SR))
    assert np.all(np.isfinite(env))
    assert _click_contrast(env) > 1.5


def test_onsets_wrapper(click_track):
    env = np.asarray(mir.onsets(click_track, SR, prepercussive=0))
    assert env.max() <= 1 + 1e-5
    assert np.all(np.isfinite(env))


def test_tempo_click_track(click_track):
    env = B.onset_strength(click_track, sr=SR, hop_length=512)
    bpm = float(B.tempo(env, sr=SR, hop_length=512))
    assert abs(bpm - 120.0) < 6.0, bpm


def test_tempo_wrapper_list(click_track):
    tempos = mir.tempo(click_track, SR, prepercussive=0)
    assert isinstance(tempos, list) and len(tempos) >= 1
    assert any(abs(t - 120.0) < 8 or abs(t - 240.0) < 16 for t in tempos), tempos


def test_plp_periodicity(click_track):
    env = B.onset_strength(click_track, sr=SR, hop_length=512)
    pul = np.asarray(B.plp(env, sr=SR, hop_length=512))
    assert pul.shape == np.asarray(env).shape
    assert pul.max() <= 1 + 1e-5 and pul.min() >= 0


def test_piptrack_tone(a440):
    pitches, mags = P.piptrack(a440, sr=SR)
    pitches, mags = np.asarray(pitches), np.asarray(mags)
    est = np.average(pitches, axis=0, weights=mags + 1e-8)
    interior = est[4:-4]
    assert abs(np.median(interior) - 440.0) < 10.0, np.median(interior)


def test_estimate_tuning_detuned():
    t = np.arange(SR * 2) / SR
    detuned = 440.0 * 2 ** (0.25 / 12)  # +25 cents
    y = np.sin(2 * np.pi * detuned * t).astype(np.float32)
    tune = float(P.estimate_tuning(y, sr=SR))
    assert abs(tune - 0.25) < 0.1, tune


def test_volume_envelope(click_track):
    env = np.asarray(mir.volume(click_track, SR))
    assert abs(env.max() - 1) < 1e-5 and env.min() >= 0


def test_recurrence_matrix_properties():
    rs = np.random.RandomState(1)
    # two alternating states -> strong off-diagonal recurrence
    X = np.concatenate([np.tile(rs.rand(6, 1), (1, 10)), np.tile(rs.rand(6, 1), (1, 10))], axis=1)
    X += 0.01 * rs.rand(6, 20)
    R = np.asarray(SEG.recurrence_matrix(jnp.asarray(X.astype(np.float32)), width=1))
    assert R.shape == (20, 20)
    assert np.allclose(R, R.T, atol=1e-5)
    assert np.all(R >= 0) and np.all(R <= 1 + 1e-6)


def test_kmeans_separates_clusters():
    rs = np.random.RandomState(2)
    a = rs.randn(20, 3) * 0.1
    b = rs.randn(20, 3) * 0.1 + 5.0
    X = jnp.asarray(np.concatenate([a, b]).astype(np.float32))
    labels, centers = SEG.kmeans(X, 2)
    labels = np.asarray(labels)
    assert len(set(labels[:20])) == 1
    assert len(set(labels[20:])) == 1
    assert labels[0] != labels[-1]


def test_laplacian_segmentation_runs(click_track):
    times, labels = mir.laplacian_segmentation(click_track, SR, k=3)
    assert len(times) == len(labels)
    assert len(times) >= 1
    assert times[0] == 0.0
