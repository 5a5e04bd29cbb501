"""Parity of the real-DFT (matmul) audio path vs the complex-FFT path.

The axon TPU relay supports neither complex dtypes nor jnp.fft (both
fail with UNIMPLEMENTED and poison the runtime), so on TPU backends the
audio stack runs entirely on real cos/sin matmuls (MAUA_AUDIO_FFT=real,
auto-selected; see `maua_tpu/audio/spectral.py` real-DFT seam). These
tests pin the real path to the complex path on CPU so the hardware
path is verified without hardware.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from maua_tpu.audio import beat, chroma, constantq, pitch, spectral

SR = 22050


@pytest.fixture(scope="module")
def y():
    rng = np.random.RandomState(0)
    t = np.arange(SR * 2) / SR
    sig = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 330 * t)
        + 0.05 * rng.randn(len(t))
    ).astype(np.float32)
    return sig


def _both_modes(monkeypatch, fn):
    monkeypatch.setenv("MAUA_AUDIO_FFT", "complex")
    ref = np.asarray(fn())
    monkeypatch.setenv("MAUA_AUDIO_FFT", "real")
    out = fn()
    if isinstance(out, spectral.RISpec):
        out = np.asarray(out.re) + 1j * np.asarray(out.im)
    else:
        out = np.asarray(out)
    return ref, out


def test_stft_istft_parity(y, monkeypatch):
    ref, out = _both_modes(monkeypatch, lambda: spectral.stft(jnp.asarray(y), n_fft=1024, hop_length=256))
    assert np.max(np.abs(ref - out)) < 1e-3
    monkeypatch.setenv("MAUA_AUDIO_FFT", "real")
    D = spectral.stft(jnp.asarray(y), n_fft=1024, hop_length=256)
    yr = np.asarray(spectral.istft(D, n_fft=1024, hop_length=256, length=len(y)))
    assert np.max(np.abs(yr[1024:-1024] - y[1024:-1024])) < 1e-4


def test_dct_parity(y, monkeypatch):
    x = jnp.asarray(np.random.RandomState(1).randn(7, 128).astype(np.float32))
    ref, out = _both_modes(monkeypatch, lambda: spectral.dct(x, norm="ortho"))
    assert np.max(np.abs(ref - out)) < 1e-4


def test_harmonic_percussive_parity(y, monkeypatch):
    ref, out = _both_modes(monkeypatch, lambda: spectral.harmonic(jnp.asarray(y), margin=3.0))
    assert np.max(np.abs(ref - out)) < 1e-3
    ref, out = _both_modes(monkeypatch, lambda: spectral.percussive(jnp.asarray(y), margin=3.0))
    assert np.max(np.abs(ref - out)) < 1e-3


def test_cqt_chroma_parity(y, monkeypatch):
    ref, out = _both_modes(
        monkeypatch, lambda: spectral.spec_abs(constantq.cqt(jnp.asarray(y), sr=SR, n_bins=48))
    )
    assert np.max(np.abs(ref - out)) / max(np.max(np.abs(ref)), 1e-9) < 1e-3
    ref, out = _both_modes(monkeypatch, lambda: chroma.chroma_cens(jnp.asarray(y), sr=SR))
    assert np.max(np.abs(ref - out)) < 1e-3


def test_tempogram_plp_tempo_parity(monkeypatch):
    env = np.clip(np.random.RandomState(2).randn(1024), 0, None).astype(np.float32)
    ref, out = _both_modes(monkeypatch, lambda: beat.tempogram(jnp.asarray(env)))
    assert np.max(np.abs(ref - out)) < 1e-2
    ref, out = _both_modes(monkeypatch, lambda: beat.plp(jnp.asarray(env)))
    assert np.max(np.abs(ref - out)) < 1e-2
    ref, out = _both_modes(monkeypatch, lambda: beat.tempo(jnp.asarray(env)))
    assert np.allclose(ref, out, rtol=1e-3)


def test_autocorrelate_parity(monkeypatch):
    env = np.random.RandomState(3).randn(2000).astype(np.float32)
    ref, out = _both_modes(monkeypatch, lambda: beat.autocorrelate(jnp.asarray(env), max_size=512))
    assert np.max(np.abs(ref - out)) / np.max(np.abs(ref)) < 1e-4


def test_piptrack_parity(y, monkeypatch):
    ref, out = _both_modes(monkeypatch, lambda: pitch.piptrack(jnp.asarray(y), sr=SR)[1])
    assert np.max(np.abs(ref - out)) / max(np.max(np.abs(ref)), 1e-9) < 1e-3


def test_onset_ensemble_parity(y, monkeypatch):
    from maua_tpu.audio import mir

    ref, out = _both_modes(monkeypatch, lambda: mir.onset_ensemble(jnp.asarray(y), SR))
    assert np.max(np.abs(ref - out)) < 1e-2


def test_fourier_parameterization_parity(monkeypatch):
    import jax

    from maua_tpu.parameterizations.fourier import Fourier

    f = Fourier(32, 24, key=jax.random.PRNGKey(1))
    monkeypatch.setenv("MAUA_AUDIO_FFT", "complex")
    ref = np.asarray(f.decode())
    monkeypatch.setenv("MAUA_AUDIO_FFT", "real")
    out = np.asarray(f.decode())
    assert np.max(np.abs(ref - out)) < 1e-5
    img = jnp.asarray(np.random.RandomState(0).rand(1, 32, 24, 3).astype(np.float32) * 1.6 - 0.8)
    f.encode(img)
    assert np.max(np.abs(np.asarray(f.decode()) - np.asarray(img))) < 1e-4
