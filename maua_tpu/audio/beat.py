"""Onset strength, tempograms, PLP, tempo estimation — jittable.

Rebuild of `rosa/beat.py` (onset_strength :10-23, fourier_tempogram
:33-38, plp :41-77) plus librosa-compatible tempo estimation used by
the reference's tempo wrapper (`audioreactive/mir.py:183-209`).
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .convert import fourier_tempo_frequencies, power_to_db, tempo_frequencies
from . import spectral as _spectral
from .spectral import hann_window, melspectrogram


def onset_strength(
    y: jax.Array,
    sr: float = 22050,
    n_fft: int = 2048,
    hop_length: int = 512,
    lag: int = 1,
    max_size: int = 1,
    n_mels: int = 128,
) -> jax.Array:
    """Spectral-flux onset envelope on the log-mel spectrogram
    (`rosa/beat.py:10-23`; librosa.onset.onset_strength).

    Returns (T,) aligned like librosa (compensated by n_fft//(2*hop))."""
    S = melspectrogram(y, sr, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels, power=2.0)
    S = power_to_db(S)
    if max_size > 1:
        r = max_size // 2
        Sp = jnp.pad(S, ((r, max_size - 1 - r), (0, 0)), mode="edge")
        S_ref = jnp.max(jnp.stack([Sp[i : i + S.shape[0]] for i in range(max_size)], 0), axis=0)
    else:
        S_ref = S
    diff = S[:, lag:] - S_ref[:, :-lag]
    onset = jnp.mean(jnp.maximum(0.0, diff), axis=0)
    # center compensation: pad front so peaks align with the audio
    pad_width = lag + n_fft // (2 * hop_length)
    onset = jnp.concatenate([jnp.zeros(pad_width, onset.dtype), onset])
    return onset[: S.shape[1]]


def autocorrelate(y: jax.Array, max_size: Optional[int] = None) -> jax.Array:
    """Bounded-lag autocorrelation (librosa.autocorrelate): FFT on CPU;
    on TPU a direct shifted-dot — complex FFT is unavailable on the
    relay, the callers bound max_size to a few hundred lags, and the
    O(n*max_size) matmul is cheap there while the FFT path's
    (n_freq, n_pad) DFT basis for a full track would be GBs."""
    n = y.shape[-1]
    if _spectral.use_real_dft():
        lags = n if max_size is None else min(max_size, n)
        # the gather below materializes (..., lags, n) floats; with an
        # unbounded max_size on a full track that is O(n^2) — fail loudly
        # instead of OOMing the relay
        if lags * n > 2**28:
            raise ValueError(
                f"autocorrelate real-DFT path needs lags*n <= 2**28 floats "
                f"(got lags={lags}, n={n}); pass a bounded max_size"
            )
        yp = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, lags)])
        idx = jnp.arange(lags)[:, None] + jnp.arange(n)[None, :]
        shifted = yp[..., idx]  # (..., lags, n)
        return jnp.einsum("...ln,...n->...l", shifted, y)
    n_pad = int(2 ** np.ceil(np.log2(2 * n - 1)))
    f = jnp.fft.rfft(y, n=n_pad, axis=-1)
    ac = jnp.fft.irfft(f * jnp.conj(f), n=n_pad, axis=-1)[..., :n]
    if max_size is not None:
        ac = ac[..., :max_size]
    return ac


def tempogram(
    onset_envelope: jax.Array, hop_length: int = 512, win_length: int = 384, center: bool = True
) -> jax.Array:
    """Local autocorrelation tempogram (librosa.feature.tempogram).
    Returns (win_length, T)."""
    oe = onset_envelope
    if center:
        oe = jnp.pad(oe, (win_length // 2, win_length // 2), mode="linear_ramp", end_values=0)
    n_frames = onset_envelope.shape[0] if center else oe.shape[0] - win_length + 1
    idx = jnp.arange(n_frames)[None, :] + jnp.arange(win_length)[:, None]
    frames = oe[idx]  # (win_length, T)
    w = hann_window(win_length)[:, None]
    fw = frames * w
    n_pad = int(2 ** np.ceil(np.log2(2 * win_length - 1)))
    if _spectral.use_real_dft():
        f = _spectral.rfft_real(fw, n=n_pad, axis=0)
        power = f.re * f.re + f.im * f.im
        ac = _spectral.irfft_real(
            _spectral.RISpec(power, jnp.zeros_like(power)), n_pad, axis=0
        )[:win_length]
    else:
        f = jnp.fft.rfft(fw, n=n_pad, axis=0)
        ac = jnp.fft.irfft(f * jnp.conj(f), n=n_pad, axis=0)[:win_length]
    norm = jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(ac), axis=0, keepdims=True)), 1e-10)
    return ac / norm


def fourier_tempogram(
    onset_envelope: jax.Array, hop_length: int = 512, win_length: int = 384, center: bool = True
) -> jax.Array:
    """Short-time Fourier tempogram (`rosa/beat.py:33-38`)."""
    oe = onset_envelope
    if center:
        oe = jnp.pad(oe, (win_length // 2, win_length // 2))
    n_frames = onset_envelope.shape[0] if center else oe.shape[0] - win_length + 1
    idx = jnp.arange(n_frames)[None, :] + jnp.arange(win_length)[:, None]
    frames = oe[idx] * hann_window(win_length)[:, None]
    if _spectral.use_real_dft():
        return _spectral.rfft_real(frames, axis=0)
    return jnp.fft.rfft(frames, axis=0)


def plp(
    onset_envelope: jax.Array,
    sr: float = 22050,
    hop_length: int = 512,
    win_length: int = 384,
    tempo_min: Optional[float] = 30.0,
    tempo_max: Optional[float] = 300.0,
    prior: Optional[np.ndarray] = None,
) -> jax.Array:
    """Predominant local pulse (`rosa/beat.py:41-77`;
    librosa.beat.plp): pick the strongest tempogram bin per frame,
    zero all others, inverse-STFT, half-wave rectify, normalize."""
    ftgram = fourier_tempogram(onset_envelope, hop_length, win_length)
    tempo_frequencies_ = fourier_tempo_frequencies(sr=sr, win_length=win_length, hop_length=hop_length)
    mask = np.ones(len(tempo_frequencies_), bool)
    if tempo_min is not None:
        mask &= tempo_frequencies_ >= tempo_min
    if tempo_max is not None:
        mask &= tempo_frequencies_ <= tempo_max
    mag = _spectral.spec_abs(ftgram)
    if prior is not None:
        mag = mag * jnp.asarray(prior)[:, None]
    mag = jnp.where(jnp.asarray(mask)[:, None], mag, -jnp.inf)
    peaks = jnp.argmax(mag, axis=0)
    keep = jax.nn.one_hot(peaks, ftgram.shape[0], axis=0)
    ftgram_kept = _spectral.spec_mul_real(ftgram, keep)
    # normalize each frame's peak to unit magnitude
    peak_vals = jnp.max(_spectral.spec_abs(ftgram_kept), axis=0, keepdims=True)
    ftgram_kept = _spectral.spec_mul_real(ftgram_kept, 1.0 / jnp.maximum(peak_vals, 1e-10))
    # inverse short-time FT (overlap-add)
    if isinstance(ftgram_kept, _spectral.RISpec):
        frames = _spectral.irfft_real(ftgram_kept, win_length, axis=0) * hann_window(win_length)[:, None]
    else:
        frames = jnp.fft.irfft(ftgram_kept, n=win_length, axis=0) * hann_window(win_length)[:, None]
    n_frames = frames.shape[1]
    out_len = win_length + (n_frames - 1)
    idx = (jnp.arange(win_length)[:, None] + jnp.arange(n_frames)[None, :]).reshape(-1)
    pulse = jnp.zeros(out_len).at[idx].add(frames.reshape(-1))
    pulse = pulse[win_length // 2 : win_length // 2 + onset_envelope.shape[0]]
    pulse = jnp.maximum(pulse, 0.0)
    return pulse / jnp.maximum(jnp.max(jnp.abs(pulse)), 1e-10)


def tempo(
    onset_envelope: jax.Array,
    sr: float = 22050,
    hop_length: int = 512,
    start_bpm: float = 120.0,
    std_bpm: float = 1.0,
    ac_size: float = 8.0,
    max_tempo: float = 320.0,
    prior: Optional[np.ndarray] = None,
) -> jax.Array:
    """Global tempo estimate from the onset autocorrelation
    (librosa.beat.tempo; reference wrapper `audioreactive/mir.py:183-209`)."""
    win_length = int(ac_size * sr / hop_length)
    win_length = min(win_length, onset_envelope.shape[0])
    ac = autocorrelate(onset_envelope, max_size=win_length)
    ac = ac / jnp.maximum(jnp.max(jnp.abs(ac)), 1e-10)
    bpms = tempo_frequencies(win_length, hop_length=hop_length, sr=sr)
    if prior is not None:
        logprior = jnp.asarray(prior)
    else:
        logprior = jnp.asarray(-0.5 * ((np.log2(np.maximum(bpms, 1e-10)) - np.log2(start_bpm)) / std_bpm) ** 2)
    if max_tempo is not None:
        logprior = jnp.where(jnp.asarray(bpms > max_tempo), -jnp.inf, logprior)
    best = jnp.argmax(power_to_db(jnp.maximum(ac, 1e-10), top_db=None) + logprior)
    return jnp.asarray(bpms)[best]
