"""Spectral features: STFT, mel, MFCC, HPSS, RMS — jittable.

Rebuild of `rosa/spectral.py` (stft/istft :10-33, FFT-based dct
:35-56, spectrogram :59-62, melspectrogram :65-78, magphase :113-120,
softmask :123-142, hpss :145-161) with librosa-compatible semantics.
These are the ops the BASELINE names as the fused-Pallas-spectrogram
target; the jnp forms here are the reference implementations the
kernels are verified against.
"""

from __future__ import annotations

import math

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .convert import mel_filterbank, power_to_db


def hann_window(n: int) -> jnp.ndarray:
    """Periodic Hann (torch.hann_window / scipy periodic)."""
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n)


def frame(y: jax.Array, frame_length: int, hop_length: int) -> jax.Array:
    """(..., T) -> (..., frame_length, n_frames) sliding frames.

    When frame_length is a hop multiple, frames assemble from
    consecutive hop-blocks with slices/concat only — TPU gathers are an
    order of magnitude slower (see kernels/spectrogram.py)."""
    n_frames = 1 + (y.shape[-1] - frame_length) // hop_length
    if frame_length % hop_length == 0:
        k = frame_length // hop_length
        n_blocks = y.shape[-1] // hop_length
        blocks = y[..., : n_blocks * hop_length].reshape(y.shape[:-1] + (n_blocks, hop_length))
        parts = [blocks[..., i : n_blocks - k + 1 + i, :] for i in range(k)]
        frames = jnp.concatenate(parts, axis=-1)[..., :n_frames, :]
        return jnp.swapaxes(frames, -1, -2)
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[None, :] + jnp.arange(frame_length)[:, None]
    return y[..., idx]


def stft(
    y: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 1024,
    center: bool = True,
    window: Optional[jax.Array] = None,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Complex STFT, shape (..., 1 + n_fft//2, n_frames)
    (`rosa/spectral.py:10-21`, torch.stft semantics)."""
    if window is None:
        window = hann_window(n_fft)
    if center:
        pads = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        y = jnp.pad(y, pads, mode=pad_mode)
    frames = frame(y, n_fft, hop_length)  # (..., n_fft, T)
    frames = frames * window[:, None]
    return jnp.fft.rfft(frames, axis=-2)


def istft(
    spec: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 1024,
    center: bool = True,
    window: Optional[jax.Array] = None,
    length: Optional[int] = None,
) -> jax.Array:
    """Inverse STFT via windowed overlap-add
    (`rosa/spectral.py:24-33`, torch.istft semantics)."""
    if window is None:
        window = hann_window(n_fft)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-2) * window[:, None]  # (..., n_fft, T)
    n_frames = frames.shape[-1]
    out_len = n_fft + hop_length * (n_frames - 1)

    idx = (jnp.arange(n_fft)[:, None] + jnp.arange(n_frames)[None, :] * hop_length).reshape(-1)
    flat = frames.reshape(frames.shape[:-2] + (-1,))
    y = jnp.zeros(frames.shape[:-2] + (out_len,), frames.dtype).at[..., idx].add(flat)
    wsum = jnp.zeros((out_len,), window.dtype).at[idx].add(jnp.tile(jnp.square(window)[:, None], (1, n_frames)).reshape(-1))
    y = y / jnp.maximum(wsum, 1e-11)
    if center:
        y = y[..., n_fft // 2 : out_len - n_fft // 2]
    if length is not None:
        if y.shape[-1] < length:
            pads = [(0, 0)] * (y.ndim - 1) + [(0, length - y.shape[-1])]
            y = jnp.pad(y, pads)
        y = y[..., :length]
    return y


def dct(x: jax.Array, norm: Optional[str] = None) -> jax.Array:
    """DCT-II along the last axis via FFT (`rosa/spectral.py:35-56`)."""
    shape = x.shape
    N = shape[-1]
    x2 = x.reshape(-1, N)
    v = jnp.concatenate([x2[:, ::2], x2[:, 1::2][:, ::-1]], axis=1)
    Vc = jnp.fft.fft(v, axis=1)
    k = -jnp.arange(N, dtype=x.dtype)[None, :] * np.pi / (2 * N)
    V = Vc.real * jnp.cos(k) - Vc.imag * jnp.sin(k)
    if norm == "ortho":
        scale = jnp.full((N,), 1.0 / (math.sqrt(N / 2) * 2))
        scale = scale.at[0].set(1.0 / (math.sqrt(N) * 2))
        V = V * scale[None, :]
    return (2 * V).reshape(shape)


def spectrogram(
    y: jax.Array,
    n_fft: int = 2048,
    hop_length: int = 1024,
    power: float = 1.0,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Magnitude spectrogram. NOTE: mirrors the reference's dropping of
    the final STFT frame (`rosa/spectral.py:59-62` slices [:, :-1])."""
    S = stft(y, n_fft=n_fft, hop_length=hop_length, center=center, pad_mode=pad_mode)
    S = S[..., :-1]
    return jnp.abs(S) ** power


def melspectrogram(
    y: jax.Array,
    sr: float,
    n_fft: int = 2048,
    hop_length: int = 1024,
    power: float = 2.0,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
) -> jax.Array:
    """(`rosa/spectral.py:65-78`): mel_basis @ spectrogram."""
    S = spectrogram(y, n_fft=n_fft, hop_length=hop_length, power=power)
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels=n_mels, fmin=fmin, fmax=fmax))
    return basis @ S


def magphase(D: jax.Array, power: float = 1.0) -> Tuple[jax.Array, jax.Array]:
    """(`rosa/spectral.py:113-120`)"""
    mag = jnp.abs(D) ** power
    phase = jnp.exp(1.0j * jnp.angle(D))
    return mag, phase


def softmask(X: jax.Array, X_ref: jax.Array, power: float = 1.0, split_zeros: bool = False) -> jax.Array:
    """librosa.util.softmask (`rosa/spectral.py:123-142`)."""
    Z = jnp.maximum(X, X_ref)
    bad_idx = Z < jnp.finfo(Z.dtype).tiny
    Zsafe = jnp.where(bad_idx, 1.0, Z)
    if np.isfinite(power):
        ref_mask = (X_ref / Zsafe) ** power
        X_mask = (X / Zsafe) ** power
        mask = X_mask / (X_mask + ref_mask)
        fill = 0.5 if split_zeros else 0.0
        mask = jnp.where(bad_idx, fill, mask)
    else:
        mask = (X > X_ref).astype(X.dtype)
    return mask


def _median_filter_axis(x: jax.Array, size: int, axis: int) -> jax.Array:
    """Median filter along one axis via stacked shifts (edge-padded)."""
    r = size // 2
    x = jnp.moveaxis(x, axis, -1)
    pads = [(0, 0)] * (x.ndim - 1) + [(r, size - 1 - r)]
    xp = jnp.pad(x, pads, mode="edge")
    stack = jnp.stack([xp[..., i : i + x.shape[-1]] for i in range(size)], axis=0)
    med = jnp.median(stack, axis=0)
    return jnp.moveaxis(med, -1, axis)


def median_filter2d(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Separable-application 2D median filter (applies per-axis medians
    when one size is 1; general case stacks the full window)."""
    sh, sw = size
    if sh == 1:
        return _median_filter_axis(x, sw, -1)
    if sw == 1:
        return _median_filter_axis(x, sh, -2)
    r0, r1 = sh // 2, sw // 2
    pads = [(0, 0)] * (x.ndim - 2) + [(r0, sh - 1 - r0), (r1, sw - 1 - r1)]
    xp = jnp.pad(x, pads, mode="edge")
    h, w = x.shape[-2], x.shape[-1]
    windows = [xp[..., i : i + h, j : j + w] for i in range(sh) for j in range(sw)]
    return jnp.median(jnp.stack(windows, axis=0), axis=0)


def hpss(
    S: jax.Array, kernel_size: int = 31, power: float = 2.0, mask: bool = False, margin: float = 1.0
) -> Tuple[jax.Array, jax.Array]:
    """Harmonic/percussive separation on a magnitude spectrogram
    (`rosa/spectral.py:145-161`; librosa.decompose.hpss).
    S: (freq, time)."""
    harm = _median_filter_axis(S, kernel_size, axis=-1)   # smooth over time
    perc = _median_filter_axis(S, kernel_size, axis=-2)   # smooth over freq
    split_zeros = margin == 1.0
    mask_harm = softmask(harm, perc * margin, power=power, split_zeros=split_zeros)
    mask_perc = softmask(perc, harm * margin, power=power, split_zeros=split_zeros)
    if mask:
        return mask_harm, mask_perc
    return S * mask_harm, S * mask_perc


def harmonic(y: jax.Array, margin: float = 8.0, n_fft: int = 2048, hop_length: int = 512) -> jax.Array:
    """Time-domain harmonic component (librosa.effects.harmonic;
    reference `audioreactive/audio.py:85-88`)."""
    D = stft(y, n_fft=n_fft, hop_length=hop_length)
    mag, phase = magphase(D)
    mask_h, _ = hpss(mag, mask=True, margin=margin)
    return istft(D * mask_h, n_fft=n_fft, hop_length=hop_length, length=y.shape[-1])


def percussive(y: jax.Array, margin: float = 8.0, n_fft: int = 2048, hop_length: int = 512) -> jax.Array:
    """(reference `audioreactive/audio.py:91-94`)"""
    D = stft(y, n_fft=n_fft, hop_length=hop_length)
    mag, phase = magphase(D)
    _, mask_p = hpss(mag, mask=True, margin=margin)
    return istft(D * mask_p, n_fft=n_fft, hop_length=hop_length, length=y.shape[-1])


def rms(y: jax.Array, frame_length: int = 2048, hop_length: int = 512, center: bool = True) -> jax.Array:
    """Frame-wise root-mean-square energy (librosa.feature.rms;
    reference volume envelope `audioreactive/mir.py:64-77`)."""
    if center:
        pads = [(0, 0)] * (y.ndim - 1) + [(frame_length // 2, frame_length // 2)]
        y = jnp.pad(y, pads, mode="constant")
    frames = frame(y, frame_length, hop_length)
    return jnp.sqrt(jnp.mean(jnp.square(frames), axis=-2))


def mfcc(
    y: jax.Array, sr: float, n_mfcc: int = 20, n_fft: int = 2048, hop_length: int = 512, n_mels: int = 128
) -> jax.Array:
    """(selfsupervised `features/audio.py` mfcc): DCT-II(ortho) of the
    log-mel spectrogram; returns (n_mfcc, T)."""
    S = melspectrogram(y, sr, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels)
    logS = power_to_db(S)
    return dct(logS.T, norm="ortho").T[..., :n_mfcc, :]


def spectral_contrast(
    y: jax.Array,
    sr: float,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_bands: int = 6,
    fmin: float = 200.0,
    quantile: float = 0.02,
) -> jax.Array:
    """librosa.feature.spectral_contrast (valley/peak per octave band)."""
    S = jnp.abs(stft(y, n_fft=n_fft, hop_length=hop_length))
    freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    octa = np.zeros(n_bands + 2)
    octa[1:] = fmin * (2.0 ** np.arange(0, n_bands + 1))
    out = []
    for k in range(n_bands + 1):
        f_low, f_high = octa[k], octa[k + 1]
        idx = np.flatnonzero((freqs >= f_low) & (freqs <= f_high))
        if len(idx) == 0:
            idx = np.array([0])
        sub = S[..., idx, :]
        n = max(int(np.rint(quantile * len(idx))), 1)
        srt = jnp.sort(sub, axis=-2)
        valley = jnp.mean(srt[..., :n, :], axis=-2)
        peak = jnp.mean(srt[..., -n:, :], axis=-2)
        out.append(power_to_db(peak, top_db=None) - power_to_db(valley, top_db=None))
    return jnp.stack(out, axis=-2)


def spectral_flatness(y: jax.Array, n_fft: int = 2048, hop_length: int = 512, power: float = 2.0) -> jax.Array:
    """librosa.feature.spectral_flatness: geometric/arithmetic mean."""
    S = jnp.abs(stft(y, n_fft=n_fft, hop_length=hop_length)) ** power
    S = jnp.maximum(S, 1e-10)
    gmean = jnp.exp(jnp.mean(jnp.log(S), axis=-2))
    amean = jnp.mean(S, axis=-2)
    return gmean / amean
