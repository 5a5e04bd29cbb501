"""Pitch tracking: piptrack, tuning estimation.

Rebuild of `rosa/pitch.py` (estimate_tuning/piptrack :9-96) with
librosa-compatible parabolic-interpolation peak picking.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .spectral import spec_abs, stft


def piptrack(
    y: jax.Array,
    sr: float = 22050,
    n_fft: int = 2048,
    hop_length: int = 512,
    fmin: float = 150.0,
    fmax: float = 4000.0,
    threshold: float = 0.1,
) -> Tuple[jax.Array, jax.Array]:
    """Parabolic-interpolated instantaneous pitches of spectral peaks
    (`rosa/pitch.py:40-96`). Returns (pitches, magnitudes), both
    (1 + n_fft//2, T)."""
    S = spec_abs(stft(y, n_fft=n_fft, hop_length=hop_length))
    fft_freqs = jnp.asarray(np.linspace(0, sr / 2, 1 + n_fft // 2, dtype=np.float32))

    # parabolic interpolation around each bin
    avg = 0.5 * (jnp.roll(S, -1, axis=0) - jnp.roll(S, 1, axis=0))
    shift = 2 * S - jnp.roll(S, -1, axis=0) - jnp.roll(S, 1, axis=0)
    shift = avg / jnp.where(jnp.abs(shift) < 1e-10, 1.0, shift)
    avg = avg.at[0].set(0).at[-1].set(0)
    shift = shift.at[0].set(0).at[-1].set(0)

    freq_mask = (fft_freqs >= fmin) & (fft_freqs <= fmax)
    ref = threshold * jnp.max(S, axis=0, keepdims=True)
    peaks = (S > ref) & (S > jnp.roll(S, 1, axis=0)) & (S >= jnp.roll(S, -1, axis=0))
    peaks = peaks & freq_mask[:, None]

    bin_offsets = jnp.arange(S.shape[0])[:, None] + shift
    pitches = jnp.where(peaks, bin_offsets * sr / n_fft, 0.0)
    mags = jnp.where(peaks, S + 0.5 * avg * shift, 0.0)
    return pitches, mags


def pitch_tuning(frequencies: jax.Array, resolution: float = 0.01, bins_per_octave: int = 12) -> jax.Array:
    """Tuning offset in fractional bins from a set of frequencies
    (librosa.pitch_tuning)."""
    f = jnp.where(frequencies > 0, frequencies, 440.0)
    octs = jnp.log2(f / (440.0 / 16))
    residual = jnp.mod(bins_per_octave * octs, 1.0)
    residual = jnp.where(residual >= 0.5, residual - 1.0, residual)
    weights = (frequencies > 0).astype(jnp.float32)
    bins = jnp.linspace(-0.5, 0.5, int(np.ceil(1.0 / resolution)) + 1)
    idx = jnp.clip(jnp.searchsorted(bins, residual.reshape(-1)) - 1, 0, len(bins) - 2)
    counts = jnp.zeros(len(bins) - 1).at[idx].add(weights.reshape(-1))
    return bins[jnp.argmax(counts)]


def estimate_tuning(
    y: jax.Array, sr: float = 22050, n_fft: int = 2048, resolution: float = 0.01, **kwargs
) -> jax.Array:
    """(`rosa/pitch.py:9-38`)"""
    pitches, mags = piptrack(y, sr=sr, n_fft=n_fft, **kwargs)
    # weight: only count pitches with mag above median of positive mags
    pos = pitches > 0
    mag_med = jnp.nanmedian(jnp.where(pos, mags, jnp.nan))
    sel = pos & (mags >= jnp.nan_to_num(mag_med))
    return pitch_tuning(jnp.where(sel, pitches, 0.0), resolution=resolution)


def pitch_track_envelope(y: jax.Array, sr: float = 22050, **kwargs) -> jax.Array:
    """Magnitude-weighted average pitch per frame
    (reference `audioreactive/mir.py:135-141`)."""
    pitches, mags = piptrack(y, sr=sr, **kwargs)
    return jnp.average(pitches, axis=0, weights=mags + 1e-8)
