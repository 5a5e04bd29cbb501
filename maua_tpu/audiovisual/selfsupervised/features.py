"""Self-supervised audio feature set at hop 1024.

Rebuild of `selfsupervised/features/audio.py:13-133` (onsets, rms,
drop_strength, chromagram, tonnetz, mfcc, pulse, spectral_contrast,
spectral_flatness — all (T, F) with hop 1024) and the salience
weighting of `selfsupervised/mir.py:13-21`.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ...audio import beat as _beat
from ...audio import chroma as _chroma
from ...audio.spectral import (
    harmonic as _harmonic,
    melspectrogram,
    mfcc as _mfcc,
    percussive as _percussive,
    rms as _rms,
    spectral_contrast as _contrast,
    spectral_flatness as _flatness,
)
from ...ops.signal import emphasize, gaussian_filter, normalize

HOP = 1024


def onsets(audio, sr) -> jax.Array:
    """(T, 1) (`features/audio.py:27-28`)"""
    y = _percussive(jnp.asarray(audio))
    env = _beat.onset_strength(y, sr=sr, hop_length=HOP)
    return normalize(env)[:, None]


def rms(audio, sr) -> jax.Array:
    """(T, 1) (`features/audio.py:31-38`)"""
    return _rms(jnp.asarray(audio), frame_length=2048, hop_length=HOP)[:-1][:, None]


def drop_strength(audio, sr) -> jax.Array:
    """(T, 1) (`features/audio.py:41-42`)"""
    return emphasize(gaussian_filter(rms(audio, sr), 10.0), strength=10.0, percentile_p=50.0)


def chromagram(audio, sr) -> jax.Array:
    """(T, 12) (`features/audio.py:45-46`)"""
    return _chroma.chroma_cens(_harmonic(jnp.asarray(audio)), sr=sr, hop_length=HOP).T


def tonnetz(audio, sr) -> jax.Array:
    """(T, 6) (`features/audio.py:49-59`)"""
    return _chroma.tonnetz(chromagram(audio, sr).T).T


def mfcc(audio, sr) -> jax.Array:
    """(T, 20) (`features/audio.py:62-67`)"""
    return _mfcc(jnp.asarray(audio), sr, hop_length=HOP)[:20].T


def pulse(audio, sr) -> jax.Array:
    """(T, 1) (`features/audio.py:70-71`)"""
    y = _percussive(jnp.asarray(audio))
    env = _beat.onset_strength(y, sr=sr, hop_length=HOP)
    return _beat.plp(env, sr=sr, hop_length=HOP)[:, None]


def spectral_contrast(audio, sr) -> jax.Array:
    """(T, 7) (`features/audio.py:74-121`)"""
    return _contrast(jnp.asarray(audio), sr, hop_length=HOP).T


def spectral_flatness(audio, sr) -> jax.Array:
    """(T, 1) (`features/audio.py:124-130`)"""
    return _flatness(jnp.asarray(audio), hop_length=HOP)[:, None]


AFEATFNS = [chromagram, tonnetz, mfcc, spectral_contrast, spectral_flatness, rms, drop_strength, onsets]
UNITFEATS = ["rms", "drop_strength", "onsets", "spectral_flatness"]
ALLFEATS = ["chromagram", "tonnetz", "mfcc", "spectral_contrast"] + UNITFEATS


def salience_weighted(envelope: jax.Array, short_sigma: float = 5.0, long_sigma: float = 80.0) -> jax.Array:
    """Emphasize locally-salient envelope motion
    (`selfsupervised/mir.py:13-21`)."""
    env = envelope.squeeze() if envelope.ndim > 1 else envelope
    short = gaussian_filter(env, short_sigma, causal=0.0, mode="reflect")
    long = gaussian_filter(env, long_sigma, causal=0.0, mode="reflect")
    weighted = (short / jnp.maximum(long, 1e-8)) ** 2 * env
    return weighted[:, None] if weighted.ndim < 2 else weighted


def extract_features(audio, sr) -> Dict[str, jax.Array]:
    """All 8 features, same frame count."""
    feats = {fn.__name__: fn(audio, sr) for fn in AFEATFNS}
    t = min(int(f.shape[0]) for f in feats.values())
    return {k: v[:t] for k, v in feats.items()}
