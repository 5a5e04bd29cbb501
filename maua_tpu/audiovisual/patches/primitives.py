"""Patch building blocks: looping/tonal/modulated latent and noise
sequences.

Rebuild of `maua/audiovisual/patches/primitives/` (latents.py:12-135,
noise.py:6-58, merge.py:6-14). The reference's stateful index-stepping
Modules become plain array producers: every primitive precomputes its
full (n_frames, ...) sequence; `ModulationSum` averages weighted
primitives. This matches the TPU render model (whole sequences scanned
on device) instead of per-frame Python iteration.
"""

from __future__ import annotations


from typing import List, Optional

import jax
import jax.numpy as jnp


from ...audio.latent import slerp_loops, spline_loops
from ...ops.signal import gaussian_filter, resample_1d


def loop_latents(latent_selection: jax.Array, loop_len: int, type: str = "spline", smooth: float = 10.0,
                 key=None) -> jax.Array:
    """Looping latent sequence (`primitives/latents.py:12-66`).
    (K, L, D) -> (loop_len, L, D)."""
    if loop_len == 1 or type == "constant":
        return latent_selection[:1]
    if type == "spline":
        return spline_loops(latent_selection, loop_len, 1)
    if type == "slerp":
        return slerp_loops(latent_selection, loop_len, 1)
    if type == "gaussian":
        k = latent_selection.shape[0]
        reps = max(round(loop_len / k), 1)
        lat = jnp.repeat(latent_selection, reps, axis=0)
        lat = resample_1d(lat, loop_len)
        return gaussian_filter(lat, smooth)
    raise ValueError(f"unknown loop type {type}")


def tempo_loop_latents(tempo: float, latent_selection: jax.Array, n_bars: int, fps: float, **kw) -> jax.Array:
    """(`primitives/latents.py:69-76`)"""
    if latent_selection.shape[0] == 1:
        loop_len = 1
    else:
        loop_len = round(n_bars * fps * 60 / (tempo / 4))
    return loop_latents(latent_selection, loop_len, **kw)


def pitch_track_latents(pitch_track: jax.Array, latent_selection: jax.Array) -> jax.Array:
    """(`primitives/latents.py:79-96`)"""
    low = jnp.percentile(pitch_track, 25)
    high = jnp.percentile(pitch_track, 75)
    pt = (pitch_track - low) / jnp.maximum(high - low, 1e-10)
    pt = pt * latent_selection.shape[0]
    idx = jnp.round(pt).astype(jnp.int32) % latent_selection.shape[0]
    return latent_selection[idx]


def tonal_latents(chroma_or_tonnetz: jax.Array, latent_selection: jax.Array) -> jax.Array:
    """(`primitives/latents.py:99-118`): (T, A), (K, L, D) -> (T, L, D)."""
    w = chroma_or_tonnetz / jnp.maximum(chroma_or_tonnetz.sum(axis=1, keepdims=True), 1e-10)
    a = chroma_or_tonnetz.shape[1]
    sel = latent_selection[jnp.arange(a) % latent_selection.shape[0]]
    return jnp.einsum("ta,ald->tld", w, sel)


def modulated_latents(modulation: jax.Array, base_latents: jax.Array) -> jax.Array:
    """(`primitives/latents.py:121-131`): (T,), (*, L, D) -> (T, L, D)."""
    return modulation[:, None, None] * base_latents[:1]


# ------------------------------------------------------------- noise
def loop_noise(loop_len: int, size: int, smooth: float, key=None) -> jax.Array:
    """Smoothed looping noise video (`primitives/noise.py:6-17`).
    -> (loop_len, size, size, 1), circularly smooth in time."""
    if key is None:
        key = jax.random.PRNGKey(0)
    noise = jax.random.normal(key, (loop_len, size, size, 1))
    noise = gaussian_filter(noise, smooth)
    std = noise.std(axis=(1, 2, 3))
    std = gaussian_filter(std, smooth)
    return noise / std.reshape(-1, 1, 1, 1)


def tempo_loop_noise(tempo: float, n_bars: int, fps: float, **kw) -> jax.Array:
    """(`primitives/noise.py:20-24`)"""
    loop_len = round(n_bars * fps * 60 / (tempo / 4))
    return loop_noise(loop_len, **kw)


def tonal_noise(chroma_or_tonnetz: jax.Array, size: int, key=None) -> jax.Array:
    """(`primitives/noise.py:27-41`)"""
    if key is None:
        key = jax.random.PRNGKey(0)
    w = chroma_or_tonnetz / jnp.maximum(chroma_or_tonnetz.sum(axis=1, keepdims=True), 1e-10)
    a = chroma_or_tonnetz.shape[1]
    noises = jax.random.normal(key, (a, size, size, 1))
    noise = jnp.einsum("ta,ahwc->thwc", w, noises)
    std = gaussian_filter(noise.std(axis=(1, 2, 3)), 10.0)
    return noise / std.reshape(-1, 1, 1, 1)


def modulated_noise(modulation: jax.Array, base_noise: Optional[jax.Array] = None, size: Optional[int] = None,
                    key=None) -> jax.Array:
    """(`primitives/noise.py:44-58`)"""
    if base_noise is None:
        base_noise = loop_noise(modulation.shape[0], size, 1.0, key)
    t = modulation.shape[0]
    base = base_noise[jnp.arange(t) % base_noise.shape[0]]
    return modulation.reshape(-1, 1, 1, 1) * base


class Modulated:
    """A (sequence, modulation) pair for ModulationSum."""

    def __init__(self, sequence: jax.Array, modulation: jax.Array):
        self.sequence = sequence
        self.modulation = modulation


def modulation_sum(modulated: List[Modulated], n_frames: int) -> jax.Array:
    """Weighted average of modulated sequences
    (`primitives/merge.py:6-14`)."""
    total = None
    weight = jnp.zeros((n_frames,))
    for m in modulated:
        mod = m.modulation[jnp.arange(n_frames) % m.modulation.shape[0]]
        seq = m.sequence[jnp.arange(n_frames) % m.sequence.shape[0]]
        contrib = mod.reshape((-1,) + (1,) * (seq.ndim - 1)) * seq
        total = contrib if total is None else total + contrib
        weight = weight + mod
    return total / jnp.maximum(weight.reshape((-1,) + (1,) * (total.ndim - 1)), 1e-10)
