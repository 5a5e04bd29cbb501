"""Chromagram variants: stft / cqt / cens + NN-filter smoothing,
tonnetz.

Rebuild of `rosa/spectral.py` chroma_cens :164-280 / chroma_cqt
:286-325 and the reference chroma wrapper
(`audioreactive/mir.py:80-122`) with librosa-compatible semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .constantq import cqt
from .convert import chroma_filterbank, cq_to_chroma, note_to_hz
from .spectral import spec_abs, stft


def _normalize_cols(x: jax.Array, norm: float = jnp.inf, axis: int = 0) -> jax.Array:
    if norm == jnp.inf:
        mag = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    elif norm == 1:
        mag = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    else:
        mag = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(mag, 1e-10)


def chroma_stft(
    y: jax.Array, sr: float = 22050, n_fft: int = 2048, hop_length: int = 512, n_chroma: int = 12, tuning: float = 0.0
) -> jax.Array:
    """STFT-based chromagram (librosa.feature.chroma_stft).
    Returns (n_chroma, T)."""
    S = spec_abs(stft(y, n_fft=n_fft, hop_length=hop_length)) ** 2
    fb = jnp.asarray(chroma_filterbank(sr, n_fft, n_chroma=n_chroma, tuning=tuning))
    raw = fb @ S
    return _normalize_cols(raw)


def chroma_cqt(
    y: jax.Array,
    sr: float = 22050,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    n_chroma: int = 12,
    n_octaves: int = 7,
    bins_per_octave: int = 36,
) -> jax.Array:
    """CQT-based chromagram (`rosa/spectral.py:286-325`)."""
    if fmin is None:
        fmin = note_to_hz("C1")
    n_bins = n_octaves * bins_per_octave
    C = spec_abs(
        cqt(y, sr=sr, hop_length=hop_length, fmin=fmin, n_bins=n_bins, bins_per_octave=bins_per_octave)
    )
    proj = jnp.asarray(cq_to_chroma(n_bins, bins_per_octave=bins_per_octave, n_chroma=n_chroma, fmin=fmin))
    return _normalize_cols(proj @ C)


def chroma_cens(
    y: jax.Array,
    sr: float = 22050,
    hop_length: int = 512,
    fmin: Optional[float] = None,
    n_chroma: int = 12,
    n_octaves: int = 7,
    bins_per_octave: int = 36,
    win_len_smooth: int = 41,
) -> jax.Array:
    """Chroma Energy Normalized Statistics (`rosa/spectral.py:164-280`;
    librosa.feature.chroma_cens): l1-normalize, quantize, smooth."""
    chroma = chroma_cqt(
        y, sr=sr, hop_length=hop_length, fmin=fmin, n_chroma=n_chroma,
        n_octaves=n_octaves, bins_per_octave=bins_per_octave,
    )
    chroma = _normalize_cols(chroma, norm=1)
    # quantization (librosa QUANT_STEPS / QUANT_WEIGHTS)
    steps = jnp.asarray([0.4, 0.2, 0.1, 0.05])
    quant = jnp.sum((chroma[None] > steps[:, None, None]) * 0.25, axis=0)
    # smooth with a Hann window over time
    win = np.hanning(win_len_smooth + 2)[1:-1]
    win = win / win.sum()
    r = len(win) // 2
    qp = jnp.pad(quant, ((0, 0), (r, len(win) - 1 - r)), mode="constant")
    smoothed = jnp.stack([qp[:, i : i + quant.shape[1]] * win[i] for i in range(len(win))], 0).sum(0)
    return _normalize_cols(smoothed, norm=2)


def nn_filter_cosine_median(x: jax.Array, k: Optional[int] = None, chunk: int = 2048) -> jax.Array:
    """Nearest-neighbor smoothing: replace each frame by the median of
    its k most cosine-similar frames (librosa.decompose.nn_filter as
    used at `audioreactive/mir.py:115-116`). x: (d, T).

    Processed in row chunks so the (T, T) cosine matrix never
    materializes (a 3-min track at hop 512 would need ~1 GB for it);
    each chunk computes its (chunk, T) similarity block, exact top-k,
    and the neighbor-value median."""
    d, t = x.shape
    if k is None:
        k = min(t - 1, int(2 * np.ceil(np.sqrt(t))))
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=0, keepdims=True), 1e-10)
    if t <= chunk:
        sim = xn.T @ xn - 2.0 * jnp.eye(t)  # exclude self
        _, nbr_idx = jax.lax.top_k(sim, k)  # (T, k)
        return jnp.median(x[:, nbr_idx], axis=-1)

    n_chunks = -(-t // chunk)
    pad = n_chunks * chunk - t
    xt_p = jnp.pad(xn.T, ((0, pad), (0, 0))).reshape(n_chunks, chunk, d)
    row0 = jnp.arange(n_chunks) * chunk

    def process(args):
        rows, r0 = args  # (chunk, d), scalar row offset
        sim = rows @ xn  # (chunk, T)
        idx = r0 + jnp.arange(chunk)
        sim = sim.at[jnp.arange(chunk), jnp.clip(idx, 0, t - 1)].add(-2.0)  # exclude self
        _, nbr_idx = jax.lax.top_k(sim, k)
        return jnp.median(x[:, nbr_idx], axis=-1)  # (d, chunk)

    out = jax.lax.map(process, (xt_p, row0))  # (n_chunks, d, chunk)
    return jnp.moveaxis(out, 0, 1).reshape(d, -1)[:, :t]


def tonnetz(chroma: jax.Array) -> jax.Array:
    """Tonal centroid features from a chromagram
    (librosa.feature.tonnetz; reference `audioreactive/mir.py:125-132`).
    chroma: (n_chroma, T) -> (6, T)."""
    n_chroma = chroma.shape[0]
    dim_map = np.linspace(0, 12, num=n_chroma, endpoint=False)
    scale = np.asarray([7.0 / 6, 7.0 / 6, 3.0 / 2, 3.0 / 2, 2.0 / 3, 2.0 / 3])
    V = scale[:, None] * dim_map[None, :]
    V[::2] -= 0.5
    R = np.array([1, 1, 1, 1, 0.5, 0.5])
    phi = R[:, None] * np.cos(np.pi * V)
    # l1-normalize chroma per frame
    c = chroma / jnp.maximum(jnp.sum(jnp.abs(chroma), axis=0, keepdims=True), 1e-10)
    return jnp.asarray(phi, jnp.float32) @ c
